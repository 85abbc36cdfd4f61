"""Beam search & CTC prefix scorer tests (SURVEY.md §4: beam=1 ≡ greedy;
prefix scorer vs brute-force path enumeration on a toy vocab)."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_asr_tpu.config import Config, DecodeConfig
from e2e_asr_tpu.decode import ctc_prefix
from e2e_asr_tpu.decode.beam import beam_search
from e2e_asr_tpu.decode.greedy import greedy_decode
from e2e_asr_tpu.models import asr as asr_mod


# ---------------------------------------------------------------- prefix DP
def brute_force_prefix(probs: np.ndarray, prefix, full: bool = False) -> float:
    """P(collapsed path starts with `prefix`) by enumerating all V^T paths.
    full=True: P(collapsed path == prefix)."""
    t, v = probs.shape
    total = 0.0
    for path in itertools.product(range(v), repeat=t):
        p = 1.0
        for ti, s in enumerate(path):
            p *= probs[ti, s]
        col = []
        prev = -1
        for s in path:
            if s != prev and s != 0:
                col.append(s)
            prev = s
        ok = col == list(prefix) if full else col[: len(prefix)] == list(prefix)
        if ok:
            total += p
    return total


def test_prefix_scores_vs_bruteforce():
    rng = np.random.RandomState(0)
    t, v = 5, 4
    logits = rng.randn(1, t, v).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    probs = np.exp(lp[0])
    enc_len = jnp.asarray([t])

    # empty prefix, candidates = each non-blank token
    r_g = ctc_prefix.init_empty_prefix(jnp.asarray(lp), enc_len, beam=1)
    cand = jnp.asarray([[[1, 2, 3]]])  # [B=1, W=1, K=3]
    psi, r_h = ctc_prefix.prefix_scores(
        jnp.asarray(lp), enc_len, r_g, jnp.asarray([[0]]), cand, prefix_is_empty=True
    )
    for ki, c in enumerate([1, 2, 3]):
        gold = brute_force_prefix(probs, [c])
        np.testing.assert_allclose(float(jnp.exp(psi[0, 0, ki])), gold, rtol=1e-4)

    # extend prefix [1] by candidates {1, 2}: psi([1,c])
    r_g1 = r_h[:, :, 0]  # forward vars of prefix [1]
    cand2 = jnp.asarray([[[1, 2]]])
    psi2, r_h2 = ctc_prefix.prefix_scores(
        jnp.asarray(lp), enc_len, r_g1, jnp.asarray([[1]]), cand2, prefix_is_empty=False
    )
    np.testing.assert_allclose(
        float(jnp.exp(psi2[0, 0, 0])), brute_force_prefix(probs, [1, 1]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(jnp.exp(psi2[0, 0, 1])), brute_force_prefix(probs, [1, 2]), rtol=1e-4
    )

    # eos score of prefix [1] == P(collapsed == [1])
    eos = ctc_prefix.eos_score(r_g1, enc_len)
    np.testing.assert_allclose(
        float(jnp.exp(eos[0, 0])), brute_force_prefix(probs, [1], full=True), rtol=1e-4
    )


def test_prefix_scores_impls_agree():
    """All prefix-scorer implementations (pallas kernel, closed form,
    literal scan) agree at realistic lattice sizes / magnitudes
    (log-prob sums reach -1e2..-1e3)."""
    rng = np.random.RandomState(7)
    b, w, k, t, v = 2, 3, 4, 97, 12
    # peaked distributions like a trained CTC head (blank-dominant)
    logits = rng.randn(b, t, v).astype(np.float32) * 3.0
    logits[:, :, 0] += 2.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    enc_len = jnp.asarray([t, t - 31])

    # parent forward variables: evolve real prefixes from the empty one
    r_g = ctc_prefix.init_empty_prefix(lp, enc_len, beam=w)
    last = jnp.zeros((b, w), jnp.int32)
    cand0 = jnp.asarray(rng.randint(1, v, (b, w, k)), jnp.int32)
    args = (lp, enc_len, r_g, last, cand0, True)
    psi_s, rh_s = ctc_prefix.prefix_scores_scan(*args)
    for impl in ("pallas", "closed_form"):
        psi_p, rh_p = ctc_prefix.prefix_scores(*args, impl=impl)
        np.testing.assert_allclose(np.asarray(psi_p), np.asarray(psi_s), rtol=1e-5, atol=2e-3)
        fin = np.asarray(rh_s) > -1e20  # compare only reachable lattice cells
        np.testing.assert_allclose(
            np.asarray(rh_p)[fin], np.asarray(rh_s)[fin], rtol=1e-5, atol=2e-3
        )

    # non-empty prefixes: take candidate 0's forward vars as the new parents
    r_g1 = rh_p[:, :, 0]
    last1 = cand0[:, :, 0]
    cand1 = jnp.asarray(rng.randint(1, v, (b, w, k)), jnp.int32)
    cand1 = cand1.at[:, :, 1].set(last1)  # exercise the `match` branch
    psi_s, rh_s = ctc_prefix.prefix_scores_scan(lp, enc_len, r_g1, last1, cand1, False)
    for impl in ("pallas", "closed_form"):
        psi_p, rh_p = ctc_prefix.prefix_scores(
            lp, enc_len, r_g1, last1, cand1, False, impl=impl
        )
        np.testing.assert_allclose(np.asarray(psi_p), np.asarray(psi_s), rtol=1e-5, atol=2e-3)
        fin = np.asarray(rh_s) > -1e20
        np.testing.assert_allclose(
            np.asarray(rh_p)[fin], np.asarray(rh_s)[fin], rtol=1e-5, atol=2e-3
        )


def test_prefix_scores_length_masked():
    """Frames past enc_len must not contribute."""
    rng = np.random.RandomState(1)
    t = 4
    logits = rng.randn(1, t, 3).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    lp_padded = jnp.pad(lp, ((0, 0), (0, 3), (0, 0)))
    cand = jnp.asarray([[[1, 2]]])
    for lpx in (lp, lp_padded):
        r_g = ctc_prefix.init_empty_prefix(lpx, jnp.asarray([t]), 1)
        psi, _ = ctc_prefix.prefix_scores(
            lpx, jnp.asarray([t]), r_g, jnp.asarray([[0]]), cand, True
        )
        if lpx is lp:
            ref = np.asarray(psi)
        else:
            np.testing.assert_allclose(np.asarray(psi), ref, rtol=1e-5)


# ----------------------------------------------------------------- beam ≡ greedy
def _toy_model(ctc_weight=0.5, seed=0, vocab=12):
    cfg = Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 20, "use_pallas": False}},
            "model": {
                "ctc_weight": ctc_weight,
                "encoder": {
                    "prenet": "",
                    "dim": [32],
                    "dropout": [0.0],
                    "layer_norm": [False],
                    "proj": [True],
                    "sample_rate": [2],
                    "sample_style": "drop",
                },
                "attention": {"mode": "dot", "dim": 24, "num_head": 1},
                "decoder": {"dim": 32, "layer": 1},
            },
            "hparas": {"dtype": "float32"},
        }
    )
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(seed), 20, vocab, cfg.model)
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(2, 40, 20).astype(np.float32))
    feat_len = jnp.asarray([40, 26])
    return cfg, params, feat, feat_len


def test_beam1_equals_greedy():
    cfg, params, feat, feat_len = _toy_model(ctc_weight=0.0)
    max_step = 12
    g_toks, _ = greedy_decode(params, cfg.model, feat, feat_len, max_step)
    dcfg = DecodeConfig(beam_size=1, ctc_weight=0.0, lm_weight=0.0, max_len_ratio=10.0)
    res = beam_search(params, cfg.model, dcfg, feat, feat_len, max_step)
    g = np.asarray(g_toks)
    b_ = np.asarray(res.tokens[:, 0])
    for i in range(g.shape[0]):
        gl = list(g[i])
        gl = gl[: gl.index(1) + 1] if 1 in gl else gl
        bl = list(b_[i][: int(res.lengths[i, 0])])
        assert bl == gl, f"utt {i}: beam {bl} != greedy {gl}"


def test_beam_search_shapes_and_scores_sorted():
    cfg, params, feat, feat_len = _toy_model(ctc_weight=0.5)
    dcfg = DecodeConfig(beam_size=4, ctc_weight=0.3, lm_weight=0.0)
    res = beam_search(params, cfg.model, dcfg, feat, feat_len, max_step=10)
    assert res.tokens.shape == (2, 4, 10)
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-5).all(), "beams not sorted by score"
    ln = np.asarray(res.lengths)
    tk = np.asarray(res.tokens)
    for bi in range(2):
        for wi in range(4):
            assert (tk[bi, wi, ln[bi, wi] :] == 0).all()


def test_beam_with_lm_fusion():
    from e2e_asr_tpu.config import LMConfig
    from e2e_asr_tpu.models import lm as lm_mod

    cfg, params, feat, feat_len = _toy_model(ctc_weight=0.0)
    lm_cfg = LMConfig(emb_dim=16, dim=24, n_layers=1)
    lm_params = lm_mod.lm_init(jax.random.PRNGKey(7), 12, lm_cfg)
    dcfg = DecodeConfig(beam_size=3, ctc_weight=0.0, lm_weight=0.4)
    res = beam_search(
        params, cfg.model, dcfg, feat, feat_len, max_step=8,
        lm_params=lm_params, lm_cfg=lm_cfg,
    )
    assert res.tokens.shape == (2, 3, 8)
    assert np.isfinite(np.asarray(res.scores)[:, 0]).all()


def test_beam_jit_compiles():
    cfg, params, feat, feat_len = _toy_model(ctc_weight=0.5)
    dcfg = DecodeConfig(beam_size=4, ctc_weight=0.4)
    fn = jax.jit(
        lambda p, f, fl: beam_search(p, cfg.model, dcfg, f, fl, max_step=9)
    )
    res = fn(params, feat, feat_len)
    assert res.tokens.shape == (2, 4, 9)


def test_beam_eos_length_window():
    """min/max_len_ratio bound finished hypothesis lengths."""
    cfg, params, feat, feat_len = _toy_model(ctc_weight=0.0)
    dcfg = DecodeConfig(beam_size=4, ctc_weight=0.0, min_len_ratio=0.3, max_len_ratio=0.6)
    res = beam_search(params, cfg.model, dcfg, feat, feat_len, max_step=16)
    # enc lens are 20 and 13 (40/2, 26/2); window is [0.3*S, 0.6*S]
    enc_s = np.asarray([20, 13])
    ln = np.asarray(res.lengths)
    tk = np.asarray(res.tokens)
    for bi in range(2):
        for wi in range(4):
            ended = 1 in list(tk[bi, wi])
            if ended:
                assert ln[bi, wi] >= int(0.3 * enc_s[bi])
                assert ln[bi, wi] <= max(int(0.6 * enc_s[bi]), 1) + 1


def test_beam_with_padded_batch_row():
    cfg, params, feat, feat_len = _toy_model(ctc_weight=0.3)
    feat = feat.at[1].set(0.0)
    feat_len = feat_len.at[1].set(0)  # fully padded row
    dcfg = DecodeConfig(beam_size=3, ctc_weight=0.3)
    res = beam_search(params, cfg.model, dcfg, feat, jnp.maximum(feat_len, 0), max_step=8)
    assert np.isfinite(np.asarray(res.scores)[0]).any()
    assert res.tokens.shape == (2, 3, 8)  # padded row decodes garbage, caller drops by uid


def test_live_leftover_avgscore_parity():
    """Live (unfinished) leftovers are normalized by EMITTED length, not by
    the static max_step (ref avgScore() parity, src/decode.py:~180; round-3
    verdict weak item 4): per-utterance state freezes once t >= max_len, so
    widening the scan window must not change results at all.
    """
    cfg, params, feat, feat_len = _toy_model(ctc_weight=0.0)
    # max_len = 0.4 * enc_len = [8, 5]; both << the 16/32 scan windows
    dcfg = DecodeConfig(beam_size=3, ctc_weight=0.0, min_len_ratio=0.0, max_len_ratio=0.4)
    r16 = beam_search(params, cfg.model, dcfg, feat, feat_len, max_step=16)
    r32 = beam_search(params, cfg.model, dcfg, feat, feat_len, max_step=32)
    np.testing.assert_allclose(
        np.asarray(r16.scores), np.asarray(r32.scores), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(r16.lengths), np.asarray(r32.lengths))
    np.testing.assert_array_equal(
        np.asarray(r16.tokens), np.asarray(r32.tokens)[:, :, :16]
    )
    # and nothing is ever emitted past an utterance's window
    max_len = (0.4 * np.asarray([20, 13])).astype(int)
    tk = np.asarray(r32.tokens)
    for bi in range(2):
        assert (tk[bi, :, max_len[bi]:] == 0).all()
    assert (np.asarray(r32.lengths) <= max_len[:, None]).all()


@pytest.mark.parametrize("mode", ["dot", "location"])
def test_step_beam_equals_tiled_step(mode):
    """The beam-aware attention step (untiled memory, round-4 decode
    optimization) is numerically identical to step() on beam-tiled memory."""
    from e2e_asr_tpu.config import AttentionConfig
    from e2e_asr_tpu.decode.beam import _tile_mem
    from e2e_asr_tpu.models import attention as att_mod

    b, w, s, e_dim, dec_dim = 3, 4, 24, 16, 12
    cfg = AttentionConfig(mode=mode, dim=10, num_head=1, loc_kernel_size=5, loc_kernel_num=3)
    params, _ = att_mod.attention_init(jax.random.PRNGKey(0), e_dim, dec_dim, cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (b, s, e_dim))
    enc_len = jnp.asarray([24, 17, 9])
    mem = att_mod.prepare(params, cfg, enc, enc_len)
    mem_bw = _tile_mem(mem, w)
    q = jax.random.normal(jax.random.PRNGKey(2), (b * w, dec_dim))
    prev = att_mod.init_align(cfg, mem_bw) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(3), (b * w, 1, s)
    )
    a1, c1 = att_mod.step(params, cfg, q, mem_bw, prev)
    a2, c2 = att_mod.step_beam(
        params, cfg, q.reshape(b, w, -1), mem, prev.reshape(b, w, 1, s)
    )
    np.testing.assert_allclose(
        np.asarray(a1).reshape(b, w, 1, s), np.asarray(a2), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(c1).reshape(b, w, -1), np.asarray(c2), rtol=2e-5, atol=2e-6
    )


def test_att_step_pallas_equals_xla(monkeypatch):
    """ops/att_step_pallas.py (interpret mode on CPU) matches the XLA
    beam-aware attention step bit-for-tolerance."""
    from e2e_asr_tpu.config import AttentionConfig
    from e2e_asr_tpu.models import attention as att_mod

    b, w, s, e_dim, dec_dim = 2, 4, 37, 24, 16
    cfg = AttentionConfig(mode="location", dim=20, num_head=1,
                          loc_kernel_size=5, loc_kernel_num=3)
    params, _ = att_mod.attention_init(jax.random.PRNGKey(0), e_dim, dec_dim, cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (b, s, e_dim))
    enc_len = jnp.asarray([37, 21])
    mem = att_mod.prepare(params, cfg, enc, enc_len)
    q = jax.random.normal(jax.random.PRNGKey(2), (b, w, dec_dim))
    prev = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (b, w, 1, s)))
    monkeypatch.setenv("E2E_ATT_STEP", "xla")
    a1, c1 = att_mod.step_beam(params, cfg, q, mem, prev)
    monkeypatch.setenv("E2E_ATT_STEP", "pallas")
    a2, c2 = att_mod.step_beam(params, cfg, q, mem, prev)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=2e-5, atol=2e-5)
