"""Distributed-semantics tests on the 8-device CPU mesh (SURVEY.md §4:
grad all-reduce equivalence — 1-device batch B == 8-device batch B/8-each)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_asr_tpu.config import Config
from e2e_asr_tpu.models import asr as asr_mod
from e2e_asr_tpu.optim import build_optimizer
from e2e_asr_tpu.parallel import mesh as mesh_mod
from e2e_asr_tpu.training.step import TrainState, compute_loss, make_train_step


def small_cfg():
    return Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": False}},
            "hparas": {"optimizer": "SGD", "lr": 0.1, "dtype": "float32"},
            "model": {
                "ctc_weight": 0.5,
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
        }
    )


def make_batch(b, seed=0, n=4000, l=8):
    rng = np.random.RandomState(seed)
    text = rng.randint(3, 16, size=(b, l)).astype(np.int32)
    text[:, -2] = 1
    text[:, -1] = 0
    return {
        "wav": (rng.randn(b, n) * 0.1).astype(np.float32),
        "wav_len": np.full((b,), n, np.int32),
        "text": text,
        "text_len": np.full((b,), l - 1, np.int32),
    }


def test_devices_available():
    assert jax.device_count() >= 8, "conftest should fake 8 CPU devices"


def test_dp_grad_equivalence():
    """Same global batch, mesh dp=1 vs dp=8 -> identical update."""
    cfg = small_cfg()
    vocab = 16
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, vocab, cfg.model)
    tx = build_optimizer(cfg.hparas)
    batch = make_batch(16)
    rng = jax.random.PRNGKey(42)

    results = []
    for dp in (1, 8):
        mesh = mesh_mod.make_mesh(dp=dp, mp=1, devices=jax.devices()[:dp])
        state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
        state = jax.device_put(state, mesh_mod.replicated(mesh))
        db = mesh_mod.shard_batch(mesh, batch)
        step = jax.jit(make_train_step(cfg, tx))
        new_state, m = step(state, db, rng)
        results.append((jax.tree.leaves(new_state.params), float(m["loss"])))

    (p1, l1), (p8, l8) = results
    assert abs(l1 - l8) < 1e-4, f"losses differ: {l1} vs {l8}"
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sharded_batch_layout():
    mesh = mesh_mod.make_mesh(dp=8, mp=1)
    batch = mesh_mod.shard_batch(mesh, make_batch(16))
    for k, v in batch.items():
        shards = v.addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape[0] == 2  # 16 / 8


def test_pad_batch_rows_masked():
    cfg = small_cfg()
    vocab = 16
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, vocab, cfg.model)
    batch = make_batch(3)
    padded = mesh_mod.pad_batch_to(batch, 8)
    assert padded["wav"].shape[0] == 8
    # loss with padded rows == loss without them
    loss_a, _ = compute_loss(
        params, cfg, jnp.asarray(batch["wav"]), jnp.asarray(batch["wav_len"]),
        jnp.asarray(batch["text"]), jnp.asarray(batch["text_len"]),
        1.0, jax.random.PRNGKey(0), train=False,
    )
    loss_b, _ = compute_loss(
        params, cfg, jnp.asarray(padded["wav"]), jnp.asarray(padded["wav_len"]),
        jnp.asarray(padded["text"]), jnp.asarray(padded["text_len"]),
        1.0, jax.random.PRNGKey(0), train=False,
    )
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    loss, enc_len = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    g.dryrun_multichip(8)
