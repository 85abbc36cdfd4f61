"""Pallas TPU kernel: fused attention-decoder scan (the speller hot loop).

The reference decodes per token in a Python loop (ref: src/asr.py:~150);
models/asr.py turned that into one `lax.scan`. This module fuses the ENTIRE
scan into Pallas kernels so the attention memory stays VMEM-resident:

Per decoded token the scan must read the projected keys k [B,S,Dk], the
values v=enc [B,S,E] and the location Toeplitz bank — ~100 MB of HBM per
step at the flagship shape (B=128, S=408), re-read L=160 times forward and
again backward. That streaming is the decoder's entire cost (the per-step
FLOPs are small); measured round-1, decoder f+b = 69.4 ms of the 175 ms
train step. Here a (batch-tile, time-block) grid keeps k/v/bank/weights in
VMEM across all L steps of a tile (v5e VMEM measured >=120 MB), so HBM
traffic drops to one read of k/v per tile plus the small per-step streams.

Scope (gated in models/asr.py, falls back to the scan otherwise):
location-aware attention, num_head=1, no v_proj/merge, 1-layer LSTM
speller, no decoder dropout. Teacher forcing / argmax / sampled feedback
supported; sampling uses the in-kernel PRNG (same distribution as the scan
oracle's `jax.random.categorical`, different stream — documented in
PARITY.md; argmax and teacher-forced paths are bit-comparable).

Backward design: a reverse-time kernel recomputes the per-step activations
from stored (align, hidden, c, token) sequences — same remat strategy as
ops/rnn_pallas.py — carrying (dh, dc, d_prev_att) and STREAMING small
per-step cotangents out (dgates [L,B,4H], dq [L,B,Dk], d_fpre [K,L,B,S]);
dk / d_locproj / d_locv / d_locb accumulate in resident f32 output refs.
Everything else (dv, dWx/dWh/db, dWq/dbq, d_emb, dWout/dbout, d_locT) is a
big batched einsum over (L,B) OUTSIDE the kernel where the MXU runs at
full M — outer-product-per-step grads are exactly what the MXU is worst
at, so they are hoisted to one contraction over L*B.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TL = 8  # decode steps per grid block (time-block minor grid dim)
NEG = -1.0e9


def _cdiv(a, b):
    return -(-a // b)


def _pad_axis(x, n, axis):
    if x.shape[axis] == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pads)


# ===========================================================================
# forward
# ===========================================================================


def _fwd_kernel(
    # streamed per time-block
    teach_ref,  # [TL, bB, Vp]
    coins_ref,  # [TL, 1]
    # per batch-tile residents
    k_ref,      # [bB, S, Dk]
    v_ref,      # [bB, S, E]
    mask_ref,   # [bB, S] f32
    ia_ref,     # [bB, S] init alignment
    seed_ref,   # [1, 1] i32 (SMEM)
    # weights (full, resident)
    locT_ref,   # [K, S, S]  (locT[k][p, s])
    wq_ref, bq_ref,     # [H, Dk], [1, Dk]
    wlp_ref,            # [K, Dk]
    locv_ref, locb_ref, # [1, Dk], [1, Dk] (locb includes conv-bias fold)
    embt_ref,           # [Vp, Emb]
    wx_ref, wh_ref, bl_ref,  # [Emb+E, 4H], [H, 4H], [1, 4H]
    wout_ref, bout_ref,      # [H, Vp], [1, Vp]
    # outputs per time-block
    logits_ref,  # [TL, bB, Vp]
    align_ref,   # [TL, bB, S]
    hidden_ref,  # [TL, bB, H]
    cseq_ref,    # [TL, bB, H]
    ohin_ref,    # [TL, bB, Vp]
    # scratch (persists across time-blocks of one tile)
    h_scr, c_scr, att_scr, oh_scr, fpre_scr,
    *, kk, h_dim, temp, train, sample, vocab,
):
    il = pl.program_id(1)

    @pl.when(il == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        att_scr[:] = ia_ref[:].astype(att_scr.dtype)
        # initial feedback token is <sos>=0 (ref: carry.prev_tok init)
        oh_scr[:] = (
            jax.lax.broadcasted_iota(jnp.int32, oh_scr.shape, 1) == 0
        ).astype(oh_scr.dtype)

    if sample:  # compiled-TPU only (gated in _fwd_call; no interpret rule)
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * pl.num_programs(1) + il)

    mask = mask_ref[:] > 0
    bB, s = mask_ref.shape
    vp = embt_ref.shape[0]
    f32 = jnp.float32

    def mm(a, bmat, dims=(((1,), (0,)), ((), ()))):
        return jax.lax.dot_general(
            a, bmat, dimension_numbers=dims, preferred_element_type=f32
        )

    # fori_loop over steps AND the K location channels: the bodies are
    # traced once (a python-unrolled TL*K body made Mosaic compile times
    # explode — tens of minutes at the flagship shape)
    def step_body(j, _):
        # --- token selection (scheduled sampling; ref: per-step coin)
        use_teacher = jnp.logical_or(coins_ref[j, 0] > 0, jnp.asarray(not train))
        oh = jnp.where(use_teacher, teach_ref[j].astype(f32), oh_scr[:].astype(f32))
        ohin_ref[j] = oh.astype(ohin_ref.dtype)
        emb = mm(oh, embt_ref[:].astype(f32))  # [bB, Emb]

        # --- attention (location-aware; ref: src/module.py LocationAware)
        h = h_scr[:].astype(f32)
        q = mm(h, wq_ref[:].astype(f32)) + bq_ref[0].astype(f32)[None]
        att_prev = att_scr[:].astype(f32)
        # e = tanh(q + k + f + locb); f = (att_prev (*) locT) @ wlp — the K
        # conv channels loop into scratch (dynamic VALUE indexing has no
        # Mosaic lowering), then one [bB*S, K] x [K, Dk] MXU matmul
        def loc_body(ki, _):
            fpre_scr[ki] = mm(att_prev, locT_ref[ki].astype(f32))  # [bB, S]
            return 0

        jax.lax.fori_loop(0, kk, loc_body, 0)
        f = mm(
            fpre_scr[:].reshape(kk, bB * s), wlp_ref[:].astype(f32),
            (((0,), (0,)), ((), ())),
        ).reshape(bB, s, -1)
        acc = (
            k_ref[:].astype(f32)
            + q[:, None, :]
            + locb_ref[0].astype(f32)[None, None]
            + f
        )
        e = jnp.tanh(acc)
        energy = jnp.sum(e * locv_ref[0].astype(f32)[None, None, :], axis=-1)  # [bB,S]
        energy = jnp.where(mask, energy, NEG)
        align = jax.nn.softmax(energy / temp, axis=-1)
        align = jnp.where(mask, align, 0.0)
        ctx = jnp.sum(align[:, :, None] * v_ref[:].astype(f32), axis=1)  # [bB, E]

        # --- speller LSTM cell (ref: src/asr.py Decoder, 1 layer)
        xin = jnp.concatenate([emb, ctx], axis=-1)
        gates = (
            mm(xin, wx_ref[:].astype(f32))
            + mm(h, wh_ref[:].astype(f32))
            + bl_ref[0].astype(f32)[None]
        )
        gi = jax.nn.sigmoid(gates[:, :h_dim])
        gf = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
        gg = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
        go = jax.nn.sigmoid(gates[:, 3 * h_dim :])
        c_new = gf * c_scr[:].astype(f32) + gi * gg
        h_new = go * jnp.tanh(c_new)
        logits = mm(h_new, wout_ref[:].astype(f32)) + bout_ref[0].astype(f32)[None]

        # --- feedback token for scheduled sampling (ref: sample/argmax)
        vmask = jax.lax.broadcasted_iota(jnp.int32, (bB, vp), 1) < vocab
        scores = jnp.where(vmask, logits, NEG)
        if sample:
            bits = pltpu.prng_random_bits((bB, vp))
            u = (bits >> 8).astype(f32) * (1.0 / (1 << 24)) + 1e-12
            scores = scores - jnp.log(-jnp.log(u))
        pred = jnp.argmax(scores, axis=-1)
        oh_pred = (
            jax.lax.broadcasted_iota(jnp.int32, (bB, vp), 1) == pred[:, None]
        ).astype(f32)

        # --- emit + advance state
        logits_ref[j] = logits.astype(logits_ref.dtype)
        align_ref[j] = align.astype(align_ref.dtype)
        hidden_ref[j] = h_new.astype(hidden_ref.dtype)
        cseq_ref[j] = c_new.astype(cseq_ref.dtype)
        h_scr[:] = h_new.astype(h_scr.dtype)
        c_scr[:] = c_new.astype(c_scr.dtype)
        att_scr[:] = align.astype(att_scr.dtype)
        oh_scr[:] = oh_pred.astype(oh_scr.dtype)
        return 0

    jax.lax.fori_loop(0, TL, step_body, 0)


def _fwd_call(k, v, mask, init_align, locT, wq, bq, wlp, locv, locb,
              embt, wx, wh, bl, wout, bout, teach_oh, coins, seed,
              *, temp, train, sample, vocab, bB):
    b, s, dk = k.shape
    e_dim = v.shape[-1]
    kk = locT.shape[0]
    h_dim = wh.shape[0]
    vp, emb_dim = embt.shape
    lp = teach_oh.shape[0]
    nb, nl = b // bB, lp // TL
    dt = k.dtype
    interpret = jax.default_backend() != "tpu"

    # gumbel feedback needs the in-kernel PRNG, which has no interpret-mode
    # rule: in interpret (CPU tests) sampled feedback degrades to argmax.
    # Sampling only matters when some step's coin says "use own prediction"
    # (train + tf_rate < 1), and parity tests pin the argmax/teacher paths.
    sample = sample and train and not interpret
    kern = functools.partial(
        _fwd_kernel, kk=kk, h_dim=h_dim, temp=temp, train=train,
        sample=sample, vocab=vocab,
    )
    tile3 = lambda ib, il: (ib, 0, 0)
    tile2 = lambda ib, il: (ib, 0)
    blkL3 = lambda ib, il: (il, ib, 0)
    full3 = lambda ib, il: (0, 0, 0)
    full2 = lambda ib, il: (0, 0)
    outs = pl.pallas_call(
        kern,
        grid=(nb, nl),
        in_specs=[
            pl.BlockSpec((TL, bB, vp), blkL3, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, 1), lambda ib, il: (il, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bB, s, dk), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bB, s, e_dim), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bB, s), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bB, s), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), full2, memory_space=pltpu.SMEM),
            pl.BlockSpec((kk, s, s), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, emb_dim), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((emb_dim + e_dim, 4 * h_dim), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, 4 * h_dim), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * h_dim), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, vp), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), full2, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((TL, bB, d), blkL3, memory_space=pltpu.VMEM)
            for d in (vp, s, h_dim, h_dim, vp)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((lp, b, d), dt) for d in (vp, s, h_dim, h_dim, vp)
        ),
        scratch_shapes=[
            pltpu.VMEM((bB, h_dim), dt),
            pltpu.VMEM((bB, h_dim), dt),
            pltpu.VMEM((bB, s), dt),
            pltpu.VMEM((bB, vp), dt),
            pltpu.VMEM((kk, bB, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(125e6)),
        interpret=interpret,
    )(
        teach_oh.astype(dt), coins, k, v, mask, init_align.astype(dt),
        seed.astype(jnp.int32).reshape(1, 1),
        locT.astype(dt), wq.astype(dt), bq.reshape(1, -1).astype(dt),
        wlp.astype(dt), locv.reshape(1, -1).astype(dt), locb.reshape(1, -1).astype(dt),
        embt.astype(dt), wx.astype(dt), wh.astype(dt), bl.reshape(1, -1).astype(dt),
        wout.astype(dt), bout.reshape(1, -1).astype(dt),
    )
    return outs  # logits, align, hidden, cseq, ohin (each [Lp, B, *])


# ===========================================================================
# backward
# ===========================================================================

BB_BWD = 32


def _bwd_kernel(
    # streamed per reverse time-block
    dlog_ref,   # [TL, bB, Vp]
    dal_ref,    # [TL, bB, S]   upstream align cotangent
    dhid_ref,   # [TL, bB, H]   upstream hidden cotangent
    al_ref,     # [TL, bB, S]   stored align (this block)
    alp_ref,    # [TL, bB, S]   stored align (previous time block, clamped)
    hid_ref, hidp_ref,  # stored hidden, this/prev block
    cs_ref, csp_ref,    # stored c, this/prev block
    oh_ref,     # [TL, bB, Vp] stored input one-hots
    # residents per tile
    k_ref, v_ref, mask_ref, ia_ref,
    locT_ref,    # [K, S, S]
    locTT_ref,   # [K, S, S]  transposed bank: locTT[k][s, p] = locT[k][p, s]
    wq_ref, bq_ref, wlp_ref, locv_ref, locb_ref,
    embt_ref, wx_ref, wh_ref, bl_ref, wout_ref,
    # outputs
    dgates_ref,  # [TL, bB, 4H] stream
    dq_ref,      # [TL, bB, Dk] stream
    dfpre_ref,   # [K, TL, bB, S] stream
    dk_ref,      # [bB, S, Dk] f32 accumulate (per tile)
    dwlp_ref,    # [K, Dk] f32 accumulate (whole grid)
    dlocv_ref,   # [8, Dk] f32 accumulate (row-sharded partials)
    dlocb_ref,   # [8, Dk] f32
    # scratch carries
    dh_scr, dc_scr, datt_scr, fpre_scr, dfa_scr,
    *, kk, h_dim, emb_dim, temp, vocab, nl,
):
    ib, il = pl.program_id(0), pl.program_id(1)

    @pl.when(jnp.logical_and(ib == 0, il == 0))
    def _():
        dwlp_ref[:] = jnp.zeros_like(dwlp_ref)
        dlocv_ref[:] = jnp.zeros_like(dlocv_ref)
        dlocb_ref[:] = jnp.zeros_like(dlocb_ref)

    @pl.when(il == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        datt_scr[:] = jnp.zeros_like(datt_scr)
        dk_ref[:] = jnp.zeros_like(dk_ref)

    f32 = jnp.float32
    mask = mask_ref[:] > 0
    bB, s = mask_ref.shape
    is_first_block = il == nl - 1  # reverse walk: last grid step is time block 0

    def mm(a, bmat, dims=(((1,), (0,)), ((), ()))):
        return jax.lax.dot_general(
            a, bmat, dimension_numbers=dims, preferred_element_type=f32
        )

    def step_body(jj, _):
        j = TL - 1 - jj  # reverse within the block
        jm = jnp.maximum(j - 1, 0)
        c_t = cs_ref[j].astype(f32)
        # step-entry state: previous row of this block, previous block's
        # last row at the boundary, zeros / uniform init at global step 0
        boundary = j == 0
        zero_entry = jnp.logical_and(boundary, is_first_block)
        h_prev = jnp.where(boundary, hidp_ref[TL - 1].astype(f32), hid_ref[jm].astype(f32))
        h_prev = jnp.where(zero_entry, 0.0, h_prev)
        c_prev = jnp.where(boundary, csp_ref[TL - 1].astype(f32), cs_ref[jm].astype(f32))
        c_prev = jnp.where(zero_entry, 0.0, c_prev)
        att_prev = jnp.where(
            boundary, alp_ref[TL - 1].astype(f32), al_ref[jm].astype(f32)
        )
        att_prev = jnp.where(zero_entry, ia_ref[:].astype(f32), att_prev)
        att_t = al_ref[j].astype(f32)

        # --- logits head backward
        dh = (
            mm(dlog_ref[j].astype(f32), wout_ref[:].astype(f32), (((1,), (1,)), ((), ())))
            + dhid_ref[j].astype(f32)
            + dh_scr[:]
        )

        # --- LSTM cell backward (remat gates from stored inputs)
        emb = mm(oh_ref[j].astype(f32), embt_ref[:].astype(f32))
        ctx = jnp.sum(att_t[:, :, None] * v_ref[:].astype(f32), axis=1)
        xin = jnp.concatenate([emb, ctx], axis=-1)
        gates = (
            mm(xin, wx_ref[:].astype(f32))
            + mm(h_prev, wh_ref[:].astype(f32))
            + bl_ref[0].astype(f32)[None]
        )
        gi = jax.nn.sigmoid(gates[:, :h_dim])
        gf = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
        gg = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
        go = jax.nn.sigmoid(gates[:, 3 * h_dim :])
        tc = jnp.tanh(c_t)
        dc = dc_scr[:] + dh * go * (1.0 - tc * tc)
        dgates = jnp.concatenate(
            [
                dc * gg * gi * (1.0 - gi),
                dc * c_prev * gf * (1.0 - gf),
                dc * gi * (1.0 - gg * gg),
                dh * tc * go * (1.0 - go),
            ],
            axis=-1,
        )
        dgates_ref[j] = dgates.astype(dgates_ref.dtype)
        din = mm(dgates, wx_ref[:].astype(f32), (((1,), (1,)), ((), ())))
        dctx = din[:, emb_dim:]
        dc_next = dc * gf
        dh_lstm = mm(dgates, wh_ref[:].astype(f32), (((1,), (1,)), ((), ())))

        # --- context/softmax backward
        dalign = (
            jnp.sum(dctx[:, None, :] * v_ref[:].astype(f32), axis=-1)
            + dal_ref[j].astype(f32)
            + datt_scr[:]
        )
        sdot = jnp.sum(dalign * att_t, axis=-1, keepdims=True)
        denergy = att_t * (dalign - sdot) / temp
        denergy = jnp.where(mask, denergy, 0.0)

        # --- energy backward: e remat, de, dq, dk, d_fpre, loc grads
        q = mm(h_prev, wq_ref[:].astype(f32)) + bq_ref[0].astype(f32)[None]

        def loc_fwd_body(ki, _):
            fpre_scr[ki] = mm(att_prev, locT_ref[ki].astype(f32))
            return 0

        jax.lax.fori_loop(0, kk, loc_fwd_body, 0)
        f = mm(
            fpre_scr[:].reshape(kk, bB * s), wlp_ref[:].astype(f32),
            (((0,), (0,)), ((), ())),
        ).reshape(bB, s, -1)
        acc = (
            k_ref[:].astype(f32)
            + q[:, None, :]
            + locb_ref[0].astype(f32)[None, None]
            + f
        )
        e = jnp.tanh(acc)
        locv = locv_ref[0].astype(f32)
        de = denergy[:, :, None] * locv[None, None, :] * (1.0 - e * e)  # [bB,S,Dk]

        dq_step = jnp.sum(de, axis=1)
        dq_ref[j] = dq_step.astype(dq_ref.dtype)
        dk_ref[:] += de
        # vector-grad partials (row 0 of an [8, Dk] buffer; summed outside)
        dlocv_ref[0:1] += jnp.sum(e * denergy[:, :, None], axis=(0, 1))[None]
        dlocb_ref[0:1] += jnp.sum(de, axis=(0, 1))[None]

        # d_fpre[k] = sum_d de*wlp[k] for all k as ONE contraction over Dk
        # (into the [K, bB, S] scratch so the datt loop can ref-index it);
        # dwlp as ONE contraction over (bB, S)
        de2 = de.reshape(bB * s, -1)
        dwlp_ref[:] += mm(
            fpre_scr[:].reshape(kk, bB * s), de2, (((1,), (0,)), ((), ()))
        )
        dfa = mm(wlp_ref[:].astype(f32), de2, (((1,), (1,)), ((), ())))  # [K, bB*S]
        dfa_scr[:] = dfa.reshape(kk, bB, s)
        dfpre_ref[j] = dfa_scr[:].astype(dfpre_ref.dtype)

        def loc_bwd_body(ki, datt):
            return datt + mm(dfa_scr[ki], locTT_ref[ki].astype(f32))

        datt_new = jax.lax.fori_loop(0, kk, loc_bwd_body, jnp.zeros((bB, s), f32))

        # --- carries for step t-1
        dh_scr[:] = dh_lstm + mm(dq_step, wq_ref[:].astype(f32), (((1,), (1,)), ((), ())))
        dc_scr[:] = dc_next
        datt_scr[:] = datt_new
        return 0

    jax.lax.fori_loop(0, TL, step_body, 0)


def _bwd_call(res, dlogits, dalign_up, dhid_up, *, temp, vocab, bB):
    (k, v, mask, init_align, locT, locTT, wq, bq, wlp, locv, locb,
     embt, wx, wh, bl, wout, align_st, hidden_st, cseq_st, ohin_st) = res
    b, s, dk = k.shape
    e_dim = v.shape[-1]
    kk = locT.shape[0]
    h_dim = wh.shape[0]
    vp, emb_dim = embt.shape
    lp = align_st.shape[0]
    nb, nl = b // bB, lp // TL
    dt = k.dtype
    interpret = jax.default_backend() != "tpu"

    kern = functools.partial(
        _bwd_kernel, kk=kk, h_dim=h_dim, emb_dim=emb_dim, temp=temp,
        vocab=vocab, nl=nl,
    )
    # reverse walk over time blocks: grid step il processes block nl-1-il
    rev = lambda ib, il: (nl - 1 - il, ib, 0)
    revp = lambda ib, il: (jnp.maximum(nl - 2 - il, 0), ib, 0)
    tile3 = lambda ib, il: (ib, 0, 0)
    tile2 = lambda ib, il: (ib, 0)
    full3 = lambda ib, il: (0, 0, 0)
    full2 = lambda ib, il: (0, 0)

    sds = lambda shape, d: jax.ShapeDtypeStruct(shape, d)
    outs = pl.pallas_call(
        kern,
        grid=(nb, nl),
        in_specs=[
            pl.BlockSpec((TL, bB, vp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, s), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, h_dim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, s), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, s), revp, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, h_dim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, h_dim), revp, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, h_dim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, h_dim), revp, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, vp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bB, s, dk), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bB, s, e_dim), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bB, s), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bB, s), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, s, s), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, s, s), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, emb_dim), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((emb_dim + e_dim, 4 * h_dim), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, 4 * h_dim), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * h_dim), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, vp), full2, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TL, bB, 4 * h_dim), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TL, bB, dk), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TL, kk, bB, s), lambda ib, il: (nl - 1 - il, 0, ib, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bB, s, dk), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((kk, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, dk), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, dk), full2, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            sds((lp, b, 4 * h_dim), dt),
            sds((lp, b, dk), dt),
            sds((lp, kk, b, s), dt),
            sds((b, s, dk), jnp.float32),
            sds((kk, dk), jnp.float32),
            sds((8, dk), jnp.float32),
            sds((8, dk), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bB, h_dim), jnp.float32),
            pltpu.VMEM((bB, h_dim), jnp.float32),
            pltpu.VMEM((bB, s), jnp.float32),
            pltpu.VMEM((kk, bB, s), jnp.float32),
            pltpu.VMEM((kk, bB, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(125e6)),
        interpret=interpret,
    )(
        dlogits.astype(dt), dalign_up.astype(dt), dhid_up.astype(dt),
        align_st, _shift_blocks(align_st), hidden_st, _shift_blocks(hidden_st),
        cseq_st, _shift_blocks(cseq_st), ohin_st,
        k, v, mask, init_align.astype(dt),
        locT.astype(dt), locTT.astype(dt),
        wq.astype(dt), bq.reshape(1, -1).astype(dt), wlp.astype(dt),
        locv.reshape(1, -1).astype(dt), locb.reshape(1, -1).astype(dt),
        embt.astype(dt), wx.astype(dt), wh.astype(dt),
        bl.reshape(1, -1).astype(dt), wout.astype(dt),
    )
    return outs  # dgates, dq, dfpre, dk, dwlp, dlocv8, dlocb8


def _shift_blocks(x):
    """Identity — the 'previous block' view is the SAME array; the revp
    index map selects block i-1. Kept as a named hook for clarity."""
    return x


# ===========================================================================
# custom_vjp wrapper
# ===========================================================================


VMEM_BUDGET = 120 << 20  # v5e has 128M of vmem; leave headroom for scalars


def _fits_fwd(bb, s, dk, e_dim, kk, vp):
    """Rough fwd-kernel vmem model from measured compiler dumps: k/v windows
    double-buffered, locT single, plus ~8M of outputs/weights."""
    kv = 2 * 2 * bb * s * (max(dk, 320) + e_dim)  # bf16, dk padded to lanes
    loct = 8 * kk * s * s  # observed ~4x nominal bf16 footprint
    return kv + loct + (8 << 20) < VMEM_BUDGET


def _fits_bwd(bb, s, dk, e_dim, kk):
    """dk f32 + dv f32 outputs and k/v inputs double-buffered dominate."""
    outs = 2 * 4 * bb * s * (max(dk, 320) + 0)  # dk f32
    kv = 2 * 2 * bb * s * (max(dk, 320) + e_dim)
    dalign = 2 * 2 * TL * kk * bb * s
    return outs + kv + dalign + (16 << 20) < VMEM_BUDGET


def _pick_bb_fwd(b, s=0, dk=0, e_dim=0, kk=0, vp=0):
    import os

    pref = int(os.environ.get("E2E_ASR_DEC_BB", "0"))
    cands = tuple(c for c in (pref, 64, 32, 16, 8) if 0 < c <= b and b % c == 0)
    for cand in cands:
        if cand == pref or not s or _fits_fwd(cand, s, dk, e_dim, kk, vp):
            return cand
    # Nothing passes the VMEM model: take the SMALLEST viable tile (least
    # VMEM), not the full batch (the largest possible footprint).
    return min(cands) if cands else b


def _pick_bb_bwd(b, s=0, dk=0, e_dim=0, kk=0):
    import os

    pref = int(os.environ.get("E2E_ASR_DEC_BB_BWD", "0"))
    cands = tuple(c for c in (pref, BB_BWD, 16, 8) if 0 < c <= b and b % c == 0)
    for cand in cands:
        if cand == pref or not s or _fits_bwd(cand, s, dk, e_dim, kk):
            return cand
    return min(cands) if cands else b


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21, 22, 23))
def decoder_scan_fused(
    k, v, mask, init_align, locT, wq, bq, wlp, locv, locb,
    embt, wx, wh, bl, wout, bout, teach_oh, coins, seed,
    temp, train, sample, vocab, l_real,
):
    """Fused attention-decoder scan. See module docstring.

    Differentiable args: k [B,S,Dk], v [B,S,E], locT [K,S,S] (Toeplitz bank,
    locT[k][p,s]), wq/bq, wlp [K,Dk], locv/locb (locb includes the conv-bias
    fold), embt [Vp,Emb], wx/wh/bl, wout/bout [H,Vp]/[Vp], teach_oh
    [Lp,B,Vp]. coins [Lp,1] f32 and seed (f32 scalar, < 2^24) are array args
    with zero cotangents; temperature/flags are static.

    Returns (logits [Lp,B,Vp], align [Lp,B,S], hidden [Lp,B,H]) — slice
    [:l_real] and [..., :vocab] outside.
    """
    outs = _fwd_call(
        k, v, mask, init_align, locT, wq, bq, wlp, locv, locb,
        embt, wx, wh, bl, wout, bout, teach_oh, coins, seed,
        temp=temp, train=train, sample=sample, vocab=vocab,
        bB=_pick_bb_fwd(k.shape[0], k.shape[1], k.shape[2], v.shape[2], locT.shape[0], embt.shape[0]),
    )
    logits, align, hidden, _, _ = outs
    return logits, align, hidden


def _vjp_fwd(k, v, mask, init_align, locT, wq, bq, wlp, locv, locb,
             embt, wx, wh, bl, wout, bout, teach_oh, coins, seed,
             temp, train, sample, vocab, l_real):
    outs = _fwd_call(
        k, v, mask, init_align, locT, wq, bq, wlp, locv, locb,
        embt, wx, wh, bl, wout, bout, teach_oh, coins, seed,
        temp=temp, train=train, sample=sample, vocab=vocab,
        bB=_pick_bb_fwd(k.shape[0], k.shape[1], k.shape[2], v.shape[2], locT.shape[0], embt.shape[0]),
    )
    logits, align, hidden, cseq, ohin = outs
    locTT = jnp.swapaxes(locT, 1, 2)
    res = (k, v, mask, init_align, locT, locTT, wq, bq, wlp, locv, locb,
           embt, wx, wh, bl, wout, align, hidden, cseq, ohin)
    return (logits, align, hidden), res


def _vjp_bwd(temp, train, sample, vocab, l_real, res, cots):
    dlogits, dalign_up, dhid_up = cots
    (k, v, mask, init_align, locT, locTT, wq, bq, wlp, locv, locb,
     embt, wx, wh, bl, wout, align_st, hidden_st, cseq_st, ohin_st) = res
    f32 = jnp.float32
    lp = align_st.shape[0]
    # zero cotangents beyond the real length (outputs there are ignored)
    step_ok = (jnp.arange(lp) < l_real)[:, None, None]
    dlogits = jnp.where(step_ok, dlogits, 0)
    dalign_up = jnp.where(step_ok, dalign_up, 0)
    dhid_up = jnp.where(step_ok, dhid_up, 0)

    dgates, dq, dfpre, dk, dwlp, dlocv8, dlocb8 = _bwd_call(
        res, dlogits, dalign_up, dhid_up,
        temp=temp, vocab=vocab,
        bB=_pick_bb_bwd(k.shape[0], k.shape[1], k.shape[2], v.shape[2], locT.shape[0]),
    )
    dlocv = jnp.sum(dlocv8.astype(f32), axis=0)
    dlocb = jnp.sum(dlocb8.astype(f32), axis=0)

    # ---- batched outside grads (one contraction over L*B each)
    dg = dgates.astype(f32)
    dqf = dq.astype(f32)
    dlog = dlogits.astype(f32)
    hid = hidden_st.astype(f32)
    al = align_st.astype(f32)
    oh = ohin_st.astype(f32)
    h_prev = jnp.concatenate([jnp.zeros_like(hid[:1]), hid[:-1]], axis=0)
    att_prev = jnp.concatenate([init_align[None].astype(f32), al[:-1]], axis=0)

    dwout = jnp.einsum("lbh,lbv->hv", hid, dlog)
    dbout = jnp.sum(dlog, axis=(0, 1))
    din = jnp.einsum("lbg,xg->lbx", dg, wx.astype(f32))
    emb_dim = embt.shape[1]
    demb_rows = din[..., :emb_dim]
    dctx = din[..., emb_dim:]
    emb_all = jnp.einsum("lbv,ve->lbe", oh, embt.astype(f32))
    ctx_all = jnp.einsum("lbs,bse->lbe", al, v.astype(f32))
    xin_all = jnp.concatenate([emb_all, ctx_all], axis=-1)
    dwx = jnp.einsum("lbx,lbg->xg", xin_all, dg)
    dbl = jnp.sum(dg, axis=(0, 1))
    dwh = jnp.einsum("lbh,lbg->hg", h_prev, dg)
    dembt = jnp.einsum("lbv,lbe->ve", oh, demb_rows)
    dwq = jnp.einsum("lbh,lbd->hd", h_prev, dqf)
    dbq = jnp.sum(dqf, axis=(0, 1))
    dv = jnp.einsum("lbs,lbe->bse", al, dctx)
    dlocT = jnp.einsum("lbp,lkbs->kps", att_prev, dfpre.astype(f32))

    return (
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        jnp.zeros_like(mask),
        jnp.zeros_like(init_align),
        dlocT.astype(locT.dtype),
        dwq.astype(wq.dtype), dbq.astype(bq.dtype),
        dwlp.astype(wlp.dtype),
        dlocv.astype(locv.dtype), dlocb.astype(locb.dtype),
        dembt.astype(embt.dtype),
        dwx.astype(wx.dtype), dwh.astype(wh.dtype), dbl.astype(bl.dtype),
        dwout.astype(wout.dtype), dbout,  # bout primal is f32 (not in res)
        jnp.zeros_like(ohin_st),  # teacher one-hots: no grad
        jnp.zeros((lp, 1), f32),  # coins
        jnp.zeros((), f32),  # seed
    )


decoder_scan_fused.defvjp(_vjp_fwd, _vjp_bwd)


# ===========================================================================
# high-level entry used by models/asr.py
# ===========================================================================


def supported(cfg, train: bool) -> bool:
    """Gate: flagship decode-scan configuration only (see module docstring)."""
    a, d = cfg.attention, cfg.decoder
    return (
        a.mode == "location"
        and a.num_head == 1
        and not a.v_proj
        and d.module.upper() == "LSTM"
        and d.layer == 1
        and (d.dropout == 0.0 or not train)
        and not (cfg.emb_reg.enable and cfg.emb_reg.fuse > 0)
    )


def auto_select(cfg, train: bool, s: int, backend: str = "") -> bool:
    """Measurement-driven 'auto' policy (round 3, one v5e, B=128, L=160):
    the fused kernel beats the lax.scan exactly when the encoder length is
    already a 128-lane multiple — Mosaic pads S up to one, so at aligned S
    the kernel does no extra work and wins (train step 233.6 vs 261.7 ms at
    S=512; fwd 57.4 vs 64.0 ms), while at S=408 the pad to 512 makes it
    lose (207 vs 175 ms). Off-TPU auto never selects it (interpret mode is
    a test vehicle, orders slower than the scan)."""
    import jax

    backend = backend or jax.default_backend()
    return supported(cfg, train) and backend == "tpu" and s % 128 == 0


def run_decode_scan(
    params, cfg, enc, enc_len, teacher_in, coins, rng,
    tf_rate_unused=None, train=False, sample_decoding=True,
):
    """Drop-in replacement for the lax.scan in models/asr.py forward.

    teacher_in: [B, L] right-shifted teacher ids. coins: [L] bool.
    Returns (att_logits [B,L,V], align [B,L,1,S], hidden [B,L,H]).
    """
    from e2e_asr_tpu.models import attention as att_mod

    ap = params["attention"]
    dp = params["decoder"]
    cell = dp["cells"][0]
    b, s0, e_dim = enc.shape
    l = teacher_in.shape[1]
    vocab = params["embed"]["table"].shape[0]
    vp = _cdiv(vocab, 128) * 128
    lp = _cdiv(l, TL) * TL
    # pad S to a lane multiple: misaligned S blew Mosaic compile times up
    # by orders of magnitude at the flagship shape; padded frames carry
    # mask=0 so every result is unchanged (align rows sliced back below)
    s = _cdiv(s0, 128) * 128
    enc = _pad_axis(enc, s, 1)
    dt = enc.dtype

    k = (enc @ ap["proj_k"]["w"].astype(dt)).astype(dt)  # [B,S,Dk] (no bias)
    mask = (jnp.arange(s)[None, :] < enc_len[:, None]).astype(jnp.float32)
    init_align = mask / jnp.maximum(enc_len, 1)[:, None].astype(jnp.float32)

    # Toeplitz bank [P,S,H=1,K] -> [K,P,S]; conv bias folded into locb
    kw = ap["loc_conv"]["w"]  # [taps, 1, K]
    locT = jnp.transpose(att_mod.toeplitz_bank(kw, s)[:, :, 0, :], (2, 0, 1))
    wlp = ap["loc_proj"]["w"]  # [K, Dk]
    locb_eff = ap["loc_b"] + ap["loc_conv"]["b"] @ wlp

    teach_oh = jax.nn.one_hot(teacher_in.T, vp, dtype=dt)  # [L,B,Vp]
    teach_oh = _pad_axis(teach_oh, lp, 0)
    coins_f = _pad_axis(coins.astype(jnp.float32)[:, None], lp, 0)
    seed = jax.random.randint(rng, (), 0, np.int32(1 << 24), jnp.int32).astype(
        jnp.float32
    )

    logits, align, hidden = decoder_scan_fused(
        k, enc, mask, init_align, locT,
        ap["proj_q"]["w"], ap["proj_q"]["b"], wlp, ap["loc_v"][0], locb_eff,
        _pad_axis(params["embed"]["table"], vp, 0),
        cell.wx, cell.wh, cell.b,
        _pad_axis(dp["char"]["w"], vp, 1), _pad_axis(dp["char"]["b"], vp, 0),
        teach_oh, coins_f, seed,
        float(cfg.attention.temperature),
        bool(train), bool(sample_decoding), int(vocab), int(l),
    )
    att_logits = jnp.moveaxis(logits[:l, :, :vocab], 0, 1)  # [B,L,V]
    aligns = jnp.moveaxis(align[:l, :, :s0], 0, 1)[:, :, None, :]  # [B,L,1,S]
    hiddens = jnp.moveaxis(hidden[:l], 0, 1)  # [B,L,H]
    return att_logits, aligns, hiddens
