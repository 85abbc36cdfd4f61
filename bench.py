"""Benchmark: flagship joint CTC/attention model on one chip.

Prints the driver-contract JSON line INCREMENTALLY (round-2 verdict item 1:
rc=124 with all-or-nothing output produced NO artifact): the primary metric
line is emitted (flushed) as soon as the max-fill stage finishes, then
RE-emitted with extras appended after each additional stage. Every stage
runs under its own wall-clock budget on a daemon thread, so a hung compile
or a wedged TPU tunnel can cost at most that stage — the last complete line
always stands.

Metrics:
- train_audio_sec_per_sec_chip (primary): BASELINE.json north star at the
  throughput-optimal max-fill shape (B=128, 1632-frame bucket).
- extra.train_realistic_audio_sec_per_sec_chip: one cache-warm epoch of the
  real BucketedLoader + DevicePrefetcher + device-resident corpus over
  mixed-length utterances — pad waste, bucket switching, input pipeline
  included; the number a real run sees.
- extra.decode_audio_sec_per_sec_chip: batched beam search W=8 with CTC
  prefix rescoring (BASELINE.json configs[3] headline decode path).

The reference publishes no throughput number (single-GPU, unreported —
BASELINE.md), so vs_baseline is reported against real-time (1.0 = audio
processed as fast as it plays): the honest interpretable anchor until a
reference measurement exists.

NOTE: on the axon remote-TPU tunnel jax.block_until_ready does NOT
synchronize — a device-to-host value readback is the only honest fence.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import traceback

import numpy as np

SR = 16000
FRAMES = 1632  # flagship LibriSpeech-like bucket (~16.3 s)
N_SAMPLES = FRAMES * 160 + 240
L_TOK = 160
VOCAB = 31

STAGE_BUDGET_S = {
    "maxfill": 480.0,
    "realistic": 660.0,
    "decode": 360.0,
    "aligned": 420.0,
    "b960": 540.0,
    "stages": 480.0,
}

_result = {
    "metric": "train_audio_sec_per_sec_chip",
    "value": None,
    "unit": "audio-seconds/s/chip",
    "vs_baseline": None,
    # the artifact must carry its own caveats (round-4 verdict item 8):
    "note": (
        "vs_baseline is vs REAL-TIME audio (1.0 = processed as fast as it plays) — "
        "the reference publishes no throughput and its mount is empty, so no "
        "reference comparison exists; sol_compute is vs the MEASURED SUSTAINED "
        "137.9 bf16 TF/s in-program envelope of this chip (nominal v5e: 197; the "
        "round-1 77 TF/s single-dispatch figure is refuted as dispatch-bound), "
        "sol_memory vs NOMINAL 819 GB/s HBM; per-stage sol values in "
        "extra.stages are each vs that stage's OWN ceiling"
    ),
    "extra": {},
}


def emit():
    print(json.dumps(_result), flush=True)


def flagship_config():
    from e2e_asr_tpu.config import Config

    return Config.from_dict(
        {
            "data": {"audio": {"feat_dim": 40, "use_pallas": True}},
            "hparas": {"optimizer": "Adadelta", "lr": 1.0, "dtype": "bfloat16"},
            "model": {
                "ctc_weight": 0.5,
                "encoder": {
                    "prenet": "vgg",
                    "dim": [320, 320, 320, 320],
                    "dropout": [0.0] * 4,
                    "layer_norm": [False] * 4,
                    "proj": [True] * 4,
                    "sample_rate": [1, 1, 1, 1],
                    "sample_style": "drop",
                },
                "attention": {
                    "mode": "location",
                    "dim": 300,
                    "num_head": 1,
                    "loc_kernel_size": 100,
                    "loc_kernel_num": 10,
                },
                "decoder": {"dim": 320, "layer": 1},
            },
        }
    )


def _train_setup(cfg):
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.optim import build_optimizer
    from e2e_asr_tpu.parallel import mesh as mesh_mod
    from e2e_asr_tpu.training.step import TrainState, make_train_step

    mesh = mesh_mod.make_mesh(dp=-1, mp=1)
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, VOCAB, cfg.model)
    tx = build_optimizer(cfg.hparas)
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
    state = jax.device_put(state, mesh_mod.replicated(mesh))
    step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,), static_argnums=(3,))
    return mesh, state, step


def bench_train_maxfill(cfg, mesh, state, step) -> float:
    """Max-fill shape: every utterance exactly bucket length (upper bound).

    B=128 is the measured throughput-optimal batch on one v5e (B=16: 5.7k,
    B=64: 7.0k, B=128: ~12k, B=256: 7.6k audio-s/s/chip).
    """
    import jax

    from e2e_asr_tpu.parallel import mesh as mesh_mod

    b = 128
    rng = np.random.RandomState(0)
    text = np.zeros((b, L_TOK), np.int32)
    text[:, : L_TOK - 1] = rng.randint(3, VOCAB, size=(b, L_TOK - 1))
    text[:, L_TOK - 1] = 1
    batch = mesh_mod.shard_batch(
        mesh,
        {
            "wav": (rng.randn(b, N_SAMPLES) * 0.1).astype(np.float32),
            "wav_len": np.full((b,), N_SAMPLES, np.int32),
            "text": text,
            "text_len": np.full((b,), L_TOK, np.int32),
        },
    )
    # compiled-executable cost analysis BEFORE donation consumes the state
    flops = bytes_acc = 0.0
    try:
        ca = step.lower(state, batch, jax.random.PRNGKey(0), 0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        bytes_acc = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass
    state, m = step(state, batch, jax.random.PRNGKey(0), 0)  # compile
    float(m["loss"])

    iters = 10
    best = float("inf")
    for trial in range(3):
        t0 = time.time()
        for i in range(iters):
            state, m = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(1 + trial), i), 0
            )
        float(m["loss"])  # honest fence
        best = min(best, time.time() - t0)
    step_s = best / iters
    util = {"step_ms": round(step_s * 1e3, 2)}
    if flops:
        from e2e_asr_tpu.utils import profiling as prof

        util["achieved_tflops"] = round(flops / step_s / 1e12, 2)
        # compute SoL vs the MEASURED SUSTAINED in-program envelope
        # (137.9 TF/s, tools/exp_mxu_envelope.py round 5); memory SoL vs
        # NOMINAL HBM (819 GB/s). Both single-dispatch "measured" figures
        # from round 1 (77 TF/s, 84 GB/s) are refuted as dispatch-bound.
        util["sol_compute"] = round(
            flops / prof.MEASURED_SUSTAINED_BF16_FLOPS / step_s, 3
        )
        util["sol_memory"] = round(bytes_acc / prof.PEAK_HBM_GBPS / step_s, 3)
    # state buffers were donated through the step; hand the live one back
    return b * N_SAMPLES / SR * iters / best / jax.device_count(), state, util


def _precompile_shapes(cfg, mesh, state, step, loader, corpus, done=None):
    """Compile every ladder executable CONCURRENTLY via lower().compile().

    lower+compile never executes (no device contention, no donation of the
    live TrainState); each thread's compile lands in the persistent cache,
    so the epoch's real jit calls are cache hits. Concurrency overlaps the
    remote compile server's walls — serial cold compiles of flagship-size
    steps are ~3 min EACH and do not fit the stage budget."""
    import concurrent.futures as cf

    import jax

    from e2e_asr_tpu.parallel import mesh as mesh_mod

    # one REAL materialized batch pins the signature the dummies must match:
    # key set / dtype / rank drift would silently turn every precompile into
    # a wasted compile plus a serial ~3-min cold compile inside the stage
    # budget (advisor round 4). epoch(0) is deterministic; re-iterated later.
    probe = next(iter(loader.epoch(0)))
    probe_sig = {
        "wav_off": (probe.wav_off.dtype, probe.wav_off.ndim),
        "wav_len": (probe.wav_len.dtype, probe.wav_len.ndim),
        "text": (probe.text.dtype, probe.text.ndim),
        "text_len": (probe.text_len.dtype, probe.text_len.ndim),
    }

    def compile_one(shape):
        bsz, n, l = shape
        rng = np.random.RandomState(0)
        text = np.zeros((bsz, l), np.int32)
        text[:, : l - 1] = rng.randint(3, VOCAB, size=(bsz, l - 1))
        text[:, l - 1] = 1
        host = {
            "wav_off": np.zeros((bsz,), np.int32),
            "wav_len": np.full((bsz,), n, np.int32),
            "text": text,
            "text_len": np.full((bsz,), l, np.int32),
        }
        for k, (dt, nd) in probe_sig.items():
            assert host[k].dtype == dt and host[k].ndim == nd, (
                f"precompile dummy batch field {k} ({host[k].dtype}, ndim "
                f"{host[k].ndim}) drifted from the loader's ({dt}, ndim {nd})"
            )
        batch = mesh_mod.shard_batch(mesh, host)
        # the REAL corpus array: its shape+sharding are part of the
        # executable signature — a stand-in would compile the wrong program
        batch["corpus"] = corpus
        step.lower(state, batch, jax.random.PRNGKey(0), n).compile()
        return shape

    def try_compile(shape):
        try:
            compile_one(shape)
            return None
        except Exception as e:  # remote compile-helper 500s are shape-specific
            return (shape, str(e)[:120])

    # `done` (settle-loop rounds): skip shapes already verified — host-side
    # lower() tracing is ~10-20 s per flagship shape on this 2-core box, so
    # re-tracing all 16 every round blows the stage budget by itself
    shapes = [sh for sh in loader.batch_shapes() if not (done and sh in done)]
    if not shapes:
        return []
    # cap concurrency: 8 simultaneous flagship-size compiles crashed the
    # remote compile helper (HTTP 500, subprocess exit 1) where 6 had
    # worked; 4 still overlaps most of the server walls
    with cf.ThreadPoolExecutor(max_workers=min(4, len(shapes))) as ex:
        failures = [f for f in ex.map(try_compile, shapes) if f]
    if done is not None:
        failed_shapes = {f[0] for f in failures}
        done.update(sh for sh in shapes if sh not in failed_shapes)
    return failures


def bench_train_realistic(cfg, mesh, state, step) -> float:
    """One cache-warm epoch of the production input path: BucketedLoader
    (mixed lengths, pad waste, bucket switching) + device-resident corpus +
    DevicePrefetcher — the configuration a real training run uses."""
    import jax

    from e2e_asr_tpu.data.corpus import synthetic
    from e2e_asr_tpu.data.dataset import BucketedLoader, build_tokenizer
    from e2e_asr_tpu.data.prefetch import DevicePrefetcher
    from e2e_asr_tpu.parallel import mesh as mesh_mod

    # enough utterances that per-epoch fixed costs (prefetch spin-up, the
    # final fence's tunnel RTT) amortize over ~12 steps, not 3
    utts = synthetic(n_utts=4608, min_sec=2.0, max_sec=16.3, seed=7)
    cfg.data.text.mode = "character"
    tok = build_tokenizer(cfg.data, utts)
    # Round-5 ladder (verdict item 3), three design rules measured in order:
    # (a) EQUAL-WIDTH 16 edges — for a uniform duration mass the pad waste
    #     of an N-bucket ladder is ~width^2/2 per bucket, minimized by
    #     equal widths (4 edges: fill 0.798; 6 histogram edges: 0.787 from
    #     last-chunk padding; 8 edges + quantized B: 0.885; 16 edges:
    #     ~0.94 expected);
    # (b) PER-BUCKET batch sizes QUANTIZED to the bucket population
    #     (B_i = ceil(n_i/ceil(n_i/cap)) rounded to 8) so the last chunk
    #     carries <=7 empty rows — unquantized per-bucket B lost ~10% of
    #     all slots to last-chunk padding;
    # (c) token buckets sized to each bucket's actual max label length
    #     (round-4's oversized them: decoder-scan cost ~ L).
    # Caps stay <=192: the remote compile HELPER crashes (HTTP 500,
    # subprocess exit 1) on specific larger shapes (B=216@448f,
    # B=160@1536f — runs/compile_realistic*.log), so _precompile_shapes
    # reports per-shape failures and the settle loop steps the affected
    # bucket's B down by 8 until its executable compiles.
    edges = [296, 384, 472, 560, 648, 736, 824, 912, 1000, 1088,
             1176, 1264, 1352, 1448, 1536, FRAMES]
    tokb = [24, 32, 40, 48, 56, 56, 72, 72, 80, 80, 96, 96, 104, 112, 112, 120]
    # the 1536-frame bucket is capped at 128 up front: B=160 there is a
    # KNOWN helper-crasher and paying the crash + re-quantize round costs
    # ~2 min of the stage budget every run
    caps = [192] * 13 + [160, 128, 128]
    common = dict(
        buckets_frames=edges, token_buckets=tokb, win=400, shift=160,
        half_batch_len=4000,  # no halving: full-B executables for all buckets
        shuffle=True,
    )
    loader = BucketedLoader(utts, tok, batch_size=caps, num_workers=4, **common)
    counts = loader.bucket_counts()

    def quantize(n_i, cap):
        # largest B <= cap (multiple of 8) whose last chunk is nearly full
        if not n_i:
            return cap
        k = max(1, -(-n_i // cap))
        return min(cap, ((-(-n_i // k) + 7) // 8) * 8)

    bs = [quantize(n_i, cap) for cap, n_i in zip(caps, counts)]
    loader.rebatch(bs)
    flat, _ = loader.flat_corpus()  # also switches the loader to offsets mode
    corpus = jax.device_put(flat, mesh_mod.replicated(mesh))
    corpus.block_until_ready()
    done = set()
    for _round in range(3):
        failures = _precompile_shapes(cfg, mesh, state, step, loader, corpus, done)
        if not failures:
            break
        for (bsz, n, l), msg in failures:
            bi = loader.buckets_samples.index(n)
            # re-QUANTIZE under the lowered cap: a bare B-8 left the last
            # chunk nearly empty (B=160->152 at n=308 made chunks of
            # 152/152/4, padding 148 rows — 5.4% of all epoch slots)
            bs[bi] = quantize(counts[bi], max(8, bsz - 8))
            print(f"# realistic ladder: shape (B={bsz}, {n} samples) failed to "
                  f"compile ({msg}); bucket {bi} re-quantizes to B={bs[bi]}",
                  file=sys.stderr, flush=True)
        loader.rebatch(bs)
    else:
        raise RuntimeError(f"ladder shapes failed to settle: {failures}")

    def put(b):
        d = mesh_mod.shard_batch(
            mesh,
            {"wav_off": b.wav_off, "wav_len": b.wav_len, "text": b.text, "text_len": b.text_len},
        )
        d["corpus"] = corpus
        return d

    def run_epoch(epoch):
        rng = jax.random.PRNGKey(9)
        audio_sec = 0.0
        fill_num = fill_den = 0  # pad efficiency: real samples / slot samples
        stall_s = 0.0  # wall spent waiting on the input pipeline
        nonlocal state
        t0 = time.time()
        m = None
        pf = DevicePrefetcher(loader.epoch(epoch), put, depth=2)
        try:
            it = iter(pf)
            i = 0
            while True:
                ts = time.time()
                try:
                    b, d = next(it)
                except StopIteration:
                    break
                stall_s += time.time() - ts
                state, m = step(state, d, jax.random.fold_in(rng, i), b.n_samples)
                audio_sec += float(b.wav_len.sum()) / SR
                fill_num += int(b.wav_len.sum())
                fill_den += b.wav_len.shape[0] * b.n_samples
                i += 1
        finally:
            pf.close()
        float(m["loss"])  # honest fence
        wall = time.time() - t0
        counters = {
            "realistic_bucket_fill": round(fill_num / max(fill_den, 1), 3),
            "realistic_input_stall_frac": round(stall_s / wall, 3),
        }
        return audio_sec / wall / jax.device_count(), counters

    run_epoch(0)  # compile both bucket shapes
    r1, c1 = run_epoch(1)
    r2, c2 = run_epoch(2)
    best, counters = (r1, c1) if r1 >= r2 else (r2, c2)
    return best, state, counters


def bench_train_aligned(cfg, mesh, state, step):
    """B=128 at a 2048-frame bucket -> enc S=512, a 128-lane multiple: the
    fused Pallas decoder scan auto-selects (decoder_pallas.auto_select) and
    beats the lax.scan path (233.6 vs 261.7 ms/step measured round 3)."""
    import jax

    from e2e_asr_tpu.parallel import mesh as mesh_mod

    frames = 2048
    n = frames * 160 + 240
    b = 128
    rng = np.random.RandomState(0)
    text = np.zeros((b, L_TOK), np.int32)
    text[:, : L_TOK - 1] = rng.randint(3, VOCAB, size=(b, L_TOK - 1))
    text[:, L_TOK - 1] = 1
    batch = mesh_mod.shard_batch(
        mesh,
        {
            "wav": (rng.randn(b, n) * 0.1).astype(np.float32),
            "wav_len": np.full((b,), n, np.int32),
            "text": text,
            "text_len": np.full((b,), L_TOK, np.int32),
        },
    )
    state, m = step(state, batch, jax.random.PRNGKey(0), 0)  # compile
    float(m["loss"])
    iters = 10
    best = float("inf")
    for trial in range(2):
        t0 = time.time()
        for i in range(iters):
            state, m = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(5 + trial), i), 0
            )
        float(m["loss"])  # honest fence
        best = min(best, time.time() - t0)
    return b * n / SR * iters / best / jax.device_count(), state, None


def bench_train_960h(cfg, mesh, state, step):
    """The acceptance corpus's big-bucket regime (round-4 verdict item 2:
    960h was timed once by hand and appeared in no bench stage, so
    regressions there were invisible). B=32 — double the reference's
    HALF_BATCHSIZE-derived 16 — fits since the CTC lattice kernel batch-
    chunks itself under its VMEM budget (ops/ctc_pallas.py)."""
    import jax

    from e2e_asr_tpu.parallel import mesh as mesh_mod

    frames, l_tok, b = 3056, 520, 32
    n = frames * 160 + 240
    rng = np.random.RandomState(0)
    text = np.zeros((b, l_tok), np.int32)
    text[:, : l_tok - 1] = rng.randint(3, VOCAB, size=(b, l_tok - 1))
    text[:, l_tok - 1] = 1
    batch = mesh_mod.shard_batch(
        mesh,
        {
            "wav": (rng.randn(b, n) * 0.1).astype(np.float32),
            "wav_len": np.full((b,), n, np.int32),
            "text": text,
            "text_len": np.full((b,), l_tok, np.int32),
        },
    )
    state, m = step(state, batch, jax.random.PRNGKey(0), 0)  # compile
    float(m["loss"])
    iters = 6
    best = float("inf")
    for trial in range(2):
        t0 = time.time()
        for i in range(iters):
            state, m = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(11 + trial), i), 0
            )
        float(m["loss"])  # honest fence
        best = min(best, time.time() - t0)
    return b * n / SR * iters / best / jax.device_count(), state, {
        "b960_step_ms": round(best / iters * 1e3, 1),
        "b960_batch": b,
    }


def bench_stages(cfg):
    """Per-stage {ms, ceiling_ms, sol} at the flagship shape — every stage
    against its OWN speed-of-light (round-4 verdict item 1). Standalone
    jitted programs (each pays its own dispatch; inside the fused step XLA
    overlaps them — BASELINE.md round-4 note)."""
    from e2e_asr_tpu.utils import stages as stages_mod

    measured = stages_mod.measure_stages(cfg, 128, FRAMES, L_TOK, VOCAB, iters=3)
    return stages_mod.stage_report(cfg, 128, FRAMES, L_TOK, VOCAB, measured)


def bench_decode(cfg) -> float:
    """Beam decode W=8 + CTC prefix rescoring at the flagship shape.

    B=64: decode batching is a first-class knob (DecodeConfig.batch_size);
    with the round-4 per-step attention kernel the beam step stopped being
    per-beam-HBM-bound and bigger batches win (B=16: 4749, B=32: 4517,
    B=64: 5023 audio-s/s measured)."""
    import jax
    import jax.numpy as jnp

    from e2e_asr_tpu.config import DecodeConfig
    from e2e_asr_tpu.decode.beam import beam_search
    from e2e_asr_tpu.models import asr as asr_mod
    from e2e_asr_tpu.ops.frontend import compute_features

    b = 64
    params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, VOCAB, cfg.model)
    rng = np.random.RandomState(0)
    wav = jnp.asarray((rng.randn(b, N_SAMPLES) * 0.1).astype(np.float32))
    wl = jnp.asarray(np.full(b, N_SAMPLES, np.int32))
    feat, feat_len = jax.jit(lambda w, l: compute_features(w, l, cfg.data.audio))(wav, wl)
    feat = feat.astype(jnp.bfloat16)
    dcfg = DecodeConfig(beam_size=8, ctc_weight=0.3, lm_weight=0.0, max_len_ratio=0.4)
    max_step = max(8, int(0.4 * FRAMES // 4))
    fn = jax.jit(
        lambda f, fl: beam_search(params, cfg.model, dcfg, f, fl, max_step).scores.sum()
    )
    float(fn(feat, feat_len))  # compile
    iters = 3
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            s = fn(feat, feat_len)
        float(s)
        best = min(best, time.time() - t0)
    return b * N_SAMPLES / SR * iters / best / jax.device_count()


def _run_stage(name: str, fn):
    """Run fn() on a daemon thread under the stage budget.

    Returns (value_or_None, timed_out). A timed-out stage's thread is STILL
    RUNNING against the TPU and may still own donated buffers — the caller
    must not run further device work in that case (advisor round 3: a later
    stage reusing the donated TrainState raced the zombie thread and could
    wedge the single-client axon tunnel for 15-20 min)."""
    out = {}

    def target():
        try:
            out["v"] = fn()
        except Exception:
            out["e"] = traceback.format_exc(limit=3)

    th = threading.Thread(target=target, daemon=True)
    th.start()
    th.join(STAGE_BUDGET_S[name])
    if "e" in out:
        print(f"# stage {name} failed:\n{out['e']}", file=sys.stderr, flush=True)
    elif "v" not in out:
        print(f"# stage {name} exceeded {STAGE_BUDGET_S[name]}s budget", file=sys.stderr, flush=True)
    return out.get("v"), th.is_alive()


def main():
    from e2e_asr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = flagship_config()
    setup = {}

    def stage_maxfill():
        mesh, state, step = _train_setup(cfg)
        thr, state, util = bench_train_maxfill(cfg, mesh, state, step)
        setup["mps"] = (mesh, state, step)
        setup["util"] = util
        return thr

    thr, wedged = _run_stage("maxfill", stage_maxfill)
    if thr is None:
        # no primary number: emit an explicit null line rather than nothing
        emit()
        os._exit(1)
    _result["value"] = round(thr, 2)
    _result["vs_baseline"] = round(thr / 1.0, 2)
    # utilization vs the MEASURED chip envelope (round-3 verdict item 5:
    # the artifact must answer "how far from this chip's speed of light")
    _result["extra"].update(setup.get("util", {}))
    emit()  # primary metric is now on the record whatever happens next

    # decode BEFORE the train-state stages: it builds its own params, so it
    # depends on nothing — if the realistic stage ever overruns its budget
    # on a slower host (it wedges the tunnel and skips everything after),
    # the decode number is already on the record
    if not wedged:
        decode, wedged = _run_stage("decode", lambda: bench_decode(cfg))
        if decode is not None:
            _result["extra"]["decode_audio_sec_per_sec_chip"] = round(decode, 2)
            emit()

    if "mps" in setup and not wedged:

        def stage_realistic():
            mesh, state, step = setup["mps"]
            thr, state, counters = bench_train_realistic(cfg, mesh, state, step)
            setup["mps"] = (mesh, state, step)  # state buffers were donated
            setup["counters"] = counters
            return thr

        realistic, wedged = _run_stage("realistic", stage_realistic)
        if realistic is not None:
            _result["extra"]["train_realistic_audio_sec_per_sec_chip"] = round(realistic, 2)
            _result["extra"].update(setup.get("counters", {}))
            emit()
        elif not wedged:
            setup.pop("mps", None)  # stage died: its donated-state handoff is void

    if "mps" in setup and not wedged:

        def stage_aligned():
            mesh, state, step = setup["mps"]
            thr, state, _ = bench_train_aligned(cfg, mesh, state, step)
            setup["mps"] = (mesh, state, step)
            return thr

        aligned, wedged = _run_stage("aligned", stage_aligned)
        if aligned is not None:
            _result["extra"]["train_aligned_audio_sec_per_sec_chip"] = round(aligned, 2)
            emit()
        elif not wedged:
            setup.pop("mps", None)

    if "mps" in setup and not wedged:

        def stage_b960():
            mesh, state, step = setup["mps"]
            thr, state, extras = bench_train_960h(cfg, mesh, state, step)
            setup["mps"] = (mesh, state, step)
            setup["b960"] = extras
            return thr

        b960, wedged = _run_stage("b960", stage_b960)
        if b960 is not None:
            _result["extra"]["train_960h_bucket_audio_sec_per_sec_chip"] = round(b960, 2)
            _result["extra"].update(setup.get("b960", {}))
            emit()

    if not wedged:
        stages, wedged = _run_stage("stages", lambda: bench_stages(cfg))
        if stages is not None:
            _result["extra"]["stages"] = stages
            emit()
    if wedged:
        print("# a stage timed out with its thread live; later TPU stages skipped", file=sys.stderr, flush=True)
    # daemon threads (a hung stage, the prefetcher) must not block exit
    os._exit(0)


if __name__ == "__main__":
    main()
