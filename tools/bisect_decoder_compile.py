"""Bisect the Mosaic compile-time pathology of ops/decoder_pallas.py.

The fused decode-scan kernel compiles in seconds at test shapes but >20 min
at the flagship shape (BASELINE.md "Decoder kernel status"). This probe AOT-
compiles (lower().compile(), no execution — safe next to a training run) the
forward kernel across an (S, L, B) ladder and logs wall compile time per
shape, so the knee of the blow-up is data, not guesswork.

Usage: python tools/bisect_decoder_compile.py [max_seconds_per_shape]
Each shape runs in a fresh subprocess under a hard timeout (a hung remote
compile would otherwise wedge the probe).
"""

from __future__ import annotations

import subprocess
import sys
import time

LADDER = [
    # (B, S, L)
    (8, 128, 32),
    (32, 256, 64),
    (128, 256, 64),
    (128, 384, 96),
    (128, 512, 160),  # flagship (S padded to lane multiple)
]

CHILD = r"""
import sys, time
B, S, L = map(int, sys.argv[1:4])
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from bench import flagship_config
from e2e_asr_tpu.models import asr as asr_mod
from e2e_asr_tpu.ops import decoder_pallas

cfg = flagship_config().model
params, _ = asr_mod.asr_init(jax.random.PRNGKey(0), 40, 31, cfg)
E = 640  # flagship encoder output dim (4x320 BiLSTM, proj)
enc = jnp.zeros((B, S, E), jnp.bfloat16)
enc_len = jnp.full((B,), S, jnp.int32)
teacher_in = jnp.zeros((B, L), jnp.int32)
coins = jnp.ones((L,), bool)

# every runtime value is a jit ARGUMENT (advisor round 2: closing over
# enc_len/teacher_in/coins made them compile-time constants — e.g. the
# attention mask folded to all-ones — so the probe compiled a different
# HLO than the real training trace in models/asr.py)
def f(params, enc, enc_len, teacher_in, coins, rng):
    return decoder_pallas.run_decode_scan(
        params, cfg, enc, enc_len, teacher_in, coins,
        rng=rng, train=True, sample_decoding=False)

t0 = time.time()
lowered = jax.jit(f).lower(
    params, enc, enc_len, teacher_in, coins, jax.random.PRNGKey(0))
t1 = time.time()
lowered.compile()
t2 = time.time()
print(f"RESULT B={B} S={S} L={L} lower={t1-t0:.1f}s compile={t2-t1:.1f}s",
      flush=True)
"""


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 550
    for b, s, l in LADDER:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, str(b), str(s), str(l)],
                timeout=budget, capture_output=True, text=True,
            )
            out = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
            print(out[0] if out else f"FAIL B={b} S={s} L={l} rc={r.returncode}\n{r.stderr[-2000:]}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT(>{budget}s) B={b} S={s} L={l} wall={time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
