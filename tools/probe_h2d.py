"""Probe host->device transfer over the axon tunnel: bandwidth by dtype/size,
blocking behavior of device_put, and whether H2D overlaps with compute.

Findings feed the input-pipeline design (int16 wire format, double-buffer).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # --- H2D bandwidth by size/dtype -------------------------------------
    for dtype, mb in [(np.float32, 16), (np.float32, 64), (np.int16, 16), (np.int16, 64)]:
        n = mb * (1 << 20) // np.dtype(dtype).itemsize
        x = (np.random.RandomState(0).randn(n) * 100).astype(dtype)
        # warm
        a = jax.device_put(x, dev)
        float(jnp.asarray(a, jnp.float32)[0])
        t0 = time.time()
        reps = 3
        arrs = []
        for _ in range(reps):
            arrs.append(jax.device_put(x, dev))
        t_put = time.time() - t0
        # fence: read one element from each
        for a in arrs:
            np.asarray(jax.device_get(a[:1]))
        t_all = time.time() - t0
        print(
            f"H2D {np.dtype(dtype).name} {mb}MB: device_put returns in "
            f"{t_put/reps*1e3:.1f} ms/transfer, fenced {t_all/reps*1e3:.1f} ms "
            f"=> {mb*reps/t_all:.0f} MB/s"
        )

    # --- does H2D overlap with compute? ----------------------------------
    # launch a long matmul chain, then device_put while it runs
    k = jax.random.PRNGKey(0)
    m = jax.random.normal(k, (4096, 4096), jnp.bfloat16)

    @jax.jit
    def burn(m):
        def body(c, _):
            return jnp.tanh(c @ m), None
        out, _ = jax.lax.scan(body, m, None, length=60)
        return out.sum()

    float(burn(m))  # compile
    t0 = time.time()
    r = burn(m)
    t_dispatch = time.time() - t0
    x = (np.random.RandomState(0).randn(16 << 20) * 100).astype(np.float32)  # 64MB
    t0 = time.time()
    a = jax.device_put(x, dev)
    np.asarray(jax.device_get(a[:1]))
    t_put_during = time.time() - t0
    t0 = time.time()
    float(r)
    t_rest = time.time() - t0
    # now the same put with an idle device
    t0 = time.time()
    a = jax.device_put(x, dev)
    np.asarray(jax.device_get(a[:1]))
    t_put_idle = time.time() - t0
    print(
        f"compute dispatch {t_dispatch*1e3:.1f} ms; 64MB put during compute "
        f"{t_put_during*1e3:.1f} ms; remaining compute wait {t_rest*1e3:.1f} ms; "
        f"64MB put idle {t_put_idle*1e3:.1f} ms"
    )

    # --- conv-run-shaped batch put (B=32, 816-frame bucket) --------------
    b, ns = 32, (816 - 1) * 160 + 400
    batch32 = {
        "wav": (np.random.RandomState(0).randn(b, ns) * 0.1).astype(np.float32),
        "wav_len": np.full((b,), ns, np.int32),
        "text": np.ones((b, 72), np.int32),
        "text_len": np.full((b,), 72, np.int32),
    }
    for name, batch in [("f32 conv batch", batch32)]:
        for _ in range(2):
            t0 = time.time()
            d = {kk: jax.device_put(v, dev) for kk, v in batch.items()}
            for v in d.values():
                np.asarray(jax.device_get(v.ravel()[:1]))
            dt = time.time() - t0
        mb = sum(v.nbytes for v in batch.values()) / 1e6
        print(f"{name}: {mb:.1f} MB in {dt*1e3:.1f} ms => {mb/dt:.0f} MB/s")


if __name__ == "__main__":
    main()
