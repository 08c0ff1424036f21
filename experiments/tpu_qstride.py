"""Hardware validation + timing of the strided quadrant-transition kernel
(ops/qstride.py) vs the XLA reference composition, at bench geometry
(128^3 patch: xraw (1, 64, 384, 4224) bf16, C=48 -> CO=96).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/tpu_qstride.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.ops import qstride
from e2enet_tpu.ops.qstride import QSStatic, quadrant_strided_fused


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained(fn, x, reps=32):
    """Chained timing (tunnel-safe: each rep depends on the last)."""
    def body(c, _):
        y, stats = fn(c, None)
        # feed a scalar of the output back into the input
        c = c + (stats[0, 0, 0] * 0).astype(c.dtype)
        return c, stats[0, 0, 0]
    f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=reps)[1])
    r = f(x)
    np.asarray(r)          # warm
    t0 = time.perf_counter()
    r = f(x)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    heart = "--heart" in sys.argv
    if heart:
        Dq, Hq, Wq, Wqp = 40, 96, 80, 84
        N = 2
    else:
        Dq, Hq, Wq, Wqp = 64, 64, 64, 66
        N = 1
    C, CO = 48, 96
    q = (2, 2, 2)
    static = QSStatic(q, C, CO, Dq, Hq, Wq, Wqp, 5, True, False)

    rng = np.random.RandomState(0)
    L = Hq * Wqp
    # zero the padding columns like real inputs
    lane = np.arange(L) % Wqp
    cm = (lane < Wq).astype(np.float32)
    xraw = jnp.asarray(
        rng.randn(N, Dq, 8 * C, L).astype(np.float32) * cm,
        jnp.bfloat16)
    mult = jnp.asarray(rng.rand(N, C).astype(np.float32) + 0.5)
    off = jnp.asarray(rng.randn(N, C).astype(np.float32) * 0.3)
    kern = jnp.asarray(rng.randn(3, 3, C, CO).astype(np.float32) * 0.1,
                       jnp.bfloat16)
    bias = jnp.asarray(rng.randn(CO).astype(np.float32) * 0.1)

    kfn = jax.jit(lambda x, _: quadrant_strided_fused(
        x, mult, off, kern, bias, static))
    rfn = jax.jit(lambda x, _: qstride._ref_forward(
        x, mult, off, kern, bias, static))

    log("compiling kernel...")
    yk, sk = kfn(xraw, None)
    yk, sk = np.asarray(yk, np.float32), np.asarray(sk)
    log("compiling reference...")
    yr, sr = rfn(xraw, None)
    yr, sr = np.asarray(yr, np.float32), np.asarray(sr)

    err = np.abs(yk - yr).max()
    scale = np.abs(yr).max()
    serr = np.abs(sk - sr).max() / (np.abs(sr).max() + 1e-9)
    log(f"y max abs err {err:.3e} (scale {scale:.3e}), "
        f"stats rel err {serr:.3e}")
    ok = err <= 0.02 * scale and serr < 1e-3
    log("PARITY", "PASS" if ok else "FAIL")

    tk = chained(kfn, xraw)
    tr = chained(rfn, xraw)
    log(f"kernel {tk:.3f} ms   reference {tr:.3f} ms   "
        f"speedup {tr / tk:.2f}x")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
