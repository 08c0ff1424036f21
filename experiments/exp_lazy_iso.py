"""Isolated micro-benchmark of ONE quadrant fused-block node with a LazyUp
part vs the materialized route, at bench level-0 geometry (Hq=Wq=64,
Dq=64, skip part 48ch + up part 48ch from a 96ch level-1 raw).

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_lazy_iso.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.ops.qfused import (LazyUp, quadrant_fused_block,
                                       transp_conv_quadrant_from_cf)

    print("device:", jax.devices()[0])
    q = (2, 2, 2)
    Q = 8
    Hq, Wq, Wqp = 64, 64, 66
    L = Hq * Wqp
    N, Dq = 1, 64
    C_same, cin, C_up, CO = 48, 96, 48, 48
    rng = np.random.RandomState(7)

    cm = (np.arange(L) % Wqp < Wq).astype(np.float32)
    p_same = jnp.asarray(rng.randn(N, Dq, Q * C_same, L) * cm,
                         np.float32).astype(jnp.bfloat16)
    raw = jnp.asarray(rng.randn(N, Dq, cin, L) * cm,
                      np.float32).astype(jnp.bfloat16)
    umult = jnp.asarray(rng.rand(N, cin) + 0.5, jnp.float32)
    uoff = jnp.asarray(rng.randn(N, cin), jnp.float32)
    ukern = jnp.asarray(rng.randn(2, 2, 2, cin, C_up) * 0.2, jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, C_same + C_up, CO) * 0.2,
                     jnp.float32).astype(jnp.bfloat16)
    b = jnp.zeros((CO,), jnp.bfloat16)
    smult = jnp.asarray(rng.rand(N, C_same) + 0.5, jnp.float32)
    soff = jnp.asarray(rng.randn(N, C_same), jnp.float32)

    @jax.jit
    def dense(p_same, raw):
        u = transp_conv_quadrant_from_cf(raw, umult, uoff, ukern, q, Hq,
                                         Wq)
        y, _ = quadrant_fused_block([p_same, u], wk, b,
                                    [(smult, soff), None], q, Hq, Wq)
        return y

    @jax.jit
    def lazy(p_same, raw):
        y, _ = quadrant_fused_block(
            [p_same, LazyUp(raw, umult, uoff, ukern.astype(jnp.float32))],
            wk, b, [(smult, soff), None], q, Hq, Wq)
        return y

    def timeit(f, tag):
        t0 = time.time()
        y = f(p_same, raw)
        np.asarray(jnp.ravel(y)[:1])
        print(f"  [{tag}] compile+run {time.time()-t0:.1f}s")
        xx = raw
        reps = 16
        t0 = time.time()
        for _ in range(reps):
            y = f(p_same, xx)
            xx = xx + 0.0 * jnp.ravel(y)[0].astype(xx.dtype)
        np.asarray(jnp.ravel(y)[:1])
        dt = (time.time() - t0) / reps * 1000
        print(f"  [{tag}] {dt:.3f} ms/op")
        return np.asarray(y, np.float32), dt

    yd, td = timeit(dense, "dense (materialized up)")
    yl, tl = timeit(lazy, "lazy")
    d = np.abs(yd - yl)
    print(f"max abs diff {d.max():.3e} (scale {np.abs(yd).max():.2f})")
    print(f"dense {td:.3f} ms vs lazy {tl:.3f} ms ({td/tl:.2f}x)")


if __name__ == "__main__":
    main()
