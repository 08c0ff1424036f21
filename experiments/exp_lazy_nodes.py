"""Async-dispatch pathology probe: N chained lazy quadrant nodes in ONE
jit program (the model has 5). exp_lazy_iso (N=1) dispatches fine async;
the full model (5 lazy nodes among ~12 kernels) costs ~780 ms/launch when
chained async vs 61 ms synced — suspect worker executable-cache thrash.

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_lazy_nodes.py [N]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.ops.qfused import LazyUp, quadrant_fused_block

    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    print("device:", jax.devices()[0], " n_nodes:", n_nodes)
    q = (2, 2, 2)
    Q = 8
    Hq, Wq, Wqp = 64, 64, 66
    L = Hq * Wqp
    N, Dq = 1, 64
    C_same, cin, C_up, CO = 48, 96, 48, 48
    rng = np.random.RandomState(7)

    cm = (np.arange(L) % Wqp < Wq).astype(np.float32)
    p0 = jnp.asarray(rng.randn(N, Dq, Q * C_same, L) * cm,
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
    def lazy(p_same, raw):
        h = p_same
        for k in range(n_nodes):
            y, _ = quadrant_fused_block(
                [h, LazyUp(raw, umult, uoff,
                           ukern.astype(jnp.float32) + 0.01 * k)],
                wk, b, [(smult, soff), None], q, Hq, Wq)
            h = jnp.tile(y, (1, 1, 1, 1))  # keep chain; y is (N,Dq,Q*CO,L)
        return h

    t0 = time.time()
    y = lazy(p0, raw)
    np.asarray(jnp.ravel(y)[:1])
    print(f"  compile+run {time.time()-t0:.1f}s")
    # synced warmup (first post-compile exec of new binaries costs seconds)
    y = lazy(p0, raw)
    np.asarray(jnp.ravel(y)[:1])
    # async chained
    xx = raw
    reps = 16
    t0 = time.time()
    for _ in range(reps):
        y = lazy(p0, xx)
        xx = xx + 0.0 * jnp.ravel(y)[0].astype(xx.dtype)
    np.asarray(jnp.ravel(y)[:1])
    dt = (time.time() - t0) / reps * 1000
    print(f"  async chained: {dt:.2f} ms/program "
          f"({dt/n_nodes:.2f} ms/node)")
    # synced
    t0 = time.time()
    for _ in range(4):
        y = lazy(p0, xx)
        np.asarray(jnp.ravel(y)[:1])
    print(f"  synced: {(time.time()-t0)/4*1000:.2f} ms/program")


if __name__ == "__main__":
    main()
