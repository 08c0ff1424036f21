"""Isolated quadrant nest-node kernel: DENSE channels vs ROW-SPARSE compact
channels (the sparse-plan configuration). Measures where the sparse win
goes at bench level-0 geometry.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_sparse_iso.py
"""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.ops.qfused import LazyUp, quadrant_fused_block
    from e2enet_tpu.ops.shift import compact_groups, group_shifts

    print("device:", jax.devices()[0])
    q = (2, 2, 2); Q = 8
    Hq, Wq, Wqp = 64, 64, 66
    L = Hq * Wqp
    N, Dq = 1, 64
    rng = np.random.RandomState(7)
    cm = (np.arange(L) % Wqp < Wq).astype(np.float32)

    def build(C_same, C_up, CO, cin_up=96, groups_override=None):
        p_same = jnp.asarray(rng.randn(N, Dq, Q * C_same, L) * cm,
                             np.float32).astype(jnp.bfloat16)
        raw = jnp.asarray(rng.randn(N, Dq, cin_up, L) * cm,
                          np.float32).astype(jnp.bfloat16)
        umult = jnp.asarray(rng.rand(N, cin_up) + .5, jnp.float32)
        uoff = jnp.asarray(rng.randn(N, cin_up), jnp.float32)
        ukern = jnp.asarray(rng.randn(2, 2, 2, cin_up, C_up) * .2,
                            jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, C_same + C_up, CO) * .2,
                         np.float32).astype(jnp.bfloat16)
        b = jnp.zeros((CO,), jnp.bfloat16)
        smult = jnp.asarray(rng.rand(N, C_same) + .5, jnp.float32)
        soff = jnp.asarray(rng.randn(N, C_same), jnp.float32)

        @jax.jit
        def f(p_same, raw):
            y, _ = quadrant_fused_block(
                [p_same, LazyUp(raw, umult, uoff, ukern)],
                wk, b, [(smult, soff), None], q, Hq, Wq,
                groups_override=groups_override)
            return y
        return f, p_same, raw

    def timeit(f, p_same, raw, tag):
        t0 = time.time()
        y = f(p_same, raw)
        np.asarray(jnp.ravel(y)[:1])
        print(f"  [{tag}] compile+run {time.time()-t0:.1f}s")
        xx = raw; reps = 16
        t0 = time.time()
        for _ in range(reps):
            y = f(p_same, xx)
            xx = xx + 0.0 * jnp.ravel(y)[0].astype(xx.dtype)
        np.asarray(jnp.ravel(y)[:1])
        dt = (time.time() - t0) / reps * 1000
        print(f"  [{tag}] {dt:.3f} ms/op")
        return dt

    td = timeit(*build(48, 48, 48), tag="dense 48+48 -> 48")
    # compact: same/up parts pruned to 16/8 rows; shifts follow the
    # ORIGINAL channel positions (a realistic compact group structure)
    alive = sorted(rng.permutation(96)[:24].tolist())
    cg = compact_groups(group_shifts(96, 5), alive)
    tc = timeit(*build(16, 8, 48), tag="compact 16+8 -> 48 (default groups)")
    tcg = timeit(*build(16, 8, 48, groups_override=cg),
                 tag="compact 16+8 -> 48 (fragmented groups)")
    print(f"dense {td:.3f} vs compact {tc:.3f} ({td/tc:.2f}x) "
          f"fragmented {tcg:.3f} ({td/tcg:.2f}x)")


if __name__ == "__main__":
    main()
