"""Quadrant fused node vs round-2 fused node at Heart level-0 geometry
(N=2, 80x192x160, 48ch, 2-part node [same(affine) + up], CO=48, bf16).

Measures fwd and fwd+bwd per-node time with chained scan (the axon tunnel
returns early on independent dispatches — PERF_NOTES.md).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_quadrant.py [fwd|bwd|both]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.ops import fused_block as fb
from e2enet_tpu.ops import qfused as qf

N, D, H, W, C = 2, 80, 192, 160, 48
CO = 48


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, args, iters=8, name=""):
    t0 = time.time()
    out = fn(args)
    jax.block_until_ready(out)
    log(f"  {name}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    out = fn(args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) * 1000 / iters
    log(f"  {name}: {dt:.2f} ms")
    return dt


def chain(step, iters=8):
    @jax.jit
    def run(x0):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return c
    return run


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    rng = np.random.RandomState(0)
    wk = jnp.asarray(rng.randn(3, 3, 2 * C, CO) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(CO) * 0.1, jnp.bfloat16)
    mult = jnp.asarray(1.0 + 0.1 * rng.randn(N, C), jnp.float32)
    off = jnp.asarray(0.1 * rng.randn(N, C), jnp.float32)

    # ---------------- round-2 layout
    Wp = fb.choose_wp(H, W, 2)
    xs = jnp.asarray(rng.randn(N, D, C, H * Wp) * 0.1, jnp.bfloat16)
    xu = jnp.asarray(rng.randn(N, D, C, H * Wp) * 0.1, jnp.bfloat16)

    def f_r2(args):
        a, u = args
        y, stats = fb.fused_shift_conv_block(
            [a, u], wk, b, [(mult, off), None], H, W)
        # cheap mix back to input shape to chain the scan
        m2, o2 = fb.norm_affine_from_stats(stats, D * H * W,
                                           jnp.ones(CO), jnp.zeros(CO))
        return (fb.apply_norm_lrelu_cf(y, m2, o2), u)

    # ---------------- quadrant layout
    q = (2, 2, 2)
    Hq, Wq = H // 2, W // 2
    Wqp = qf.choose_wqp(Hq, Wq)
    xsq = jnp.asarray(rng.randn(N, D // 2, 8 * C, Hq * Wqp) * 0.1,
                      jnp.bfloat16)
    xuq = jnp.asarray(rng.randn(N, D // 2, 8 * C, Hq * Wqp) * 0.1,
                      jnp.bfloat16)

    def f_q(args):
        a, u = args
        y, stats = qf.quadrant_fused_block(
            [a, u], wk, b, [(mult, off), None], q, Hq, Wq)
        m2, o2 = qf.quadrant_norm_affine(stats, 8, D * H * W,
                                         jnp.ones(CO), jnp.zeros(CO))
        return (qf.quadrant_apply_norm_lrelu(y, m2, o2), u)

    if mode in ("fwd", "both"):
        log("forward:")
        bench(chain(f_r2), (xs, xu), name="round2 fused")
        bench(chain(f_q), (xsq, xuq), name="quadrant")

    if mode in ("bwd", "both"):
        log("fwd+bwd (grad wrt parts+w):")

        def loss_r2(args):
            a, u = args
            y, stats = fb.fused_shift_conv_block(
                [a, u], wk, b, [(mult, off), None], H, W)
            return (jnp.sum(y.astype(jnp.float32) * 1e-6)
                    + jnp.sum(stats) * 1e-6)

        def loss_q(args):
            a, u = args
            y, stats = qf.quadrant_fused_block(
                [a, u], wk, b, [(mult, off), None], q, Hq, Wq)
            return (jnp.sum(y.astype(jnp.float32) * 1e-6)
                    + jnp.sum(stats) * 1e-6)

        def g_r2(args):
            ga, gu = jax.grad(loss_r2)(args)
            return (ga, gu)

        def g_q(args):
            ga, gu = jax.grad(loss_q)(args)
            return (ga, gu)

        bench(chain(g_r2), (xs, xu), name="round2 fused")
        bench(chain(g_q), (xsq, xuq), name="quadrant")


if __name__ == "__main__":
    main()
