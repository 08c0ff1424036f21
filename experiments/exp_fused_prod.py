"""Timing of the production fused block (ops/fused_block.py, padded-flat
channels-first, no boundary masks) on the real TPU.

Shapes: 128^3 x 48 (bench patch) block, and the 2-part 96->48 nest node.
Compare against the XLA channels-last equivalents.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_fused_prod.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.ops import blocks
from e2enet_tpu.ops.fused_block import (choose_wp, fused_shift_conv_block,
                                        norm_affine_from_stats, to_padded_cf)
from e2enet_tpu.ops.shift import depth_shift


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(f, x, iters=20, label=""):
    def step(c, _):
        y = f(c)
        if y.shape == c.shape and y.dtype == c.dtype:
            return y, None
        return c + jnp.mean(y).astype(c.dtype), None

    g = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=iters)[0])
    t0 = time.time()
    jax.block_until_ready(g(x))
    log(f"  {label}: compile {time.time()-t0:.1f}s")
    t0 = time.time()
    jax.block_until_ready(g(x))
    dt = (time.time() - t0) / iters * 1000
    log(f"  {label}: {dt:.2f} ms")
    return dt


def main():
    log("device:", jax.devices()[0])
    N, D, H, W, C = 1, 128, 128, 128, 48
    Wp = choose_wp(H, W)
    log(f"Wp={Wp}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    bf = jnp.bfloat16
    x_cf = to_padded_cf(
        jax.random.normal(ks[0], (N, D, H, W, C), jnp.float32).astype(bf),
        W, Wp)
    x_cl = jax.random.normal(ks[1], (N, D, H, W, C), jnp.float32).astype(bf)
    wk = (jax.random.normal(ks[2], (3, 3, C, C), jnp.float32) * 0.05).astype(bf)
    b = jnp.zeros((C,), bf)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    mult = jnp.ones((N, C), jnp.float32)
    off = jnp.zeros((N, C), jnp.float32)

    # ---- single-part full block (affine-on-load + shift + conv + stats)
    def fused_full(v):
        y, st = fused_shift_conv_block([v], wk, b, [(mult, off)], H, W)
        return y

    chain_time(fused_full, x_cf, 20, "FUSED block 48->48 (v3a padded)")

    def xla_full(v):
        y = blocks.conv3d_as_2d(depth_shift(v, 5), wk, b, (1, 1, 1),
                                compute_dtype=bf)
        y = blocks.instance_norm(y, gamma, beta)
        return blocks.leaky_relu(y)

    chain_time(xla_full, x_cl, 20, "XLA block 48->48 (shift+conv+IN+lrelu)")

    # ---- 2-part nest node 96->48
    wk2 = (jax.random.normal(ks[3], (3, 3, 2 * C, C), jnp.float32) * 0.05
           ).astype(bf)
    up_cf = to_padded_cf(
        jax.random.normal(ks[4], (N, D, H, W, C), jnp.float32).astype(bf),
        W, Wp)

    def fused_node(v):
        y, st = fused_shift_conv_block([v, up_cf], wk2, b,
                                       [(mult, off), None], H, W)
        return y

    chain_time(fused_node, x_cf, 20, "FUSED node [48+48]->48")

    up_cl = jax.random.normal(ks[5], (N, D, H, W, C), jnp.float32).astype(bf)

    def xla_node(v):
        # the current production path: split-concat shift conv + IN + lrelu
        from e2enet_tpu.ops.shift import (depth_shift_custom,
                                          group_shifts_for_range)
        yv = None
        offc = 0
        for part in (blocks.leaky_relu(blocks.instance_norm(v, gamma, beta)),
                     up_cl):
            pc = part.shape[-1]
            gs = group_shifts_for_range(2 * C, 5, offc, offc + pc)
            ps = depth_shift_custom(part, gs)
            ksl = jax.lax.slice_in_dim(wk2, offc, offc + pc, axis=-2)
            contrib = blocks.conv3d_as_2d(ps, ksl,
                                          b if yv is None else None,
                                          (1, 1, 1), compute_dtype=bf)
            yv = contrib if yv is None else yv + contrib
            offc += pc
        y = blocks.instance_norm(yv, gamma, beta)
        return blocks.leaky_relu(y)

    chain_time(xla_node, x_cl, 20, "XLA node [48+48]->48 (split-concat)")


if __name__ == "__main__":
    main()
