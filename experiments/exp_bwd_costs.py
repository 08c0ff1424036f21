"""Round-2 priority 2: where does the 5.5x fwd->bwd blowup come from?

Times fwd vs fwd+bwd for each device op at level-0 geometry (128^3 x 48,
bf16), with chained-scan timing (tunnel-safe). Suspects:
  * max_pool backward: lax.reduce_window grad lowers to SelectAndScatter —
    classically catastrophic on TPU. window == stride always here
    (unetpp_d.py:524), so a reshape+max is exact with an elementwise grad.
  * conv wgrad/dgrad layouts at C=48
  * instance-norm grad
  * transpconv (matmul) grad

Run: env PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_bwd_costs.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.ops import blocks
from e2enet_tpu.ops.shift import depth_shift


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(f, x, iters=10, label=""):
    def step(c, _):
        y = f(c)
        if y.shape == c.shape and y.dtype == c.dtype:
            return y, None
        # shape-changing op: keep the carry, fold in a data dependency
        return c + jnp.mean(y).astype(c.dtype), None

    g = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=iters)[0])
    t0 = time.time()
    r = g(x)
    jax.block_until_ready(r)
    log(f"  {label}: compile {time.time()-t0:.1f}s")
    t0 = time.time()
    r = g(x)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters * 1000
    log(f"  {label}: {dt:.2f} ms")
    return dt


def max_pool_reshape(x, window):
    """window == stride max pool via reshape; grad is elementwise."""
    wd, wh, ww = window
    N, D, H, W, C = x.shape
    x = x.reshape(N, D // wd, wd, H // wh, wh, W // ww, ww, C)
    return jnp.max(x, axis=(2, 4, 6))


def main():
    log("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    N, D, H, W, C = 1, 128, 128, 128, 48
    x = jax.random.normal(key, (N, D, H, W, C), jnp.float32).astype(jnp.bfloat16)
    wk = (jax.random.normal(key, (3, 3, C, C), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((C,), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)

    # ---- max pool fwd and bwd, both impls
    def mp_rw(v):
        return blocks.max_pool(v, (2, 2, 2))

    def mp_rs(v):
        return max_pool_reshape(v, (2, 2, 2))

    def bwd_of(f):
        def g(v):
            y, vjp = jax.vjp(f, v)
            (dx,) = vjp(y)  # cotangent = y (shape-compatible, data dep)
            return dx
        return g

    chain_time(mp_rw, x, 10, "max_pool reduce_window FWD")
    chain_time(bwd_of(mp_rw), x, 10, "max_pool reduce_window FWD+BWD")
    chain_time(mp_rs, x, 10, "max_pool reshape FWD")
    chain_time(bwd_of(mp_rs), x, 10, "max_pool reshape FWD+BWD")

    # ---- conv
    def conv(v):
        return blocks.conv3d_as_2d(v, wk, b, (1, 1, 1),
                                   compute_dtype=jnp.bfloat16)

    chain_time(conv, x, 10, "conv (1,3,3) FWD")

    def conv_bwd(v):
        y, vjp = jax.vjp(lambda a: blocks.conv3d_as_2d(
            a, wk, b, (1, 1, 1), compute_dtype=jnp.bfloat16), v)
        (dx,) = vjp(y)
        return dx

    chain_time(conv_bwd, x, 10, "conv FWD+BWD(dx only)")

    def conv_bwd_w(v):
        def f(a, k):
            return blocks.conv3d_as_2d(a, k, b, (1, 1, 1),
                                       compute_dtype=jnp.bfloat16)
        y, vjp = jax.vjp(f, v, wk)
        dx, dk = vjp(y)
        return dx + dk.sum() * 0

    chain_time(conv_bwd_w, x, 10, "conv FWD+BWD(dx+dw)")

    # ---- shift
    def shift_bwd(v):
        y, vjp = jax.vjp(lambda a: depth_shift(a, 5), v)
        (dx,) = vjp(y)
        return dx

    chain_time(lambda v: depth_shift(v, 5), x, 10, "shift FWD")
    chain_time(shift_bwd, x, 10, "shift FWD+BWD")

    # ---- instance norm
    def inorm(v):
        return blocks.instance_norm(v, scale, bias)

    def inorm_bwd(v):
        y, vjp = jax.vjp(inorm, v)
        (dx,) = vjp(y)
        return dx

    chain_time(inorm, x, 10, "instance_norm FWD")
    chain_time(inorm_bwd, x, 10, "instance_norm FWD+BWD")

    # ---- transpconv (level1 -> level0): (N,64^3,96) -> (N,128^3,48)
    x1 = jax.random.normal(key, (N, 64, 64, 64, 96), jnp.float32).astype(jnp.bfloat16)
    tk = (jax.random.normal(key, (2, 2, 2, 96, 48), jnp.float32) * 0.05
          ).astype(jnp.bfloat16)

    def tconv(v):
        return blocks.transp_conv_matmul(v, tk, (2, 2, 2),
                                         compute_dtype=jnp.bfloat16)

    def tconv_bwd(v):
        y, vjp = jax.vjp(tconv, v)
        (dx,) = vjp(y)
        return dx

    chain_time(tconv, x1, 10, "transpconv FWD")
    chain_time(tconv_bwd, x1, 10, "transpconv FWD+BWD")

    # ---- full block
    def block(v):
        s = depth_shift(v, 5)
        y = blocks.conv3d_as_2d(s, wk, b, (1, 1, 1),
                                compute_dtype=jnp.bfloat16)
        y = blocks.instance_norm(y, scale, bias)
        return blocks.leaky_relu(y)

    def block_bwd(v):
        y, vjp = jax.vjp(block, v)
        (dx,) = vjp(y)
        return dx

    chain_time(block, x, 10, "full block FWD")
    chain_time(block_bwd, x, 10, "full block FWD+BWD(dx)")


if __name__ == "__main__":
    main()
