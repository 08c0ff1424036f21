"""Transposed-conv -> padded-CF emission shootout (level 1 -> 0 at the
bench geometry). The profile shows the current formulation costs ~3.3 ms of
XLA relayout copies per up-link (two copies); find a one-copy form.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_transpconv.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.ops.blocks import transp_conv_matmul, transp_conv_matmul_cf
from e2enet_tpu.ops.fused_block import to_padded_cf


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(f, x, iters=20, label=""):
    def step(c, _):
        y = f(c)
        return c + jnp.mean(y).astype(c.dtype), None

    g = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=iters)[0])
    t0 = time.time()
    jax.block_until_ready(g(x))
    log(f"  {label}: compile {time.time()-t0:.0f}s")
    t0 = time.time()
    jax.block_until_ready(g(x))
    dt = (time.time() - t0) / iters * 1000
    log(f"  {label}: {dt:.2f} ms")
    return dt


def main():
    log("device:", jax.devices()[0])
    N, D1, H1, W1, C1, CO = 1, 64, 64, 64, 96, 48
    sd = sh = sw = 2
    H, W, Wp = 128, 128, 130
    bf = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x_cl = jax.random.normal(key, (N, D1, H1, W1, C1), jnp.float32).astype(bf)
    x_cf = jnp.transpose(x_cl, (0, 1, 4, 2, 3)).reshape(N, D1, C1, H1 * W1)
    wk = (jax.random.normal(key, (sd, sh, sw, C1, CO), jnp.float32) * 0.1
          ).astype(bf)

    # V1: current production (pad input W1 -> Wp/sw, dot, 8D transpose)
    chain_time(lambda v: transp_conv_matmul_cf(v, wk, (2, 2, 2), W, Wp),
               x_cl, 20, "V1 pad+dot+transpose (current)")

    # V4: old CL path + to_padded_cf
    chain_time(lambda v: to_padded_cf(
        transp_conv_matmul(v, wk, (2, 2, 2)), W, Wp),
        x_cl, 20, "V4 CL transpconv + to_padded_cf")

    # V3: CF input, einsum, relayout to (N, D, CO, H*Wp)
    w2 = wk.reshape(sd * sh * sw, C1, CO)

    def v3(v_cf):
        # v_cf (N, D1, C1, L1); out (N, D1, S, CO, L1)
        y = jnp.einsum("ndcl,sco->ndsol", v_cf, w2.astype(bf),
                       preferred_element_type=bf)
        W1p = Wp // sw
        y = y.reshape(N, D1, sd, sh, sw, CO, H1, W1)
        y = jnp.pad(y, ((0, 0),) * 7 + ((0, 0),))  # no-op, keep graph simple
        y = jnp.transpose(y, (0, 1, 2, 5, 6, 3, 7, 4))
        y = y.reshape(N, D1 * sd, CO, H, W)
        y = jnp.pad(y, ((0, 0),) * 4 + ((0, Wp - W),))
        return y.reshape(N, D1 * sd, CO, H * Wp)

    chain_time(v3, x_cf, 20, "V3 CF-input einsum + transpose")

    # V5: dot with (sd, CO, sh, sw) weight order — different permutation
    def v5(v_cl):
        W1p = Wp // sw
        v = jnp.pad(v_cl, ((0, 0), (0, 0), (0, 0), (0, W1p - W1), (0, 0)))
        wr = jnp.transpose(wk, (0, 4, 1, 2, 3)).reshape(
            C1, -1) if False else jnp.transpose(
            wk.reshape(sd, sh, sw, C1, CO), (3, 0, 4, 1, 2)).reshape(
            C1, sd * CO * sh * sw)
        y = jnp.dot(v.astype(bf), wr.astype(bf),
                    preferred_element_type=bf)
        y = y.reshape(N, D1, H1, W1p, sd, CO, sh, sw)
        y = jnp.transpose(y, (0, 1, 4, 5, 2, 6, 3, 7))
        return y.reshape(N, D1 * sd, CO, H * Wp)

    chain_time(v5, x_cl, 20, "V5 dot (sd,CO,sh,sw) order + transpose")


if __name__ == "__main__":
    main()
