"""Micro-bench of the fused-block Pallas BACKWARD kernel (round-3 queue #2:
19.2 ms/node measured in the train-step profile, est. floor ~13).

Times value+grad through one fused block at the Heart level-0 train
geometry (N=2, D=80, H=192, W=160): the single-part 48->48 block and the
3-part [48+48+48]->48 nest node. Chained scan timing (tunnel-safe).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_bwd_kernel.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.ops.fused_block import (choose_wp, fused_shift_conv_block,
                                        to_padded_cf)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(f, x, iters=10, label="", extras=()):
    # extras are passed as jit args (NOT closed over: closure constants are
    # embedded in the HLO and blow the tunnel's request-size limit at
    # these shapes).
    def step(c, _, *ex):
        return c + f(c, *ex), None

    def run(x0, *ex):
        return jax.lax.scan(lambda c, s: step(c, s, *ex), x0, None,
                            length=iters)[0]

    g = jax.jit(run)
    t0 = time.time()
    jax.block_until_ready(g(x, *extras))
    log(f"  {label}: compile {time.time()-t0:.1f}s")
    best = None
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(g(x, *extras))
        dt = (time.time() - t0) / iters * 1000
        best = dt if best is None else min(best, dt)
    log(f"  {label}: {best:.2f} ms")
    return best


def main():
    log("device:", jax.devices()[0])
    N, D, H, W, C = 2, 80, 192, 160, 48
    Wp = choose_wp(H, W)
    log(f"Heart level-0 geometry: N={N} D={D} H={H} W={W} Wp={Wp}")
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    bf = jnp.bfloat16

    def mk(k):
        return to_padded_cf(
            jax.random.normal(k, (N, D, H, W, C), jnp.float32).astype(bf),
            W, Wp)

    x1, x2, x3 = mk(ks[0]), mk(ks[1]), mk(ks[2])
    wk1 = (jax.random.normal(ks[3], (3, 3, C, C), jnp.float32) * .05).astype(bf)
    wk3 = (jax.random.normal(ks[4], (3, 3, 3 * C, C), jnp.float32) * .05
           ).astype(bf)
    b = jnp.zeros((C,), bf)
    mult = jnp.ones((N, C), jnp.float32)
    off = jnp.zeros((N, C), jnp.float32)

    def loss1(v):
        y, st = fused_shift_conv_block([v], wk1, b, [(mult, off)], H, W)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(st)

    def loss3(v, x2_, x3_):
        y, st = fused_shift_conv_block(
            [v, x2_, x3_], wk3, b, [(mult, off), None, (mult, off)], H, W)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(st)

    def fwd1(v):
        y, st = fused_shift_conv_block([v], wk1, b, [(mult, off)], H, W)
        return jnp.mean(y).astype(bf)

    chain_time(lambda v: fwd1(v), x1, 10, "fwd  1-part 48->48")
    chain_time(lambda v: jax.grad(loss1)(v).astype(bf) * 1e-6, x1, 10,
               "f+b  1-part 48->48")
    chain_time(lambda v, a, c: jax.grad(loss3)(v, a, c).astype(bf) * 1e-6,
               x1, 10, "f+b  3-part [3x48]->48", extras=(x2, x3))


if __name__ == "__main__":
    main()
