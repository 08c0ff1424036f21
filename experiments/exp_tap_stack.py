"""Fwd micro-bench of the fused block (1-part and 3-part nest) at the
Heart level-0 and bench 128^3 geometries.

Originally the A/B harness for the FUSED_TAP_STACK experiment (stack the
9 tap slices per lane tile and contract in ONE K-merged dot). MEASURED
NEGATIVE and removed from the kernel: 1-part a wash (8.85 -> 8.59 /
5.40 -> 5.39 ms), 3-part a big loss (14.15 -> 18.42 heart, 6.93 -> 10.46
bench 128^3) — the extra VMEM stacking pass costs more than the padded
small-K dots it saves. See PERF_NOTES.md.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/exp_tap_stack.py
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


def chain_time(f, x, extras=(), iters=10, label=""):
    def run(x0, *ex):
        def step(c, _):
            return c + f(c, *ex), None
        return jax.lax.scan(step, x0, None, length=iters)[0]

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


def bench_geom(tag, N, D, H, W, C):
    Wp = choose_wp(H, W)
    log(f"{tag}: N={N} D={D} H={H} W={W} Wp={Wp} C={C}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    bf = jnp.bfloat16

    def mk(k):
        return to_padded_cf(
            jax.random.normal(k, (N, D, H, W, C), jnp.float32).astype(bf),
            W, Wp)

    x1, x2, x3 = mk(ks[0]), mk(ks[1]), mk(ks[2])
    wk1 = (jax.random.normal(ks[3], (3, 3, C, C), jnp.float32) * .05
           ).astype(bf)
    wk3 = (jax.random.normal(ks[4], (3, 3, 3 * C, C), jnp.float32) * .05
           ).astype(bf)
    b = jnp.zeros((C,), bf)
    mult = jnp.ones((N, C), jnp.float32)
    off = jnp.zeros((N, C), jnp.float32)

    def fwd1(v):
        y, st = fused_shift_conv_block([v], wk1, b, [(mult, off)], H, W)
        return jnp.mean(y).astype(bf) + jnp.mean(st).astype(bf)

    def fwd3(v, a, c):
        y, st = fused_shift_conv_block(
            [v, a, c], wk3, b, [(mult, off), None, (mult, off)], H, W)
        return jnp.mean(y).astype(bf) + jnp.mean(st).astype(bf)

    chain_time(fwd1, x1, (), 10, f"{tag} fwd 1-part")
    chain_time(fwd3, x1, (x2, x3), 10, f"{tag} fwd 3-part")


def main():
    log("device:", jax.devices()[0])
    bench_geom("heart", 2, 80, 192, 160, 48)
    bench_geom("bench128", 1, 128, 128, 128, 48)


if __name__ == "__main__":
    main()
