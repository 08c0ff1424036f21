"""Bisect the quadrant bwd kernel fault: run each level-0 kernel config of
the Heart model in isolation (production shapes, fwd+bwd).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_quadrant2.py [cfg...]
cfgs: c1 (1-part C=1), c48 (1-part C=48), n2 (2-part 48+48), head
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.ops import qfused as qf

N, D, H, W = 2, 80, 192, 160
q = (2, 2, 2)
Hq, Wq = H // 2, W // 2
Wqp = qf.choose_wqp(Hq, Wq)
L = Hq * Wqp
CO = 48


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_cfg(name, part_cs, affine_first):
    rng = np.random.RandomState(0)
    parts = [jnp.asarray(rng.randn(N, D // 2, 8 * c, L) * 0.1, jnp.bfloat16)
             for c in part_cs]
    C_tot = sum(part_cs)
    wk = jnp.asarray(rng.randn(3, 3, C_tot, CO) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(CO) * 0.1, jnp.bfloat16)
    affs = []
    for i, c in enumerate(part_cs):
        if i == 0 and affine_first:
            affs.append((jnp.asarray(1 + 0.1 * rng.randn(N, c), jnp.float32),
                         jnp.asarray(0.1 * rng.randn(N, c), jnp.float32)))
        else:
            affs.append(None)

    def loss(parts):
        y, stats = qf.quadrant_fused_block(parts, wk, b, affs, q, Hq, Wq)
        return jnp.sum(y.astype(jnp.float32)) * 1e-6 + jnp.sum(stats) * 1e-6

    g = jax.jit(jax.grad(loss))
    t0 = time.time()
    out = g(parts)
    jax.block_until_ready(out)
    log(f"{name}: OK compile+run {time.time()-t0:.1f}s")


def main():
    cfgs = sys.argv[1:] or ["c48", "c1", "n2"]
    for c in cfgs:
        if c == "c1":
            run_cfg("c1 (1-part C=1 raw)", [1], False)
        elif c == "c48":
            run_cfg("c48 (1-part C=48 affine)", [48], True)
        elif c == "n2":
            run_cfg("n2 (2-part 48+48, first affine)", [48, 48], True)


if __name__ == "__main__":
    main()
