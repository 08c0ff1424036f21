"""Quantify the DS-loss path cost in the train step: time value_and_grad
of (a) the full deep-supervision DC+CE loss vs (b) a trivial scalar of the
raw DS outputs. The difference bounds what a quadrant-space loss could
save. Heart geometry, production model (quadrant + fused levels 0-1).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/exp_loss_cost.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus, ds_loss_weights
from e2enet_tpu.ops.losses import deep_supervision_loss


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    patch = (80, 192, 160)
    pools = ((2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2))
    n_classes, B = 3, 2
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=n_classes,
        pool_op_kernel_sizes=pools, base_num_features=48,
        compute_dtype=jnp.bfloat16, fused=True, fused_max_level=1,
        quadrant=True, remat=True)
    x = jnp.zeros((B, *patch, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    weights = ds_loss_weights(len(pools), model.num_ds_outputs())
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(B, *patch, 1).astype(np.float32))
    tgts = []
    shape = np.array(patch)
    for i in range(model.num_ds_outputs()):
        tgts.append(jnp.asarray(
            rng.randint(0, n_classes, (B, *shape.astype(int))), jnp.int32))
        shape = shape // np.array(pools[i])
    tgts = tuple(tgts)

    def loss_full(params, data, targets):
        outs = model.apply({"params": params}, data, do_ds=True)
        return deep_supervision_loss(outs, targets,
                                     [float(w) for w in weights],
                                     batch_dice=True)

    def loss_trivial(params, data, targets):
        outs = model.apply({"params": params}, data, do_ds=True)
        return sum(jnp.sum(o.astype(jnp.float32)) * 1e-6 for o in outs)

    for name, fn in [("full DS dc_ce", loss_full),
                     ("trivial sum", loss_trivial)]:
        # chained iterations (data depends on the previous loss) — over the
        # axon tunnel independent dispatches return from block_until_ready
        # before remote execution finishes
        def chain(params, data, targets, iters=3):
            def body(c, _):
                l, g = jax.value_and_grad(fn)(params, c, targets)
                # CONSUME the grads — an unused grad tree is DCE'd and the
                # whole backward vanishes from the program (measured: 124
                # ms "fwd+bwd" that was really fwd-only vs 455 real)
                gsum = sum(jnp.sum(x.astype(jnp.float32)) * 1e-20
                           for x in jax.tree_util.tree_leaves(g))
                # the epsilon terms are value-neutral but NOT foldable —
                # keep the scan iterations chained
                return c + (l * 1e-20 + gsum).astype(c.dtype), l
            c, ls = jax.lax.scan(body, data, None, length=iters)
            return ls[-1]

        g = jax.jit(chain)
        t0 = time.time()
        l = g(params, data, tgts)
        jax.block_until_ready(l)
        log(f"{name}: compile+first {time.time()-t0:.0f}s loss={float(l):.4f}")
        best = None
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(g(params, data, tgts))
            dt = (time.time() - t0) / 3 * 1000
            best = dt if best is None else min(best, dt)
        log(f"{name}: {best:.0f} ms/iter")


if __name__ == "__main__":
    main()
