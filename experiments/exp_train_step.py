"""Train-step timing at Heart 3d_fullres geometry (batch 2, patch
80x192x160, 48 feats, bf16, SGD + DS loss): fused Pallas blocks vs XLA path.
Round-1 measured 1274 ms/step (custom shift VJPs); reference A100 dummy-load
is ~174 ms/step (43.6 s / 250 it).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_train_step.py [--no_fused] [--remat0]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus, ds_loss_weights
from e2enet_tpu.training.train_state import (create_train_state,
                                             make_train_step)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    fused = "--no_fused" not in sys.argv
    remat = "--no_remat" not in sys.argv
    quadrant = "--no_quadrant" not in sys.argv
    max_level = 1 if "--max_level1" in sys.argv else 0
    patch = (80, 192, 160)
    pools = ((2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2))
    n_classes = 3
    B = 2
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=n_classes,
        pool_op_kernel_sizes=pools, base_num_features=48,
        compute_dtype=jnp.bfloat16, fused=fused, fused_max_level=max_level,
        quadrant=quadrant, remat=remat)
    x = jnp.zeros((B, *patch, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    state = create_train_state(params)
    n_out = model.num_ds_outputs()
    weights = ds_loss_weights(len(pools), n_out)
    step = make_train_step(model, weights, batch_dice=True)

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(B, *patch, 1).astype(np.float32))
    tgts = []
    shape = np.array(patch)
    for i in range(n_out):
        tgts.append(jnp.asarray(
            rng.randint(0, n_classes, (B, *shape.astype(int))), jnp.int32))
        shape = shape // np.array(pools[i])
    tgts = tuple(tgts)

    t0 = time.time()
    state, m = step(state, data, tgts, 1e-2)
    jax.block_until_ready(m["loss"])
    log(f"compile+first: {time.time()-t0:.0f}s loss={float(m['loss']):.4f}")

    # dispatch-loop timing (state-chained, 5 RPCs): includes the axon
    # tunnel's per-dispatch stall — what a remote-driven loop would see
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, data, tgts, 1e-2)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / iters * 1000
    log(f"train step ({'fused' if fused else 'xla'}, remat={remat}): "
        f"{dt:.0f} ms (dispatch loop incl. tunnel stalls)")

    # in-program scan (ONE dispatch): the true per-step device time — what
    # a production epoch loop (lax.scan / local runtime) pays per step
    step_fn = make_train_step(model, weights, batch_dice=True,
                              jit_compile=False)

    def epoch(state, data, tgts, n=10):
        def body(s, _):
            s, m = step_fn(s, data, tgts, 1e-2)
            return s, m["loss"]
        s, losses = jax.lax.scan(body, state, None, length=n)
        return s, losses[-1]

    ep = jax.jit(epoch, donate_argnums=(0,))
    t0 = time.time()
    state2, l = ep(state, data, tgts)
    jax.block_until_ready(l)
    log(f"scan compile+first: {time.time()-t0:.0f}s loss={float(l):.4f}")
    best = None
    for _ in range(3):
        t0 = time.time()
        state2, l = ep(state2, data, tgts)
        jax.block_until_ready(l)
        dt = (time.time() - t0) / 10 * 1000
        best = dt if best is None else min(best, dt)
    log(f"train step ({'fused' if fused else 'xla'}, remat={remat}): "
        f"{best:.0f} ms (in-program scan, true device rate)")


if __name__ == "__main__":
    main()
