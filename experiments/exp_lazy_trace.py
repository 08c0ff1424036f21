"""Trace the lazy-up model forward to find where the 276-vs-33 ms went.

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_lazy_trace.py
Then: python experiments/exp_trace_agg.py /tmp/prof_lazy
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus

    dev = jax.devices()[0]
    print("device:", dev)
    patch = (128, 128, 128)

    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=16,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48,
        compute_dtype=jnp.bfloat16,
        fused=True, quadrant=True, quadrant_logits=True,
        quadrant_input=patch)
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, *patch, 1), jnp.float32).astype(
        jnp.bfloat16)

    fwd_j = jax.jit(lambda p, x: model.apply(p, x, do_ds=False))
    t0 = time.time()
    y = fwd_j(params, x)
    np.asarray(jnp.ravel(y)[:1])
    print(f"compile+run {time.time()-t0:.1f}s")

    # synced warmup (2nd exec of a fresh binary costs seconds on the worker)
    y = fwd_j(params, x)
    np.asarray(jnp.ravel(y)[:1])
    t0 = time.time()
    with jax.profiler.trace("/tmp/prof_lazy"):
        xx = x
        reps = 8
        for _ in range(reps):
            y = fwd_j(params, xx)
            xx = xx + 0.0 * jnp.ravel(y)[0].astype(xx.dtype)
        np.asarray(jnp.ravel(y)[:1])
    print(f"traced {reps} chained reps: "
          f"{(time.time()-t0)/reps*1000:.1f} ms/rep wall")
    print("trace written to /tmp/prof_lazy")


if __name__ == "__main__":
    main()
