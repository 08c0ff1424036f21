"""Model-forward timing sweep: fused level cutoff (which levels benefit from
the Pallas fused blocks). 128^3 patch, 48 feats, bf16, single forward
(do_ds=False), chained-scan timed.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_model_fwd.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("device:", jax.devices()[0])
    patch = (128, 128, 128)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *patch, 1),
                          jnp.float32).astype(jnp.bfloat16)
    params = None
    for label, kw in [
        ("XLA (fused off)", dict(fused=False)),
        ("fused level 0", dict(fused=True, fused_max_level=0)),
        ("fused levels 0-1", dict(fused=True, fused_max_level=1)),
        ("fused levels 0-2", dict(fused=True, fused_max_level=2)),
    ]:
        model = ShiftUNetPlusPlus(
            input_channels=1, num_classes=16,
            pool_op_kernel_sizes=((2, 2, 2),) * 5,
            base_num_features=48, compute_dtype=jnp.bfloat16, **kw)
        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(1), x)

        def f(v, m=model):
            return m.apply(params, v, do_ds=False)

        def step(c, _):
            y = f(c)
            return c + jnp.mean(y).astype(c.dtype), None

        g = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=10)[0])
        t0 = time.time()
        jax.block_until_ready(g(x))
        log(f"  {label}: compile {time.time()-t0:.0f}s")
        t0 = time.time()
        jax.block_until_ready(g(x))
        dt = (time.time() - t0) / 10 * 1000
        log(f"  {label}: {dt:.1f} ms/fwd")


if __name__ == "__main__":
    main()
