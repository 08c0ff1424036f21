"""Hardware A/B for the LAZY quadrant up-link (qfused.LazyUp: the
transposed-conv up-link GEMM computed inside the consuming fused kernel on
DMA arrival — the (N, Dq, Q*C_up, L) tensor never hits HBM).

Compares the bench model's forward with the lazy path enabled (default)
vs force-disabled (monkeypatched lazy_up_supported -> False, which takes
the materialized route: qlink site kernel / XLA twin + dense kernel DMA):
numerical parity + chained fwd timing.

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python experiments/exp_lazy_up.py
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    from e2enet_tpu.ops import qfused

    dev = jax.devices()[0]
    print("device:", dev)
    on_tpu = dev.platform != "cpu"
    patch = (128, 128, 128) if on_tpu else (32, 32, 32)

    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=16,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48 if on_tpu else 8,
        compute_dtype=jnp.bfloat16,
        fused=on_tpu, quadrant=True, quadrant_logits=True,
        quadrant_input=patch,
        fused_interpret=not on_tpu)
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, *patch, 1), jnp.float32).astype(
        jnp.bfloat16)

    def fwd(p, x):
        return model.apply(p, x, do_ds=False)

    fwd_j = jax.jit(fwd)

    def run(tag):
        t0 = time.time()
        y = fwd_j(params, x)
        np.asarray(jnp.ravel(y)[:1])
        print(f"  [{tag}] compile+run {time.time()-t0:.1f}s")
        # one more synced warmup rep: the FIRST post-compile execution of a
        # new Mosaic binary costs seconds on the axon worker (one-time
        # load/JIT) and must not pollute the chained average
        y = fwd_j(params, x)
        np.asarray(jnp.ravel(y)[:1])
        # chained timing
        xx = x
        t0 = time.time()
        reps = 16
        for _ in range(reps):
            y = fwd_j(params, xx)
            xx = xx + 0.0 * jnp.ravel(y)[0].astype(xx.dtype)
        np.asarray(jnp.ravel(y)[:1])
        dt = (time.time() - t0) / reps * 1000
        print(f"  [{tag}] fwd {dt:.2f} ms/pass")
        return np.asarray(y, np.float32), dt

    print("lazy ON (default):")
    y_lazy, t_lazy = run("lazy")

    orig = qfused.lazy_up_supported
    qfused.lazy_up_supported = lambda *a, **k: False
    fwd_j = jax.jit(fwd)  # fresh jit: the gate is trace-time
    try:
        print("lazy OFF (materialized up-link):")
        y_mat, t_mat = run("mat")
    finally:
        qfused.lazy_up_supported = orig

    d = np.abs(y_lazy - y_mat)
    scale = np.abs(y_mat).max()
    print(f"max abs diff {d.max():.3e}  (scale {scale:.2f}), "
          f"mean {d.mean():.3e}")
    print(f"fwd: lazy {t_lazy:.2f} ms vs materialized {t_mat:.2f} ms "
          f"({t_mat / t_lazy:.2f}x)")


if __name__ == "__main__":
    main()
