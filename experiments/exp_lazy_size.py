"""Compare compiled-executable sizes: lazy vs materialized model forward.

Run:  env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_lazy_size.py
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
    from e2enet_tpu.ops import qfused

    print("device:", jax.devices()[0])
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
    x = jnp.zeros((1, *patch, 1), jnp.bfloat16)

    def report(tag):
        # fresh closure per report: a shared function object would hit
        # jax's trace cache and re-measure the FIRST program
        def fwd(p, x, _tag=tag):
            return model.apply(p, x, do_ds=False)

        lowered = jax.jit(fwd).lower(params, x)
        compiled = lowered.compile()
        try:
            blob = compiled.runtime_executable().serialize()
            print(f"  [{tag}] serialized executable: "
                  f"{len(blob)/1e6:.2f} MB")
        except Exception as e:  # noqa: BLE001
            print(f"  [{tag}] serialize failed: {e!r}")
        try:
            ma = compiled.memory_analysis()
            print(f"  [{tag}] memory_analysis: {ma}")
        except Exception as e:  # noqa: BLE001
            print(f"  [{tag}] memory_analysis failed: {e!r}")

    report("lazy")
    orig = qfused.lazy_up_supported
    qfused.lazy_up_supported = lambda *a, **k: False
    try:
        report("mat")
    finally:
        qfused.lazy_up_supported = orig


if __name__ == "__main__":
    main()
