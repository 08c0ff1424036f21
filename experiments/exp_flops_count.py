"""Count per-pass FLOPs and HBM bytes of the bench network (XLA path, CPU
compile only) for the PERF_NOTES roofline table.

The XLA (no_fused) path is used so XLA's cost analysis sees every dot/conv
(the Pallas kernels are opaque custom calls); the fused path computes the
same math, so the FLOP count transfers.

Run: python experiments/exp_flops_count.py
"""
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    patch = (128, 128, 128)
    num_classes = 16
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=num_classes,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48, compute_dtype=jnp.bfloat16,
        fused=False, quadrant=False)
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x0)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    fwd = jax.jit(lambda p, x: model.apply(p, x, do_ds=False))
    lowered = fwd.lower(params, x0)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    log(f"forward pass 128^3 x 48feat x 16cls:")
    log(f"  flops          = {flops/1e12:.3f} TFLOP")
    log(f"  bytes accessed = {bytes_/2**30:.1f} GiB (XLA estimate, "
        f"CPU layouts)")


if __name__ == "__main__":
    main()
