"""Fused depth-shift + (1,3,3) conv as a Pallas TPU kernel.

Motivation (measured on v5e, 128^3 x 48ch bf16): the XLA path materializes
the channel-grouped depth shift (pad + 5 slices + concat) at ~5 ms — more
than the 87-GFLOP conv itself (~2.8 ms). This kernel never materializes the
shifted tensor in HBM.

Design:
  * grid walks (N, D) sequentially; a rotating 5-slot VMEM buffer holds the
    depth rows x[d-2..d+2] (full channel width — Mosaic requires lane-dim
    slices to be 128-aligned, so channel-group DMA is not possible); each
    step DMAs ONE new row (input HBM traffic ~1x, like the unfused conv
    alone);
  * the shifted slice is assembled in VMEM by per-channel selects between
    the 5 rows (VPU) into a zero-haloed (H+2, W+2, C) scratch;
  * the 3x3 conv runs as 9 offset (H*W, C) @ (C, COUT) MXU matmuls with f32
    accumulation (+bias), written back as one (H, W, COUT) block.

Semantics identical to conv3d_as_2d(depth_shift(x, shift_size), k, b,
stride=(1,1,1)); that XLA pair stays as numerical oracle and as the
custom_vjp backward. The reference *wanted* this fusion — its CUDA `Shift`
kernel import is commented out (unetpp_d.py:23,92); this is the TPU answer.

STATUS: not yet wired into the default model path. Mosaic rejects manual
DMAs whose lane (channel) dim is not 128-aligned (C=48 here), and the
BlockSpec-alias variant compiles too slowly over this environment's remote
compile tunnel to iterate. The production path instead uses the select-based
depth_shift (ops/shift.py) which fuses into one XLA elementwise pass. This
kernel is kept for the next optimization round (the remaining win is ~2x on
the level-0 blocks).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shift import depth_shift, group_shifts

NSLOT = 5  # rotating depth-row slots (== shift window)


def _kernel(x_hbm, w_ref, b_ref, o_ref, rows, shifted, sems, *, groups,
            D, H, W, C, COUT):
    n = pl.program_id(0)
    d = pl.program_id(1)
    pad = 2  # shift window is [-2, 2] for shift_size 5; [-1, 1] pads fine

    def slot(src_d):
        return jax.lax.rem(src_d + 2 * NSLOT, NSLOT)

    def fetch(src_d):
        """DMA x[n, src_d] -> rows[slot] (zeros if out of range)."""
        s = slot(src_d)

        @pl.when((src_d >= 0) & (src_d < D))
        def _():
            cp = pltpu.make_async_copy(x_hbm.at[n, src_d],
                                       rows.at[s], sems.at[0])
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_not((src_d >= 0) & (src_d < D)))
        def _():
            rows[s] = jnp.zeros((H, W, C), rows.dtype)

    # first step per sample: zero the halo scratch and prefetch the window
    @pl.when(d == 0)
    def _():
        @pl.when(n == 0)
        def _():
            shifted[...] = jnp.zeros_like(shifted)
        for src in range(-pad, pad):      # -2..1; +2 fetched below
            fetch(jnp.int32(src))

    fetch(d + pad)

    # assemble the channel-grouped shifted slice: channel c in group g reads
    # depth row (d - s_g)
    ch = jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 2)
    out_val = jnp.zeros((H, W, C), rows.dtype)
    for (c0, c1, s) in groups:
        row = rows[slot(d - s)]
        out_val = jnp.where((ch >= c0) & (ch < c1), row, out_val)
    shifted[pl.ds(1, H), pl.ds(1, W), :] = out_val

    # 3x3 conv = 9 offset matmuls, f32 accumulation
    acc = jnp.zeros((H * W, COUT), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            xs = shifted[pl.ds(kh, H), pl.ds(kw, W), :].reshape(H * W, C)
            acc = acc + jnp.dot(xs, w_ref[kh, kw],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[0, 0] = acc.reshape(H, W, COUT).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_shift_conv(x, kernel, bias, shift_size: int = 5):
    """x: (N, D, H, W, C); kernel: (3, 3, C, COUT); bias: (COUT,).
    conv(depth_shift(x, shift_size)) + bias, stride 1, SAME padding."""
    return _forward(x, kernel, bias, shift_size)


def _forward(x, kernel, bias, shift_size):
    N, D, H, W, C = x.shape
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3) and cin == C
    assert shift_size // 2 <= 2, "window beyond +-2 needs a larger NSLOT ring"
    groups = tuple(group_shifts(C, shift_size))

    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, D=D, H=H, W=W, C=C,
                          COUT=cout),
        grid=(N, D),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),    # bias
        ],
        out_specs=pl.BlockSpec((1, 1, H, W, cout),
                               lambda n, d: (n, d, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D, H, W, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, H, W, C), x.dtype),        # depth-row ring
            pltpu.VMEM((H + 2, W + 2, C), x.dtype),       # haloed slice
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * D * H * W * 9 * C * cout,
            bytes_accessed=(N * D * H * W * (C + cout) * x.dtype.itemsize),
            transcendentals=0),
    )(x, kernel, bias)
    return out


def _reference(x, kernel, bias, shift_size):
    from .blocks import conv3d_as_2d
    return conv3d_as_2d(depth_shift(x, shift_size), kernel, bias, (1, 1, 1),
                        compute_dtype=x.dtype)


def _fwd(x, kernel, bias, shift_size):
    return _forward(x, kernel, bias, shift_size), (x, kernel, bias)


def _bwd(shift_size, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(lambda a, k, b: _reference(a, k, b, shift_size),
                     x, kernel, bias)
    return vjp(g)


fused_shift_conv.defvjp(_fwd, _bwd)


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def shift_conv_vmem_ok(H: int, W: int, C: int, cout: int,
                       itemsize: int = 2,
                       budget: int = 100 * 2 ** 20) -> bool:
    """VMEM feasibility of the fused kernel at this shape."""
    ring = NSLOT * H * W * C * itemsize
    shifted = (H + 2) * (W + 2) * C * itemsize
    out = H * W * cout * itemsize
    acc = H * W * cout * 4
    return ring + shifted + out + acc < budget
