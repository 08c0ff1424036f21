"""Core network building blocks, channels-last and MXU-friendly.

Design notes (TPU-first, not a port):
  * All tensors are (N, D, H, W, C) channels-last.
  * Every conv in the E2ENet family has a (1,3,3) kernel
    (unetpp_d.py:286-287 forces this), so 3D convs are lowered to batched 2D
    convs: fold D into the batch dim and run a (3,3) conv — the layout XLA
    tiles best onto the MXU. A depth stride is a slice before the fold.
  * Transposed convs always have kernel == stride (unetpp_d.py:521-522), so
    they are a single matmul Cin -> (sd*sh*sw*Cout) followed by a
    depth-to-space reshape — pure MXU work, no scatter.
  * InstanceNorm statistics are computed in float32 regardless of the
    compute dtype (mirrors torch autocast keeping norms in fp32).

Reference parity: ConvDropoutNormNonlin (unetpp_d.py:61-111),
StackedConvLayers (unetpp_d.py:122-185), transpconv construction
(unetpp_d.py:521-522), maxpool down links (unetpp_d.py:524).
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .shift import (compact_groups, depth_shift, depth_shift_custom,
                    group_shifts, group_shifts_for_range)

LRELU_SLOPE = 1e-2
INSTNORM_EPS = 1e-5


def he_normal_leaky(slope: float = LRELU_SLOPE):
    """Kaiming-normal init, fan_in, leaky_relu gain — parity with
    torch.nn.init.kaiming_normal_(w, a=1e-2) used by InitWeights_He
    (unetpp_d.py:28-36)."""
    gain2 = 2.0 / (1.0 + slope ** 2)

    def init(key, shape, dtype=jnp.float32):
        # shape (..., in, out): fan_in = prod(spatial) * in
        fan_in = int(np.prod(shape[:-1]))
        std = np.sqrt(gain2 / fan_in)
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)
    return init


def instance_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                  eps: float = INSTNORM_EPS) -> jnp.ndarray:
    """Per-(sample, channel) normalization over D,H,W; statistics in
    float32 via one fused sum/sumsq pass (E[x^2]-E[x]^2), the affine apply
    folded to a single fma. For bf16 inputs the fma runs in bf16 with f32
    scalars (~20% faster, within 1-2 bf16 ulp); f32 inputs keep a fully-f32
    apply for the golden parity path."""
    dtype = x.dtype
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    if dtype == jnp.bfloat16:
        n = float(np.prod([x.shape[a] for a in axes]))
        s1 = jnp.sum(xf, axis=axes, keepdims=True)
        s2 = jnp.sum(xf * xf, axis=axes, keepdims=True)
        mean = s1 / n
        var = s2 / n - mean * mean
        mult = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
        off = bias.astype(jnp.float32) - mean * mult
        return x * mult.astype(dtype) + off.astype(dtype)
    # f32 path: two-pass variance (exact; the golden parity path)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def leaky_relu(x, slope: float = LRELU_SLOPE):
    return jnp.where(x >= 0, x, x * slope)


def batch_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = INSTNORM_EPS) -> jnp.ndarray:
    """Batch-statistics normalization over (N, D, H, W) per channel —
    the BN of the reference's architectural variants
    (nnUNet_variants/architectural_variants/nnUNetTrainerV2_BN.py; always
    batch stats here: the jitted functional trainer keeps no running
    averages, matching torch BN in training mode)."""
    dtype = x.dtype
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 8,
               eps: float = INSTNORM_EPS) -> jnp.ndarray:
    """GroupNorm(num_groups=8) — parity with MyGroupNorm of the GN
    variants (architectural_variants, norm_op_kwargs num_groups=8)."""
    dtype = x.dtype
    N = x.shape[0]
    C = x.shape[-1]
    g = num_groups if C % num_groups == 0 else 1
    xf = x.astype(jnp.float32).reshape(N, -1, g, C // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def frn(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
        eps: float = 1e-6) -> jnp.ndarray:
    """Filter Response Normalization (reference
    custom_modules/feature_response_norm.py semantics): x / sqrt(nu2+eps)
    with nu2 = mean(x^2) over spatial dims, then affine. Pair with the
    'tlu' nonlin."""
    dtype = x.dtype
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    nu2 = jnp.mean(xf * xf, axis=axes, keepdims=True)
    y = xf * jax.lax.rsqrt(nu2 + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def mish(x):
    """x * tanh(softplus(x)) (reference custom_modules/mish.py)."""
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


NORM_OPS = {"instance": instance_norm, "batch": batch_norm,
            "group": group_norm, "frn": frn,
            "none": lambda x, scale, bias: x}

NONLINS = {"lrelu": leaky_relu, "relu": jax.nn.relu,
           "gelu": jax.nn.gelu, "mish": mish, "none": lambda x: x,
           # nnUNetTrainerV2_LReLU_slope_2en1 (architectural_variants)
           "lrelu2e1": lambda x: leaky_relu(x, 0.2)}


def _precision_for(dtype):
    # this XLA build computes f32 convs/dots at reduced precision by default;
    # force exact f32 when the compute dtype is f32 (golden tests, eval)
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


NO_FLIPS = (False, False, False)


def conv3d_one_flat(x: jnp.ndarray, kernel: jnp.ndarray,
                    bias: Optional[jnp.ndarray],
                    stride: Tuple[int, int, int], flat_axis: int,
                    compute_dtype=jnp.bfloat16,
                    flips: Tuple[bool, bool, bool] = NO_FLIPS) -> jnp.ndarray:
    """3D conv whose kernel is 1 along `flat_axis` (0=D,1=H,2=W): permute
    that axis into the batch-fold position and run the 2D path. Covers the
    313/331 ablation kernels (unetpp_d_313.py:286, unetpp_d_331.py:286).

    flips: per TRUE spatial axis (d, h, w) — compute the MIRRORED-equivalent
    conv: conv(x, flips=c) == flip_c(conv(flip_c(x))) exactly. Mirrored
    kernel + swapped strided-axis padding (see conv3d_as_2d). The substrate
    of flip-free mirror TTA (the reference flips data per pass,
    neural_network.py:529-563; we mirror the operator instead)."""
    if flat_axis == 0:
        return conv3d_as_2d(x, kernel, bias, stride, compute_dtype, flips)
    # move flat axis to position 1 (the D slot of conv3d_as_2d)
    perm = {1: (0, 2, 1, 3, 4), 2: (0, 3, 1, 2, 4)}[flat_axis]
    inv = {1: (0, 2, 1, 3, 4), 2: (0, 2, 3, 1, 4)}[flat_axis]
    strides = {1: (stride[1], stride[0], stride[2]),
               2: (stride[2], stride[0], stride[1])}[flat_axis]
    fl = {1: (flips[1], flips[0], flips[2]),
          2: (flips[2], flips[0], flips[1])}[flat_axis]
    y = conv3d_as_2d(jnp.transpose(x, perm), kernel, bias, strides,
                     compute_dtype, fl)
    return jnp.transpose(y, inv)


def conv3d_full(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray],
                stride: Tuple[int, int, int],
                compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Direct 3D conv, channels-last NDHWC, SAME-style padding (k//2 per
    side). Serves kernels with NO size-1 axis — the allConv3x3 ablation
    (nnUNetTrainerV2_allConv3x3.py:44-46 sets every kernel to 3) and the
    residual-encoder UNet (generic_modular_residual_UNet.py). XLA tiles
    3D convs onto the MXU directly; the batched-2D lowering only wins when
    one axis is flat."""
    kd, kh, kw = kernel.shape[0], kernel.shape[1], kernel.shape[2]
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), kernel.astype(compute_dtype),
        window_strides=tuple(stride),
        padding=((kd // 2, kd // 2), (kh // 2, kh // 2),
                 (kw // 2, kw // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=compute_dtype,
        precision=_precision_for(compute_dtype),
    )
    if bias is not None:
        y = y + bias.astype(compute_dtype)
    return y


def conv3d_as_2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
                 stride: Tuple[int, int, int],
                 compute_dtype=jnp.bfloat16,
                 flips: Tuple[bool, bool, bool] = NO_FLIPS) -> jnp.ndarray:
    """(1,kh,kw) 3D conv as a batched 2D conv. kernel: (kh, kw, Cin, Cout).
    Depth stride is realized by slicing D before the fold (exactly what a
    kernel-size-1 strided conv computes).

    flips (fd, fh, fw): mirrored-equivalent conv. Per flipped spatial axis:
    mirror the kernel; a flipped STRIDE-s axis additionally re-anchors the
    window grid — padding (1,1) -> (2-s, s) for kernel 3 (derivation:
    p_lo' = k - 1 - (I - sJ + s - 1 + p_lo)), and the kernel-1 depth slice
    starts at sd-1 (flip maps the kept residues 0 mod s -> s-1 mod s)."""
    sd, sh, sw = stride
    fd, fh, fw = flips
    if sd > 1:
        x = x[:, sd - 1::sd] if fd else x[:, ::sd]
    N, D, H, W, C = x.shape
    kh, kw, cin, cout = kernel.shape
    if fh:
        kernel = kernel[::-1]
    if fw:
        kernel = kernel[:, ::-1]
    x2 = x.reshape(N * D, H, W, C).astype(compute_dtype)
    # flipped axis: pad (k//2, k//2) -> (k - s - k//2, k//2); stride 1 is
    # symmetric (unchanged), stride 2 re-anchors the window grid (kernel 3:
    # (0, 1); kernel 1: (-1, 0) — XLA accepts negative padding)
    pad_h = ((kh - sh - kh // 2, kh // 2) if fh
             else (kh // 2, kh // 2))
    pad_w = ((kw - sw - kw // 2, kw // 2) if fw
             else (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x2, kernel.astype(compute_dtype),
        window_strides=(sh, sw),
        padding=(pad_h, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
        precision=_precision_for(compute_dtype),
    )
    Ho, Wo = y.shape[1], y.shape[2]
    y = y.reshape(N, D, Ho, Wo, cout)
    if bias is not None:
        y = y + bias.astype(compute_dtype)
    return y


def flip_transp_kernel(kernel: jnp.ndarray,
                       flips: Tuple[bool, bool, bool]) -> jnp.ndarray:
    """Mirrored-equivalent transposed conv (kernel == stride): since
    y[s*j + r] = x[j] * k[r], the flipped operator is exactly the kernel
    with its spatial entries reversed per flipped axis (r <-> s-1-r) — no
    window re-anchoring (flip_c(tconv(flip_c(x))) == tconv_flipk(x))."""
    for ax, f in enumerate(flips):
        if f:
            kernel = jnp.flip(kernel, axis=ax)
    return kernel


def transp_conv_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                       stride: Tuple[int, int, int],
                       compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Transposed conv with kernel == stride as matmul + depth-to-space.
    kernel: (sd, sh, sw, Cin, Cout); x: (N, D, H, W, Cin);
    out: (N, D*sd, H*sh, W*sw, Cout)."""
    sd, sh, sw = stride
    N, D, H, W, C = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (sd, sh, sw), "transpconv requires kernel == stride"
    import os
    if os.environ.get("E2E_TRANSP_NATIVE") == "1":
        # A/B experiment: XLA-native lhs-dilated conv (no explicit d2s
        # transpose; XLA picks the layout)
        return jax.lax.conv_general_dilated(
            x.astype(compute_dtype),
            kernel[::-1, ::-1, ::-1].astype(compute_dtype),
            window_strides=(1, 1, 1), padding=[(sd - 1, sd - 1),
                                               (sh - 1, sh - 1),
                                               (sw - 1, sw - 1)],
            lhs_dilation=stride,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=compute_dtype,
            precision=_precision_for(compute_dtype))
    w2 = kernel.reshape(sd * sh * sw * 1, cin, cout)  # (S, Cin, Cout)
    w2 = jnp.transpose(w2, (1, 0, 2)).reshape(cin, sd * sh * sw * cout)
    y = jnp.dot(x.astype(compute_dtype), w2.astype(compute_dtype),
                preferred_element_type=compute_dtype,
                precision=_precision_for(compute_dtype))
    y = y.reshape(N, D, H, W, sd, sh, sw, cout)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(N, D * sd, H * sh, W * sw, cout)


def transp_conv_matmul_cf(x: jnp.ndarray, kernel: jnp.ndarray,
                          stride: Tuple[int, int, int], W: int, Wp: int,
                          compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """transp_conv_matmul emitting the padded channels-first flat layout
    (N, D, Cout, H*Wp) that the fused block kernels consume. The input is
    zero-padded to Wp/sw columns BEFORE the matmul (cheap, fuses with the
    producer), so the depth-to-space relayout lands directly in the final
    padded layout: ONE copy instead of transpose + pad (profile showed the
    separate pad costing an extra full-volume pass per up-link).
    x: channels-last (N, D1, H1, W1, Cin). Requires Wp % sw == 0."""
    sd, sh, sw = stride
    N, D1, H1, W1, C = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    assert (kd, kh, kw) == (sd, sh, sw), "transpconv requires kernel == stride"
    assert W == W1 * sw and Wp % sw == 0, (W, W1, sw, Wp)
    W1p = Wp // sw
    if W1p != W1:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, W1p - W1), (0, 0)))
    w2 = kernel.reshape(sd * sh * sw, cin, cout)
    w2 = jnp.transpose(w2, (1, 0, 2)).reshape(cin, sd * sh * sw * cout)
    y = jnp.dot(x.astype(compute_dtype), w2.astype(compute_dtype),
                preferred_element_type=compute_dtype,
                precision=_precision_for(compute_dtype))
    y = y.reshape(N, D1, H1, W1p, sd, sh, sw, cout)
    y = jnp.transpose(y, (0, 1, 4, 7, 2, 5, 3, 6))
    return y.reshape(N, D1 * sd, cout, (H1 * sh) * Wp)


def max_pool(x: jnp.ndarray, window: Tuple[int, int, int]) -> jnp.ndarray:
    """Max pool with window == stride (the nest down links, unetpp_d.py:524).

    Implemented as reshape + max over the window axes: fuses with producers
    (reduce_window does not) and differentiates to a cheap elementwise
    select — reduce_window's gradient lowers to SelectAndScatter, which is
    catastrophically slow on TPU."""
    wd, wh, ww = window
    N, D, H, W, C = x.shape
    if D % wd == 0 and H % wh == 0 and W % ww == 0:
        x = x.reshape(N, D // wd, wd, H // wh, wh, W // ww, ww, C)
        return jnp.max(x, axis=(2, 4, 6))
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, init, jax.lax.max,
        window_dimensions=(1, wd, wh, ww, 1),
        window_strides=(1, wd, wh, ww, 1),
        padding="VALID")


class ShiftConvBlock(nn.Module):
    """shift -> conv(1,3,3) -> InstanceNorm -> LeakyReLU.

    Parity: ConvDropoutNormNonlin (unetpp_d.py:61-111). Dropout p is 0 in the
    trainer (nnUNetTrainer_simple.py dropout_op_kwargs {'p': 0}) so it is
    omitted. The shift applies iff the conv kernel is (1,3,3)
    (unetpp_d.py:103-104) — signalled here by `do_shift`.
    """
    features: int
    kernel: Tuple[int, int, int] = (1, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    shift_size: int = 5
    do_shift: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    # architectural-variant knobs (reference nnUNet_variants/
    # architectural_variants: BN/GN/FRN norms, ReLU/Mish nonlins). The
    # Pallas fused path bakes instance+lrelu into the kernels, so models
    # gate fusion off for non-default values.
    norm_op: str = "instance"           # instance|batch|group|frn|none
    nonlin: str = "lrelu"               # lrelu|relu|gelu|mish|none
    # conv -> nonlin -> norm order (ConvDropoutNonlinNorm,
    # nnUNetTrainerV2_ReLU_convReLUIN / _lReLU_convlReLUIN). XLA path only
    # (the fused kernels bake the default order).
    nonlin_before_norm: bool = False

    fused: bool = False                 # run the Pallas fused-block kernel
    fused_hw: Optional[Tuple[int, int]] = None   # static (H, W) when fused
    fused_interpret: bool = False
    # quadrant (space-to-depth) fused kernel (ops/qfused.py): inputs are in
    # the level-below geometry with q-times the channels. fused_q = the
    # quadrant factors (qd, qh, qw); fused_hw is then (Hq, Wq).
    fused_q: Optional[Tuple[int, int, int]] = None
    # quadrant-native STRIDED transition (the encoder's convolutional
    # pooling out of the quadrant level, ops/qfused.py
    # quadrant_strided_shift_conv): (q, Hq, Wq, Wp_out). Input is the
    # normalized quadrant tensor (padding columns zero); output is the
    # pending (raw CF, stats) at the level-below geometry. Parameter
    # shapes/names match the unfused strided block exactly.
    fused_q_strided: Optional[Tuple[Tuple[int, int, int], int, int, int]] = \
        None
    # mirrored-equivalent block (flip-free TTA): block(x, flips=c) ==
    # flip_c(block(flip_c(x))) — mirrored conv kernels + re-anchored
    # strided windows + negated shift groups. Norms/nonlins are
    # flip-invariant; parameters are IDENTICAL across flip variants.
    flips: Tuple[bool, bool, bool] = NO_FLIPS
    # ---- DSFF row-sparse inference (models/sparse_plan.py). All STATIC.
    # sparse_in: per input part, the alive logical channel indices within
    # the part's FULL channel range (a row-structured DSFF mask kills
    # whole input channels; dead channels carry w == 0 so skipping them is
    # exact up to summation order). The conv then contracts over only the
    # alive K rows — a real MXU FLOP cut. sparse_in_full: the full channel
    # count per part (the parameter keeps its FULL checkpoint shape; alive
    # rows are gathered from it at trace time). sparse_compact[p]: the
    # part TENSOR was already emitted compact by its producer (chained
    # stack convs, pruned up-links) — only the kernel rows/groups follow
    # the alive indices then. sparse_out: emit only these output channels
    # (the chained consumer's alive input rows) — prunes kernel columns,
    # bias, and the returned norm scale/bias/stats.
    sparse_in: Optional[Tuple[Tuple[int, ...], ...]] = None
    sparse_in_full: Optional[Tuple[int, ...]] = None
    sparse_compact: Optional[Tuple[bool, ...]] = None
    sparse_out: Optional[Tuple[int, ...]] = None

    def _sparse_kernel_rows(self):
        """Global alive row indices over the full concat channel space +
        the compact-space shift groups."""
        full = self.sparse_in_full
        off = np.cumsum([0] + list(full))
        galive = np.concatenate([
            off[p] + np.asarray(a, np.int64)
            for p, a in enumerate(self.sparse_in)])
        cin_full = int(off[-1])
        groups_full = (group_shifts(cin_full, self.shift_size)
                       if self.do_shift else [(0, cin_full, 0)])
        return galive, compact_groups(groups_full, galive)

    @nn.compact
    def __call__(self, x):
        """x: a tensor, OR a list of tensors representing an implicit
        channel concatenation. In the list case the concat is never
        materialized: conv(shift(cat(parts))) == sum_i conv(shift_i(part_i))
        with each part's shift-group boundaries inherited from the full
        concat — avoids shifting the wide tensor (the dominant cost of the
        nest blocks, see PERF_NOTES.md).

        fused=True runs the Pallas fused-block kernel (ops/fused_block.py):
        x is then (parts, affines) with parts in padded channels-first
        flat layout, affines the per-part pending instance-norm(+lrelu)
        params; returns (raw_conv_out, stats, norm_scale, norm_bias) — the
        normalization is NOT applied; consumers apply it on load. Parameter
        shapes/names are identical in both modes (checkpoint interop)."""
        if self.fused and self.fused_q_strided is not None:
            from .qfused import (quadrant_apply_norm_lrelu, quadrant_colmask,
                                 quadrant_strided_shift_conv)
            from .qstride import (QSStatic, qstrided_supported,
                                  quadrant_strided_fused)
            (x0,), (aff,) = x
            q, Hq, Wq, wp_out = self.fused_q_strided
            assert self.kernel == (1, 3, 3)
            assert self.norm_op == "instance" and self.nonlin == "lrelu"
            Q = int(np.prod(q))
            cin = int(x0.shape[2]) // Q
            kernel = self.param("kernel", he_normal_leaky(),
                                (3, 3, cin, self.features))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            scale = self.param("norm_scale", nn.initializers.ones,
                               (self.features,))
            nbias = self.param("norm_bias", nn.initializers.zeros,
                               (self.features,))
            wqp = int(x0.shape[3]) // Hq
            import os
            use_kernel = (aff is not None
                          and os.environ.get("QSTRIDED_KERNEL", "1") == "1"
                          and qstrided_supported(q, cin, self.features,
                                                 Hq, Wq, wqp, wp_out))
            if use_kernel:
                static = QSStatic(tuple(q), cin, self.features,
                                  int(x0.shape[1]), Hq, Wq, wqp,
                                  self.shift_size, self.do_shift,
                                  self.fused_interpret,
                                  tuple(self.flips))
                y, stats = quadrant_strided_fused(
                    x0, aff[0], aff[1], kernel, bias, static)
            else:
                xqn = (x0 if aff is None else quadrant_apply_norm_lrelu(
                    x0, aff[0], aff[1], quadrant_colmask(Hq, Wq, wqp)))
                y, stats = quadrant_strided_shift_conv(
                    xqn, kernel, bias, q, Hq, Wq, wp_out,
                    shift_size=self.shift_size, do_shift=self.do_shift,
                    compute_dtype=self.compute_dtype,
                    flips=tuple(self.flips))
            return y, stats, scale, nbias

        if self.fused:
            parts, affines = x
            H, W = self.fused_hw
            assert self.kernel == (1, 3, 3) and self.stride == (1, 1, 1)
            assert self.norm_op == "instance" and self.nonlin == "lrelu", \
                "fused kernels bake instance-norm + lrelu"
            from .qfused import LazyUp
            if self.fused_q is not None:
                Q = int(np.prod(self.fused_q))
                cin = sum(int(p.kernel.shape[-1])
                          if isinstance(p, LazyUp)
                          else int(p.shape[2]) // Q for p in parts)
            else:
                cin = sum(int(p.shape[2]) for p in parts)
            if self.sparse_in is not None:
                # parameter keeps the FULL checkpoint shape; rows of
                # pre-compact parts are already gathered by the producer
                cin = sum(self.sparse_in_full)
            kernel = self.param("kernel", he_normal_leaky(),
                                (3, 3, cin, self.features))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            scale = self.param("norm_scale", nn.initializers.ones,
                               (self.features,))
            nbias = self.param("norm_bias", nn.initializers.zeros,
                               (self.features,))
            g_override = None
            if self.sparse_in is not None:
                galive, g_override = self._sparse_kernel_rows()
                kernel = jnp.take(kernel, jnp.asarray(galive), axis=-2)
                compact = self.sparse_compact or (False,) * len(parts)
                new_parts, new_affines = [], []
                for p, part in enumerate(parts):
                    alive = np.asarray(self.sparse_in[p], np.int32)
                    aff = affines[p]
                    ident = (len(alive) == self.sparse_in_full[p]
                             and np.array_equal(alive,
                                                np.arange(len(alive))))
                    if isinstance(part, LazyUp):
                        # prune the up-link GEMM's output columns: the
                        # consumer only reads these rows — the dead
                        # channels are never computed at all
                        if len(alive) < int(part.kernel.shape[-1]):
                            part = LazyUp(part.raw, part.mult, part.off,
                                          jnp.take(part.kernel,
                                                   jnp.asarray(alive),
                                                   axis=-1))
                    elif not compact[p] and not ident:
                        if self.fused_q is not None:
                            from .qfused import take_channels_quadrant
                            part = take_channels_quadrant(part, alive, Q)
                        else:
                            part = jnp.take(part, jnp.asarray(alive),
                                            axis=2)
                        if aff is not None:
                            aff = (jnp.take(aff[0], jnp.asarray(alive),
                                            axis=-1),
                                   jnp.take(aff[1], jnp.asarray(alive),
                                            axis=-1))
                    new_parts.append(part)
                    new_affines.append(aff)
                parts, affines = new_parts, new_affines
            if self.sparse_out is not None:
                oa = jnp.asarray(np.asarray(self.sparse_out, np.int32))
                kernel = jnp.take(kernel, oa, axis=-1)
                bias = jnp.take(bias, oa)
                scale = jnp.take(scale, oa)
                nbias = jnp.take(nbias, oa)
            if self.fused_q is not None:
                from .qfused import quadrant_fused_block
                y, stats = quadrant_fused_block(
                    parts, kernel.astype(self.compute_dtype),
                    bias.astype(self.compute_dtype), affines,
                    self.fused_q, H, W,
                    shift_size=self.shift_size, do_shift=self.do_shift,
                    interpret=self.fused_interpret,
                    flips=tuple(self.flips),
                    groups_override=g_override)
            else:
                from .fused_block import fused_shift_conv_block
                y, stats = fused_shift_conv_block(
                    parts, kernel.astype(self.compute_dtype),
                    bias.astype(self.compute_dtype), affines, H, W,
                    shift_size=self.shift_size, do_shift=self.do_shift,
                    interpret=self.fused_interpret,
                    flips=tuple(self.flips),
                    groups_override=g_override)
            return y, stats, scale, nbias

        kd, kh, kw = self.kernel
        flat_axes = [i for i, k in enumerate(self.kernel) if k == 1]
        if not flat_axes:
            # full 3D kernel (allConv3x3 ablation / residual-encoder UNet):
            # direct NDHWC conv, no depth shift (torch_shift is (1,3,3)-
            # only in the reference), mirrored operators unsupported (the
            # TTA predictor flips data for these models)
            assert not any(self.flips), "3D kernels use data-flip TTA"
            parts = x if isinstance(x, (list, tuple)) else [x]
            cin3 = sum(int(p.shape[-1]) for p in parts)
            kernel = self.param("kernel", he_normal_leaky(),
                                (kd, kh, kw, cin3, self.features))
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            scale = self.param("norm_scale", nn.initializers.ones,
                               (self.features,))
            nbias = self.param("norm_bias", nn.initializers.zeros,
                               (self.features,))
            y = None
            off = 0
            for part in parts:
                pc = int(part.shape[-1])
                ksl = jax.lax.slice_in_dim(kernel, off, off + pc, axis=-2)
                contrib = conv3d_full(part, ksl,
                                      bias if y is None else None,
                                      self.stride, self.compute_dtype)
                y = contrib if y is None else y + contrib
                off += pc
            if self.nonlin_before_norm:
                return NORM_OPS[self.norm_op](NONLINS[self.nonlin](y),
                                              scale, nbias)
            y = NORM_OPS[self.norm_op](y, scale, nbias)
            if self.norm_op == "frn":
                tau = self.param("frn_tau", nn.initializers.zeros,
                                 (self.features,))
                return jnp.maximum(y, tau.astype(y.dtype))
            return NONLINS[self.nonlin](y)
        flat_axis = flat_axes[0]
        spatial = tuple(k for k in self.kernel if k != 1) or (1, 1)
        if len(spatial) == 1:
            spatial = (spatial[0], 1)
        parts = x if isinstance(x, (list, tuple)) else [x]
        cin = sum(int(p.shape[-1]) for p in parts)
        if self.sparse_in is not None:
            cin = sum(self.sparse_in_full)
        kernel = self.param("kernel", he_normal_leaky(),
                            (*spatial, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = self.param("norm_scale", nn.initializers.ones,
                           (self.features,))
        nbias = self.param("norm_bias", nn.initializers.zeros,
                           (self.features,))
        shifting = self.do_shift and self.kernel == (1, 3, 3)

        if self.sparse_in is not None:
            # DSFF row-sparse: gather alive channels (exact — dead rows
            # carry w == 0), keep each channel's ORIGINAL shift group
            galive, cgroups = self._sparse_kernel_rows()
            kernel = jnp.take(kernel, jnp.asarray(galive), axis=-2)
            compact = self.sparse_compact or (False,) * len(parts)

            def gather_cl(i, p):
                alive = np.asarray(self.sparse_in[i], np.int32)
                if compact[i] or (len(alive) == self.sparse_in_full[i]
                                  and np.array_equal(
                                      alive, np.arange(len(alive)))):
                    return p
                return jnp.take(p, jnp.asarray(alive), axis=-1)

            parts = [gather_cl(i, p) for i, p in enumerate(parts)]
            part_lens = [len(a) for a in self.sparse_in]
        else:
            cgroups = (group_shifts(cin, self.shift_size) if shifting
                       else None)
            part_lens = [int(p.shape[-1]) for p in parts]
        if self.sparse_out is not None:
            oa = jnp.asarray(np.asarray(self.sparse_out, np.int32))
            kernel = jnp.take(kernel, oa, axis=-1)
            bias = jnp.take(bias, oa)
            scale = jnp.take(scale, oa)
            nbias = jnp.take(nbias, oa)

        def restrict(groups, lo, hi):
            return tuple((max(c0, lo) - lo, min(c1, hi) - lo, s)
                         for (c0, c1, s) in groups if c0 < hi and c1 > lo)

        fd = self.flips[0]
        if len(parts) == 1 and self.sparse_in is None:
            x = parts[0]
            import os as _os
            if (shifting and _os.environ.get("E2E_SHIFT_GROUPCONV") == "1"
                    and flat_axis is None):
                # A/B experiment: conv(shift(x)) = sum_g conv(pad-slice_g)
                # — the shift becomes per-group depth SLICES of one padded
                # tensor (fusible views), no materialized shifted copies.
                # Mirrored bodies (fd) negate the group shifts, exactly as
                # depth_shift_custom does.
                import jax.numpy as _jnp
                D = x.shape[1]
                pad = self.shift_size // 2
                pw = [(0, 0)] * x.ndim
                pw[1] = (pad, pad)
                xp = _jnp.pad(x, pw)
                y = None
                for (c0, c1, s) in group_shifts(cin, self.shift_size):
                    if fd:
                        s = -s
                    part = jax.lax.slice_in_dim(
                        xp, pad - s, pad - s + D, axis=1)[..., c0:c1]
                    ksl = jax.lax.slice_in_dim(kernel, c0, c1, axis=-2)
                    contrib = conv3d_one_flat(
                        part, ksl, bias if y is None else None,
                        self.stride, flat_axis, self.compute_dtype,
                        flips=self.flips)
                    y = contrib if y is None else y + contrib
            else:
                if shifting:
                    if fd:
                        neg = tuple((c0, c1, -s) for (c0, c1, s)
                                    in group_shifts(cin, self.shift_size))
                        x = depth_shift_custom(x, neg)
                    else:
                        x = depth_shift(x, self.shift_size)
                y = conv3d_one_flat(x, kernel, bias, self.stride,
                                    flat_axis, self.compute_dtype,
                                    flips=self.flips)
        else:
            y = None
            off = 0
            for i, part in enumerate(parts):
                pc = part_lens[i]
                if shifting:
                    groups = restrict(cgroups, off, off + pc)
                    if fd:
                        groups = tuple((c0, c1, -s)
                                       for (c0, c1, s) in groups)
                    part = depth_shift_custom(part, groups)
                ksl = jax.lax.slice_in_dim(kernel, off, off + pc, axis=-2)
                contrib = conv3d_one_flat(part, ksl,
                                          bias if y is None else None,
                                          self.stride, flat_axis,
                                          self.compute_dtype,
                                          flips=self.flips)
                y = contrib if y is None else y + contrib
                off += pc
        if self.nonlin_before_norm:
            # ConvDropoutNonlinNorm block order (generic_UNet.py): the
            # nonlinearity applies to the raw conv output, the norm is last
            return NORM_OPS[self.norm_op](NONLINS[self.nonlin](y), scale,
                                          nbias)
        y = NORM_OPS[self.norm_op](y, scale, nbias)
        if self.norm_op == "frn":
            # FRN pairs with the thresholded linear unit: max(y, tau)
            tau = self.param("frn_tau", nn.initializers.zeros,
                             (self.features,))
            return jnp.maximum(y, tau.astype(y.dtype))
        return NONLINS[self.nonlin](y)


class StackedConvBlocks(nn.Module):
    """num_convs ShiftConvBlocks; the stride only applies to the first
    (convolutional pooling). Parity: StackedConvLayers (unetpp_d.py:122-185).
    """
    features: int
    num_convs: int
    first_stride: Tuple[int, int, int] = (1, 1, 1)
    kernel: Tuple[int, int, int] = (1, 3, 3)
    shift_size: int = 5
    do_shift: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_op: str = "instance"
    nonlin: str = "lrelu"
    nonlin_before_norm: bool = False   # ConvDropoutNonlinNorm variants
    fused: bool = False
    fused_hw: Optional[Tuple[int, int]] = None
    fused_interpret: bool = False
    fused_q: Optional[Tuple[int, int, int]] = None
    # quadrant-native strided transition: block0 leaves the quadrant level
    # via quadrant_strided_shift_conv (see ShiftConvBlock.fused_q_strided);
    # the remaining blocks run the plain fused CF path at the level-below
    # geometry (fused_hw). x is then ([normalized quadrant tensor], [None]).
    q_transition: Optional[Tuple[Tuple[int, int, int], int, int, int]] = None
    flips: Tuple[bool, bool, bool] = NO_FLIPS   # mirrored-equivalent stack
    # ---- DSFF row-sparse inference (see ShiftConvBlock). sparse_in/
    # sparse_in_full/sparse_compact describe block0's input parts.
    # sparse_chain[i] (i = 1..num_convs-1) is block i's alive input rows
    # over the stack features: block i-1 then EMITS only those output
    # channels (out-column prune) and block i contracts only those rows —
    # the intra-stack chain never computes a dead channel. sparse_out
    # prunes the LAST block's outputs (set by the model when a _final
    # stack follows with its own row mask).
    sparse_in: Optional[Tuple[Tuple[int, ...], ...]] = None
    sparse_in_full: Optional[Tuple[int, ...]] = None
    sparse_compact: Optional[Tuple[bool, ...]] = None
    sparse_chain: Optional[Tuple[Optional[Tuple[int, ...]], ...]] = None
    sparse_out: Optional[Tuple[int, ...]] = None

    def _block_sparse(self, i):
        """(sparse_in, sparse_in_full, sparse_compact, sparse_out) of
        block i under the chain semantics above."""
        chain = self.sparse_chain or (None,) * self.num_convs
        if i == 0:
            sin, sfull, scomp = (self.sparse_in, self.sparse_in_full,
                                 self.sparse_compact)
        elif chain[i] is not None:
            # producer emitted exactly these channels — tensor compact
            sin = (tuple(chain[i]),)
            sfull = (self.features,)
            scomp = (True,)
        else:
            sin = sfull = scomp = None
        nxt = (chain[i + 1] if i + 1 < self.num_convs else None)
        sout = (tuple(nxt) if nxt is not None
                else (self.sparse_out if i == self.num_convs - 1 else None))
        return sin, sfull, scomp, sout

    @nn.compact
    def __call__(self, x):
        """x may be a list (implicit concat) — only the first conv sees it.

        fused=True: x is (parts, affines); every conv must be stride 1
        (convolutional pooling stays on the XLA path — or, with
        q_transition, block0 IS the convolutional pooling computed
        natively on the quadrant tensor). Blocks are chained through their
        instance-norm STATISTICS: block i's norm + lrelu is applied on
        load by block i+1 (ops/fused_block.py). Returns the final block's
        (raw, stats, norm_scale, norm_bias) pending normalization.
        fused_q: quadrant layout (ops/qfused.py)."""
        if self.fused:
            from .fused_block import norm_affine_from_stats
            from .qfused import quadrant_norm_affine
            parts, affines = x
            H, W = self.fused_hw
            assert self.first_stride == (1, 1, 1) \
                or self.q_transition is not None
            D = int(parts[0].shape[1])
            Q = (int(np.prod(self.fused_q))
                 if self.fused_q is not None else 1)
            n_vox = D * H * W * Q       # logical voxel count per channel
            out = None
            for i in range(self.num_convs):
                if out is not None:
                    raw, stats, scale, nbias = out
                    if self.fused_q is not None:
                        mult, off = quadrant_norm_affine(stats, Q, n_vox,
                                                         scale, nbias)
                    else:
                        mult, off = norm_affine_from_stats(stats, n_vox,
                                                           scale, nbias)
                    parts, affines = [raw], [(mult, off)]
                sin, sfull, scomp, sout = self._block_sparse(i)
                out = ShiftConvBlock(
                    features=self.features, kernel=self.kernel,
                    shift_size=self.shift_size, do_shift=self.do_shift,
                    compute_dtype=self.compute_dtype, fused=True,
                    fused_hw=self.fused_hw, fused_q=self.fused_q,
                    fused_q_strided=(self.q_transition if i == 0 else None),
                    fused_interpret=self.fused_interpret,
                    flips=self.flips,
                    sparse_in=sin, sparse_in_full=sfull,
                    sparse_compact=scomp, sparse_out=sout,
                    name=f"block{i}")((parts, affines))
            return out

        for i in range(self.num_convs):
            sin, sfull, scomp, sout = self._block_sparse(i)
            x = ShiftConvBlock(
                features=self.features, kernel=self.kernel,
                stride=self.first_stride if i == 0 else (1, 1, 1),
                shift_size=self.shift_size, do_shift=self.do_shift,
                compute_dtype=self.compute_dtype,
                norm_op=self.norm_op, nonlin=self.nonlin,
                nonlin_before_norm=self.nonlin_before_norm,
                flips=self.flips,
                sparse_in=sin, sparse_in_full=sfull,
                sparse_compact=scomp, sparse_out=sout,
                name=f"block{i}")(x)
        return x


class TranspConv(nn.Module):
    """Transposed conv, kernel == stride, no bias (unetpp_d.py:521-522).
    cf_out=(H, W, Wp): emit the padded channels-first flat layout for the
    fused block kernels instead of channels-last.
    q_out=Wqp: emit the QUADRANT layout (ops/qfused.py) — since kernel ==
    stride == the quadrant factors, the matmul's output columns ARE the
    quadrant blocks: no depth-to-space relayout at all."""
    features: int
    stride: Tuple[int, int, int]
    compute_dtype: jnp.dtype = jnp.bfloat16
    cf_out: Optional[Tuple[int, int, int]] = None
    q_out: Optional[int] = None          # Wqp of the quadrant layout
    # with q_out: (Hq, Wq) of the input level — the input may then be a
    # PENDING (raw_cf, mult, off) triple consumed without materializing
    # the normalized channels-last tensor (qfused.transp_conv_quadrant_
    # from_cf). Requires the pending's Wp == q_out.
    q_in_hw: Optional[Tuple[int, int]] = None
    flips: Tuple[bool, bool, bool] = NO_FLIPS   # mirrored-equivalent op
    interpret: bool = False          # Pallas interpret mode (CPU tests)
    # lazy: with a pending input, do NOT materialize the up-link — return
    # a qfused.LazyUp for the consuming quadrant kernel to compute on DMA
    # arrival (the (N,Dq,Q*C,L) tensor never hits HBM). The consumer
    # falls back to the materialized route when unsupported.
    lazy: bool = False
    # ---- DSFF row-sparse inference: sparse_in = this up-link's alive
    # input rows over the below node's FULL channel range (K cut of the
    # GEMM; rows not in the up mask may be included — their kernel rows
    # are zero, see models/unetpp.py emit-union compaction — so this is
    # exact). sparse_in_compact: the below producer already emitted
    # EXACTLY the sparse_in rows (in that order) — gather only the kernel
    # rows, never the volume tensor. sparse_out = the consumer's alive
    # rows within the up part (output-column cut: dead up channels are
    # never computed). The consumer must then treat the up part as compact.
    sparse_in: Optional[Tuple[int, ...]] = None
    sparse_in_compact: bool = False
    sparse_in_full: Optional[int] = None   # full cin when input is compact
    sparse_out: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x):
        pending_in = isinstance(x, (tuple, list)) and len(x) == 3
        sd, sh, sw = self.stride
        if self.sparse_in is not None and self.sparse_in_compact:
            # the volume tensor holds exactly the sparse_in rows; the
            # parameter keeps its FULL checkpoint shape
            assert self.sparse_in_full is not None
            cin = self.sparse_in_full
        else:
            cin = int(x[0].shape[2]) if pending_in else x.shape[-1]
        kernel = self.param("kernel", he_normal_leaky(),
                            (sd, sh, sw, cin, self.features))
        if self.sparse_in is not None:
            ia = jnp.asarray(np.asarray(self.sparse_in, np.int32))
            kernel = jnp.take(kernel, ia, axis=-2)
            if self.sparse_in_compact:
                pass            # tensor already compact in sparse_in order
            elif pending_in:
                raw, mult, off = x
                x = (jnp.take(raw, ia, axis=2),
                     jnp.take(mult, ia, axis=-1),
                     jnp.take(off, ia, axis=-1))
            else:
                x = jnp.take(x, ia, axis=-1)
        if self.sparse_out is not None:
            kernel = jnp.take(
                kernel, jnp.asarray(np.asarray(self.sparse_out, np.int32)),
                axis=-1)
        if any(self.flips):
            kernel = flip_transp_kernel(kernel, self.flips)
        if pending_in:
            assert self.q_out is not None and self.q_in_hw is not None
            from .qfused import LazyUp, transp_conv_quadrant_from_cf
            raw, mult, off = x
            if self.lazy:
                # kernel stays f32: casts happen inside the consumers
                # (fwd w2t -> bf16; bwd twin) so the param GRADIENT keeps
                # the param dtype
                return LazyUp(raw, mult.astype(jnp.float32),
                              off.astype(jnp.float32), kernel)
            return transp_conv_quadrant_from_cf(
                raw, mult, off, kernel, self.stride, self.q_in_hw[0],
                self.q_in_hw[1], self.compute_dtype,
                interpret=self.interpret)
        if self.q_out is not None:
            from .qfused import transp_conv_quadrant
            return transp_conv_quadrant(x, kernel, self.stride, self.q_out,
                                        self.compute_dtype)
        if self.cf_out is not None:
            H, W, Wp = self.cf_out
            return transp_conv_matmul_cf(x, kernel, self.stride, W, Wp,
                                         self.compute_dtype)
        return transp_conv_matmul(x, kernel, self.stride, self.compute_dtype)


def _seghead_block_einsum(xb, w, compute_dtype):
    """Per-Q-block 1x1 head einsum with f32 logits. For non-f32 compute
    dtypes the input cotangent is computed in the COMPUTE dtype (gy cast
    to bf16 before the transpose dot): default XLA AD follows the f32
    logits dtype and emits a full-width f32 (N, Dq, Q, C, L) cotangent —
    at Heart train geometry a 990 MB tensor whose layout copy + f32
    consumer fusions cost ~6 ms/step (PERF_NOTES round-11). The weight
    gradient keeps f32 accumulation. f32 models use plain AD so the
    calibrated f32 golden-parity programs are unchanged."""
    precision = _precision_for(compute_dtype)
    if jnp.dtype(compute_dtype) == jnp.float32:
        return jnp.einsum("ndqcl,ck->ndqkl", xb, w,
                          preferred_element_type=jnp.float32,
                          precision=precision)

    @jax.custom_vjp
    def f(xb, w):
        return jnp.einsum("ndqcl,ck->ndqkl", xb, w,
                          preferred_element_type=jnp.float32,
                          precision=precision)

    def fwd(xb, w):
        return f(xb, w), (xb, w)

    def bwd(res, gy):
        xb, w = res
        gyc = gy.astype(compute_dtype)
        gx = jnp.einsum("ndqkl,ck->ndqcl", gyc, w,
                        preferred_element_type=jnp.float32,
                        precision=precision).astype(xb.dtype)
        gw = jnp.einsum("ndqcl,ndqkl->ck", xb, gyc,
                        preferred_element_type=jnp.float32,
                        precision=precision).astype(w.dtype)
        return gx, gw

    f.defvjp(fwd, bwd)
    return f(xb, w)


class SegHead(nn.Module):
    """1x1x1 conv, no bias (seg_output_use_bias=False, unetpp_d.py:394-401;
    use_bias=True is the nnUNetTrainerV2_ReLU_biasInSegOutput /
    _lReLU_biasInSegOutput architectural variants).
    Output logits in float32.
    quadrant=(q, Hq, Wq): input is quadrant channels-first (N, Dq, Q*C, L);
    the 1x1 conv runs per block and only the (num_classes)-channel logits
    are de-quadrantized to channels-last — 16x less relayout traffic than
    materializing the feature tensor."""
    num_classes: int
    compute_dtype: jnp.dtype = jnp.bfloat16
    quadrant: Optional[Tuple[Tuple[int, int, int], int, int]] = None
    # emit_quadrant: return the logits in quadrant CF form (N, Dq, Q*K, L)
    # instead of de-quadrantizing — the sliding-window predictor then runs
    # TTA unflip + softmax in quadrant space (ops/qfused.quadrant_flip)
    emit_quadrant: bool = False
    # emit_probs_dtype: with emit_quadrant + a pending input, fuse the
    # class SOFTMAX into the head and return quadrant PROBS in this dtype
    # (bf16) instead of f32 logits — one Pallas pass (qlink.
    # seghead_probs_quadrant) replaces the norm materializer + einsum +
    # separate softmax (~94 ms/volume of seg glue at bench geometry,
    # round-12 profile). Callers (sliding flip-free TTA) detect the
    # non-f32 dtype and skip their own softmax. None = exact f32 logits.
    emit_probs_dtype: Optional[jnp.dtype] = None
    interpret: bool = False          # Pallas interpret mode (CPU tests)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        if self.quadrant is not None:
            from .qfused import from_quadrant_cf
            q, Hq, Wq = self.quadrant
            Q = int(np.prod(q))
            pending_in = isinstance(x, (tuple, list)) and len(x) == 3
            N, Dq, QC, L = (x[0] if pending_in else x).shape
            cin = QC // Q
            kernel = self.param("kernel", he_normal_leaky(),
                                (cin, self.num_classes))

            def block_1x1(xq, w):
                xb = xq.reshape(N, Dq, Q, cin, L).astype(self.compute_dtype)
                y = _seghead_block_einsum(xb, w.astype(self.compute_dtype),
                                          self.compute_dtype)
                return y.reshape(N, Dq, Q * self.num_classes, L)

            if pending_in and self.emit_probs_dtype is not None:
                # fused norm + 1x1 + softmax -> bf16 probs (see attr
                # comment). The logits-only kernel stays a negative
                # result (round-9); this one removes the boundary the
                # logits version broke.
                assert self.emit_quadrant and not self.use_bias
                from .qfused import quadrant_apply_norm_lrelu
                from .qlink import (seghead_probs_quadrant,
                                    seghead_probs_supported)
                raw, mult, off = x

                def xla_twin(raw, mult, off, w):
                    z = block_1x1(
                        quadrant_apply_norm_lrelu(raw, mult, off), w)
                    z = z.astype(jnp.float32).reshape(
                        N, Dq, Q, self.num_classes, L)
                    z = jax.nn.softmax(z, axis=3)
                    return z.reshape(N, Dq, Q * self.num_classes,
                                     L).astype(self.emit_probs_dtype)

                if (raw.dtype == jnp.bfloat16 and not self.interpret
                        and seghead_probs_supported(
                            Q, cin, self.num_classes, L, raw.dtype)):
                    return seghead_probs_quadrant(
                        raw, mult, off, kernel, Q, xla_twin,
                        out_dtype=self.emit_probs_dtype)
                return xla_twin(raw, mult, off, kernel)
            if pending_in:
                # pending raw + affine, materialized into the einsum in
                # one XLA graph. A Pallas seghead kernel (qlink.
                # seghead_quadrant) was measured a NET LOSS here: its f32
                # output layout broke the downstream softmax-accumulate
                # fusion (softmax-add 19.7 -> 101 ms/volume — PERF_NOTES
                # round-9 negative result); keep the XLA form.
                from .qfused import quadrant_apply_norm_lrelu
                raw, mult, off = x
                y = block_1x1(
                    quadrant_apply_norm_lrelu(raw, mult, off), kernel)
            else:
                y = block_1x1(x, kernel)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.num_classes,))
                y = y + jnp.tile(b.astype(y.dtype),
                                 (Q,))[None, None, :, None]
            if self.emit_quadrant:
                return y.astype(jnp.float32)
            return from_quadrant_cf(y, q, Hq, Wq,
                                    self.num_classes).astype(jnp.float32)
        cin = x.shape[-1]
        kernel = self.param("kernel", he_normal_leaky(), (cin, self.num_classes))
        y = jnp.dot(x.astype(self.compute_dtype),
                    kernel.astype(self.compute_dtype),
                    preferred_element_type=jnp.float32,
                    precision=_precision_for(self.compute_dtype))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.num_classes,)).astype(y.dtype)
        return y.astype(jnp.float32)
