"""Residual-encoder U-Net (the reference's FabiansUNet: "Residual
Encoder, Plain conv decoder").

Parity: generic_modular_residual_UNet.py — ResidualUNetEncoder (:28-110:
initial conv-norm-nonlin, then one ResidualLayer per stage whose first
block carries the stage stride), BasicResidualBlock
(custom_modules/conv_blocks.py:86-145: conv-norm-lrelu-conv-norm + a
1x1-conv+norm skip when stride/width changes, lrelu after the add);
decoder = generic_modular_UNet.PlainConvUNetDecoder (:184-260: transpconv
-> concat skip -> plain ConvDropoutNormReLU stack, 1x1 bias-free seg
heads, full-res first); FabiansUNet (:305-337:
default_blocks_per_stage_encoder (1,2,3,4,4,...), decoder all 1).
Used by the nnUNetTrainerV2_ResencUNet[_DA3[_BN]] trainer variants
(nnUNet_variants/architectural_variants/nnUNetTrainerV2_ResencUNet.py).

TPU-first: channels-last NDHWC, direct XLA 3D convs (ops/blocks.conv3d_full
— these are plain 3^3 kernels, no shift machinery), transposed convs as the
matmul + depth-to-space form (ops/blocks.TranspConv), norm/nonlin from the
shared registries. Deep supervision integrates with the standard trainer
(heads at every decoder stage, full-res first; the resolution of head i is
cumprod(pools[:i]) so models/unetpp.deep_supervision_scales applies as-is).
"""
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.blocks import (NONLINS, NORM_OPS, SegHead, StackedConvBlocks,
                          TranspConv, conv3d_full, he_normal_leaky)
from .unetpp import encoder_channels

DEFAULT_BLOCKS_ENCODER = (1, 2, 3, 4, 4, 4, 4, 4, 4, 4, 4)
DEFAULT_BLOCKS_DECODER = (1, 1, 1, 1, 1, 1, 1, 1, 1, 1)


class ResidualBlock(nn.Module):
    """BasicResidualBlock (conv_blocks.py:86-145)."""
    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    compute_dtype: Any = jnp.bfloat16
    norm_op: str = "instance"
    nonlin: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        cin = int(x.shape[-1])
        kd, kh, kw = self.kernel
        w1 = self.param("conv1", he_normal_leaky(),
                        (kd, kh, kw, cin, self.features))
        b1 = self.param("bias1", nn.initializers.zeros, (self.features,))
        s1 = self.param("scale1", nn.initializers.ones, (self.features,))
        n1 = self.param("nbias1", nn.initializers.zeros, (self.features,))
        w2 = self.param("conv2", he_normal_leaky(),
                        (kd, kh, kw, self.features, self.features))
        b2 = self.param("bias2", nn.initializers.zeros, (self.features,))
        s2 = self.param("scale2", nn.initializers.ones, (self.features,))
        n2 = self.param("nbias2", nn.initializers.zeros, (self.features,))

        out = conv3d_full(x, w1, b1, self.stride, self.compute_dtype)
        out = NONLINS[self.nonlin](NORM_OPS[self.norm_op](out, s1, n1))
        out = NORM_OPS[self.norm_op](
            conv3d_full(out, w2, b2, (1, 1, 1), self.compute_dtype), s2, n2)

        if any(s != 1 for s in self.stride) or cin != self.features:
            # downsample_skip: 1x1 strided conv (bias-free) + norm
            wd = self.param("skip_conv", he_normal_leaky(),
                            (1, 1, 1, cin, self.features))
            sd = self.param("skip_scale", nn.initializers.ones,
                            (self.features,))
            nd = self.param("skip_nbias", nn.initializers.zeros,
                            (self.features,))
            residual = NORM_OPS[self.norm_op](
                conv3d_full(x, wd, None, self.stride, self.compute_dtype),
                sd, nd)
        else:
            residual = x
        return NONLINS[self.nonlin](out + residual)


class ResidualLayer(nn.Module):
    """num_blocks ResidualBlocks; the stride rides on the first
    (conv_blocks.py:214-227)."""
    features: int
    num_blocks: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    first_stride: Tuple[int, int, int] = (1, 1, 1)
    compute_dtype: Any = jnp.bfloat16
    norm_op: str = "instance"
    nonlin: str = "lrelu"

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = ResidualBlock(
                features=self.features, kernel=self.kernel,
                stride=self.first_stride if i == 0 else (1, 1, 1),
                compute_dtype=self.compute_dtype, norm_op=self.norm_op,
                nonlin=self.nonlin, name=f"block{i}")(x)
        return x


class ResidualUNet(nn.Module):
    """FabiansUNet, channels-last. pool_op_kernel_sizes are the strides
    BETWEEN resolution levels (nnUNet plans convention); the encoder has
    num_pool+1 stages (stage 0 stride 1)."""
    input_channels: int
    num_classes: int
    pool_op_kernel_sizes: Tuple[Tuple[int, int, int], ...]
    base_num_features: int = 24
    max_num_features: int = 320
    conv_kernel: Tuple[int, int, int] = (3, 3, 3)
    blocks_per_stage_encoder: Tuple[int, ...] = ()
    blocks_per_stage_decoder: Tuple[int, ...] = ()
    compute_dtype: Any = jnp.bfloat16
    norm_op: str = "instance"
    nonlin: str = "lrelu"
    seg_bias: bool = False
    remat: bool = True     # accepted for trainer interop (XLA path only)
    do_shift: bool = False          # interop no-ops
    flips: Tuple[bool, bool, bool] = (False, False, False)

    @property
    def num_pool(self) -> int:
        return len(self.pool_op_kernel_sizes)

    @property
    def input_shape_must_be_divisible_by(self) -> np.ndarray:
        return np.prod(np.array(self.pool_op_kernel_sizes), 0)

    def num_ds_outputs(self) -> int:
        return min(4, self.num_pool)

    @nn.compact
    def __call__(self, x, do_ds: bool = True):
        assert not any(self.flips), "ResidualUNet uses data-flip TTA"
        P = self.num_pool
        pools = [tuple(int(i) for i in p)
                 for p in self.pool_op_kernel_sizes]
        enc = encoder_channels(self.base_num_features, P,
                               self.max_num_features)
        be = (tuple(self.blocks_per_stage_encoder)
              or DEFAULT_BLOCKS_ENCODER[:P + 1])
        bd = (tuple(self.blocks_per_stage_decoder)
              or DEFAULT_BLOCKS_DECODER[:P])
        cd = self.compute_dtype
        x = x.astype(cd)

        # initial conv-norm-nonlin (ResidualUNetEncoder :66-68)
        kd, kh, kw = self.conv_kernel
        w0 = self.param("initial_conv", he_normal_leaky(),
                        (kd, kh, kw, self.input_channels, enc[0]))
        b0 = self.param("initial_bias", nn.initializers.zeros, (enc[0],))
        s0 = self.param("initial_scale", nn.initializers.ones, (enc[0],))
        n0 = self.param("initial_nbias", nn.initializers.zeros, (enc[0],))
        h = NONLINS[self.nonlin](NORM_OPS[self.norm_op](
            conv3d_full(x, w0, b0, (1, 1, 1), cd), s0, n0))

        common = dict(kernel=self.conv_kernel, compute_dtype=cd,
                      norm_op=self.norm_op, nonlin=self.nonlin)
        skips = []
        for s in range(P + 1):
            feats = enc[min(s, P)]
            h = ResidualLayer(
                features=min(feats, self.max_num_features),
                num_blocks=be[s],
                first_stride=pools[s - 1] if s > 0 else (1, 1, 1),
                name=f"encoder{s}", **common)(h)
            skips.append(h)

        # plain-conv decoder: bottleneck up (PlainConvUNetDecoder :231-240)
        seg_outputs = []
        for i, s in enumerate(range(P - 1, -1, -1)):
            f_skip = int(skips[s].shape[-1])
            h = TranspConv(features=f_skip, stride=pools[s],
                           compute_dtype=cd, name=f"up{i}")(h)
            h = StackedConvBlocks(
                features=f_skip, num_convs=bd[i], kernel=self.conv_kernel,
                do_shift=False, compute_dtype=cd, norm_op=self.norm_op,
                nonlin=self.nonlin, name=f"decoder{i}")(
                    [h, skips[s]])
            seg_outputs.append(h)

        n_heads = self.num_ds_outputs()
        outputs = []
        for u in range(n_heads):
            # head u sits at level u (full-res first = last decoder stage)
            outputs.append(SegHead(num_classes=self.num_classes,
                                   compute_dtype=cd,
                                   use_bias=self.seg_bias,
                                   name=f"seg_head{u}")(
                seg_outputs[len(seg_outputs) - 1 - u]))
        if do_ds:
            return outputs
        return outputs[0]
