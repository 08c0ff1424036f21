"""ShiftUNet — classic nnU-Net U-Net with restricted depth-shift convs.

Covers Tconv 'ori' (reference Generic_UNet, generic_UNet.py:218-483, which
also forces (1,3,3) kernels + depth shift with shift_size=3,
generic_UNet.py:77-95,278-280) and Tconv 'shiftConvPP_nodff' (unetpp_d_nodff
— UNet++ with the nest removed degenerates to this plain decoder,
unetpp_d_nodff.py:353-377).

Deep supervision: one head per decoder stage; returns num_pool outputs
ordered full-res first (generic_UNet forward tail).
"""
from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.blocks import SegHead, StackedConvBlocks, TranspConv
from .unetpp import encoder_channels, MAX_NUM_FILTERS_3D


class ShiftUNet(nn.Module):
    input_channels: int
    num_classes: int
    pool_op_kernel_sizes: Tuple[Tuple[int, int, int], ...]
    base_num_features: int = 48
    max_num_features: int = MAX_NUM_FILTERS_3D
    num_conv_per_stage: int = 2
    shift_size: int = 3
    do_shift: bool = True
    remat: bool = True
    compute_dtype: Any = jnp.bfloat16
    norm_op: str = "instance"           # architectural-variant knobs
    nonlin: str = "lrelu"
    nonlin_before_norm: bool = False
    seg_bias: bool = False
    # mirrored-equivalent model (flip-free mirror TTA; see
    # models/unetpp.ShiftUNetPlusPlus.flips)
    flips: Tuple[bool, bool, bool] = (False, False, False)

    @property
    def num_pool(self) -> int:
        return len(self.pool_op_kernel_sizes)

    @property
    def input_shape_must_be_divisible_by(self) -> np.ndarray:
        return np.prod(np.array(self.pool_op_kernel_sizes), 0)

    def num_ds_outputs(self) -> int:
        return self.num_pool

    def _check_divisible(self, x):
        div = self.input_shape_must_be_divisible_by
        spatial = x.shape[1:4]
        if any(int(s) % int(d) != 0 for s, d in zip(spatial, div)):
            raise ValueError(
                f"input spatial shape {tuple(spatial)} must be divisible by "
                f"{tuple(int(d) for d in div)} (pool kernels "
                f"{self.pool_op_kernel_sizes})")

    @nn.compact
    def __call__(self, x, do_ds: bool = True):
        self._check_divisible(x)
        P = self.num_pool
        pools = [tuple(p) for p in self.pool_op_kernel_sizes]
        enc = encoder_channels(self.base_num_features, P,
                               self.max_num_features)
        cd = self.compute_dtype
        x = x.astype(cd)
        common = dict(norm_op=self.norm_op, nonlin=self.nonlin,
                      nonlin_before_norm=self.nonlin_before_norm,
                      shift_size=self.shift_size, do_shift=self.do_shift,
                      compute_dtype=cd, flips=tuple(self.flips))
        Stack = (nn.remat(StackedConvBlocks, static_argnums=())
                 if self.remat else StackedConvBlocks)

        skips = []
        h = x
        for d in range(P):
            stride = pools[d - 1] if d > 0 else (1, 1, 1)
            h = Stack(features=enc[d],
                                  num_convs=self.num_conv_per_stage,
                                  first_stride=stride,
                                  name=f"context{d}", **common)(h)
            skips.append(h)
        h = Stack(features=enc[P],
                              num_convs=self.num_conv_per_stage - 1,
                              first_stride=pools[P - 1],
                              name=f"context{P}a", **common)(h)
        h = Stack(features=enc[P], num_convs=1,
                              name=f"context{P}b", **common)(h)

        seg_outputs = []
        for u, lvl in enumerate(reversed(range(P))):
            up = TranspConv(features=enc[lvl], stride=pools[lvl],
                            compute_dtype=cd, flips=tuple(self.flips),
                            name=f"up_{u}")(h)
            h = jnp.concatenate([up, skips[lvl]], axis=-1)
            h = Stack(features=enc[lvl],
                                  num_convs=self.num_conv_per_stage - 1,
                                  name=f"loc_{u}", **common)(h)
            h = Stack(features=enc[lvl], num_convs=1,
                                  name=f"loc_{u}_final", **common)(h)
            seg_outputs.append(SegHead(num_classes=self.num_classes,
                                       use_bias=self.seg_bias,
                                       compute_dtype=cd,
                                       name=f"seg_head{u}")(h))

        # full-res first, then decreasing resolution
        outputs = [seg_outputs[-1]] + seg_outputs[:-1][::-1]
        if do_ds:
            return outputs
        return outputs[0]
