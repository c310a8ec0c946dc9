"""FPN feature extractor over 4 scales.

Behavioural twin of reference net/unit/backbone.py:9-66 (FPN_4Scales), NHWC:
strided 5x5 downsampling stacks to 1/2, 1/4, 1/8, then a top-down path of
2x bilinear upsamples + 1x1 lateral adds, emitting
(y4: 1/8 x c3, y3: 1/4 x c2, y2: 1/2 x c1) — coarsest first, matching the
stage order of the cascade.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.models.layers import ConvBNReLU, ConvND
from mdfnet_tpu.ops.sample import resize_bilinear_2x


class FPN4Scales(nn.Module):
    out_chs: Tuple[int, int, int, int] = (8, 16, 32, 64)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0, c1, c2, c3 = self.out_chs

        # bottom-up
        x = ConvBNReLU(c0, 3, 1, dtype=self.dtype, name="conv01_0")(x, train)
        x = ConvBNReLU(c0, 3, 1, dtype=self.dtype, name="conv01_1")(x, train)
        x = ConvBNReLU(c1, 5, 2, dtype=self.dtype, name="conv12_0")(x, train)
        x = ConvBNReLU(c1, 3, 1, dtype=self.dtype, name="conv12_1")(x, train)
        x2 = ConvBNReLU(c1, 3, 1, dtype=self.dtype, name="conv12_2")(x, train)
        x = ConvBNReLU(c2, 5, 2, dtype=self.dtype, name="conv23_0")(x2, train)
        x = ConvBNReLU(c2, 3, 1, dtype=self.dtype, name="conv23_1")(x, train)
        x3 = ConvBNReLU(c2, 3, 1, dtype=self.dtype, name="conv23_2")(x, train)
        x = ConvBNReLU(c3, 5, 2, dtype=self.dtype, name="conv34_0")(x3, train)
        x = ConvBNReLU(c3, 3, 1, dtype=self.dtype, name="conv34_1")(x, train)
        x4 = ConvBNReLU(c3, 3, 1, dtype=self.dtype, name="conv34_2")(x, train)

        # top-down (bilinear 2x is a fixed stencil, see ops/sample.py)
        def up2(v):  # NHWC -> upsample H, W
            return resize_bilinear_2x(v.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)

        y4 = ConvND(c3, (1, 1), use_bias=False, dtype=self.dtype, name="out4")(x4)
        x3 = up2(x4) + ConvND(c3, (1, 1), use_bias=True, dtype=self.dtype, name="lat3")(x3)
        y3 = ConvND(c2, (1, 1), use_bias=False, dtype=self.dtype, name="out3")(x3)
        x2 = up2(x3) + ConvND(c3, (1, 1), use_bias=True, dtype=self.dtype, name="lat2")(x2)
        y2 = ConvND(c1, (1, 1), use_bias=False, dtype=self.dtype, name="out2")(x2)

        return y4, y3, y2
