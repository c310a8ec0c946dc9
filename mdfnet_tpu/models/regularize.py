"""3D U-Net cost-volume regularisers.

Behavioural twins of reference net/unit/regular.py:9-133, on channels-last
(B, D, H, W, G) volumes. Stage 0 uses the 3-scale net (in=32ch), stages 1-2
the 4-scale nets (in=16/8ch). Both end in a bias-free 3x3x3 conv to a single
channel followed by a softmax over the depth axis, producing (B, D, H, W).

The softmax is computed in f32 even when conv compute runs in bf16 — the
probability volume feeds the distribution-fitting stage, which is precision
sensitive (SURVEY.md §7 hard part 4).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.models.layers import ConvBNReLU3D, ConvND, TrConvBNReLU3D, _torch_conv_init


class ProbConv(nn.Module):
    """Final 3x3x3 conv to a single channel, emitted as 27 shifted
    channel-contractions producing (B, D, H, W) directly.

    A conv3d with C_out=1 forces a (B,D,H,W,1) tensor whose 1-wide channel
    axis lands on the 128-lane dim (128x physical padding — measured 34 ms on
    its own at DTU eval size). Contracting the channel axis per tap keeps the
    output layout compact. Parameters stay conv-shaped ((3,3,3,C,1), path
    <stage>/prob/kernel) so reference checkpoints import unchanged.
    """
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        kernel = self.param("kernel", _torch_conv_init(c * 27), (3, 3, 3, c, 1))
        dtype = self.dtype or x.dtype
        xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        k = kernel.astype(dtype)
        out = jnp.zeros((b, d, h, w), jnp.float32)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    tap = jax.lax.dynamic_slice(
                        xp, (0, dz, dy, dx, 0), (b, d, h, w, c))
                    out = out + jnp.einsum(
                        "bdhwc,c->bdhw", tap, k[dz, dy, dx, :, 0],
                        preferred_element_type=jnp.float32)
        return out


class RegularNet3Scales(nn.Module):
    """Stage-0 regulariser. Twin of reference net/unit/regular.py:9-69.

    H and W must be divisible by 4 (two stride-2 levels)."""
    inner_chs: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0, c1, c2 = self.inner_chs, self.inner_chs * 2, self.inner_chs * 4
        _, d, h, w, _ = x.shape
        assert h % 4 == 0 and w % 4 == 0, f"volume H,W must divide 4, got {x.shape}"

        x = ConvBNReLU3D(c0, 3, 1, 1, dtype=self.dtype, name="conv01_0")(x, train)
        x = ConvBNReLU3D(c0, 3, 1, 1, dtype=self.dtype, name="conv01_1")(x, train)

        x1 = ConvBNReLU3D(c1, 3, 2, 1, dtype=self.dtype, name="conv12_0")(x, train)
        x1 = ConvBNReLU3D(c1, 3, 1, 1, dtype=self.dtype, name="conv12_1")(x1, train)
        x1 = ConvBNReLU3D(c1, 3, 1, 1, dtype=self.dtype, name="conv12_2")(x1, train)

        y = ConvBNReLU3D(c2, 3, 2, 1, dtype=self.dtype, name="conv232_0")(x1, train)
        y = ConvBNReLU3D(c2, 3, 1, 1, dtype=self.dtype, name="conv232_1")(y, train)
        y = ConvBNReLU3D(c2, 3, 1, 1, dtype=self.dtype, name="conv232_2")(y, train)
        y = TrConvBNReLU3D(c1, 3, 2, 1, 1, dtype=self.dtype, name="conv232_3")(y, train)
        x1 = x1 + y

        x = x + TrConvBNReLU3D(c0, 3, 2, 1, 1, dtype=self.dtype, name="conv10")(x1, train)

        x = ProbConv(dtype=self.dtype, name="prob")(x)
        return nn.softmax(x, axis=1)


class RegularNet4Scales(nn.Module):
    """Stage-1/2 regulariser. Twin of reference net/unit/regular.py:72-133.

    H and W must be divisible by 8 (three stride-2 levels)."""
    base_chs: int = 8
    sample_stride: Tuple[int, int, int] = (2, 2, 2)
    sample_padding: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0, c1, c2, c3 = (self.base_chs, self.base_chs * 2,
                          self.base_chs * 4, self.base_chs * 8)
        _, d, h, w, _ = x.shape
        assert h % 8 == 0 and w % 8 == 0, f"volume H,W must divide 8, got {x.shape}"
        ss, sp = self.sample_stride, self.sample_padding

        x1 = ConvBNReLU3D(c0, 3, 1, 1, dtype=self.dtype, name="conv01")(x, train)

        x2 = ConvBNReLU3D(c1, 3, ss, 1, dtype=self.dtype, name="conv12_0")(x1, train)
        x2 = ConvBNReLU3D(c1, 3, 1, 1, dtype=self.dtype, name="conv12_1")(x2, train)

        x3 = ConvBNReLU3D(c2, 3, ss, 1, dtype=self.dtype, name="conv23_0")(x2, train)
        x3 = ConvBNReLU3D(c2, 3, 1, 1, dtype=self.dtype, name="conv23_1")(x3, train)

        y = ConvBNReLU3D(c3, 3, ss, 1, dtype=self.dtype, name="conv343_0")(x3, train)
        y = ConvBNReLU3D(c3, 3, 1, 1, dtype=self.dtype, name="conv343_1")(y, train)
        y = TrConvBNReLU3D(c2, 3, ss, 1, sp, dtype=self.dtype, name="conv343_2")(y, train)
        x3 = x3 + y

        x2 = x2 + TrConvBNReLU3D(c1, 3, ss, 1, sp, dtype=self.dtype, name="trconv32")(x3, train)
        x1 = x1 + TrConvBNReLU3D(c0, 3, ss, 1, sp, dtype=self.dtype, name="trconv21")(x2, train)

        x = ProbConv(dtype=self.dtype, name="prob")(x1)
        return nn.softmax(x, axis=1)
