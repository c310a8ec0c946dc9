"""Depth refinement head: 1/2-res depth -> full-res via PixelShuffle.

Behavioural twin of reference net/unit/refine.py:8-46 (RefineNet2): detach the
input depth, normalise to [0, 1] by the scene depth range, run residual
blocks, PixelShuffle(2) upsample, denormalise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.models.layers import ConvND, Res, pixel_shuffle_2x


class RefineNet2(nn.Module):
    base_chs: int = 8
    nres: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, depth, depth_range, train: bool = False):
        """
        Args:
            depth: (B, H/2, W/2) half-res depth.
            depth_range: (B, 2).
        Returns:
            (B, H, W) refined full-res depth.
        """
        depth = jax.lax.stop_gradient(depth)[..., None]  # (B, H/2, W/2, 1)
        b = depth.shape[0]
        dmin = depth_range[:, 0].astype(depth.dtype).reshape(b, 1, 1, 1)
        dmax = depth_range[:, 1].astype(depth.dtype).reshape(b, 1, 1, 1)
        x = (depth - dmin) / (dmax - dmin)

        x = ConvND(self.base_chs, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                   name="conv0")(x)
        skip = x
        for i in range(self.nres):
            x = Res(self.base_chs, dtype=self.dtype, name=f"res{i}")(x)
        x = ConvND(self.base_chs, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        x = skip + x
        x = ConvND(self.base_chs * 4, (3, 3), 1, 1, use_bias=False, dtype=self.dtype,
                   name="conv2_0")(x)
        x = pixel_shuffle_2x(x)
        x = ConvND(1, (3, 3), 1, 1, use_bias=False, dtype=self.dtype, name="conv2_1")(x)

        x = dmin + x * (dmax - dmin)
        return x[..., 0]
