"""Variance-based cost aggregation — the reference's alternative aggregator.

Behavioural twin of reference net/unit/homoaggregate.py:49-69
(homo_aggregate_by_variance, present but unused in the shipped config): the
cost volume is the per-channel variance across {ref} U {warped srcs}, with a
softmax over D applied to each warped volume first. Kept as an extension
point of the pluggable aggregation stage (the classic MVSNet-style cost).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.ops.warp import homography_warp
from mdfnet_tpu.ops.warp_dense import homography_warp_dense
from mdfnet_tpu.ops.pallas.warp_kernel import homography_warp_pallas


class VarianceAggregate(nn.Module):
    """Parameter-free variance cost volume. Returns (B, D, H, W, C)."""
    ngroups: int = 0  # unused; kept for interface parity with VectorAggregate
    dtype: jnp.dtype | None = None
    warp_impl: str = "dense"

    @nn.compact
    def __call__(self, features, ref_proj, src_projs, depth_hypos,
                 train: bool = False):
        ref_feat, src_feats = features[0], features[1:]
        warp = {"dense": homography_warp_dense,
                "pallas": homography_warp_pallas,
                "gather": homography_warp}[self.warp_impl]

        ref_volume = ref_feat[:, None]  # (B, 1, H, W, C) broadcast over D
        vol_sum = ref_volume
        vol_sq_sum = ref_volume ** 2
        for v in range(len(src_feats)):
            warped = warp(src_feats[v], src_projs[:, v], ref_proj, depth_hypos)
            # the reference softmaxes dim=1 of (B, C, D, H, W) == channels
            warped = nn.softmax(warped, axis=-1)
            vol_sum = vol_sum + warped
            vol_sq_sum = vol_sq_sum + warped ** 2

        n = len(src_feats) + 1
        return vol_sq_sum / n - (vol_sum / n) ** 2
