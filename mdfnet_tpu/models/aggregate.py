"""Group-wise vector cost aggregation over source views.

Behavioural twin of reference net/unit/homoaggregate.py:8-46 (VectorAggregate):
features are turned into per-group "unit vectors" by a softmax over the
channels within each group; ref and each warped src volume are correlated by
an inner product per group; a tiny learned 1x1x1 Conv3d+BN+ReLU+Conv3d+sigmoid
stack produces a per-src visibility weight used for a weighted average.

TPU-first differences from the reference:
- volumes are (B, D, H, W, G) channels-last;
- src views are accumulated in a streaming sum (memory O(1) in V), like the
  reference's python loop, but expressed so XLA can pipeline warps;
- the ref softmax volume is computed once on (B, H, W, G, C/G) and broadcast
  over D instead of materialising the repeated (B, C, D, H, W) ref volume.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mdfnet_tpu.models.layers import BatchNorm, ConvND
from mdfnet_tpu.ops.warp import homography_warp
from mdfnet_tpu.ops.warp_dense import homography_warp_dense
from mdfnet_tpu.ops.pallas.warp_kernel import homography_warp_pallas


class DepthWeight(nn.Module):
    """sigmoid(Conv3d(G->1,1) -> BN -> ReLU -> Conv3d(1->1,1)) visibility net.

    Twin of reference net/unit/homoaggregate.py:16-20. 1x1x1 convs on
    channels-last volumes are plain matmuls on the MXU.
    """
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, volume, train: bool = False):
        w = ConvND(1, (1, 1, 1), use_bias=False, dtype=self.dtype, name="conv0")(volume)
        w = BatchNorm(name="bn0")(w, train)
        w = nn.relu(w)
        w = ConvND(1, (1, 1, 1), use_bias=True, dtype=self.dtype, name="conv1")(w)
        return nn.sigmoid(w)


class VectorAggregate(nn.Module):
    ngroups: int = 8
    dtype: jnp.dtype | None = None
    # "pallas": fused window-DMA tent-kernel warp kernel (fastest TPU path);
    # "dense":  gather-free tent-kernel matmul warp in plain XLA;
    # "gather": guaranteed-exact windowed-gather warp.
    # pallas/dense are exact for MVS-style cameras (see ops/warp_dense.py).
    warp_impl: str = "dense"

    @nn.compact
    def __call__(self, features, ref_proj, src_projs, depth_hypos, train: bool = False):
        """
        Args:
            features: list of (B, H, W, C) per-view features, ref first.
            ref_proj: (B, 4, 4); src_projs: (B, V-1, 4, 4).
            depth_hypos: (B, D, H, W) or (B, D, 1, 1).
        Returns:
            (B, D, H, W, G) aggregated cost volume.
        """
        ref_feat, src_feats = features[0], features[1:]
        b, h, w, c = ref_feat.shape
        g = self.ngroups
        cg = c // g

        weight_net = DepthWeight(dtype=self.dtype, name="depth_weight")
        warp = {"dense": homography_warp_dense,
                "pallas": homography_warp_pallas,
                "gather": homography_warp}[self.warp_impl]

        if cg == 2:
            # Pair fast path (the reference config has C/G == 2 at every
            # stage): softmax([a, b]) == [sigma(a-b), sigma(b-a)], so the
            # group-softmax + inner product collapses to
            #   sim_g = p*q + (1-p)(1-q),  p = sigma(wa-wb), q = sigma(ra-rb).
            # Warping is linear, so warp(even) - warp(odd) == warp(even-odd):
            # only the G difference channels are warped — half the DMA and
            # compute of warping all C channels, bit-identical result
            # (out-of-image zeros give sigma(0)=0.5 == softmax([0,0])[0]).
            q = nn.sigmoid(ref_feat[..., 0::2] - ref_feat[..., 1::2])
            q = q[:, None]  # (B, 1, H, W, G)
        else:
            ref_unit = _softmax_groups(ref_feat, g, cg)[:, None]

        volume_sum = 0.0
        weight_sum = 0.0
        for v in range(len(src_feats)):
            if cg == 2:
                diff = src_feats[v][..., 0::2] - src_feats[v][..., 1::2]
                p = nn.sigmoid(warp(diff, src_projs[:, v], ref_proj,
                                    depth_hypos))  # (B, D, H, W, G)
                sim = p * q + (1.0 - p) * (1.0 - q)
            else:
                warped = warp(src_feats[v], src_projs[:, v], ref_proj,
                              depth_hypos)  # (B, D, H, W, C)
                soft = _softmax_groups(warped, g, cg)
                sim = jnp.sum(soft * ref_unit, axis=-1)
            wgt = weight_net(sim, train)  # (B, D, H, W, 1)
            weight_sum = weight_sum + wgt
            volume_sum = volume_sum + wgt * sim

        return volume_sum / weight_sum


def _softmax_groups(x: jnp.ndarray, groups: int, group_ch: int) -> jnp.ndarray:
    """Softmax over the channels within each group (last axis split G x C/G)."""
    shape = x.shape[:-1] + (groups, group_ch)
    return nn.softmax(x.reshape(shape), axis=-1)
