"""Differentiable plane-sweep homography warping.

Behavioural twin of reference net/unit/base.py:85-126 (homo_warping), built
TPU-first: channels-last layout, one batched gather over the (D, H, W) sweep
instead of torch's grid_sample over a (D*H, W) grid, coordinates computed in
f32 regardless of feature dtype.

The reference's idiosyncratic sampling convention (align_corners=True
normalisation followed by align_corners=False sampling) is folded into
:func:`mdfnet_tpu.geometry.reference_grid_coords` — reproduced here exactly so
that imported reference checkpoints stay in parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mdfnet_tpu import geometry
from mdfnet_tpu.ops.sample import bilinear_sample_2d


def homography_warp(src_feat: jnp.ndarray, src_proj: jnp.ndarray,
                    ref_proj: jnp.ndarray, depth_hypos: jnp.ndarray) -> jnp.ndarray:
    """Warp src features onto ref plane-sweep hypotheses.

    Args:
        src_feat: (B, H, W, C) source-view features, channels-last.
        src_proj: (B, 4, 4) source projection (K@E composed, see geometry).
        ref_proj: (B, 4, 4) reference projection.
        depth_hypos: (B, D, H, W) or (B, D, 1, 1) depth hypotheses.
    Returns:
        (B, D, H, W, C) warped feature volume.
    """
    b, h, w, c = src_feat.shape
    d = depth_hypos.shape[1]

    coord_dtype = jnp.float32
    x_src, y_src = geometry.sweep_coordinates(
        src_proj.astype(coord_dtype), ref_proj.astype(coord_dtype),
        depth_hypos.astype(coord_dtype), h, w)  # (B, D, H*W)
    x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, h, w)
    x_eff = jax.lax.stop_gradient(x_eff)
    y_eff = jax.lax.stop_gradient(y_eff)

    warped = bilinear_sample_2d(src_feat, x_eff, y_eff)  # (B, D, H*W, C)
    return warped.reshape(b, d, h, w, c)
