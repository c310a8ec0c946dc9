"""Multi-scale masked smooth-L1 depth loss.

Behavioural twin of reference net/loss.py:6-27: for each of the 4 output
scales, smooth-L1 (beta=1) between predicted and GT depth, averaged over the
pixels where GT > depth_min, summed across scales.

JAX difference: torch masks by boolean indexing (dynamic shape); here the mean
is computed as a masked weighted sum — identical value, static shapes.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def multi_scale_depth_loss(depths: Sequence[jnp.ndarray],
                           gt_pyramid: Dict[str, jnp.ndarray],
                           depth_range: jnp.ndarray,
                           axis_name: Optional[str] = None) -> jnp.ndarray:
    """
    Args:
        depths: predicted depths coarse-to-fine, [d_1/8, d_1/4, d_1/2, d_full].
        gt_pyramid: {"3": 1/8 GT, "2": 1/4, "1": 1/2, "0": full}, each (B,h,w).
        depth_range: (B, 2).
        axis_name: when called per-shard inside shard_map over a data-parallel
            mesh axis, the masked sums and counts are psum'd over that axis
            first, so every shard computes the exact GLOBAL-batch masked mean
            (pmean of per-shard means would mis-weight shards whose valid-
            pixel counts differ).
    Returns:
        scalar loss (globally identical on every shard when axis_name given).
    """
    dmin = depth_range[:, 0].reshape(-1, 1, 1)
    total = 0.0
    for depth, key in zip(depths, ("3", "2", "1", "0")):
        gt = gt_pyramid[key]
        mask = (gt > dmin).astype(jnp.float32)
        per_px = smooth_l1(depth.astype(jnp.float32), gt.astype(jnp.float32))
        s = jnp.sum(per_px * mask)
        c = jnp.sum(mask)
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            c = jax.lax.psum(c, axis_name)
        total = total + s / jnp.maximum(c, 1.0)
    return total
