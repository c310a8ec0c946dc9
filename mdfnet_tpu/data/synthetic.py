"""Synthetic multi-view scenes with analytic ground truth.

The reference has no test suite (SURVEY.md §4); golden-file tests against tiny
synthetic scenes are this framework's substitute. A textured fronto-parallel
(or tilted) plane at a known depth yields analytic GT depth and exactly
consistent multi-view geometry, so model plumbing, loss, fusion and metrics
can all be validated without DTU on disk.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SyntheticScene:
    imgs: np.ndarray        # (V, H, W, 3) float32 in [0,1]
    intrinsics: np.ndarray  # (V, 3, 3)
    extrinsics: np.ndarray  # (V, 4, 4) world->cam
    depth: np.ndarray       # (H, W) GT depth of view 0
    depth_range: np.ndarray  # (2,)
    depths: np.ndarray | None = None  # (V, H, W) GT depth of every view


def _texture(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Smooth, high-frequency RGB texture over plane coordinates."""
    r = 0.5 + 0.5 * np.sin(0.13 * u) * np.cos(0.07 * v)
    g = 0.5 + 0.5 * np.sin(0.05 * u + 1.7) * np.sin(0.11 * v + 0.3)
    b = 0.5 + 0.5 * np.cos(0.09 * u - 0.5) * np.cos(0.15 * v + 2.1)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def make_plane_scene(height: int = 128, width: int = 160, nviews: int = 3,
                     plane_depth: float = 600.0, tilt: float = 0.0,
                     depth_range=(425.0, 935.0), baseline: float = 12.0,
                     focal: float = 320.0) -> SyntheticScene:
    """Views of a textured plane z = plane_depth + tilt * x_world.

    Cameras share orientation (identity rotation) and are translated along x,
    so every pixel of every view observes the plane and the warp math is
    analytically checkable.
    """
    k = np.array([[focal, 0.0, width / 2.0],
                  [0.0, focal, height / 2.0],
                  [0.0, 0.0, 1.0]], dtype=np.float32)
    intrinsics = np.stack([k] * nviews)

    extrinsics = []
    for v in range(nviews):
        e = np.eye(4, dtype=np.float32)
        # camera v sits at world x = v * baseline: world->cam subtracts it
        e[0, 3] = -v * baseline
        extrinsics.append(e)
    extrinsics = np.stack(extrinsics)

    ys, xs = np.meshgrid(np.arange(height, dtype=np.float64),
                         np.arange(width, dtype=np.float64), indexing="ij")

    imgs = []
    depths = []
    for v in range(nviews):
        cx = v * baseline  # camera center world x
        # ray through pixel: world point = cam_origin + z * dir,
        # dir = K^-1 [x, y, 1]; plane: z = d0 + tilt * x_world
        dx = (xs - k[0, 2]) / k[0, 0]
        dy = (ys - k[1, 2]) / k[1, 1]
        # z = d0 + tilt * (cx + z*dx)  =>  z = (d0 + tilt*cx) / (1 - tilt*dx)
        z = (plane_depth + tilt * cx) / (1.0 - tilt * dx)
        xw = cx + z * dx
        yw = z * dy
        imgs.append(_texture(xw * 4.0, yw * 4.0))
        depths.append(z.astype(np.float32))

    depths = np.stack(depths)
    return SyntheticScene(
        imgs=np.stack(imgs),
        intrinsics=intrinsics.astype(np.float32),
        extrinsics=extrinsics.astype(np.float32),
        depth=depths[0],
        depth_range=np.array(depth_range, dtype=np.float32),
        depths=depths,
    )


def make_batch(scene: SyntheticScene, batch: int = 1) -> dict:
    """Package a scene as the model's input dict (channels-last, batched)."""
    def rep(x):
        return np.broadcast_to(x[None], (batch,) + x.shape).copy()

    h, w = scene.depth.shape
    gt = scene.depth
    pyramid = {
        "3": gt[::8, ::8].copy(),
        "2": gt[::4, ::4].copy(),
        "1": gt[::2, ::2].copy(),
        "0": gt,
    }
    return {
        "imgs": rep(scene.imgs),
        "intrinsics": rep(scene.intrinsics),
        "extrinsics": rep(scene.extrinsics),
        "depth_range": rep(scene.depth_range),
        "ref_depths": {k: rep(v) for k, v in pyramid.items()},
    }
