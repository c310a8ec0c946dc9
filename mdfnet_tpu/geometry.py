"""Camera geometry shared by the model and the fusion backends.

Pure jnp functions, all batched, all jit-friendly (static shapes only).

The reference implementation duplicates this math in four places
(net/unit/base.py:85-126, net/unit/scale.py:4-20,
tools/filter/dynamic_filter_gpu.py:194-238, tools/pcd/utils/utils.py:140-171);
here it lives once and everything else composes it.

Conventions
-----------
- intrinsics  K: (..., 3, 3)
- extrinsics  E: (..., 4, 4) world -> camera
- pixel coordinates are (x, y) with x along width; integer coordinates land on
  pixel centers (the reference's convention throughout).
"""
from __future__ import annotations

import jax.numpy as jnp


def scale_intrinsics(intrinsics: jnp.ndarray, stage: int, num_stages: int = 4) -> jnp.ndarray:
    """Scale K for a pyramid stage. Stage s lives at resolution 1/2^(num_stages-1-s).

    Mirrors reference net/unit/scale.py:14-15 (rows 0..1 of K divided by
    2**(3-stage) for the 4-stage config).
    """
    level = num_stages - 1 - stage
    factor = 1.0 / (2.0 ** level)
    scale = jnp.array([factor, factor, 1.0], dtype=intrinsics.dtype).reshape(
        (1,) * (intrinsics.ndim - 2) + (3, 1)
    )
    return intrinsics * scale


def projection_matrices(intrinsics: jnp.ndarray, extrinsics: jnp.ndarray, stage: int,
                        num_stages: int = 4) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build per-view 4x4 projection matrices for a stage and split ref/src.

    P[:3, :4] = K_s @ E[:3, :4]; row 3 is E's row 3 ([0,0,0,1]).
    Behavioural twin of reference net/unit/scale.py:4-20.

    Args:
        intrinsics: (B, V, 3, 3)
        extrinsics: (B, V, 4, 4)
    Returns:
        ref_proj (B, 4, 4), src_projs (B, V-1, 4, 4)
    """
    k = scale_intrinsics(intrinsics, stage, num_stages)
    top = jnp.einsum("bvij,bvjk->bvik", k, extrinsics[..., :3, :4])
    proj = jnp.concatenate([top, extrinsics[..., 3:4, :4]], axis=-2)
    return proj[:, 0], proj[:, 1:]


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid (3, H*W): rows are x, y, 1 (x fastest-varying)."""
    y = jnp.arange(height, dtype=dtype)
    x = jnp.arange(width, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)  # (H, W) each
    ones = jnp.ones((height * width,), dtype=dtype)
    return jnp.stack([xx.reshape(-1), yy.reshape(-1), ones], axis=0)


def sweep_coordinates(src_proj: jnp.ndarray, ref_proj: jnp.ndarray,
                      depth_hypos: jnp.ndarray, height: int, width: int
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Plane-sweep: project each ref pixel at each depth hypothesis into src.

    Composes rel = src_proj @ ref_proj^{-1} and maps homogeneous ref pixels
    lifted to each hypothesised depth. Behavioural twin of the coordinate part
    of reference net/unit/base.py:85-119 (homo_warping).

    Args:
        src_proj: (B, 4, 4)
        ref_proj: (B, 4, 4)
        depth_hypos: (B, D, H, W) or (B, D, 1, 1) — broadcast over pixels.
        height, width: ref image extent (static).
    Returns:
        (x_src, y_src): each (B, D, H*W) unnormalised src pixel coordinates.
    """
    b, d = depth_hypos.shape[:2]
    rel = jnp.matmul(src_proj, jnp.linalg.inv(ref_proj))
    rot = rel[:, :3, :3]
    trans = rel[:, :3, 3]

    grid = pixel_grid(height, width, dtype=rot.dtype)  # (3, H*W)
    rot_xyz = jnp.einsum("bij,jn->bin", rot, grid)  # (B, 3, H*W)

    hypos = depth_hypos.reshape(b, d, -1)
    if hypos.shape[-1] == 1:
        hypos = jnp.broadcast_to(hypos, (b, d, height * width))
    # (B, 3, D, H*W)
    xyz = rot_xyz[:, :, None, :] * hypos[:, None, :, :] + trans[:, :, None, None]
    z = xyz[:, 2]
    x_src = xyz[:, 0] / z
    y_src = xyz[:, 1] / z
    return x_src, y_src


def reference_grid_coords(x_src: jnp.ndarray, y_src: jnp.ndarray,
                          height: int, width: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reproduce the reference's exact sampling-coordinate convention.

    The reference normalises projected coordinates with the align_corners=True
    formula (x/( (W-1)/2 ) - 1, net/unit/base.py:115-116) but then samples with
    torch-1.7 grid_sample's default align_corners=False
    (net/unit/base.py:122-123), whose inverse mapping is
    x_pix = ((gx + 1) * W - 1) / 2.  The composition is

        x_eff = x * W / (W - 1) - 0.5

    which this helper applies so our gather-based sampler can operate in plain
    pixel space while matching the reference bit-for-bit in float tolerance.
    """
    x_eff = x_src * (width / (width - 1.0)) - 0.5
    y_eff = y_src * (height / (height - 1.0)) - 0.5
    return x_eff, y_eff


def unproject(depth: jnp.ndarray, intrinsics: jnp.ndarray, extrinsics: jnp.ndarray
              ) -> jnp.ndarray:
    """Back-project a depth map to world-space points.

    Args:
        depth: (B, H, W)
        intrinsics: (B, 3, 3)
        extrinsics: (B, 4, 4) world->cam
    Returns:
        xyz_world: (B, 3, H*W)
    """
    b, h, w = depth.shape
    grid = pixel_grid(h, w, dtype=depth.dtype)  # (3, H*W)
    cam = jnp.einsum("bij,jn->bin", jnp.linalg.inv(intrinsics), grid)
    cam = cam * depth.reshape(b, 1, -1)
    cam_h = jnp.concatenate([cam, jnp.ones((b, 1, h * w), dtype=depth.dtype)], axis=1)
    world = jnp.einsum("bij,bjn->bin", jnp.linalg.inv(extrinsics), cam_h)
    return world[:, :3]


def project(xyz_world: jnp.ndarray, intrinsics: jnp.ndarray, extrinsics: jnp.ndarray
            ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project world-space points into a camera.

    Args:
        xyz_world: (B, 3, N)
        intrinsics: (B, 3, 3)
        extrinsics: (B, 4, 4)
    Returns:
        (x, y, z_cam): each (B, N); z_cam is the camera-frame depth.
    """
    b, _, n = xyz_world.shape
    ones = jnp.ones((b, 1, n), dtype=xyz_world.dtype)
    cam = jnp.einsum("bij,bjn->bin", extrinsics,
                     jnp.concatenate([xyz_world, ones], axis=1))[:, :3]
    pix = jnp.einsum("bij,bjn->bin", intrinsics, cam)
    z = cam[:, 2]
    return pix[:, 0] / pix[:, 2], pix[:, 1] / pix[:, 2], z
