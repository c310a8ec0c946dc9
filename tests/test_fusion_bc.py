"""Fusion B (consistency vote) and C (pcd visibility fusion) tests:
hand-crafted cases for the native cores, native-vs-numpy differential tests,
and synthetic-scene end-to-end sanity."""
import numpy as np
import pytest

import jax.numpy as jnp

from mdfnet_tpu.data.synthetic import make_plane_scene
from mdfnet_tpu.fusion import native
from mdfnet_tpu.fusion.consistency_vote import consistency_vote
from mdfnet_tpu.fusion.pcd_fusion import (
    averaged_depth, reproject_all, visibility_masks, zbuffer_fusion)


# ------------------------------------------------------------- native cores

def test_zbuffer_elect_handcrafted():
    # two candidates in one cell: nearer one has 1 violation (rank 0 < 1) so
    # the farther (rank 1 >= 1) wins; lone candidate in another cell wins
    depth = np.array([2.0, 5.0, 3.0], np.float32)
    xy = np.array([[0.5, 0.5], [0.5, 0.5], [1.5, 0.5]], np.float32)
    vio = np.array([1, 1, 0], np.int32)
    valid = np.ones((1, 2), bool)
    out = native.zbuffer_elect(depth, xy, vio, valid)
    assert out[0, 0] == 5.0
    assert out[0, 1] == 3.0

    # zero violations -> nearest wins
    vio0 = np.zeros(3, np.int32)
    out0 = native.zbuffer_elect(depth, xy, vio0, valid)
    assert out0[0, 0] == 2.0

    # last candidate wins when every rank < violation
    vio9 = np.array([9, 9, 9], np.int32)
    out9 = native.zbuffer_elect(depth, xy, vio9, valid)
    assert out9[0, 0] == 5.0


def test_zbuffer_elect_native_matches_numpy(rng):
    m, h, w = 500, 8, 11
    depth = (rng.rand(m) * 10).astype(np.float32)
    depth[rng.rand(m) < 0.1] = 0.0
    xy = np.stack([rng.rand(m) * (w + 1) - 0.5,
                   rng.rand(m) * (h + 1) - 0.5], 1).astype(np.float32)
    vio = rng.randint(0, 4, m).astype(np.int32)
    valid = rng.rand(h, w) > 0.2
    a = native.zbuffer_elect(depth, xy, vio, valid)
    lib, native._lib = native._lib, None
    failed, native._load_failed = native._load_failed, True
    try:
        b = native.zbuffer_elect(depth, xy, vio, valid)
    finally:
        native._lib, native._load_failed = lib, failed
    np.testing.assert_array_equal(a, b)


def test_segment_filter_handcrafted():
    depth = np.zeros((12, 12), np.float32)
    depth[1:9, 1:9] = 100.0      # big segment (64 px)
    depth[10, 10] = 200.0        # isolated pixel, depth-disconnected
    mask = native.segment_filter(depth, window=1, diff_thresh=1e-3,
                                 size_thresh=10)
    assert mask[1:9, 1:9].all()
    assert not mask[10, 10]
    assert not mask[0, 0]  # zero depth dropped


def test_segment_filter_native_matches_numpy(rng):
    depth = (600 + rng.randn(16, 16)).astype(np.float32)
    depth[rng.rand(16, 16) < 0.3] = 0.0
    a = native.segment_filter(depth, 2, 1e-3, 5)
    lib, native._lib = native._lib, None
    failed, native._load_failed = native._load_failed, True
    try:
        b = native.segment_filter(depth, 2, 1e-3, 5)
    finally:
        native._lib, native._load_failed = lib, failed
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------- fusion B

def test_consistency_vote_synthetic_plane():
    scene = make_plane_scene(height=48, width=64, nviews=5, plane_depth=600.0,
                             tilt=0.05)
    d = scene.depths
    pts, accept = consistency_vote(
        jnp.asarray(d[0]), jnp.asarray(scene.intrinsics[0]),
        jnp.asarray(scene.extrinsics[0]), jnp.asarray(d[1:]),
        jnp.asarray(scene.intrinsics[1:]), jnp.asarray(scene.extrinsics[1:]),
        disp_thresh=0.25, num_consistent=3)
    accept = np.asarray(accept).reshape(48, 64)
    assert accept[8:-8, 32:-8].mean() > 0.95

    # accepted points lie on the plane z = 600 + 0.05 * x (world frame)
    pts = np.asarray(pts).reshape(48, 64, 3)
    sel = accept[8:-8, 32:-8]
    p = pts[8:-8, 32:-8][sel]
    np.testing.assert_allclose(p[:, 2], 600.0 + 0.05 * p[:, 0], rtol=2e-3)

    # corrupted depth is rejected
    _, accept_bad = consistency_vote(
        jnp.asarray(d[0] + 40), jnp.asarray(scene.intrinsics[0]),
        jnp.asarray(scene.extrinsics[0]), jnp.asarray(d[1:]),
        jnp.asarray(scene.intrinsics[1:]), jnp.asarray(scene.extrinsics[1:]),
        disp_thresh=0.25, num_consistent=3)
    assert np.asarray(accept_bad).mean() < 0.05


# ---------------------------------------------------------------- fusion C

def test_pcd_reproject_and_vis_filter_synthetic():
    scene = make_plane_scene(height=48, width=64, nviews=4, plane_depth=600.0,
                             tilt=0.05)
    d = scene.depths
    xr, yr, dr, rng_m = reproject_all(
        jnp.asarray(d[0]), jnp.asarray(scene.intrinsics[0]),
        jnp.asarray(scene.extrinsics[0]), jnp.asarray(d[1:]),
        jnp.asarray(scene.intrinsics[1:]), jnp.asarray(scene.extrinsics[1:]))
    masks, mask = visibility_masks(jnp.asarray(d[0]), xr, yr, dr, rng_m,
                                   vthresh=4)
    mask = np.asarray(mask)
    assert mask[8:-8, 32:-8].mean() > 0.95

    ave = np.asarray(averaged_depth(jnp.asarray(d[0]), dr, masks))
    np.testing.assert_allclose(ave[8:-8, 32:-8], d[0][8:-8, 32:-8], rtol=2e-3)


def test_zbuffer_fusion_synthetic():
    scene = make_plane_scene(height=48, width=64, nviews=4, plane_depth=600.0)
    d = scene.depths
    fused = zbuffer_fusion(d[0], scene.intrinsics[0], scene.extrinsics[0],
                           d[1:], scene.intrinsics[1:], scene.extrinsics[1:])
    inner = fused[8:-8, 32:-8]
    got = inner[inner > 0]
    assert (inner > 0).mean() > 0.9
    np.testing.assert_allclose(got, 600.0, rtol=5e-3)


def test_voxel_downsample(rng):
    from mdfnet_tpu.fusion.pcd_fusion import voxel_downsample
    # two clusters of points, far apart: one output point per cluster
    a = np.full((50, 3), 10.25) + rng.randn(50, 3) * 0.01
    b = np.full((30, 3), -5.4) + rng.randn(30, 3) * 0.01
    xyz = np.concatenate([a, b]).astype(np.float32)
    rgb = np.concatenate([np.full((50, 3), 200), np.full((30, 3), 40)]
                         ).astype(np.uint8)
    out_xyz, out_rgb, _ = voxel_downsample(xyz, rgb, voxel=1.0)
    assert len(out_xyz) == 2
    np.testing.assert_allclose(sorted(out_xyz[:, 0]), [-5.4, 10.25], atol=0.05)
    assert set(out_rgb[:, 0]) == {200, 40}
