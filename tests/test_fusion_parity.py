"""Fusion A parity vs the reference dynamic consistency filter, plus PLY
roundtrip and an end-to-end synthetic-scene fusion sanity check."""
import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/tools/filter")  # its private data_io

# the reference filter imports plyfile at module scope; it is not installed
# and not needed for the functions under test — stub it out
import types  # noqa: E402
_plyfile = types.ModuleType("plyfile")
_plyfile.PlyData = object
_plyfile.PlyElement = object
sys.modules.setdefault("plyfile", _plyfile)

from tools.filter.dynamic_filter_gpu import (  # noqa: E402
    check_geometric_consistency)

from mdfnet_tpu.data.synthetic import make_plane_scene  # noqa: E402
from mdfnet_tpu.fusion import geometric_consistency, write_ply, read_ply  # noqa: E402
from mdfnet_tpu.fusion.dynamic_filter import THRESHOLD_STEPS, fuse_view  # noqa: E402


def _scene_depths(nviews=5):
    scene = make_plane_scene(height=64, width=80, nviews=nviews,
                             plane_depth=600.0, tilt=0.05)
    return scene, scene.depths


def test_geometric_consistency_matches_reference(rng):
    scene, _ = _scene_depths()
    h, w = 64, 80
    ref_depth = (600 + 30 * rng.rand(h, w)).astype(np.float32)
    src_depth = (600 + 30 * rng.rand(h, w)).astype(np.float32)
    k = scene.intrinsics
    e = scene.extrinsics

    masks_t, mask_t, d_re_t = check_geometric_consistency(
        torch.from_numpy(ref_depth), torch.from_numpy(k[0]),
        torch.from_numpy(e[0]), torch.from_numpy(src_depth),
        torch.from_numpy(k[1]), torch.from_numpy(e[1]))

    counts, strict_sum, depth_sum = geometric_consistency(
        jnp.asarray(ref_depth), jnp.asarray(k[0]), jnp.asarray(e[0]),
        jnp.asarray(src_depth[None]), jnp.asarray(k[None, 1]),
        jnp.asarray(e[None, 1]))

    for i, m_t in enumerate(masks_t):
        ours = np.asarray(counts[i]) > 0
        theirs = m_t[0].numpy().astype(bool)
        # boundary pixels may flip due to float order-of-ops; require <0.5% flips
        assert (ours != theirs).mean() < 5e-3, f"rung {i} diverged"

    ours_strict = np.asarray(strict_sum) > 0
    theirs_strict = mask_t[0].numpy().astype(bool)
    agree = ours_strict == theirs_strict
    assert agree.mean() > 0.995
    np.testing.assert_allclose(np.asarray(depth_sum)[agree],
                               d_re_t[0].numpy()[agree], atol=0.05)


def test_fuse_view_synthetic_plane(rng):
    """Perfect synthetic depths must pass everywhere; corrupted must not.

    With S src views, rung i can only reach count S, so sum_i[count_i >= i]
    maxes out at S-1 rungs; nconditions must be <= S-1 (the reference uses 10
    srcs with nconditions=5)."""
    scene, depths = _scene_depths(nviews=5)
    conf = np.ones_like(depths[0])

    depth_avg, geo, photo, final = fuse_view(
        depths[0], conf, scene.intrinsics[0], scene.extrinsics[0],
        depths[1:], scene.intrinsics[1:], scene.extrinsics[1:],
        photo_thresh=0.8, nconditions=3)
    # the farthest camera (baseline 48) shifts the image ~f*b/z = 26 px; ref
    # pixels left of that fall outside its frustum and legitimately fail
    interior = final[8:-8, 32:-8]
    assert interior.mean() > 0.98, f"consistent plane rejected: {interior.mean()}"
    np.testing.assert_allclose(depth_avg[8:-8, 32:-8],
                               scene.depth[8:-8, 32:-8], rtol=1e-3)

    # corrupt ref depth -> rejected
    bad = depths[0] + 50.0
    _, geo_b, _, final_b = fuse_view(
        bad, conf, scene.intrinsics[0], scene.extrinsics[0],
        depths[1:], scene.intrinsics[1:], scene.extrinsics[1:],
        photo_thresh=0.8, nconditions=3)
    assert final_b.mean() < 0.05, "corrupted depth accepted"


def test_ply_roundtrip(tmp_path, rng):
    xyz = rng.randn(100, 3).astype(np.float32)
    rgb = (rng.rand(100, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    write_ply(p, xyz, rgb)
    xyz2, rgb2 = read_ply(p)
    np.testing.assert_array_equal(xyz, xyz2)
    np.testing.assert_array_equal(rgb, rgb2)
