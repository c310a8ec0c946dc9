"""End-to-end integration: synthetic scene written to disk in the DTU eval
layout -> dataset loader -> jitted eval loop (PFM outputs) -> dynamic-filter
fusion -> point cloud whose geometry matches the synthetic plane."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import jax

from mdfnet_tpu.config import ModelConfig
from mdfnet_tpu.data.datasets import DTUEvalDataset
from mdfnet_tpu.data.formats import (
    read_pfm, write_cam_file, write_pair_file)
from mdfnet_tpu.data.synthetic import make_plane_scene
from mdfnet_tpu.evaluate import run_eval
from mdfnet_tpu.models import build_model

SMALL = ModelConfig(chs=(4, 8, 8, 8), ndepths=(8, 8, 8), ngroups=(8, 4, 4))


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    """Write a synthetic scene as scan1 in the DTU eval directory layout."""
    root = tmp_path_factory.mktemp("dtu_eval_root")
    scene = make_plane_scene(height=64, width=96, nviews=4, plane_depth=600.0,
                             tilt=0.05)
    scan = root / "scan1"
    (scan / "images").mkdir(parents=True)
    (scan / "cams").mkdir()
    nv = scene.imgs.shape[0]
    for v in range(nv):
        img = (scene.imgs[v] * 255).astype(np.uint8)
        Image.fromarray(img).save(scan / "images" / f"{v:08d}.jpg", quality=97)
        write_cam_file(str(scan / "cams" / f"{v:08d}_cam.txt"),
                       scene.intrinsics[v], scene.extrinsics[v],
                       depth_info=(425.0, 2.5, 192, 935.0))
    pairs = [(r, [s for s in range(nv) if s != r]) for r in range(nv)]
    write_pair_file(str(root / "pair.txt"), pairs)
    return str(root), scene


def test_eval_loop_and_fusion(disk_scene, tmp_path):
    root, scene = disk_scene
    dataset = DTUEvalDataset(root, scans=[1], nviews=4, crop_height=64)
    assert len(dataset) == 4
    item = dataset[0]
    assert item["imgs"].shape == (4, 64, 96, 3)

    model = build_model(SMALL)
    args = (item["imgs"][None], item["extrinsics"][None],
            item["intrinsics"][None], item["depth_range"][None])
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)

    out_dir = str(tmp_path / "outputs")
    stats = run_eval(model, variables, dataset, out_dir, log_fn=None)
    assert stats["n_views"] >= 3  # first batch excluded from timing

    # outputs exist in the reference's schema and are well-formed
    d0 = read_pfm(os.path.join(out_dir, "scan1", "depth_est", "00000000.pfm"))[0]
    c0 = read_pfm(os.path.join(out_dir, "scan1", "confidence", "00000000.pfm"))[0]
    assert d0.shape == (64, 96) and c0.shape == (64, 96)
    assert np.isfinite(d0).all()
    assert (c0 >= 0).all() and (c0 <= 1.0 + 1e-5).all()
    # NB: the refined depth is NOT clamped to the scene range (the refine
    # head's residual is unbounded, reference net/unit/refine.py:43-44), so
    # only the pre-refinement stages guarantee [dmin, dmax]; check the depth
    # is at least in a sane neighbourhood of the range for random weights
    assert (d0 > 0).all() and (d0 < 2000).all()


def test_fusion_on_analytic_depths(disk_scene, tmp_path):
    """Write the *analytic* GT depths as if the model had produced them, then
    fuse: the cloud must land on the plane z = 600 + 0.05x."""
    from mdfnet_tpu.data.formats import write_pfm
    from mdfnet_tpu.fusion.dynamic_filter import fuse_scan
    from mdfnet_tpu.fusion.ply import read_ply

    root, scene = disk_scene
    eval_dir = tmp_path / "gt_outputs" / "scan1"
    (eval_dir / "depth_est").mkdir(parents=True)
    (eval_dir / "confidence").mkdir()
    for v in range(scene.depths.shape[0]):
        write_pfm(str(eval_dir / "depth_est" / f"{v:08d}.pfm"),
                  scene.depths[v])
        write_pfm(str(eval_dir / "confidence" / f"{v:08d}.pfm"),
                  np.ones_like(scene.depths[v]))

    out_ply = str(tmp_path / "scan1.ply")
    xyz = fuse_scan(os.path.join(root, "scan1"), str(eval_dir), out_ply,
                    cam_folder="cams", photo_thresh=0.8, nconditions=2,
                    log_fn=None)
    assert len(xyz) > 3000
    np.testing.assert_allclose(xyz[:, 2], 600.0 + 0.05 * xyz[:, 0], rtol=2e-3)

    xyz2, rgb2 = read_ply(out_ply)
    assert len(xyz2) == len(xyz)
