"""Dataset sampler tests: synthetic directory trees in each dataset's layout,
loaded back through the samplers; robust view sampling; format codecs."""
import os

import numpy as np
import pytest
from PIL import Image

from mdfnet_tpu.data.datasets import (
    BlendedMVSTrainDataset, DTUTrainDataset, TanksEvalDataset)
from mdfnet_tpu.data.formats import (
    read_cam_file, read_pair_file, read_pfm, write_cam_file, write_pair_file,
    write_pfm)
from mdfnet_tpu.data.pipeline import BatchLoader, collate


def _cam(f=320.0, cx=32.0, cy=24.0, tx=0.0):
    k = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
    e = np.eye(4, dtype=np.float32)
    e[0, 3] = tx
    return k, e


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.randn(37, 53).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, img)
    assert scale == 1.0


def test_pfm_reference_compatible(tmp_path, rng):
    """Files written by us parse identically through the reference reader."""
    import sys
    sys.path.insert(0, "/root/reference")
    from tools.data_io import read_pfm as ref_read_pfm, save_pfm as ref_save_pfm

    img = rng.randn(24, 31).astype(np.float32)
    ours = str(tmp_path / "ours.pfm")
    write_pfm(ours, img)
    ref_data, _ = ref_read_pfm(ours)
    np.testing.assert_array_equal(ref_data, img)

    theirs = str(tmp_path / "theirs.pfm")
    ref_save_pfm(theirs, img)
    back, _ = read_pfm(theirs)
    np.testing.assert_array_equal(back, img)


def test_cam_file_roundtrip(tmp_path):
    k, e = _cam()
    p = str(tmp_path / "c_cam.txt")
    write_cam_file(p, k, e, depth_info=(425.0, 2.5, 192, 935.0))
    k2, e2, info = read_cam_file(p)
    np.testing.assert_allclose(k2, k, rtol=1e-6)
    np.testing.assert_allclose(e2, e, rtol=1e-6)
    np.testing.assert_allclose(info, [425.0, 2.5, 192, 935.0], rtol=1e-6)


@pytest.fixture
def dtu_train_tree(tmp_path, rng):
    root = tmp_path / "dtu"
    (root / "Cameras").mkdir(parents=True)
    nviews = 4
    pairs = [(r, [s for s in range(nviews) if s != r]) for r in range(nviews)]
    write_pair_file(str(root / "Cameras" / "pair.txt"), pairs)
    for scan in (2, 6):
        (root / "Rectified" / f"scan{scan}_train").mkdir(parents=True)
        (root / "Depths" / f"scan{scan}_train").mkdir(parents=True)
    for v in range(nviews):
        k, e = _cam(tx=v * 10.0)
        write_cam_file(str(root / "Cameras" / f"{v:08d}_cam.txt"), k, e,
                       (425.0, 2.5))
        for scan in (2, 6):
            for light in range(2):
                img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(
                    root / "Rectified" / f"scan{scan}_train" /
                    f"rect_{v + 1:03d}_{light}_r5000.png")
            write_pfm(str(root / "Depths" / f"scan{scan}_train" /
                          f"depth_map_{v:04d}.pfm"),
                      (500 + 100 * rng.rand(48, 64)).astype(np.float32))
    return str(root)


def test_dtu_train_dataset(dtu_train_tree):
    ds = DTUTrainDataset(dtu_train_tree, scans=[2, 6], lightings=[0, 1],
                         nviews=3, robust_sampling=False)
    assert len(ds) == 2 * 4 * 2  # scans x views x lightings
    item = ds[0]
    assert item["imgs"].shape == (3, 48, 64, 3)
    assert item["intrinsics"].shape == (3, 3, 3)
    assert item["extrinsics"].shape == (3, 4, 4)
    assert item["ref_depths"]["0"].shape == (48, 64)
    assert item["ref_depths"]["3"].shape == (6, 8)
    np.testing.assert_allclose(item["depth_range"], [425.0, 935.0])

    # robust sampling draws (nviews-1) distinct srcs, never the ref; the
    # stream is per-(epoch, item) deterministic (thread-safe, reproducible)
    ds_r = DTUTrainDataset(dtu_train_tree, scans=[2], lightings=[0],
                           nviews=3, robust_sampling=True, seed=3)
    seen = set()
    for epoch in range(5):
        ds_r.set_epoch(epoch)
        it = ds_r[0]
        views = tuple(np.asarray(it["extrinsics"])[1:, 0, 3])
        assert 0.0 not in views, "robust sampling must never pick the ref"
        it2 = ds_r[0]  # same epoch+idx -> identical item
        np.testing.assert_array_equal(it["extrinsics"], it2["extrinsics"])
        seen.add(views)
    assert len(seen) > 1, "robust sampling never varied across epochs"

    # a fresh dataset with the same seed reproduces the exact stream
    ds_r2 = DTUTrainDataset(dtu_train_tree, scans=[2], lightings=[0],
                            nviews=3, robust_sampling=True, seed=3)
    ds_r.set_epoch(2)
    ds_r2.set_epoch(2)
    for idx in range(len(ds_r)):
        np.testing.assert_array_equal(ds_r[idx]["extrinsics"],
                                      ds_r2[idx]["extrinsics"])


@pytest.fixture
def blended_tree(tmp_path, rng):
    root = tmp_path / "blended"
    scene = "5a3ca9cb270f0e3f14d0eddb"
    for sub in ("blended_images", "cams", "rendered_depth_maps"):
        (root / scene / sub).mkdir(parents=True)
    with open(root / "training_list.txt", "w") as f:
        f.write(scene + "\n")
    nviews = 4
    pairs = [(r, [s for s in range(nviews) if s != r]) for r in range(nviews)]
    write_pair_file(str(root / scene / "cams" / "pair.txt"), pairs)
    for v in range(nviews):
        k, e = _cam(tx=v * 5.0)
        write_cam_file(str(root / scene / "cams" / f"{v:08d}_cam.txt"), k, e,
                       (2.5, 0.3, 128, 60.0))
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / scene / "blended_images" /
                                  f"{v:08d}.jpg")
        write_pfm(str(root / scene / "rendered_depth_maps" / f"{v:08d}.pfm"),
                  (10 + 30 * rng.rand(48, 64)).astype(np.float32))
    return str(root)


def test_blendedmvs_dataset(blended_tree):
    ds = BlendedMVSTrainDataset(blended_tree, nviews=3, robust_sampling=False)
    assert len(ds) == 4
    item = ds[0]
    assert item["imgs"].shape == (3, 48, 64, 3)
    # per-scene depth range from the cam info line: min idx 0, max idx 3
    np.testing.assert_allclose(item["depth_range"], [2.5, 60.0])


@pytest.fixture
def tanks_tree(tmp_path, rng):
    root = tmp_path / "tanks"
    scene = "Family"
    (root / scene / "images").mkdir(parents=True)
    (root / scene / "cams_1").mkdir()
    nviews = 3
    pairs = [(r, [s for s in range(nviews) if s != r]) for r in range(nviews)]
    write_pair_file(str(root / scene / "pair.txt"), pairs)
    for v in range(nviews):
        k, e = _cam(tx=v * 5.0)
        write_cam_file(str(root / scene / "cams_1" / f"{v:08d}_cam.txt"), k, e,
                       (1.0, 120.0))
        img = (rng.rand(72, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / scene / "images" / f"{v:08d}.jpg")
    return str(root)


def test_tanks_dataset(tanks_tree):
    ds = TanksEvalDataset(tanks_tree, scenes=["Family"], nviews=3,
                          crop_height=64)
    assert len(ds) == 3
    item = ds[0]
    assert item["imgs"].shape == (3, 64, 64, 3)  # cropped from 72
    np.testing.assert_allclose(item["depth_range"], [1.0, 120.0])
    assert item["filename"] == "Family/{}/00000000{}"


def test_batch_loader_threads_and_order(dtu_train_tree):
    ds = DTUTrainDataset(dtu_train_tree, scans=[2, 6], lightings=[0, 1],
                         nviews=3, robust_sampling=False)
    loader0 = BatchLoader(ds, batch_size=3, shuffle=False, num_workers=0)
    loader2 = BatchLoader(ds, batch_size=3, shuffle=False, num_workers=2)
    b0 = [b["imgs"] for b in loader0]
    b2 = [b["imgs"] for b in loader2]
    assert len(b0) == len(b2) == len(loader0)
    for a, b in zip(b0, b2):
        np.testing.assert_array_equal(a, b)
