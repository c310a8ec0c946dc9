"""LEARNED end-to-end proof (VERDICT r2 #4): train until the loss
plateaus, eval with the TRAINED checkpoint, fuse the PREDICTED depths (not
GT), and score the cloud with the DTU metric — the one capability the GT
pipeline test cannot cover is that training actually produces a model whose
predictions survive fusion (reference train.py -> eval.py -> tools/filter
workflow, README.md:37-65)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mdfnet_tpu.data.synthetic import (
    make_plane_scene, write_dtu_eval_tree, write_dtu_train_tree)

H, W, NV = 64, 96, 11
PLANE, TILT, BASELINE = 600.0, 0.05, 4.0
EPOCHS = 30


def test_learned_train_eval_fuse_metric(tmp_path, capsys):
    root = tmp_path / "root"
    write_dtu_train_tree(str(root / "dtu640x512"), scans=(1,), nviews=NV,
                         lightings=1, height=H, width=W, plane_depth=PLANE,
                         tilt=TILT, baseline=BASELINE)
    scene = write_dtu_eval_tree(str(root / "dtu1600x1200"), scans=(9,),
                                nviews=NV, height=H, width=W,
                                plane_depth=PLANE, tilt=TILT,
                                baseline=BASELINE)

    ckpt_dir = str(tmp_path / "pth")
    from mdfnet_tpu.train import main as train_main
    train_main(["-d", "dtu", "--root", str(root), "--scans", "1",
                "--epochs", str(EPOCHS), "--batch-size", "2", "--nviews",
                "4", "--lightings", "1", "--ckpt-dir", ckpt_dir])
    losses = [float(x) for x in
              open(os.path.join(ckpt_dir, "epoch_loss.txt")).read().split()]
    # converged: an order of magnitude below the untrained start
    assert losses[-1] < losses[0] / 10, losses

    out_dir = str(tmp_path / "outputs")
    from mdfnet_tpu.cli.eval import main as eval_main
    eval_main(["-p", os.path.join(ckpt_dir, f"dtu_{EPOCHS}"), "-d", "dtu",
               "--root", str(root), "--scans", "9", "-o", out_dir])

    # the PREDICTED depth itself must have learned the plane
    from mdfnet_tpu.data.formats import read_pfm
    d, _ = read_pfm(os.path.join(out_dir, "scan9", "depth_est",
                                 "00000000.pfm"))
    med_err = float(np.median(np.abs(d - scene.depths[0])))
    px = PLANE / float(scene.intrinsics[0][0, 0])  # world units per pixel
    assert med_err < 3 * px, (med_err, px)

    # fuse the predictions; a 30-epoch model's confidence head is not yet
    # calibrated to the reference's 0.8 production threshold, so the CLI's
    # threshold override is used — the geometric consistency ladder still
    # does the real filtering
    ply_dir = str(tmp_path / "plys")
    from mdfnet_tpu.cli.fuse import main as fuse_main
    fuse_main(["-m", "filter", "-d", "dtu", "--root", str(root),
               "--scans", "9", "-e", out_dir, "-o", ply_dir,
               "--photo-thresh", "0.05"])

    from mdfnet_tpu.fusion.ply import read_ply
    cloud, _ = read_ply(os.path.join(ply_dir, "ours009_l3.ply"))
    assert len(cloud) > 500, f"learned cloud too small ({len(cloud)})"

    sample_set = str(tmp_path / "SampleSet")
    from tests.test_cli_pipeline import _write_sample_set
    _write_sample_set(sample_set, scene)

    from mdfnet_tpu.cli.dtu_eval import main as metric_main
    metric_main(["--ply_dir", ply_dir, "--sample_set", sample_set,
                 "--scans", "9"])
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # learned-from-scratch on one synthetic plane: the fused cloud must land
    # within a few pixel footprints of the true surface (px = 1.875 units)
    assert result["acc"] < 4 * px, result
    assert result["comp"] < 4 * px, result
