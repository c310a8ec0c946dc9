"""End-to-end forward parity: reference CoreNet (torch, CPU) vs our CoreNet
(JAX) with the reference's weights imported via utils/pth_import.py.

This is the test the missing shipped checkpoints would have powered
(SURVEY.md §6): identical math on identical weights must produce identical
depth + confidence maps within float tolerance.
"""
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from net import core as ref_core  # noqa: E402
from net.unit import scale as ref_scale  # noqa: E402
from net.unit import backbone as ref_backbone  # noqa: E402
from net.unit import regress as ref_regress  # noqa: E402
from net.unit import refine as ref_refine  # noqa: E402
from net.unit.depthhypos import HyposByFit  # noqa: E402
from net.unit.homoaggregate import VectorAggregate as RefVectorAggregate  # noqa: E402
from net.unit.regular import RegularNet_3Scales, RegularNet_4Scales  # noqa: E402

from mdfnet_tpu.data.synthetic import make_plane_scene  # noqa: E402
from mdfnet_tpu.models import build_model  # noqa: E402
from mdfnet_tpu.utils.pth_import import state_dict_to_variables  # noqa: E402


def _build_reference_model(seed=7):
    torch.manual_seed(seed)
    import torch.nn as nn
    chs, ndepths = (8, 16, 32, 64), (48, 24, 8)
    curves, threshs, ngroups = [None, "gauss1", "laplace"], (0.0, 0.95, 1e-5), (32, 16, 8)
    backbone = ref_backbone.FPN_4Scales(chs)
    hypos = nn.ModuleList([HyposByFit(ndepths[i], curves[i], threshs[i])
                           for i in range(3)])
    aggr = nn.ModuleList([RefVectorAggregate(ngroups[i]) for i in range(3)])
    regular = nn.ModuleList([RegularNet_4Scales(c) for c in ngroups[1:]])
    regular.insert(0, RegularNet_3Scales(ngroups[0]))
    regress = [ref_regress.depth_regression, ref_regress.confidence_regress]
    refine = ref_refine.RefineNet2()
    return ref_core.CoreNet(backbone, hypos, ref_scale.scale_cam, aggr,
                            regular, regress, refine)


@pytest.fixture(scope="module")
def parity_setup():
    scene = make_plane_scene(height=64, width=96, nviews=3, plane_depth=620.0,
                             tilt=0.08)
    tmodel = _build_reference_model()
    # randomise BN running stats so eval mode actually exercises them
    g = torch.Generator().manual_seed(3)
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.copy_(0.05 * torch.randn(m.running_mean.shape, generator=g))
            m.running_var.copy_(1.0 + 0.1 * torch.rand(m.running_var.shape, generator=g))
    variables = state_dict_to_variables(tmodel.state_dict())
    jmodel = build_model()
    return scene, tmodel, jmodel, variables


def _inputs(scene, channels_first: bool):
    imgs = scene.imgs[None]  # (1, V, H, W, 3)
    if channels_first:
        imgs = imgs.transpose(0, 1, 4, 2, 3)
    return (imgs, scene.extrinsics[None], scene.intrinsics[None],
            scene.depth_range[None])


def test_eval_forward_parity(parity_setup):
    scene, tmodel, jmodel, variables = parity_setup
    tmodel.eval()
    t_imgs, t_extr, t_intr, t_rng = [torch.from_numpy(np.asarray(a)) for a in
                                     _inputs(scene, channels_first=True)]
    with torch.no_grad():
        ref = tmodel(t_imgs, t_extr, t_intr, t_rng)

    j_in = [jnp.asarray(a) for a in _inputs(scene, channels_first=False)]
    out = jmodel.apply(variables, *j_in, train=False)

    ref_depth = ref["depth"].numpy()
    ref_conf = ref["confidence"].numpy()
    depth = np.asarray(out["depth"])
    conf = np.asarray(out["confidence"])

    assert depth.shape == ref_depth.shape
    assert conf.shape == ref_conf.shape
    # depth in scene units (hundreds): compare relative to the depth range
    scale = float(scene.depth_range[1] - scene.depth_range[0])
    np.testing.assert_allclose(depth / scale, ref_depth / scale, atol=2e-3)
    np.testing.assert_allclose(conf, ref_conf, atol=5e-3)


def test_train_forward_parity(parity_setup):
    scene, tmodel, jmodel, variables = parity_setup
    tmodel.train()
    t_imgs, t_extr, t_intr, t_rng = [torch.from_numpy(np.asarray(a)) for a in
                                     _inputs(scene, channels_first=True)]
    with torch.no_grad():
        ref = tmodel(t_imgs, t_extr, t_intr, t_rng)

    j_in = [jnp.asarray(a) for a in _inputs(scene, channels_first=False)]
    out, _ = jmodel.apply(variables, *j_in, train=True, mutable=["batch_stats"])

    scale = float(scene.depth_range[1] - scene.depth_range[0])
    for i, (d_ref, d_out) in enumerate(zip(ref["depth"], out["depth"])):
        np.testing.assert_allclose(
            np.asarray(d_out) / scale, d_ref.numpy() / scale, atol=3e-3,
            err_msg=f"stage {i} depth diverged")
