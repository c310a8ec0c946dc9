"""Extension-point parity: variance aggregation and the EMA confidence branch
vs the reference's unused-but-present alternatives."""
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from net.unit.homoaggregate import homo_aggregate_by_variance  # noqa: E402
from net.unit.regress import confidence_regress as ref_confidence  # noqa: E402
from net.unit.scale import scale_cam  # noqa: E402

from mdfnet_tpu import geometry  # noqa: E402
from mdfnet_tpu.data.crop import crop_image_and_intrinsics  # noqa: E402
from mdfnet_tpu.models.aggregate_variance import VarianceAggregate  # noqa: E402
from mdfnet_tpu.ops.regress import confidence_regression  # noqa: E402


def _cams(rng, b, v):
    intr = np.zeros((b, v, 3, 3), np.float32)
    extr = np.zeros((b, v, 4, 4), np.float32)
    for i in range(b):
        for j in range(v):
            intr[i, j] = [[800, 0, 24], [0, 800, 16], [0, 0, 1]]
            e = np.eye(4)
            e[0, 3] = j * 8.0
            extr[i, j] = e
    return intr, extr


def test_variance_aggregate_matches_reference(rng):
    b, v, c, h, w, d = 1, 3, 8, 32, 48, 6
    intr, extr = _cams(rng, b, v)
    feats = [rng.randn(b, c, h, w).astype(np.float32) for _ in range(v)]
    hypos = np.broadcast_to(
        np.linspace(500, 700, d, dtype=np.float32)[None, :, None, None],
        (b, d, 1, 1)).copy()

    rp_t, sp_t = scale_cam(torch.from_numpy(intr), torch.from_numpy(extr), 2)
    with torch.no_grad():
        ref = homo_aggregate_by_variance(
            [torch.from_numpy(f) for f in feats], rp_t, sp_t,
            torch.from_numpy(hypos)).numpy()  # (B, C, D, H, W)

    rp, sp = geometry.projection_matrices(jnp.asarray(intr), jnp.asarray(extr), 2)
    agg = VarianceAggregate(warp_impl="gather")
    out = agg.apply({}, [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
                    rp, sp, jnp.asarray(hypos))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_confidence_ema_matches_reference(rng):
    b, d, h, w = 1, 8, 12, 16
    logits = rng.randn(b, d, h, w).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    prob = prob.astype(np.float32)
    last = rng.rand(b, h // 2, w // 2).astype(np.float32)

    with torch.no_grad():
        ref = ref_confidence(torch.from_numpy(prob),
                             last_confidence=torch.from_numpy(last)).numpy()
    out = confidence_regression(jnp.asarray(prob),
                                last_confidence=jnp.asarray(last))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_crop_divisible(rng):
    img = rng.rand(1200, 1600, 3).astype(np.float32)
    k = np.array([[1000, 0, 800], [0, 1000, 600], [0, 0, 1]], np.float32)
    out, k2 = crop_image_and_intrinsics(img, k, multiple=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    # 1200 % 32 = 16 -> cut 8 top / 8 bottom; 1600 divides already
    assert out.shape == (1184, 1600, 3)
    np.testing.assert_allclose(k2[1, 2], 600 - 8)
    np.testing.assert_allclose(k2[0, 2], 800)


def _randomize_bn(bn, rng):
    with torch.no_grad():
        n = bn.weight.numel()
        bn.weight.copy_(torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(n).astype(np.float32) * 0.1))
        bn.running_var.copy_(torch.from_numpy(rng.rand(n).astype(np.float32) + 0.5))


def _convbnrelu_params(mod):
    """torch base.ConvBNReLU -> (params, stats) subtrees for layers.ConvBNReLU."""
    from mdfnet_tpu.utils.pth_import import _conv_weight
    params = {"conv": {"kernel": jnp.asarray(_conv_weight(mod.conv.weight.detach().numpy()))},
              "bn": {"scale": jnp.asarray(mod.bn.weight.detach().numpy()),
                     "bias": jnp.asarray(mod.bn.bias.detach().numpy())}}
    stats = {"bn": {"mean": jnp.asarray(mod.bn.running_mean.numpy()),
                    "var": jnp.asarray(mod.bn.running_var.numpy())}}
    return params, stats


def test_trconvbnrelu_2d_matches_reference(rng):
    """layers.TrConvBNReLU vs the reference's unused 2D TrConvBNReLU
    (net/unit/base.py:28-47), eval mode with randomized BN stats."""
    from net.unit.base import TrConvBNReLU as RefTr

    from mdfnet_tpu.models.layers import TrConvBNReLU

    x = rng.randn(2, 6, 9, 4).astype(np.float32)
    ref_mod = RefTr(4, 5, 3, 2, 1, 1)
    _randomize_bn(ref_mod.bn, rng)
    ref_mod.eval()
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()

    from mdfnet_tpu.utils.pth_import import _trconv_weight
    params = {"conv": {"kernel": jnp.asarray(
                  _trconv_weight(ref_mod.conv.weight.detach().numpy()))},
              "bn": {"scale": jnp.asarray(ref_mod.bn.weight.detach().numpy()),
                     "bias": jnp.asarray(ref_mod.bn.bias.detach().numpy())}}
    stats = {"bn": {"mean": jnp.asarray(ref_mod.bn.running_mean.numpy()),
                    "var": jnp.asarray(ref_mod.bn.running_var.numpy())}}
    out = TrConvBNReLU(5, 3, 2, 1, 1).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_refinenet_v1_matches_reference(rng):
    """models.refine.RefineNet vs the reference's unused RefineNet
    (net/unit/refine.py:49-95): image-guided residual over an
    align_corners=True bilinear upsample."""
    from net.unit.refine import RefineNet as RefRefine

    from mdfnet_tpu.models.refine import RefineNet
    from mdfnet_tpu.utils.pth_import import _conv_weight, _trconv_weight

    b, h, w = 2, 16, 24
    img = rng.rand(b, h, w, 3).astype(np.float32)
    depth = (rng.rand(b, h // 2, w // 2).astype(np.float32) * 200 + 500)
    drange = np.array([[425.0, 935.0]] * b, np.float32)

    ref_mod = RefRefine()
    for m in ref_mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            _randomize_bn(m, rng)
    ref_mod.eval()
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(img).permute(0, 3, 1, 2),
                      torch.from_numpy(depth),
                      torch.from_numpy(drange)).numpy()

    params, stats = {}, {}
    params["conv_img"], stats["conv_img"] = _convbnrelu_params(ref_mod.conv_img)
    params["conv_depth0"], stats["conv_depth0"] = _convbnrelu_params(ref_mod.conv_depth[0])
    params["conv_depth1"], stats["conv_depth1"] = _convbnrelu_params(ref_mod.conv_depth[1])
    trconv, trbn = ref_mod.conv_depth[2], ref_mod.conv_depth[3]
    params["conv_depth2"] = {
        "conv": {"kernel": jnp.asarray(_trconv_weight(trconv.weight.detach().numpy()))},
        "bn": {"scale": jnp.asarray(trbn.weight.detach().numpy()),
               "bias": jnp.asarray(trbn.bias.detach().numpy())}}
    stats["conv_depth2"] = {"bn": {"mean": jnp.asarray(trbn.running_mean.numpy()),
                                   "var": jnp.asarray(trbn.running_var.numpy())}}
    params["conv_res0"], stats["conv_res0"] = _convbnrelu_params(ref_mod.conv_res[0])
    params["conv_res1"] = {"kernel": jnp.asarray(
        _conv_weight(ref_mod.conv_res[1].weight.detach().numpy()))}

    out = RefineNet().apply({"params": params, "batch_stats": stats},
                            jnp.asarray(img), jnp.asarray(depth),
                            jnp.asarray(drange), train=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-3)


def test_atv_hypos_matches_reference(rng):
    """ops.fitting.atv_hypos vs the reference's unused adaptive-thin-volume
    generator (net/unit/depthhypos.py:218-253), both stages."""
    from net.unit.depthhypos import atv_hypos as ref_atv

    from mdfnet_tpu.ops.fitting import atv_hypos

    b, h, w, d = 2, 8, 12, 6
    drange = np.array([[425.0, 935.0], [500.0, 900.0]], np.float32)

    # stage 0: uniform init
    with torch.no_grad():
        ref0 = ref_atv(None, None, torch.from_numpy(drange), d).numpy()
    out0 = atv_hypos(None, None, jnp.asarray(drange), d)
    np.testing.assert_allclose(np.asarray(out0), ref0, rtol=1e-6)

    # later stage: fine-scale depth + coarse-scale expected variance
    depth = (rng.rand(b, h, w).astype(np.float32) * 300 + 500)
    var = (rng.rand(b, h // 2, w // 2).astype(np.float32) * 50 + 1)
    with torch.no_grad():
        ref1 = ref_atv(torch.from_numpy(depth[:, None]),
                       torch.from_numpy(var),
                       torch.from_numpy(drange), d).numpy()
    out1 = atv_hypos(jnp.asarray(depth), jnp.asarray(var),
                     jnp.asarray(drange), d)
    assert out1.shape == ref1.shape == (b, d, h, w)
    np.testing.assert_allclose(np.asarray(out1), ref1, rtol=1e-5, atol=1e-3)


def test_registry_assembles_alternative_units(rng):
    """The registry builds a model from the alternative units (VERDICT r3
    item 7): variance aggregation + atv hypotheses + RefineNet v1 — forward
    runs in train AND eval modes with finite outputs of the right shapes."""
    import jax

    from mdfnet_tpu.config import ModelConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.models.registry import build_model

    cfg = ModelConfig(chs=(4, 8, 8, 8), ndepths=(8, 8, 8), ngroups=(8, 4, 4),
                      aggregate_impl="variance", hypo_impl="atv",
                      refine_impl="refine1")
    model = build_model(cfg)

    scene = make_plane_scene(height=32, width=64, nviews=3, plane_depth=600.0)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]), jnp.asarray(batch["depth_range"]))

    variables = model.init(jax.random.PRNGKey(0), *args, train=True)
    out, _ = model.apply(variables, *args, train=True,
                         mutable=["batch_stats"])
    assert len(out["depth"]) == 4
    assert out["depth"][-1].shape == (1, 32, 64)
    assert all(np.isfinite(np.asarray(dd)).all() for dd in out["depth"])

    out_eval = model.apply(variables, *args, train=False)
    assert out_eval["depth"].shape == (1, 32, 64)
    assert np.isfinite(np.asarray(out_eval["depth"])).all()


def test_alternative_units_remat_train(rng):
    """remat=True with the variance aggregate (ADVICE r4: static_argnums
    must match VarianceAggregate's shorter signature — this crashed at
    init before round 5)."""
    import jax

    from mdfnet_tpu.config import ModelConfig
    from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
    from mdfnet_tpu.models.registry import build_model

    cfg = ModelConfig(chs=(4, 8, 8, 8), ndepths=(8, 8, 8), ngroups=(8, 4, 4),
                      aggregate_impl="variance", remat=True)
    model = build_model(cfg)

    scene = make_plane_scene(height=32, width=64, nviews=3, plane_depth=600.0)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]), jnp.asarray(batch["depth_range"]))

    variables = model.init(jax.random.PRNGKey(0), *args, train=True)
    out, _ = model.apply(variables, *args, train=True,
                         mutable=["batch_stats"])
    assert all(np.isfinite(np.asarray(dd)).all() for dd in out["depth"])
