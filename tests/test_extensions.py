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
