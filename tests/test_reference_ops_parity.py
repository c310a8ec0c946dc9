"""Op-level parity against the reference implementation itself.

The reference (read-only at /root/reference) is imported at test time as the
oracle: its homo_warping, HyposByFit, confidence_regress and Loss run on CPU
torch, and our JAX twins must match within float tolerance. No reference code
is copied — it is only executed.
"""
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from net.unit.base import homo_warping  # noqa: E402
from net.unit.depthhypos import HyposByFit  # noqa: E402
from net.unit.regress import confidence_regress as ref_confidence  # noqa: E402
from net.unit.regress import depth_regression as ref_depth_regress  # noqa: E402
from net.loss import Loss as RefLoss  # noqa: E402

from mdfnet_tpu import geometry  # noqa: E402
from mdfnet_tpu.ops import (  # noqa: E402
    confidence_regression, depth_regression, homography_warp,
    refined_hypotheses, uniform_hypotheses)
from mdfnet_tpu.models.loss import multi_scale_depth_loss  # noqa: E402


def _random_cams(rng, b, v):
    """Plausible camera stacks: small rotations, translations, DTU-ish K."""
    intr = np.zeros((b, v, 3, 3), np.float32)
    extr = np.zeros((b, v, 4, 4), np.float32)
    for i in range(b):
        for j in range(v):
            f = 800.0 + 50 * rng.rand()
            intr[i, j] = [[f, 0, 80], [0, f, 64], [0, 0, 1]]
            angle = 0.02 * rng.randn(3)
            cx, sx = np.cos(angle[0]), np.sin(angle[0])
            rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            cy, sy = np.cos(angle[1]), np.sin(angle[1])
            ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            e = np.eye(4)
            e[:3, :3] = rx @ ry
            e[:3, 3] = rng.randn(3) * [10.0, 5.0, 2.0]
            extr[i, j] = e
    return intr, extr


def test_projection_matrices_match_reference(rng):
    from net.unit.scale import scale_cam
    b, v = 2, 4
    intr, extr = _random_cams(rng, b, v)
    for stage in range(3):
        ref_proj_t, src_projs_t = scale_cam(torch.from_numpy(intr),
                                            torch.from_numpy(extr), stage)
        ref_proj, src_projs = geometry.projection_matrices(
            jnp.asarray(intr), jnp.asarray(extr), stage)
        np.testing.assert_allclose(np.asarray(ref_proj), ref_proj_t.numpy(),
                                   rtol=1e-6)
        for k in range(v - 1):
            np.testing.assert_allclose(np.asarray(src_projs[:, k]),
                                       src_projs_t[k].numpy(), rtol=1e-6)


@pytest.mark.parametrize("hypo_shape", ["planes", "full"])
def test_homography_warp_matches_reference(rng, hypo_shape):
    b, c, h, w, d = 1, 8, 32, 48, 6
    intr, extr = _random_cams(rng, b, 2)
    feat = rng.randn(b, c, h, w).astype(np.float32)
    if hypo_shape == "planes":
        hypos = np.linspace(425, 935, d, dtype=np.float32)[None, :, None, None]
        hypos = np.broadcast_to(hypos, (b, d, 1, 1)).copy()
    else:
        base = 600 + 50 * rng.rand(b, 1, h, w).astype(np.float32)
        off = np.linspace(-40, 40, d, dtype=np.float32)[None, :, None, None]
        hypos = base + off

    from net.unit.scale import scale_cam
    ref_proj_t, src_projs_t = scale_cam(torch.from_numpy(intr),
                                        torch.from_numpy(extr), 2)
    with torch.no_grad():
        ref = homo_warping(torch.from_numpy(feat), src_projs_t[0], ref_proj_t,
                           torch.from_numpy(hypos)).numpy()  # (B,C,D,H,W)

    ref_proj, src_projs = geometry.projection_matrices(
        jnp.asarray(intr), jnp.asarray(extr), 2)
    out = homography_warp(jnp.asarray(feat.transpose(0, 2, 3, 1)),
                          src_projs[:, 0], ref_proj, jnp.asarray(hypos))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)  # -> (B,C,D,H,W)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_uniform_hypotheses_match_reference(rng):
    mod = HyposByFit(48, None, 0.0)
    depth_range = np.array([[425.0, 935.0], [2.5, 60.0]], np.float32)
    ref = mod(None, torch.from_numpy(depth_range), None, None).numpy()
    out = uniform_hypotheses(jnp.asarray(depth_range), 48)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


@pytest.mark.parametrize("curve,thresh", [("gauss1", 0.95), ("laplace", 1e-5),
                                          ("gauss0", 0.95)])
def test_refined_hypotheses_match_reference(rng, curve, thresh):
    b, d, h, w = 2, 16, 12, 16
    nd_next = 8
    depth = (500 + 100 * rng.rand(b, h, w)).astype(np.float32)
    # peaked prob volumes like a real posterior
    hypos = np.linspace(425, 935, d, dtype=np.float32)[None, :, None, None]
    hypos = np.broadcast_to(hypos, (b, d, h, w)).copy()
    logits = -((hypos - depth[:, None]) / 60.0) ** 2 + 0.1 * rng.randn(b, d, h, w)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    prob = prob.astype(np.float32)
    depth_range = np.array([[425.0, 935.0], [430.0, 900.0]], np.float32)

    mod = HyposByFit(nd_next, curve, thresh)
    with torch.no_grad():
        ref = mod(torch.from_numpy(depth), torch.from_numpy(depth_range),
                  torch.from_numpy(prob), torch.from_numpy(hypos),
                  upsample=True).numpy()

    out = refined_hypotheses(jnp.asarray(depth), jnp.asarray(depth_range),
                             jnp.asarray(prob), jnp.asarray(hypos),
                             ndepths=nd_next, curve_class=curve,
                             prob_thresh=thresh, upsample=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-2)


def test_depth_and_confidence_regression_match_reference(rng):
    b, d, h, w = 2, 8, 10, 12
    logits = rng.randn(b, d, h, w).astype(np.float32) * 2
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    prob = prob.astype(np.float32)
    hypos = np.cumsum(np.abs(rng.randn(b, d, h, w)) + 0.5, axis=1).astype(np.float32)

    ref_d = ref_depth_regress(torch.from_numpy(prob), torch.from_numpy(hypos)).numpy()
    out_d = depth_regression(jnp.asarray(prob), jnp.asarray(hypos))
    np.testing.assert_allclose(np.asarray(out_d), ref_d, rtol=1e-5)

    with torch.no_grad():
        ref_c = ref_confidence(torch.from_numpy(prob)).numpy()
    out_c = confidence_regression(jnp.asarray(prob))
    np.testing.assert_allclose(np.asarray(out_c), ref_c, atol=1e-5)


def test_loss_matches_reference(rng):
    b, h, w = 2, 32, 40
    depth_range = np.array([[425.0, 935.0]] * b, np.float32)
    gt = {}
    preds = []
    for i, k in enumerate(("3", "2", "1", "0")):
        s = 8 // (2 ** i)
        g = (400 + 600 * rng.rand(b, h // s, w // s)).astype(np.float32)
        g[g < 480] = 0.0  # some invalid pixels
        gt[k] = g
        preds.append((450 + 500 * rng.rand(b, h // s, w // s)).astype(np.float32))

    ref_loss = RefLoss()({"depth": [torch.from_numpy(p) for p in preds]},
                         {k: torch.from_numpy(v) for k, v in gt.items()},
                         torch.from_numpy(depth_range)).item()
    out = multi_scale_depth_loss([jnp.asarray(p) for p in preds],
                                 {k: jnp.asarray(v) for k, v in gt.items()},
                                 jnp.asarray(depth_range))
    np.testing.assert_allclose(float(out), ref_loss, rtol=1e-5)
