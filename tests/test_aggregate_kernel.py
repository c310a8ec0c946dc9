"""rowsweep_aggregate fused kernel vs VectorAggregate's dense path."""
import numpy as np

import jax
import jax.numpy as jnp

from mdfnet_tpu import geometry
from mdfnet_tpu.models.aggregate import VectorAggregate
from mdfnet_tpu.ops.pallas.aggregate_kernel import (
    rowsweep_aggregate, rowsweep_cover)

import pytest

pytestmark = pytest.mark.slow


def _scene(rng, b=1, v=4, h=24, w=40, c=16):
    feats = [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
             for _ in range(v)]
    intr = jnp.tile(jnp.asarray(np.array(
        [[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)),
        (b, v, 1, 1))
    extr = np.tile(np.eye(4, dtype=np.float32), (b, v, 1, 1))
    for i in range(1, v):
        extr[:, i, 0, 3] = i * 2.0
        extr[:, i, 1, 3] = (i % 2) * 0.7
    ref_proj, src_projs = geometry.projection_matrices(
        intr, jnp.asarray(extr), stage=3)  # full-res K for these sizes
    return feats, ref_proj, src_projs


def test_rowsweep_matches_vector_aggregate(rng):
    b, v, h, w, c = 1, 4, 24, 40, 16
    g = c // 2
    feats, ref_proj, src_projs = _scene(rng, b, v, h, w, c)
    hypos = jnp.broadcast_to(
        jnp.linspace(420.0, 700.0, 8)[None, :, None, None],
        (b, 8, h, w)).astype(jnp.float32)
    hypos = hypos + jnp.asarray(rng.rand(b, 8, h, w).astype(np.float32)) * 5.0

    agg = VectorAggregate(g, dtype=jnp.float32, warp_impl="dense")
    variables = agg.init(jax.random.PRNGKey(0), feats, ref_proj, src_projs,
                         hypos)
    ref_vol = agg.apply(variables, feats, ref_proj, src_projs, hypos)

    # fused kernel inputs: (S, H, C, W) pair diffs + ref q + DepthWeight
    # params folded exactly as the kernel expects
    diffs = [f[0, :, :, 0::2] - f[0, :, :, 1::2] for f in feats]
    diffs_hcw = jnp.stack([jnp.transpose(d, (0, 2, 1)) for d in diffs])
    q = jax.nn.sigmoid(diffs_hcw[0])

    p = variables["params"]["depth_weight"]
    st = variables["batch_stats"]["depth_weight"]["bn0"]
    k0 = p["conv0"]["kernel"][0, 0, 0, :, 0]
    bn_scale = (p["bn0"]["scale"][0]
                / np.sqrt(np.asarray(st["var"][0]) + 1e-5))
    bn_offset = p["bn0"]["bias"][0] - np.asarray(st["mean"][0]) * bn_scale
    k1 = p["conv1"]["kernel"][0, 0, 0, 0, 0]
    b1 = p["conv1"]["bias"][0]

    cover = rowsweep_cover(src_projs[0], ref_proj[0], hypos[0], h, w)
    assert bool(cover), "test geometry must satisfy the y-window contract"

    out, kcover = rowsweep_aggregate(
        diffs_hcw[1:], q, src_projs[0], ref_proj[0],
        hypos[0], k0, bn_scale, bn_offset, k1, b1, interpret=True)
    assert bool(kcover)
    # (D, H, C, Wp) -> (B, D, H, W, C)
    out_bdhwc = jnp.transpose(out[:, :, :, :w], (0, 1, 3, 2))[None]
    np.testing.assert_allclose(np.asarray(out_bdhwc), np.asarray(ref_vol),
                               atol=2e-3, rtol=2e-2)


def test_rowsweep_broadcast_hypos(rng):
    """(D, 1, 1) stage-0-style hypotheses broadcast correctly."""
    b, v, h, w, c = 1, 3, 16, 32, 8
    g = c // 2
    feats, ref_proj, src_projs = _scene(rng, b, v, h, w, c)
    hypos = jnp.linspace(400.0, 900.0, 8)[None, :, None, None].astype(
        jnp.float32)
    hypos = jnp.broadcast_to(hypos, (b, 8, 1, 1))

    agg = VectorAggregate(g, dtype=jnp.float32, warp_impl="dense")
    variables = agg.init(jax.random.PRNGKey(1), feats, ref_proj, src_projs,
                         hypos)
    ref_vol = agg.apply(variables, feats, ref_proj, src_projs, hypos)

    diffs = [f[0, :, :, 0::2] - f[0, :, :, 1::2] for f in feats]
    diffs_hcw = jnp.stack([jnp.transpose(d, (0, 2, 1)) for d in diffs])
    q = jax.nn.sigmoid(diffs_hcw[0])
    p = variables["params"]["depth_weight"]
    st = variables["batch_stats"]["depth_weight"]["bn0"]
    k0 = p["conv0"]["kernel"][0, 0, 0, :, 0]
    bn_scale = (p["bn0"]["scale"][0]
                / np.sqrt(np.asarray(st["var"][0]) + 1e-5))
    bn_offset = p["bn0"]["bias"][0] - np.asarray(st["mean"][0]) * bn_scale
    k1 = p["conv1"]["kernel"][0, 0, 0, 0, 0]
    b1 = p["conv1"]["bias"][0]

    out, kcover = rowsweep_aggregate(
        diffs_hcw[1:], q, src_projs[0], ref_proj[0],
        hypos[0], k0, bn_scale, bn_offset, k1, b1, interpret=True)
    assert bool(kcover)
    out_bdhwc = jnp.transpose(out[:, :, :, :w], (0, 1, 3, 2))[None]
    np.testing.assert_allclose(np.asarray(out_bdhwc), np.asarray(ref_vol),
                               atol=2e-3, rtol=2e-2)


def test_rowsweep_segmented_matches_unsegmented(rng):
    """SMEM segmentation (round 4, for the 11-view tanks config whose plan
    arrays overflow the 1 MB scalar memory): a tiny smem_budget forces
    multiple per-segment kernel launches, which must reproduce the
    single-launch volume bit-for-bit."""
    b, v, h, w, c = 1, 4, 24, 40, 16
    g = c // 2
    feats, ref_proj, src_projs = _scene(rng, b, v, h, w, c)
    hypos = jnp.broadcast_to(
        jnp.linspace(420.0, 700.0, 8)[None, :, None, None],
        (b, 8, h, w)).astype(jnp.float32)

    diffs = [f[0, :, :, 0::2] - f[0, :, :, 1::2] for f in feats]
    diffs_hcw = jnp.stack([jnp.transpose(d, (0, 2, 1)) for d in diffs])
    q = jax.nn.sigmoid(diffs_hcw[0])
    k0 = jnp.asarray(rng.randn(g).astype(np.float32) * 0.1)

    args = (diffs_hcw[1:], q, src_projs[0], ref_proj[0], hypos[0],
            k0, 1.0, 0.0, 1.0, 0.0)
    out1, c1 = rowsweep_aggregate(*args, interpret=True)
    out2, c2 = rowsweep_aggregate(*args, interpret=True, smem_budget=1)
    assert bool(c1) == bool(c2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
