"""Full CoreNet with warp_impl="fused" vs the dense reference path."""
from unittest import mock

import numpy as np

import jax
import jax.numpy as jnp

from mdfnet_tpu.models.core import CoreNet
from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
from mdfnet_tpu.ops.pallas import aggregate_kernel

import pytest

pytestmark = pytest.mark.slow


def _interpret_rowsweep():
    orig = aggregate_kernel.rowsweep_aggregate

    def forced(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    return mock.patch.object(aggregate_kernel, "rowsweep_aggregate", forced)


def test_fused_model_matches_dense(rng):
    scene = make_plane_scene(height=64, width=96, nviews=4,
                             plane_depth=600.0, tilt=0.05)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["depth_range"]))

    m_dense = CoreNet(warp_impl="dense", dtype=jnp.float32)
    m_fused = CoreNet(warp_impl="fused", dtype=jnp.float32)
    variables = m_dense.init(jax.random.PRNGKey(0), *args, train=False)

    out_dense = m_dense.apply(variables, *args, train=False)
    with _interpret_rowsweep():
        out_fused = m_fused.apply(variables, *args, train=False)

    d_ref = np.asarray(out_dense["depth"])
    d_fused = np.asarray(out_fused["depth"])
    assert d_fused.shape == d_ref.shape
    # identical math modulo f32 accumulation-order differences
    np.testing.assert_allclose(d_fused, d_ref, atol=0.5, rtol=1e-3)
    assert np.abs(d_fused - d_ref).mean() < 0.05

    c_ref = np.asarray(out_dense["confidence"])
    c_fused = np.asarray(out_fused["confidence"])
    np.testing.assert_allclose(c_fused, c_ref, atol=5e-2)
