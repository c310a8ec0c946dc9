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


def _interpret_all_kernels():
    """Force interpret=True on every Pallas kernel entry point."""
    import contextlib
    from mdfnet_tpu.ops.pallas import conv2d_kernel, conv3d_kernel

    stack = contextlib.ExitStack()
    for mod, names in ((conv2d_kernel, ["conv2d_fused", "conv2d_chain_fused"]),
                       (conv3d_kernel, ["conv3d_bn_relu",
                                        "conv3d_pair_bn_relu"]),
                       (aggregate_kernel, ["rowsweep_aggregate"])):
        for n in names:
            orig = getattr(mod, n)

            def forced(*a, _o=orig, **kw):
                kw["interpret"] = True
                return _o(*a, **kw)

            stack.enter_context(mock.patch.object(mod, n, forced))
    return stack


def test_fully_fused_pallas_model_matches_dense(rng):
    """The COMPLETE TPU fast path — fused rowsweep + Pallas backbone chains
    + dhcw U-Nets + diff-emitting out-convs (emit_diffs) + keep_wpad lane
    flow — vs the dense XLA path, in interpret mode."""
    scene = make_plane_scene(height=64, width=96, nviews=4,
                             plane_depth=600.0, tilt=0.05)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]),
            jnp.asarray(batch["depth_range"]))

    m_dense = CoreNet(warp_impl="dense", dtype=jnp.float32)
    m_fast = CoreNet(warp_impl="fused", pallas_conv=True, dtype=jnp.float32)
    variables = m_dense.init(jax.random.PRNGKey(0), *args, train=False)

    out_dense = m_dense.apply(variables, *args, train=False)
    with _interpret_all_kernels():
        out_fast = m_fast.apply(variables, *args, train=False)

    d_ref = np.asarray(out_dense["depth"])
    d_fast = np.asarray(out_fast["depth"])
    assert d_fast.shape == d_ref.shape
    np.testing.assert_allclose(d_fast, d_ref, atol=0.5, rtol=1e-3)
    assert np.abs(d_fast - d_ref).mean() < 0.05
    np.testing.assert_allclose(np.asarray(out_fast["confidence"]),
                               np.asarray(out_dense["confidence"]),
                               atol=5e-2)
