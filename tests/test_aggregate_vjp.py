"""Train-mode fused rowsweep aggregate (custom VJP) vs the dense path.

The forward runs the stats + per-view-affine rowsweep kernels and the
backward rematerialises through homography_warp_pallas's splat-adjoint VJP
(ops/pallas/aggregate_vjp.py) — all in interpret mode here. The dense path
is the existing fully-differentiable XLA reference (what train used before
round 5). Values agree to the kernel's bf16 tent-matmul tolerance; the
gradient STRUCTURE (params + every view's features + ref diffs) must match.
"""
import numpy as np

import jax
import jax.numpy as jnp

import pytest

from mdfnet_tpu import geometry
from mdfnet_tpu.data.synthetic import make_plane_scene
from mdfnet_tpu.models.aggregate import VectorAggregate
from mdfnet_tpu.ops.pallas import runtime as pallas_rt

pytestmark = pytest.mark.slow


@pytest.fixture
def interpret_kernels():
    pallas_rt.set_force_interpret(True)
    jax.clear_caches()
    yield
    pallas_rt.set_force_interpret(False)
    jax.clear_caches()


def _setup(rng, b=2, h=16, w=24, d=5, g=4, v=3):
    c = 2 * g
    scene = make_plane_scene(height=h, width=w, nviews=v, plane_depth=600.0,
                             tilt=0.05)
    feats = [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)) * 0.5
             for _ in range(v)]
    intr = jnp.asarray(np.broadcast_to(scene.intrinsics[None],
                                       (b,) + scene.intrinsics.shape))
    extr = jnp.asarray(np.broadcast_to(scene.extrinsics[None],
                                       (b,) + scene.extrinsics.shape))
    rp, sp = geometry.projection_matrices(intr, extr, 2)
    hyp = jnp.broadcast_to(jnp.linspace(520, 680, d)[None, :, None, None],
                           (b, d, h, w)).astype(jnp.float32)
    return feats, rp, sp, hyp, g


def test_fused_train_aggregate_matches_dense(rng, interpret_kernels):
    feats, rp, sp, hyp, g = _setup(rng)

    dense = VectorAggregate(g, warp_impl="dense")
    fused = VectorAggregate(g, warp_impl="fused")
    variables = dense.init(jax.random.PRNGKey(0), feats, rp, sp, hyp, True)

    out_d, upd_d = dense.apply(variables, feats, rp, sp, hyp, True,
                               mutable=["batch_stats"])
    out_f, upd_f = fused.apply(variables, feats, rp, sp, hyp, True,
                               mutable=["batch_stats"])
    assert out_f.shape == out_d.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               atol=2e-2, rtol=2e-2)
    # the BN running-stat EMA must replay the dense path's sequential
    # per-view updates
    for a, b_ in zip(jax.tree_util.tree_leaves(upd_f["batch_stats"]),
                     jax.tree_util.tree_leaves(upd_d["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)


def test_fused_train_aggregate_grads_match_dense(rng, interpret_kernels):
    feats, rp, sp, hyp, g = _setup(rng)

    variables = VectorAggregate(g, warp_impl="dense").init(
        jax.random.PRNGKey(0), feats, rp, sp, hyp, True)

    def grads(impl):
        agg = VectorAggregate(g, warp_impl=impl)

        def loss(params, fs):
            out, _ = agg.apply({**variables, "params": params}, fs, rp, sp,
                               hyp, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1))(variables["params"], feats)

    want_p, want_f = grads("dense")
    got_p, got_f = grads("fused")
    for a, b_ in zip(jax.tree_util.tree_leaves(got_p),
                     jax.tree_util.tree_leaves(want_p)):
        scale = max(1e-3, float(np.abs(np.asarray(b_)).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b_) / scale,
                                   rtol=0, atol=3e-2)
    for a, b_ in zip(got_f, want_f):
        scale = max(1e-3, float(np.abs(np.asarray(b_)).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b_) / scale,
                                   rtol=0, atol=3e-2)
