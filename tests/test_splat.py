"""Scatter-free warp adjoint (ops/splat.py): exactness vs autodiff of the
gather warp, coverage flag behaviour, dtype/padding edges."""
import numpy as np

import jax
import jax.numpy as jnp

from mdfnet_tpu import geometry
from mdfnet_tpu.data.synthetic import make_plane_scene
from mdfnet_tpu.ops.splat import dense_splat_2d
from mdfnet_tpu.ops.warp import homography_warp


def _warp_setup(rng, h=48, w=64, d=6, c=8, per_pixel_hypos=True):
    scene = make_plane_scene(height=h, width=w, nviews=2, plane_depth=600.0,
                             tilt=0.05)
    feat = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    intr = jnp.asarray(scene.intrinsics[None])
    extr = jnp.asarray(scene.extrinsics[None])
    rp, sp = geometry.projection_matrices(intr, extr, 2)
    if per_pixel_hypos:
        base = jnp.linspace(500, 700, d)[None, :, None, None]
        wobble = 20.0 * jnp.sin(jnp.arange(h) / 7.0)[None, None, :, None]
        hyp = jnp.broadcast_to(base + wobble, (1, d, h, w)).astype(jnp.float32)
    else:
        hyp = jnp.broadcast_to(jnp.linspace(500, 700, d)[None, :, None, None],
                               (1, d, 1, 1)).astype(jnp.float32)
    return feat, sp[:, 0], rp, hyp


def _coords(src_proj, ref_proj, hyp, h, w):
    x_src, y_src = geometry.sweep_coordinates(src_proj, ref_proj, hyp, h, w)
    x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, h, w)
    d = hyp.shape[1]
    return (x_eff.reshape(1, d, h, w), y_eff.reshape(1, d, h, w))


def test_splat_matches_gather_autodiff(rng):
    """d_src from dense_splat_2d == jax.vjp of the (exact) gather warp."""
    h, w, d, c = 48, 64, 6, 8
    feat, sp, rp, hyp = _warp_setup(rng, h, w, d, c)
    g = jnp.asarray(rng.randn(1, d, h, w, c).astype(np.float32))

    _, vjp_fn = jax.vjp(lambda f: homography_warp(f, sp, rp, hyp), feat)
    (want,) = vjp_fn(g)

    x, y = _coords(sp, rp, hyp, h, w)
    got, cover = dense_splat_2d(g, x, y, h, w, x_tile=32, x_margin=16,
                                band=8, chunk_tiles=13)
    assert bool(cover)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_splat_uniform_hypos_and_tile_pad(rng):
    """(B, D, 1, 1) broadcast hypos; width not a multiple of x_tile."""
    h, w, d, c = 40, 56, 5, 4
    feat, sp, rp, hyp = _warp_setup(rng, h, w, d, c, per_pixel_hypos=False)
    g = jnp.asarray(rng.randn(1, d, h, w, c).astype(np.float32))

    _, vjp_fn = jax.vjp(lambda f: homography_warp(f, sp, rp, hyp), feat)
    (want,) = vjp_fn(g)

    x, y = _coords(sp, rp, hyp, h, w)
    got, cover = dense_splat_2d(g, x, y, h, w, x_tile=48, x_margin=16,
                                band=6)
    assert bool(cover)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_splat_batch_multi(rng):
    """Batched inputs with different cams per item."""
    h, w, d, c = 32, 48, 4, 3
    scene = make_plane_scene(height=h, width=w, nviews=3, plane_depth=600.0,
                             tilt=0.05)
    feat = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    intr = jnp.asarray(np.stack([scene.intrinsics[:2], scene.intrinsics[1:]]))
    extr = jnp.asarray(np.stack([scene.extrinsics[:2], scene.extrinsics[1:]]))
    rp, sp = geometry.projection_matrices(intr, extr, 2)
    hyp = jnp.broadcast_to(jnp.linspace(520, 680, d)[None, :, None, None],
                           (2, d, h, w)).astype(jnp.float32)
    g = jnp.asarray(rng.randn(2, d, h, w, c).astype(np.float32))

    _, vjp_fn = jax.vjp(lambda f: homography_warp(f, sp[:, 0], rp, hyp), feat)
    (want,) = vjp_fn(g)

    x, y = _coords_multi(sp[:, 0], rp, hyp, h, w)
    got, cover = dense_splat_2d(g, x, y, h, w, x_tile=32, x_margin=16,
                                band=6)
    assert bool(cover)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def _coords_multi(src_proj, ref_proj, hyp, h, w):
    x_src, y_src = geometry.sweep_coordinates(src_proj, ref_proj, hyp, h, w)
    x_eff, y_eff = geometry.reference_grid_coords(x_src, y_src, h, w)
    b, d = hyp.shape[:2]
    return (x_eff.reshape(b, d, h, w), y_eff.reshape(b, d, h, w))


def test_splat_coverage_flag_trips(rng):
    """Random (incoherent) coordinates must trip the coverage contract."""
    h, w, d, c = 24, 32, 3, 2
    g = jnp.asarray(rng.randn(1, d, h, w, c).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, w - 1, (1, d, h, w)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, h - 1, (1, d, h, w)).astype(np.float32))
    _, cover = dense_splat_2d(g, x, y, h, w, x_tile=16, x_margin=4, band=4)
    assert not bool(cover)


def test_splat_out_of_image_samples_contribute_zero(rng):
    """Samples fully outside the image must not corrupt the adjoint."""
    h, w, d, c = 24, 32, 3, 2
    feat, sp, rp, hyp = _warp_setup(rng, h, w, d, c, per_pixel_hypos=False)
    # shift the source proj so a band of samples falls off-image
    sp = sp.at[:, 0, 3].add(40.0)
    g = jnp.asarray(rng.randn(1, d, h, w, c).astype(np.float32))

    _, vjp_fn = jax.vjp(lambda f: homography_warp(f, sp, rp, hyp), feat)
    (want,) = vjp_fn(g)

    x, y = _coords(sp, rp, hyp, h, w)
    got, cover = dense_splat_2d(g, x, y, h, w, x_tile=16, x_margin=16,
                                band=6)
    assert bool(cover)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_warp_dense_custom_vjp_matches_gather(rng):
    """Gradient through homography_warp_dense (splat VJP) == gather autodiff."""
    h, w, d, c = 48, 64, 6, 8
    feat, sp, rp, hyp = _warp_setup(rng, h, w, d, c)
    g = jnp.asarray(rng.randn(1, d, h, w, c).astype(np.float32))

    from mdfnet_tpu.ops.warp_dense import homography_warp_dense

    def loss_fast(f):
        return jnp.vdot(homography_warp_dense(f, sp, rp, hyp), g)

    def loss_ref(f):
        return jnp.vdot(homography_warp(f, sp, rp, hyp), g)

    gf = jax.grad(loss_fast)(feat)
    gr = jax.grad(loss_ref)(feat)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_aggregate_train_grads_match_gather(rng):
    """VectorAggregate train-mode gradients (params + all view features):
    fast warp impls vs the gather oracle."""
    from mdfnet_tpu.models.aggregate import VectorAggregate

    h, w, d, c, v = 32, 48, 4, 8, 3
    scene = make_plane_scene(height=h, width=w, nviews=v, plane_depth=600.0,
                             tilt=0.05)
    feats = [jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
             for _ in range(v)]
    intr = jnp.asarray(scene.intrinsics[None])
    extr = jnp.asarray(scene.extrinsics[None])
    rp, sp = geometry.projection_matrices(intr, extr, 2)
    hyp = jnp.broadcast_to(jnp.linspace(500, 700, d)[None, :, None, None],
                           (1, d, h, w)).astype(jnp.float32)

    def grads(impl):
        agg = VectorAggregate(c // 2, warp_impl=impl)
        variables = agg.init(jax.random.PRNGKey(0), feats, rp, sp, hyp, True)

        def loss(params, fs):
            out, _ = agg.apply({**variables, "params": params}, fs, rp, sp,
                               hyp, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1))(variables["params"], feats)

    # "pallas" shares this VJP but its forward kernel needs a TPU; the
    # warp-level test above covers the shared backward.
    want_p, want_f = grads("gather")
    for impl in ("dense",):
        got_p, got_f = grads(impl)
        for a, b in zip(jax.tree_util.tree_leaves(got_p),
                        jax.tree_util.tree_leaves(want_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)
        for a, b in zip(got_f, want_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def test_pallas_splat_matches_gather_autodiff(rng):
    """pallas_splat_2d (interpret) == jax.vjp of the gather warp."""
    from mdfnet_tpu.ops.pallas.splat_kernel import pallas_splat_2d

    h, w, d, c = 48, 64, 6, 8
    feat, sp, rp, hyp = _warp_setup(rng, h, w, d, c)
    g = jnp.asarray(rng.randn(1, d, h, w, c).astype(np.float32))

    _, vjp_fn = jax.vjp(lambda f: homography_warp(f, sp, rp, hyp), feat)
    (want,) = vjp_fn(g)

    x, y = _coords(sp, rp, hyp, h, w)
    got, cover = pallas_splat_2d(g, x, y, h, w, band=8, x_tile=128,
                                 x_margin=16, interpret=True)
    assert bool(cover)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_pallas_splat_batch_odd_planes(rng):
    """Batched + odd plane count + multi-block width (interpret)."""
    from mdfnet_tpu.ops.pallas.splat_kernel import pallas_splat_2d

    h, w, d, c = 32, 160, 5, 4
    scene = make_plane_scene(height=h, width=w, nviews=3, plane_depth=600.0,
                             tilt=0.05)
    feat = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    intr = jnp.asarray(np.stack([scene.intrinsics[:2], scene.intrinsics[1:]]))
    extr = jnp.asarray(np.stack([scene.extrinsics[:2], scene.extrinsics[1:]]))
    rp, sp = geometry.projection_matrices(intr, extr, 2)
    hyp = jnp.broadcast_to(jnp.linspace(520, 680, d)[None, :, None, None],
                           (2, d, h, w)).astype(jnp.float32)
    g = jnp.asarray(rng.randn(2, d, h, w, c).astype(np.float32))

    _, vjp_fn = jax.vjp(lambda f: homography_warp(f, sp[:, 0], rp, hyp), feat)
    (want,) = vjp_fn(g)

    x, y = _coords_multi(sp[:, 0], rp, hyp, h, w)
    got, cover = pallas_splat_2d(g, x, y, h, w, band=6, x_tile=128,
                                 x_margin=16, interpret=True)
    assert bool(cover)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
