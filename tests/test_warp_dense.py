"""Dense (gather-free) warp path: exactness vs the gather sampler, coverage
flag behaviour, tile/chunk padding edges."""
import numpy as np

import jax.numpy as jnp

from mdfnet_tpu import geometry
from mdfnet_tpu.data.synthetic import make_plane_scene
from mdfnet_tpu.ops.sample import bilinear_sample_2d
from mdfnet_tpu.ops.warp import homography_warp
from mdfnet_tpu.ops.warp_dense import dense_sample_2d, homography_warp_dense


def test_dense_sample_matches_gather(rng):
    b, h, w, c = 2, 40, 56, 8
    img = rng.randn(b, h, w, c).astype(np.float32)
    base_x = np.linspace(-5, w + 3, 50)[None, None, :]
    base_y = rng.uniform(0, h - 1, (b, 6, 1))
    x = (base_x + rng.randn(b, 6, 50) * 0.3).astype(np.float32)
    y = (base_y + rng.randn(b, 6, 50) * 2.0).astype(np.float32)

    ref = bilinear_sample_2d(jnp.asarray(img), jnp.asarray(x.reshape(b, -1)),
                             jnp.asarray(y.reshape(b, -1)))
    # tile=16 with t_total=50 exercises tile padding; chunk_tiles=7 exercises
    # chunk padding
    out, cov = dense_sample_2d(jnp.asarray(img), jnp.asarray(x),
                               jnp.asarray(y), x_tile=16, y_window=16,
                               x_margin=16, chunk_tiles=7)
    assert bool(cov)
    np.testing.assert_allclose(np.asarray(out).reshape(b, -1, c),
                               np.asarray(ref), atol=1e-5)


def test_dense_warp_matches_gather_warp(rng):
    scene = make_plane_scene(height=48, width=64, nviews=2, plane_depth=600.0,
                             tilt=0.05)
    feat = rng.randn(1, 48, 64, 8).astype(np.float32)
    intr = jnp.asarray(scene.intrinsics[None])
    extr = jnp.asarray(scene.extrinsics[None])
    rp, sp = geometry.projection_matrices(intr, extr, 2)
    hyp = jnp.broadcast_to(jnp.linspace(500, 700, 6)[None, :, None, None],
                           (1, 6, 48, 64)).astype(jnp.float32)
    a = homography_warp(jnp.asarray(feat), sp[:, 0], rp, hyp)
    d = homography_warp_dense(jnp.asarray(feat), sp[:, 0], rp, hyp,
                              x_tile=32, y_window=8, x_margin=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-5)


def test_dense_sample_coverage_flag(rng):
    """Scattered (non-coherent) coordinates must trip the coverage check."""
    b, h, w, c = 1, 64, 64, 4
    img = rng.randn(b, h, w, c).astype(np.float32)
    x = rng.uniform(0, w - 1, (b, 4, 32)).astype(np.float32)
    y = rng.uniform(0, h - 1, (b, 4, 32)).astype(np.float32)
    _, cov = dense_sample_2d(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
                             x_tile=32, y_window=4, x_margin=0)
    assert not bool(cov)


def test_dense_sample_all_out_of_image(rng):
    b, h, w, c = 1, 16, 16, 4
    img = rng.randn(b, h, w, c).astype(np.float32)
    x = np.full((b, 2, 8), -10.0, np.float32)
    y = np.full((b, 2, 8), 99.0, np.float32)
    out, _ = dense_sample_2d(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
                             x_tile=8, y_window=4, x_margin=4)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
