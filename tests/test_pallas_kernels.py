"""Pallas kernels in interpreter mode vs their exact references."""
import numpy as np

import jax
import jax.numpy as jnp

from mdfnet_tpu.ops.pallas.conv3d_kernel import conv3d_bn_relu
from mdfnet_tpu.ops.pallas.warp_kernel import pallas_sample_2d
from mdfnet_tpu.ops.sample import bilinear_sample_2d

import pytest

pytestmark = pytest.mark.slow


def test_pallas_sample_matches_gather(rng):
    h, w, c = 40, 260, 8
    img = rng.randn(h, w, c).astype(np.float32)
    base_x = np.linspace(-5, w + 3, 200)[None, :]
    base_y = rng.uniform(4, h - 5, (6, 1))
    x = (base_x + rng.randn(6, 200) * 0.2).astype(np.float32)
    y = (base_y + rng.randn(6, 200) * 0.8).astype(np.float32)

    ref = bilinear_sample_2d(jnp.asarray(img[None]),
                             jnp.asarray(x.reshape(1, -1)),
                             jnp.asarray(y.reshape(1, -1)))[0]
    out, cov = pallas_sample_2d(jnp.asarray(img), jnp.asarray(x),
                                jnp.asarray(y), x_tile=128, y_window=16,
                                x_margin=32, interpret=True)
    assert bool(cov)
    np.testing.assert_allclose(np.asarray(out).reshape(-1, c),
                               np.asarray(ref), atol=1e-5)


def test_conv3d_bn_relu_matches_lax_conv(rng):
    d, h, ci, w, co = 6, 20, 16, 40, 8
    x = rng.randn(d, h, ci, w).astype(np.float32)
    k = (rng.randn(3, 3, 3, ci, co) * 0.1).astype(np.float32)
    scale = (0.5 + rng.rand(co)).astype(np.float32)
    offset = rng.randn(co).astype(np.float32)

    x_ndhwc = jnp.asarray(x.transpose(0, 1, 3, 2))[None]
    ref = jax.lax.conv_general_dilated(
        x_ndhwc, jnp.asarray(k), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    ref = np.maximum(np.asarray(ref) * scale + offset, 0.0)

    out = conv3d_bn_relu(jnp.asarray(x), jnp.asarray(k), jnp.asarray(scale),
                         jnp.asarray(offset), th=8, interpret=True)
    out = np.asarray(out).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.parametrize("shape", [
    # (d, h, ci, cm, co, w): odd extents, non-128 widths, ci != cm != co
    (6, 20, 16, 8, 8, 40),
    (5, 9, 32, 16, 16, 130),
    (8, 12, 8, 8, 16, 50),
])
def test_conv3d_pair_matches_two_convs(rng, shape):
    """conv3d_pair_bn_relu == two chained conv3d_bn_relu calls (the VMEM
    intermediate is bit-compatible with the HBM round-trip)."""
    from mdfnet_tpu.ops.pallas.conv3d_kernel import conv3d_pair_bn_relu

    d, h, ci, cm, co, w = shape
    x = rng.randn(d, h, ci, w).astype(np.float32)
    k1 = (rng.randn(3, 3, 3, ci, cm) * 0.1).astype(np.float32)
    k2 = (rng.randn(3, 3, 3, cm, co) * 0.1).astype(np.float32)
    s1 = (0.5 + rng.rand(cm)).astype(np.float32)
    o1 = rng.randn(cm).astype(np.float32)
    s2 = (0.5 + rng.rand(co)).astype(np.float32)
    o2 = rng.randn(co).astype(np.float32)

    mid = conv3d_bn_relu(jnp.asarray(x), jnp.asarray(k1), jnp.asarray(s1),
                         jnp.asarray(o1), th=8, interpret=True)
    ref = conv3d_bn_relu(mid, jnp.asarray(k2), jnp.asarray(s2),
                         jnp.asarray(o2), th=8, interpret=True)

    out = conv3d_pair_bn_relu(jnp.asarray(x), jnp.asarray(k1),
                              jnp.asarray(s1), jnp.asarray(o1),
                              jnp.asarray(k2), jnp.asarray(s2),
                              jnp.asarray(o2), th=8, td=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # keep_wpad: pad columns must come back zeroed for the next consumer
    outp = conv3d_pair_bn_relu(jnp.asarray(x), jnp.asarray(k1),
                               jnp.asarray(s1), jnp.asarray(o1),
                               jnp.asarray(k2), jnp.asarray(s2),
                               jnp.asarray(o2), th=8, td=2,
                               keep_wpad=True, interpret=True)
    wp = -(-w // 128) * 128
    assert outp.shape[-1] == wp
    np.testing.assert_allclose(np.asarray(outp[..., :w]), np.asarray(ref),
                               atol=1e-4)
    assert not np.any(np.asarray(outp[..., w:]))


def test_conv3d_pair_bf16_aligned_input(rng):
    """bf16 pair with a 128-aligned zero-padded input extent (the dhcw
    U-Net's production calling convention)."""
    from mdfnet_tpu.ops.pallas.conv3d_kernel import conv3d_pair_bn_relu

    d, h, ci, cm, co, w = 4, 10, 16, 8, 8, 100
    wp = 128
    x = np.zeros((d, h, ci, wp), np.float32)
    x[..., :w] = rng.randn(d, h, ci, w)
    k1 = (rng.randn(3, 3, 3, ci, cm) * 0.1).astype(np.float32)
    k2 = (rng.randn(3, 3, 3, cm, co) * 0.1).astype(np.float32)
    s1 = (0.5 + rng.rand(cm)).astype(np.float32)
    o1 = rng.randn(cm).astype(np.float32)
    s2 = (0.5 + rng.rand(co)).astype(np.float32)
    o2 = rng.randn(co).astype(np.float32)

    xb = jnp.asarray(x).astype(jnp.bfloat16)
    mid = conv3d_bn_relu(xb, jnp.asarray(k1), jnp.asarray(s1),
                         jnp.asarray(o1), th=8, valid_w=w, keep_wpad=True,
                         interpret=True)
    ref = conv3d_bn_relu(mid, jnp.asarray(k2), jnp.asarray(s2),
                         jnp.asarray(o2), th=8, valid_w=w, interpret=True)
    out = conv3d_pair_bn_relu(xb, jnp.asarray(k1), jnp.asarray(s1),
                              jnp.asarray(o1), jnp.asarray(k2),
                              jnp.asarray(s2), jnp.asarray(o2), th=8, td=2,
                              valid_w=w, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)


def test_conv3d_bn_relu_via_module(rng):
    """ConvBNReLU3D(pallas_eval=True) matches the XLA path in interpret mode,
    sharing the same parameter structure."""
    import functools
    from unittest import mock
    from mdfnet_tpu.models.layers import ConvBNReLU3D
    from mdfnet_tpu.ops.pallas import conv3d_kernel

    x = jnp.asarray(rng.randn(1, 6, 12, 24, 16).astype(np.float32))
    m_ref = ConvBNReLU3D(8, dtype=jnp.float32)
    m_pal = ConvBNReLU3D(8, dtype=jnp.float32, pallas_eval=True)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    out_ref = m_ref.apply(v, x)

    orig = conv3d_kernel.conv3d_bn_relu

    def forced(x_, k_, s_, o_, **kw):
        kw["interpret"] = True
        kw.setdefault("th", 8)
        return orig(x_, k_, s_, o_, **kw)

    with mock.patch.object(conv3d_kernel, "conv3d_bn_relu", forced):
        out_pal = m_pal.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=1e-4)


def test_trconv3d_bn_relu_matches_module(rng):
    """Phase-decomposed transposed conv == ConvTransposeND + BN + relu."""
    from unittest import mock
    from mdfnet_tpu.models.layers import TrConvBNReLU3D
    from mdfnet_tpu.ops.pallas import conv3d_kernel

    x = jnp.asarray(rng.randn(1, 4, 10, 24, 16).astype(np.float32))
    m_ref = TrConvBNReLU3D(8, dtype=jnp.float32)
    m_pal = TrConvBNReLU3D(8, dtype=jnp.float32, pallas_eval=True)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    out_ref = m_ref.apply(v, x)

    orig = conv3d_kernel.conv3d_bn_relu

    def forced(x_, k_, s_, o_, **kw):
        kw["interpret"] = True
        kw["th"] = 4
        return orig(x_, k_, s_, o_, **kw)

    with mock.patch.object(conv3d_kernel, "conv3d_bn_relu", forced):
        out_pal = m_pal.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=1e-4)


def test_conv3d_stride2_matches_lax_conv(rng):
    for (d, h, ci, w, co) in [(6, 20, 16, 40, 8), (7, 19, 8, 33, 16)]:
        x = rng.randn(d, h, ci, w).astype(np.float32)
        k = (rng.randn(3, 3, 3, ci, co) * 0.1).astype(np.float32)
        scale = (0.5 + rng.rand(co)).astype(np.float32)
        offset = rng.randn(co).astype(np.float32)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x.transpose(0, 1, 3, 2))[None], jnp.asarray(k),
            (2, 2, 2), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
        ref = np.maximum(np.asarray(ref) * scale + offset, 0.0)
        out = conv3d_bn_relu(jnp.asarray(x), jnp.asarray(k),
                             jnp.asarray(scale), jnp.asarray(offset),
                             th=4, stride=2, interpret=True)
        np.testing.assert_allclose(np.asarray(out).transpose(0, 1, 3, 2), ref,
                                   atol=1e-4)


def test_pallas_warp_custom_vjp_matches_dense_grad(rng):
    """warp_impl="pallas" is train-safe: its custom VJP (dense tent-matmul
    transpose) must produce the same d(src_feat) as differentiating the
    dense warp directly, and zero grads for projections/hypotheses."""
    from mdfnet_tpu import geometry
    from mdfnet_tpu.ops.pallas.warp_kernel import homography_warp_pallas
    from mdfnet_tpu.ops.warp_dense import homography_warp_dense

    b, h, w, c, d = 1, 16, 32, 4, 3
    src = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    intr = jnp.tile(jnp.asarray([[40.0, 0, w / 2], [0, 40.0, h / 2],
                                 [0, 0, 1.0]], jnp.float32), (b, 2, 1, 1))
    extr = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 2, 1, 1))
    extr = extr.at[:, 1, 0, 3].set(2.0)
    ref_proj, src_projs = geometry.projection_matrices(intr, extr, 3)
    hypos = jnp.broadcast_to(
        jnp.linspace(500.0, 700.0, d)[None, :, None, None], (b, d, 1, 1))

    def loss_pallas(s):
        out = homography_warp_pallas(s, src_projs[:, 0], ref_proj, hypos)
        return jnp.sum(out * out)

    def loss_dense(s):
        out = homography_warp_dense(s, src_projs[:, 0], ref_proj, hypos)
        return jnp.sum(out * out)

    # interpret-mode forward via the impl's default path runs on CPU
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(loss_pallas)(src)
    g_dense = jax.grad(loss_dense)(src)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_dense),
                               atol=1e-4)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(lambda p: jnp.sum(homography_warp_pallas(
            src, p, ref_proj, hypos)))(src_projs[:, 0])
    np.testing.assert_array_equal(np.asarray(gp), 0.0)
