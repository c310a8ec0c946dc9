"""Depth-folded 2D U-Net (ops/fold2d.py): weight transforms vs lax 3D
convs, and the full RegularNet4Scales fold2d path vs the plain XLA path."""
from unittest import mock

import numpy as np

import jax
import jax.numpy as jnp

import pytest

from mdfnet_tpu.models.layers import ConvTransposeND, _dimension_numbers
from mdfnet_tpu.ops import fold2d


def _conv(x, k, s, nd):
    return jax.lax.conv_general_dilated(
        x, k, (s,) * nd, [(1, 1)] * nd,
        dimension_numbers=_dimension_numbers(nd))


@pytest.mark.parametrize("stride", [1, 2])
def test_fold_conv3d_matches_lax(rng, stride):
    D, H, W, CI, CO = 8, 8, 12, 8, 16
    x = jnp.asarray(rng.randn(1, D, H, W, CI).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, CI, CO).astype(np.float32) * 0.2)
    ref = _conv(x, k, stride, 3)
    xf = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(1, H, W, D * CI)
    out = _conv(xf, fold2d.fold_conv3d(k, D, stride), stride, 2)
    dout = D // stride
    out = out.reshape(1, H // stride, W // stride, dout, CO)
    out = jnp.transpose(out, (0, 3, 1, 2, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fold_trconv3d_matches_torch_semantics(rng):
    D, H, W, CI, CO = 4, 8, 12, 16, 8
    x = jnp.asarray(rng.randn(1, D, H, W, CI).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, CO, CI).astype(np.float32) * 0.2)
    m = ConvTransposeND(CO, (3, 3, 3), 2, 1, 1, use_bias=False)
    ref = m.apply({"params": {"kernel": k}}, x)  # (1, 2D, 2H, 2W, CO)

    xf = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(1, H, W, D * CI)
    out = _conv(xf, fold2d.fold_trconv3d(k, D), 1, 2)  # (1,H,W,4*2D*CO)
    out = out.reshape(1, H, W, 2, 2, 2 * D * CO)
    out = jnp.transpose(out, (0, 1, 3, 2, 4, 5))
    out = out.reshape(1, 2 * H, 2 * W, 2 * D, CO)
    out = jnp.transpose(out, (0, 3, 1, 2, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_interleave_2x2(rng):
    b, hc, cf, wc = 1, 3, 5, 4
    y = jnp.asarray(rng.randn(b, hc, 4 * cf, wc + 2).astype(np.float32))
    out = fold2d.interleave_2x2(y, cf, wc)
    assert out.shape == (b, 2 * hc, cf, 2 * wc)
    for py in range(2):
        for px in range(2):
            np.testing.assert_array_equal(
                np.asarray(out[:, py::2, :, px::2]),
                np.asarray(y[:, :, (py * 2 + px) * cf:(py * 2 + px + 1) * cf,
                             :wc]))


@pytest.mark.slow
@pytest.mark.parametrize("D,C", [(8, 8), (24, 16)])
def test_regularnet_fold2d_matches_plain(rng, D, C):
    """RegularNet4Scales at D*c0 in (64, 192) takes the depth-folded path;
    exact vs the plain XLA path (interpret-mode Pallas, randomized BN
    stats, lane-padded dhcw input). (8,8) is the stage-2 geometry,
    (24,16) the stage-1 one (G=16 cost volume into base 8ch)."""
    from mdfnet_tpu.models.regularize import RegularNet4Scales
    from mdfnet_tpu.ops.pallas import conv2d_kernel

    H, W = 16, 24
    x = jnp.asarray(rng.randn(1, D, H, W, C).astype(np.float32))
    m_plain = RegularNet4Scales(8, dtype=jnp.float32)
    m_fast = RegularNet4Scales(8, dtype=jnp.float32, pallas_eval=True)
    v = m_plain.init(jax.random.PRNGKey(0), x)
    v = {"params": jax.tree_util.tree_map(
             lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)
                                   * 0.3), v["params"]),
         "batch_stats": jax.tree_util.tree_map(
             lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32)
                                   + 0.5), v["batch_stats"])}
    ref = m_plain.apply(v, x)

    # dhcw input with zeroed junk lanes (the producer-kernel invariant)
    xp = jnp.transpose(x, (0, 1, 2, 4, 3))
    xp = jnp.pad(xp, ((0, 0),) * 4 + ((0, 128 - W),))

    orig = conv2d_kernel.conv2d_fused

    def forced(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(conv2d_kernel, "conv2d_fused", forced):
        out = m_fast.apply(v, xp, False, True, W)
        v2 = m_fast.init(jax.random.PRNGKey(0), xp, False, True, W)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    pa = {jax.tree_util.keystr(p): a.shape for p, a in
          jax.tree_util.tree_leaves_with_path(v)}
    pb = {jax.tree_util.keystr(p): a.shape for p, a in
          jax.tree_util.tree_leaves_with_path(v2)}
    assert pa == pb
