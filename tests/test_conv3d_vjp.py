"""Exactness of the train-mode Pallas conv VJPs (ops/pallas/conv3d_vjp.py)
vs XLA autodiff of the same convolution, in interpret mode on CPU.

These rules let the training U-Nets (reference net/unit/regular.py) ride the
fused (D, H, C, W) kernels; any orientation/padding slip in the hand-written
transposes would silently corrupt training gradients, so every combination
of stride and odd/even extents is pinned here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdfnet_tpu.models.layers import _dimension_numbers
from mdfnet_tpu.ops.pallas.conv3d_vjp import conv3d_train, trconv3d_train


def _xla_conv(x, k, stride):
    xn = jnp.transpose(x, (0, 1, 2, 4, 3))
    y = jax.lax.conv_general_dilated(xn, k, (stride,) * 3, [(1, 1)] * 3,
                                     dimension_numbers=_dimension_numbers(3))
    return jnp.transpose(y, (0, 1, 2, 4, 3))


def _xla_trconv(x, k):
    xn = jnp.transpose(x, (0, 1, 2, 4, 3))
    kf = jnp.swapaxes(jnp.flip(k, (0, 1, 2)), -1, -2)
    y = jax.lax.conv_general_dilated(xn, kf, (1, 1, 1), [(1, 2)] * 3,
                                     lhs_dilation=(2, 2, 2),
                                     dimension_numbers=_dimension_numbers(3))
    return jnp.transpose(y, (0, 1, 2, 4, 3))


@pytest.mark.parametrize("stride,shape", [
    (1, (2, 5, 6, 4, 8)),
    (1, (1, 4, 8, 8, 16)),
    (2, (2, 6, 8, 4, 16)),
    (2, (1, 5, 7, 8, 9)),     # odd D/H/W
])
def test_conv3d_train_matches_xla_grads(stride, shape):
    rng = np.random.RandomState(0)
    b, d, h, ci, w = shape
    co = 6
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.randn(b, -(-d // stride), -(-h // stride), co,
                               -(-w // stride)).astype(np.float32))

    y, vjp = jax.vjp(lambda xx, kk: conv3d_train(xx, kk, stride, True), x, k)
    y_ref, vjp_ref = jax.vjp(lambda xx, kk: _xla_conv(xx, kk, stride), x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    dx, dk = vjp(ct)
    dx_ref, dk_ref = vjp_ref(ct)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [
    (2, 3, 4, 4, 8),
    (1, 4, 5, 8, 9),
])
def test_trconv3d_train_matches_xla_grads(shape):
    rng = np.random.RandomState(1)
    b, d, h, ci, w = shape
    co = 5
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, co, ci).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.randn(b, 2 * d, 2 * h, co, 2 * w).astype(np.float32))

    y, vjp = jax.vjp(lambda xx, kk: trconv3d_train(xx, kk, True), x, k)
    y_ref, vjp_ref = jax.vjp(_xla_trconv, x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    dx, dk = vjp(ct)
    dx_ref, dk_ref = vjp_ref(ct)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("net", ["3s", "4s"])
def test_regularnet_train_dhcw_matches_xla(net):
    """Full U-Net train fwd + param/input grads + BN stat updates on the
    Pallas dhcw path == the XLA path (shared variables, interpret mode)."""
    from unittest import mock
    from mdfnet_tpu.ops.pallas import conv3d_vjp
    from mdfnet_tpu.models.regularize import (
        RegularNet3Scales, RegularNet4Scales)

    conv_orig, tr_orig = conv3d_vjp.conv3d_bn_relu, conv3d_vjp.trconv3d_bn_relu

    def conv_i(*a, **kw):
        return conv_orig(*a, **{**kw, "interpret": True})

    def tr_i(*a, **kw):
        return tr_orig(*a, **{**kw, "interpret": True})

    rng = np.random.RandomState(2)
    if net == "3s":
        cls, kw = RegularNet3Scales, dict(inner_chs=4)
        x = rng.randn(2, 8, 8, 8, 8).astype(np.float32)   # (B, D, H, W, C)
    else:
        cls, kw = RegularNet4Scales, dict(base_chs=4)
        x = rng.randn(2, 8, 8, 8, 4).astype(np.float32)
    x = jnp.asarray(x)
    xt = jnp.transpose(x, (0, 1, 2, 4, 3))                 # (B, D, H, C, W)

    m_ref = cls(dtype=jnp.float32, **kw)
    m_pal = cls(dtype=jnp.float32, pallas_eval=True, **kw)
    v = m_ref.init(jax.random.PRNGKey(0), x, True)

    def run_ref(params, xx):
        out, mut = m_ref.apply({**v, "params": params}, xx, True,
                               mutable=["batch_stats"])
        return jnp.sum(out ** 2), (out, mut["batch_stats"])

    def run_pal(params, xx):
        out, mut = m_pal.apply({**v, "params": params}, xx, True, True,
                               mutable=["batch_stats"])
        return jnp.sum(out ** 2), (out, mut["batch_stats"])

    (l_r, (o_r, bs_r)), g_r = jax.value_and_grad(run_ref, argnums=(0, 1),
                                                 has_aux=True)(v["params"], x)
    with mock.patch.object(conv3d_vjp, "conv3d_bn_relu", conv_i), \
            mock.patch.object(conv3d_vjp, "trconv3d_bn_relu", tr_i):
        (l_p, (o_p, bs_p)), g_p = jax.value_and_grad(
            run_pal, argnums=(0, 1), has_aux=True)(v["params"], xt)

    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_r),
                               rtol=1e-4, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-3, atol=1e-4),
        bs_p, bs_r)
    # param grads match leaf-by-leaf (tolerances absorb f32 accumulation
    # order; both paths accumulate in f32)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-2, atol=5e-4),
        g_p[0], g_r[0])
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(g_p[1], (0, 1, 2, 4, 3))),
        np.asarray(g_r[1]), rtol=1e-3, atol=1e-4)
