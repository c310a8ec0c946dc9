"""Custom-VJP Pallas conv2d (ops/pallas/conv2d_vjp.py) vs XLA autodiff, and
the Pallas train backbone vs the XLA train backbone — exact same math,
gradients, and BatchNorm statistics (interpret mode on CPU)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from mdfnet_tpu.models.layers import _dimension_numbers


def _xla_conv(x_hcw, kernel, stride):
    xn = jnp.transpose(x_hcw, (0, 1, 3, 2))
    p = (kernel.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(xn, kernel, (stride, stride),
                                     [(p, p)] * 2,
                                     dimension_numbers=_dimension_numbers(2))
    return jnp.transpose(y, (0, 1, 3, 2))


@pytest.mark.parametrize("k,stride,ci,co", [(3, 1, 8, 8), (5, 2, 8, 16),
                                            (3, 1, 4, 8), (5, 2, 16, 32)])
def test_conv2d_train_matches_xla(rng, k, stride, ci, co):
    from mdfnet_tpu.ops.pallas.conv2d_vjp import conv2d_train

    n, h, w = 2, 16, 24
    x = jnp.asarray(rng.randn(n, h, ci, w).astype(np.float32))
    kern = jnp.asarray((rng.randn(k, k, ci, co) * 0.2).astype(np.float32))
    cot = jnp.asarray(rng.randn(n, -(-h // stride), co,
                                -(-w // stride)).astype(np.float32))

    def loss_p(x_, k_):
        return jnp.sum(conv2d_train(x_, k_, stride, True) * cot)

    def loss_x(x_, k_):
        y = _xla_conv(x_, k_, stride)
        return jnp.sum(y * cot[:, :y.shape[1], :, :y.shape[3]])

    yp = conv2d_train(x, kern, stride, True)
    yx = _xla_conv(x, kern, stride)
    assert yp.shape[1] >= yx.shape[1] and yp.shape[3] >= yx.shape[3]
    np.testing.assert_allclose(np.asarray(yp[:, :yx.shape[1], :, :yx.shape[3]]),
                               np.asarray(yx), atol=1e-4)

    (dp_x, dp_k) = jax.grad(loss_p, argnums=(0, 1))(x, kern)
    (dx_x, dx_k) = jax.grad(loss_x, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(dp_x), np.asarray(dx_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp_k), np.asarray(dx_k), atol=1e-3)


def test_pallas_train_backbone_matches_xla(rng):
    """FPN4Scales with pallas_eval=True in TRAIN mode (hcw Pallas trunk +
    custom VJP) must reproduce the XLA train backbone: outputs, BN stats,
    and parameter gradients."""
    from mdfnet_tpu.models.backbone import FPN4Scales
    from mdfnet_tpu.ops.pallas import runtime as pallas_rt

    n, h, w, v = 4, 32, 64, 2  # vgroups=2 views, 2 items each
    x = jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32))

    xla = FPN4Scales((4, 8, 8, 8))
    variables = xla.init(jax.random.PRNGKey(0), x, True, v)

    def run(model, variables):
        def loss(params):
            (y4, y3, y2), mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, True, v, mutable=["batch_stats"])
            return (jnp.sum(y4 ** 2) + jnp.sum(y3 ** 2)
                    + jnp.sum(y2 ** 2)), (y4, y3, y2, mut["batch_stats"])

        (val, aux), grads = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(variables["params"])
        return val, aux, grads

    val_x, aux_x, grads_x = run(xla, variables)

    jax.clear_caches()
    pallas_rt.set_force_interpret(True)
    try:
        pal = FPN4Scales((4, 8, 8, 8), pallas_eval=True)
        val_p, aux_p, grads_p = run(pal, variables)
    finally:
        pallas_rt.set_force_interpret(False)
        jax.clear_caches()

    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-4)
    for a, b in zip(aux_x[:3], aux_p[:3]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
    # BN running stats (per-view sequential EMA) must match exactly-ish
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(aux_x[3]),
            jax.tree_util.tree_leaves_with_path(aux_p[3])):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   err_msg=str(pa))
    ga = np.concatenate([np.asarray(g).ravel() for g in
                         jax.tree_util.tree_leaves(grads_x)])
    gb = np.concatenate([np.asarray(g).ravel() for g in
                         jax.tree_util.tree_leaves(grads_p)])
    np.testing.assert_allclose(gb, ga, atol=2e-3 * max(1.0, np.abs(ga).max()))


def test_pallas_train_refine_matches_xla(rng):
    """RefineNet2 with pallas_eval=True in TRAIN mode (hcw custom-VJP conv
    stack) must reproduce the XLA train path: output and parameter grads."""
    from mdfnet_tpu.models.refine import RefineNet2
    from mdfnet_tpu.ops.pallas import runtime as pallas_rt

    b, h, w = 2, 16, 24
    depth = jnp.asarray((rng.rand(b, h, w) * 300 + 500).astype(np.float32))
    drange = jnp.asarray(np.array([[425.0, 935.0]] * b, np.float32))

    xla = RefineNet2()
    variables = xla.init(jax.random.PRNGKey(0), depth, drange, True)

    def run(model):
        def loss(params):
            y = model.apply({"params": params}, depth, drange, True)
            return jnp.sum(y ** 2), y

        return jax.jit(jax.value_and_grad(loss, has_aux=True))(
            variables["params"])

    (val_x, y_x), g_x = run(xla)
    jax.clear_caches()
    pallas_rt.set_force_interpret(True)
    try:
        (val_p, y_p), g_p = run(RefineNet2(pallas_eval=True))
    finally:
        pallas_rt.set_force_interpret(False)
        jax.clear_caches()

    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-3)
    ga = np.concatenate([np.asarray(g).ravel() for g in
                         jax.tree_util.tree_leaves(g_x)])
    gb = np.concatenate([np.asarray(g).ravel() for g in
                         jax.tree_util.tree_leaves(g_p)])
    np.testing.assert_allclose(gb, ga, atol=2e-3 * max(1.0, np.abs(ga).max()))
