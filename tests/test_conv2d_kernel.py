"""conv2d_fused Pallas kernel vs lax.conv in interpreter mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_fused


def _ref_conv(x_nhcw, k, scale, offset, stride, relu):
    """x (N, H, Ci, W) -> (N, H', Co, W') via XLA NHWC conv."""
    x_nhwc = jnp.transpose(jnp.asarray(x_nhcw), (0, 1, 3, 2))
    ks = k.shape[0]
    y = jax.lax.conv_general_dilated(
        x_nhwc, jnp.asarray(k), (stride, stride),
        [((ks - 1) // 2,) * 2] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = np.asarray(y) * scale + offset
    if relu:
        y = np.maximum(y, 0.0)
    return y.transpose(0, 1, 3, 2)


@pytest.mark.parametrize("ks,stride,ci,co,relu", [
    (3, 1, 8, 8, True),
    (3, 1, 3, 8, True),     # RGB input: k*Ci = 9 -> sublane padding
    (5, 2, 8, 16, True),
    (3, 2, 16, 32, True),
    (1, 1, 16, 64, False),  # 1x1 lateral with bias-as-offset
    (3, 1, 1, 32, True),    # refine entry: single-channel depth
])
def test_conv2d_fused_matches_lax(rng, ks, stride, ci, co, relu):
    n, h, w = 2, 20, 40
    x = rng.randn(n, h, ci, w).astype(np.float32)
    k = (rng.randn(ks, ks, ci, co) * 0.2).astype(np.float32)
    scale = (0.5 + rng.rand(co)).astype(np.float32)
    offset = rng.randn(co).astype(np.float32)

    ref = _ref_conv(x, k, scale, offset, stride, relu)
    out = conv2d_fused(jnp.asarray(x), jnp.asarray(k), jnp.asarray(scale),
                       jnp.asarray(offset), th=4, stride=stride, relu=relu,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_conv2d_fused_odd_sizes(rng):
    """Non-divisible H/W exercise the padding/slicing edges."""
    x = rng.randn(1, 13, 8, 37).astype(np.float32)
    k = (rng.randn(5, 5, 8, 8) * 0.2).astype(np.float32)
    scale = np.ones(8, np.float32)
    offset = np.zeros(8, np.float32)
    ref = _ref_conv(x, k, scale, offset, 2, True)
    out = conv2d_fused(jnp.asarray(x), jnp.asarray(k), jnp.asarray(scale),
                       jnp.asarray(offset), th=4, stride=2, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
