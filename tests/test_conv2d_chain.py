"""conv2d_chain_fused (multi-layer fused trunk kernel) vs per-layer XLA."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdfnet_tpu.ops.pallas.conv2d_kernel import conv2d_chain_fused


def _ref_chain(x_nhcw, kernels, scales, offsets, relus):
    x = jnp.transpose(jnp.asarray(x_nhcw), (0, 1, 3, 2))  # NHWC
    for k, s, o, r in zip(kernels, scales, offsets, relus):
        ks = k.shape[0]
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(k), (1, 1), [((ks - 1) // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x * s + o
        if r:
            x = jnp.maximum(x, 0.0)
    return np.asarray(x).transpose(0, 1, 3, 2)


@pytest.mark.parametrize("ks_chain,chs,h,w,th", [
    ((3, 3), (8, 8, 8), 20, 40, 4),       # backbone pair shape
    ((3, 3), (8, 16, 16), 24, 33, 8),     # non-128 W, channel growth
    ((3, 1, 3), (8, 16, 16, 8), 20, 40, 4),  # 1x1 mid-layer
    ((3, 3), (8, 8, 8), 13, 40, 16),      # single row block (n_hb == 1)
    ((3, 3), (16, 32, 32), 17, 128, 8),   # W == Wp (wq extension path)
])
def test_conv2d_chain_matches_lax(rng, ks_chain, chs, h, w, th):
    n = 2
    x = rng.randn(n, h, chs[0], w).astype(np.float32)
    kernels, scales, offsets, relus = [], [], [], []
    for l, ks in enumerate(ks_chain):
        kernels.append((rng.randn(ks, ks, chs[l], chs[l + 1]) * 0.2)
                       .astype(np.float32))
        scales.append((0.5 + rng.rand(chs[l + 1])).astype(np.float32))
        offsets.append(rng.randn(chs[l + 1]).astype(np.float32))
        relus.append(True)

    ref = _ref_chain(x, kernels, scales, offsets, relus)
    out = conv2d_chain_fused(
        jnp.asarray(x), [jnp.asarray(k) for k in kernels],
        [jnp.asarray(s) for s in scales], [jnp.asarray(o) for o in offsets],
        th=th, relu_flags=tuple(relus), interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)
