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


@pytest.mark.parametrize("h,w,th,klast", [
    (20, 40, 4, 5),      # backbone conv01 + conv12_0 shape
    (22, 33, 8, 5),      # odd width, strided output ceil(33/2)
    (16, 130, 4, 3),     # k3 stride-2 tail, W > 128
    (9, 40, 16, 5),      # single row block
])
def test_conv2d_chain_stride2_tail(rng, h, w, th, klast):
    """Chain with a final stride-2 conv (the backbone scale transition)."""
    chs = (8, 8, 8, 16)
    n = 2
    x = rng.randn(n, h, chs[0], w).astype(np.float32)
    kernels, scales, offsets, relus = [], [], [], []
    for l, ks in enumerate((3, 3, klast)):
        kernels.append((rng.randn(ks, ks, chs[l], chs[l + 1]) * 0.2)
                       .astype(np.float32))
        scales.append((0.5 + rng.rand(chs[l + 1])).astype(np.float32))
        offsets.append(rng.randn(chs[l + 1]).astype(np.float32))
        relus.append(True)

    # reference: two stride-1 convs then a stride-2 conv
    v = jnp.transpose(jnp.asarray(x), (0, 1, 3, 2))
    for l, k in enumerate(kernels):
        ks = k.shape[0]
        stride = 2 if l == 2 else 1
        v = jax.lax.conv_general_dilated(
            v, jnp.asarray(k), (stride, stride), [((ks - 1) // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        v = jnp.maximum(v * scales[l] + offsets[l], 0.0)
    ref = np.asarray(v).transpose(0, 1, 3, 2)

    out = conv2d_chain_fused(
        jnp.asarray(x), [jnp.asarray(k) for k in kernels],
        [jnp.asarray(s) for s in scales], [jnp.asarray(o) for o in offsets],
        th=th, relu_flags=tuple(relus), final_stride=2, interpret=True)
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


@pytest.mark.parametrize("h,w,th", [(20, 40, 4), (16, 24, 16), (33, 130, 8)])
def test_conv2d_chain_residuals(rng, h, w, th):
    """Res-block skip adds inside the chain kernel (refine's structure:
    conv0 -> 3x[conv-relu-conv + skip] -> conv1 + conv0-skip -> conv2_0)."""
    c = 8
    n = 2
    x = rng.randn(n, h, c, w).astype(np.float32)

    def mk(ci, co):
        return (rng.randn(3, 3, ci, co) * 0.2).astype(np.float32)

    ones = np.ones(c, np.float32)
    zeros = np.zeros(c, np.float32)
    kernels = [mk(c, c)]
    scales, offsets = [ones], [zeros]
    relus, resid = [False], [None]
    for i in range(3):
        kernels += [mk(c, c), mk(c, c)]
        scales += [ones, ones * 0.1]
        offsets += [zeros, zeros]
        relus += [True, False]
        resid += [None, 2 * i]
    kernels.append(mk(c, c))
    scales.append(ones)
    offsets.append(zeros)
    relus.append(False)
    resid.append(0)
    kernels.append(mk(c, 4 * c))
    scales.append(np.ones(4 * c, np.float32))
    offsets.append(np.zeros(4 * c, np.float32))
    relus.append(False)
    resid.append(None)

    # reference: per-layer lax convs with explicit adds
    def conv(v, k, s, o, r):
        y = jax.lax.conv_general_dilated(
            v, jnp.asarray(k), (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y * s + o
        return jnp.maximum(y, 0.0) if r else y

    v = jnp.transpose(jnp.asarray(x), (0, 1, 3, 2))
    outs = []
    for l, k in enumerate(kernels):
        y = conv(v, k, scales[l], offsets[l], relus[l])
        if resid[l] is not None:
            y = y + outs[resid[l]]
        outs.append(y)
        v = y
    ref = np.asarray(jnp.transpose(outs[-1], (0, 1, 3, 2)))

    out = conv2d_chain_fused(
        jnp.asarray(x), [jnp.asarray(k) for k in kernels],
        [jnp.asarray(s) for s in scales], [jnp.asarray(o) for o in offsets],
        th=th, relu_flags=tuple(relus), residuals=tuple(resid),
        interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)
