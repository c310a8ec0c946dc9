"""FPN4Scales Pallas (N,H,C,W) eval trunk vs the XLA NHWC path."""
from unittest import mock

import numpy as np

import jax
import jax.numpy as jnp

from mdfnet_tpu.models.backbone import FPN4Scales
from mdfnet_tpu.ops.pallas import conv2d_kernel

import pytest

pytestmark = pytest.mark.slow


def _interpret_conv2d():
    orig = conv2d_kernel.conv2d_fused
    orig_chain = conv2d_kernel.conv2d_chain_fused

    def forced(x, k, s, o, **kw):
        kw["interpret"] = True
        return orig(x, k, s, o, **kw)

    def forced_chain(*args, **kw):
        kw["interpret"] = True
        return orig_chain(*args, **kw)

    p1 = mock.patch.object(conv2d_kernel, "conv2d_fused", forced)
    p2 = mock.patch.object(conv2d_kernel, "conv2d_chain_fused", forced_chain)

    class _Both:
        def __enter__(self):
            p1.__enter__()
            p2.__enter__()

        def __exit__(self, *a):
            p2.__exit__(*a)
            p1.__exit__(*a)

    return _Both()


def test_fpn_pallas_matches_xla(rng):
    h, w = 32, 64  # divisible by 8 like the eval crops
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))

    m_ref = FPN4Scales(dtype=jnp.float32)
    m_pal = FPN4Scales(dtype=jnp.float32, pallas_eval=True)
    v = m_ref.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats so the folded affine is exercised
    v = jax.tree_util.tree_map(lambda a: a, v)
    ref = m_ref.apply(v, x)

    with _interpret_conv2d():
        pal = m_pal.apply(v, x)

    assert len(pal) == 3
    for r, p in zip(ref, pal):
        p_nhwc = jnp.transpose(p, (0, 1, 3, 2))
        assert p_nhwc.shape == r.shape
        np.testing.assert_allclose(np.asarray(p_nhwc), np.asarray(r),
                                   atol=2e-4)


def test_fpn_pallas_param_structure_identical(rng):
    x = jnp.asarray(rng.randn(1, 16, 32, 3).astype(np.float32))
    m_ref = FPN4Scales(dtype=jnp.float32)
    m_pal = FPN4Scales(dtype=jnp.float32, pallas_eval=True)
    v_ref = m_ref.init(jax.random.PRNGKey(0), x)
    with _interpret_conv2d():
        v_pal = m_pal.init(jax.random.PRNGKey(0), x)

    paths_ref = {jax.tree_util.keystr(p): a.shape for p, a in
                 jax.tree_util.tree_leaves_with_path(v_ref)}
    paths_pal = {jax.tree_util.keystr(p): a.shape for p, a in
                 jax.tree_util.tree_leaves_with_path(v_pal)}
    assert paths_ref == paths_pal
