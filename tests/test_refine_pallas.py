"""RefineNet2 Pallas (H,C,W) eval path vs the XLA NHWC path."""
from unittest import mock

import numpy as np

import jax
import jax.numpy as jnp

from mdfnet_tpu.models.refine import RefineNet2
from mdfnet_tpu.ops.pallas import conv2d_kernel

import pytest

pytestmark = pytest.mark.slow


def test_refine_pallas_matches_xla(rng):
    depth = jnp.asarray(600.0 + 50 * rng.rand(2, 16, 24).astype(np.float32))
    drange = jnp.asarray(np.tile([[425.0, 935.0]], (2, 1)).astype(np.float32))

    m_ref = RefineNet2(dtype=jnp.float32)
    m_pal = RefineNet2(dtype=jnp.float32, pallas_eval=True)
    v = m_ref.init(jax.random.PRNGKey(0), depth, drange)
    ref = m_ref.apply(v, depth, drange)

    orig = conv2d_kernel.conv2d_fused
    orig_chain = conv2d_kernel.conv2d_chain_fused

    def forced(x, k, s, o, **kw):
        kw["interpret"] = True
        return orig(x, k, s, o, **kw)

    def forced_chain(*args, **kw):
        kw["interpret"] = True
        return orig_chain(*args, **kw)

    with mock.patch.object(conv2d_kernel, "conv2d_fused", forced), \
            mock.patch.object(conv2d_kernel, "conv2d_chain_fused",
                              forced_chain):
        pal = m_pal.apply(v, depth, drange)
        v_pal = m_pal.init(jax.random.PRNGKey(0), depth, drange)

    assert pal.shape == ref.shape
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-2,
                               rtol=1e-5)
    # identical parameter structure
    pa = {jax.tree_util.keystr(p): a.shape for p, a in
          jax.tree_util.tree_leaves_with_path(v)}
    pb = {jax.tree_util.keystr(p): a.shape for p, a in
          jax.tree_util.tree_leaves_with_path(v_pal)}
    assert pa == pb
