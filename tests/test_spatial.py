"""Spatially-sharded eval forward vs single-device forward on a CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdfnet_tpu.config import ModelConfig
from mdfnet_tpu.data.synthetic import make_batch, make_plane_scene
from mdfnet_tpu.models import build_model
from mdfnet_tpu.parallel import make_mesh
from mdfnet_tpu.parallel.spatial import spatial_eval_forward

SMALL = ModelConfig(chs=(4, 8, 8, 8), ndepths=(8, 8, 8), ngroups=(8, 4, 4))


def test_spatial_sharded_eval_matches_single_device():
    n = 4
    assert len(jax.devices()) >= n
    mesh = make_mesh(data=1, spatial=n, devices=jax.devices()[:n])

    scene = make_plane_scene(height=128, width=64, nviews=3, plane_depth=600.0,
                             tilt=0.05)
    batch = make_batch(scene, batch=1)
    args = (jnp.asarray(batch["imgs"]), jnp.asarray(batch["extrinsics"]),
            jnp.asarray(batch["intrinsics"]), jnp.asarray(batch["depth_range"]))

    model = build_model(SMALL)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)

    ref = model.apply(variables, *args, train=False)
    out = spatial_eval_forward(model, variables, mesh, *args, overlap=16)

    assert out["depth"].shape == ref["depth"].shape
    assert out["confidence"].shape == ref["confidence"].shape

    d_ref = np.asarray(ref["depth"])[0]
    d_out = np.asarray(out["depth"])[0]
    scale = 935.0 - 425.0
    rel = np.abs(d_out - d_ref) / scale
    # interior of each band must match tightly; band boundaries may carry
    # sub-receptive-field halo error
    assert np.median(rel) < 1e-4
    assert (rel < 5e-3).mean() > 0.9, f"too much halo error: {rel.mean()}"
