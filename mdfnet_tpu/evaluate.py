"""Evaluation loop: depth + confidence inference, PFM/PNG outputs.

Behavioural twin of reference eval.py:10-50 — iterates ref views, runs the
jitted forward, writes depth_est/<ref>.pfm, depth_est/<ref>.png and
confidence/<ref>.pfm in the reference's directory schema so the fusion
backends are drop-in.

TPU notes: one compiled program per input shape (datasets are constant-shape
so there is exactly one compile); the host writes files while the device runs
the next batch (simple software pipelining via jax's async dispatch).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdfnet_tpu.data.formats import ensure_dir, write_depth_png, write_pfm


def make_eval_step(model, variables, spatial: int = 1):
    if spatial > 1:
        # exact halo-exchange spatial sharding over the image-height axis
        # (parallel/spatial.py): 1/n HBM per device, full-res eval without
        # the reference's crop workaround
        from mdfnet_tpu.parallel import make_mesh
        from mdfnet_tpu.parallel.spatial import spatial_eval_forward
        mesh = make_mesh(data=1, spatial=spatial,
                         devices=jax.devices()[:spatial])

        @jax.jit
        def eval_step(imgs, extrinsics, intrinsics, depth_range):
            return spatial_eval_forward(model, variables, mesh, imgs,
                                        extrinsics, intrinsics, depth_range)
        return eval_step

    @jax.jit
    def eval_step(imgs, extrinsics, intrinsics, depth_range):
        return model.apply(variables, imgs, extrinsics, intrinsics,
                           depth_range, train=False)
    return eval_step


def run_eval(model, variables, dataset, output_dir: str,
             batch_size: int = 1, log_fn=print,
             spatial: int = 1) -> Dict[str, float]:
    """Evaluate every item, write outputs, return timing stats."""
    from mdfnet_tpu.data.pipeline import BatchLoader

    eval_step = make_eval_step(model, variables, spatial=spatial)
    loader = BatchLoader(dataset, batch_size, shuffle=False, drop_last=False,
                         num_workers=2)

    n_views = 0
    total_time = 0.0
    for i, batch in enumerate(loader):
        start = time.perf_counter()
        out = eval_step(jnp.asarray(batch["imgs"]),
                        jnp.asarray(batch["extrinsics"]),
                        jnp.asarray(batch["intrinsics"]),
                        jnp.asarray(batch["depth_range"]))
        depth = np.asarray(jax.device_get(out["depth"]))
        conf = np.asarray(jax.device_get(out["confidence"]))
        elapsed = time.perf_counter() - start
        if i > 0:  # skip compile step in throughput stats
            total_time += elapsed
            n_views += depth.shape[0]

        for b, filename in enumerate(batch["filename"]):
            depth_path = os.path.join(output_dir, filename.format("depth_est", ".pfm"))
            png_path = os.path.join(output_dir, filename.format("depth_est", ".png"))
            conf_path = os.path.join(output_dir, filename.format("confidence", ".pfm"))
            ensure_dir(os.path.dirname(depth_path))
            ensure_dir(os.path.dirname(conf_path))
            write_pfm(depth_path, depth[b])
            write_depth_png(png_path, depth[b])
            write_pfm(conf_path, conf[b])
        if log_fn and (i % 10 == 0):
            log_fn(f"eval {i + 1}/{len(loader)}  {elapsed:.3f}s/batch")

    sec_per_view = total_time / max(n_views, 1)
    return {"sec_per_view": sec_per_view,
            "views_per_sec": (n_views / total_time) if total_time else 0.0,
            "n_views": n_views}
