"""Fusion B: fusibile-style per-pixel multi-view consistency vote.

TPU-native replacement for the reference's gipuma/fusibile CUDA pipeline
(tools/gipuma/main.py driving tools/fusibile/fusibile.cu). The CUDA kernel's
per-pixel program (fusibile.cu:138-277) is embarrassingly parallel and maps
to one vmapped/jitted JAX op over (S, H, W):

For every ref pixel with (prob-filtered) depth d:
  1. back-project to world X;
  2. for each other view: project X -> (x_s, y_s) and depth-in-src d_X;
     bilinear-sample the src depth map at (x_s, y_s) -> d_s;
  3. consistent when |f_ref*B/d_X - f_ref*B/d_s| < disp_thresh with
     B = ||C_ref - C_src|| (disparity-space threshold,
     fusibile.cu:41-53, 206-210). The reference's normal-angle test is
     vacuous (the driver fakes constant normals, gipuma/tool.py:137-155)
     and is therefore omitted;
  4. average the world points back-projected from each agreeing src at its
     *truncated* integer pixel with its sampled depth (fusibile.cu:233-241),
     plus the ref point, over (n_consistent + 1);
  5. emit when n_consistent >= num_consistent (default 3, reference
     gipuma/conf.py:34-36).

Unlike the reference there is no .dmb/P-matrix conversion layer: PFMs and cam
txts are consumed directly, and no fake-normal files are needed.
"""
from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdfnet_tpu import geometry
from mdfnet_tpu.data.formats import (
    ensure_dir, read_cam_file, read_image, read_pair_file, read_pfm)
from mdfnet_tpu.fusion.ply import write_ply
from mdfnet_tpu.fusion.pairs import _find_pair_file
from mdfnet_tpu.ops.sample import bilinear_sample_2d


@partial(jax.jit, static_argnames=("disp_thresh", "num_consistent"))
def consistency_vote(ref_depth, ref_k, ref_e, src_depths, src_ks, src_es,
                     src_valid=None,
                     disp_thresh: float = 0.25, num_consistent: int = 3):
    """One ref view's vote against all srcs.

    Args:
        ref_depth: (H, W) prob-filtered depth (0 = invalid).
        src_depths: (S, H, W); cams batched likewise.
        src_valid: optional (S,) bool mask for pad-to-max-S sources.
    Returns:
        points: (H*W, 3) averaged world points;
        accept: (H*W,) bool — n_consistent >= num_consistent and ref valid.
    """
    h, w = ref_depth.shape
    f_ref = ref_k[0, 0]

    # camera centers C = -R^T t
    def center(e):
        return -e[:3, :3].T @ e[:3, 3]

    c_ref = center(ref_e)
    x_world = geometry.unproject(ref_depth[None], ref_k[None], ref_e[None])
    x_world = x_world[0]  # (3, N)

    def per_src(src_depth, src_k, src_e):
        x_s, y_s, d_x = geometry.project(x_world[None], src_k[None], src_e[None])
        x_s, y_s, d_x = x_s[0], y_s[0], d_x[0]
        in_bounds = (x_s >= 0) & (x_s < w) & (y_s >= 0) & (y_s < h)

        d_s = bilinear_sample_2d(src_depth[None, :, :, None],
                                 x_s[None], y_s[None])[0, :, 0]
        baseline = jnp.linalg.norm(c_ref - center(src_e))
        disp_x = f_ref * baseline / d_x
        disp_s = f_ref * baseline / d_s
        ok = in_bounds & (jnp.abs(disp_x - disp_s) < disp_thresh) & (d_s > 0)

        # back-project the *truncated* src pixel at the sampled depth
        xi = jnp.floor(x_s)
        yi = jnp.floor(y_s)
        pix = jnp.stack([xi, yi, jnp.ones_like(xi)], axis=0)  # (3, N)
        cam = jnp.linalg.inv(src_k) @ pix * d_s[None]
        cam_h = jnp.concatenate([cam, jnp.ones((1, cam.shape[1]))], axis=0)
        world_s = (jnp.linalg.inv(src_e) @ cam_h)[:3]
        return ok, jnp.where(ok[None], world_s, 0.0)

    oks, worlds = jax.vmap(per_src)(src_depths, src_ks, src_es)
    if src_valid is not None:
        oks = oks & src_valid[:, None]
        worlds = jnp.where(oks[:, None], worlds, 0.0)
    n_consistent = oks.sum(0)  # (N,)
    avg = (x_world + worlds.sum(0)) / (n_consistent + 1)[None]
    accept = (n_consistent >= num_consistent) & (ref_depth.reshape(-1) > 0)
    return avg.T, accept


def fuse_scan_vote(scan_dir: str, eval_dir: str, out_ply: str,
                   img_folder: str = "images", cam_folder: str = "cams",
                   prob_thresh: float = 0.6, disp_thresh: float = 0.25,
                   num_consistent: int = 3, log_fn=print) -> np.ndarray:
    """Fuse a scan with the consistency vote (every view acts as ref once,
    like fusibile's host loop over cameras, main.cpp:787-800)."""
    from mdfnet_tpu.fusion.view_store import ViewStore, pad_sources

    _, pairs = read_pair_file(_find_pair_file(scan_dir))
    view_ids = [ref for ref, _ in pairs]
    id_set = set(view_ids)
    max_s = max(len([s for s in srcs if s in id_set]) for _, srcs in pairs)

    def load_view(vid):
        d = read_pfm(os.path.join(eval_dir, "depth_est", f"{vid:08d}.pfm"))[0]
        conf = read_pfm(os.path.join(eval_dir, "confidence",
                                     f"{vid:08d}.pfm"))[0]
        k, e, _ = read_cam_file(os.path.join(scan_dir, cam_folder,
                                             f"{vid:08d}_cam.txt"))
        return {"depth": np.where(conf >= prob_thresh, d, 0.0)
                .astype(np.float32), "k": k, "e": e}

    store = ViewStore(load_view, maxsize=4 * max_s)
    verts: List[np.ndarray] = []
    colors: List[np.ndarray] = []
    for ref, srcs in pairs:
        src_ids = [s for s in srcs if s in id_set]
        rv = store.get(ref)
        svs = [store.get(s) for s in src_ids]
        (sd, sk, se), src_valid = pad_sources(
            [np.stack([v["depth"] for v in svs]),
             np.stack([v["k"] for v in svs]),
             np.stack([v["e"] for v in svs])], max_s)
        pts, accept = consistency_vote(
            jnp.asarray(rv["depth"]), jnp.asarray(rv["k"]),
            jnp.asarray(rv["e"]), jnp.asarray(sd), jnp.asarray(sk),
            jnp.asarray(se), jnp.asarray(src_valid),
            disp_thresh=float(disp_thresh), num_consistent=int(num_consistent))
        pts = np.asarray(pts)
        accept = np.asarray(accept)
        h, w = rv["depth"].shape
        if accept.any():
            # the ref image is used exactly once — loaded on demand as
            # uint8-scaled colors, never resident for the whole scan
            img = read_image(os.path.join(scan_dir, img_folder,
                                          f"{ref:08d}.jpg"))
            verts.append(pts[accept].astype(np.float32))
            colors.append((img[:h, :w].reshape(-1, 3)[accept] * 255)
                          .astype(np.uint8))
        if log_fn:
            log_fn(f"view {ref:>3}: {int(accept.sum())} points")

    xyz = np.concatenate(verts, axis=0) if verts else np.zeros((0, 3), np.float32)
    rgb = np.concatenate(colors, axis=0) if colors else np.zeros((0, 3), np.uint8)
    ensure_dir(os.path.dirname(out_ply) or ".")
    write_ply(out_ply, xyz, rgb)
    if log_fn:
        log_fn(f"saved {len(xyz)} points -> {out_ply}")
    return xyz
