"""Fusion A: dynamic multi-view consistency filter (main method for T&T).

Behavioural twin of reference tools/filter/dynamic_filter_gpu.py:12-238,
recast TPU-first: the per-src-view loop becomes one vmapped/jitted
reprojection over the stacked source views, and the nine dynamic thresholds
become a vectorised comparison against the threshold ladder

    dist < i/thre1  AND  |d_reproj - d_ref|/d_ref < i/thre2,  i in [2, 10]

per-i counts are accumulated across srcs and a pixel passes geometrically
when sum_i [count_i >= i] >= nconditions (reference :91-101); photometrically
when confidence > photo_thresh. Accepted pixels are averaged over agreeing
views and back-projected to a colored world-space point cloud.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdfnet_tpu import geometry
from mdfnet_tpu.data.formats import (
    ensure_dir, read_cam_file, read_image, read_pair_file, read_pfm,
    write_mask_png, write_pfm)
from mdfnet_tpu.fusion.ply import write_ply
from mdfnet_tpu.fusion.pairs import _find_pair_file
from mdfnet_tpu.ops.sample import bilinear_sample_2d

THRESHOLD_STEPS = tuple(range(2, 11))  # the 9-rung dynamic ladder


def reproject_depth(ref_depth, ref_k, ref_e, src_depth, src_k, src_e):
    """Project ref depth into src, resample src depth, project back.

    Twin of reference reproject_with_depth (dynamic_filter_gpu.py:194-238).
    All maps (H, W); cams (3,3)/(4,4). Returns (depth_reprojected, x_reproj,
    y_reproj) in the ref frame.
    """
    h, w = ref_depth.shape
    xyz_world = geometry.unproject(ref_depth[None], ref_k[None], ref_e[None])
    x_src, y_src, _ = geometry.project(xyz_world, src_k[None], src_e[None])

    # bilinear resample of the src depth at the projected coords (the
    # reference samples with align_corners=True on pixel coords == plain
    # pixel-space bilinear, tools/filter/data_io.py:117-131)
    sampled = bilinear_sample_2d(src_depth[None, :, :, None],
                                 x_src, y_src)[..., 0]  # (1, N)

    # lift the *projected* src pixel at the sampled depth, then back to ref
    ones = jnp.ones_like(x_src)
    src_pix = jnp.stack([x_src, y_src, ones], axis=1)  # (1, 3, N)
    cam = jnp.einsum("bij,bjn->bin", jnp.linalg.inv(src_k[None]), src_pix)
    cam = cam * sampled[:, None]
    cam_h = jnp.concatenate([cam, ones[:, None]], axis=1)
    world = jnp.einsum("bij,bjn->bin",
                       jnp.linalg.inv(src_e[None]), cam_h)[:, :3]
    x_ref, y_ref, d_ref = geometry.project(world, ref_k[None], ref_e[None])

    return (d_ref.reshape(h, w), x_ref.reshape(h, w), y_ref.reshape(h, w))


@partial(jax.jit, static_argnames=("thre1", "thre2"))
def geometric_consistency(ref_depth, ref_k, ref_e, src_depths, src_ks, src_es,
                          src_valid=None,
                          thre1: float = 4.0, thre2: float = 1300.0):
    """All-src geometric consistency in one vmapped pass.

    Args:
        ref_depth: (H, W); src_depths: (S, H, W); cams batched likewise.
        src_valid: optional (S,) bool — padded sources contribute nothing
            (pad-to-max-S keeps ONE jit specialisation for variable-src
            pair files instead of a retrace per count).
    Returns:
        counts: (9, H, W) int32 — per-rung agreement counts over srcs.
        strict_mask_sum: (H, W) int32 — count of srcs passing the strictest
            final rung (i=10; the reference's `mask`, used for averaging).
        depth_sum: (H, W) f32 — sum of reprojected depths over srcs passing
            the final rung (zeros elsewhere), for view-averaged depth.
    """
    h, w = ref_depth.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    def per_src(src_depth, src_k, src_e):
        d_re, x_re, y_re = reproject_depth(ref_depth, ref_k, ref_e,
                                           src_depth, src_k, src_e)
        dist = jnp.sqrt((x_re - xx) ** 2 + (y_re - yy) ** 2)
        rel = jnp.abs(d_re - ref_depth) / ref_depth
        steps = jnp.asarray(THRESHOLD_STEPS, jnp.float32)[:, None, None]
        masks = (dist[None] < steps / thre1) & (rel[None] < steps / thre2)
        final = masks[-1]
        return masks.astype(jnp.int32), final.astype(jnp.int32), \
            jnp.where(final, d_re, 0.0)

    masks, finals, depths = jax.vmap(per_src)(src_depths, src_ks, src_es)
    if src_valid is not None:
        v = src_valid.astype(masks.dtype)[:, None, None, None]
        masks = masks * v
        finals = finals * v[:, 0]
        depths = depths * src_valid.astype(depths.dtype)[:, None, None]
    return masks.sum(0), finals.sum(0), depths.sum(0)


def fuse_view(ref_depth: np.ndarray, confidence: np.ndarray,
              ref_k: np.ndarray, ref_e: np.ndarray,
              src_depths: np.ndarray, src_ks: np.ndarray, src_es: np.ndarray,
              photo_thresh: float = 0.8, nconditions: int = 5,
              thre1: float = 4.0, thre2: float = 1300.0,
              src_valid: np.ndarray | None = None):
    """One ref view's filtered depth + masks (all numpy in/out)."""
    counts, strict_sum, depth_sum = geometric_consistency(
        jnp.asarray(ref_depth), jnp.asarray(ref_k), jnp.asarray(ref_e),
        jnp.asarray(src_depths), jnp.asarray(src_ks), jnp.asarray(src_es),
        None if src_valid is None else jnp.asarray(src_valid),
        thre1=float(thre1), thre2=float(thre2))
    counts = np.asarray(counts)
    strict_sum = np.asarray(strict_sum)
    depth_sum = np.asarray(depth_sum)

    rungs_passed = (counts >= np.asarray(THRESHOLD_STEPS)[:, None, None]).sum(0)
    geo_mask = rungs_passed >= nconditions
    photo_mask = confidence > photo_thresh
    final_mask = geo_mask & photo_mask
    depth_avg = (depth_sum + ref_depth) / (strict_sum + 1)
    return depth_avg, geo_mask, photo_mask, final_mask


def fuse_scan(scan_dir: str, eval_dir: str, out_ply: str,
              img_folder: str = "images", cam_folder: str = "cams",
              photo_thresh: float = 0.8, nconditions: int = 5,
              thre1: float = 4.0, thre2: float = 1300.0,
              filter_folder: Optional[str] = None,
              log_fn=print) -> np.ndarray:
    """Fuse a whole scan into a point cloud .ply.

    Twin of reference filter() (dynamic_filter_gpu.py:12-164). Reads the
    scan's pair.txt + cams + images from `scan_dir` and depth_est/confidence
    PFMs from `eval_dir`; writes masks + filtered depth (if filter_folder)
    and the fused cloud to `out_ply`.
    """
    from mdfnet_tpu.fusion.view_store import ViewStore, pad_sources

    _, pairs = read_pair_file(_find_pair_file(scan_dir))
    if filter_folder:
        ensure_dir(filter_folder)
    max_s = max(len(srcs) for _, srcs in pairs)

    def load_view(vid):
        k, e, _ = read_cam_file(os.path.join(
            scan_dir, cam_folder, f"{vid:08d}_cam.txt"))
        return {"depth": read_pfm(os.path.join(
                    eval_dir, "depth_est", f"{vid:08d}.pfm"))[0],
                "k": k, "e": e}

    store = ViewStore(load_view, maxsize=4 * max_s)
    verts: List[np.ndarray] = []
    colors: List[np.ndarray] = []
    for ref_view, src_views in pairs:
        t0 = time.time()
        rv = store.get(ref_view)
        ref_depth, ref_k, ref_e = rv["depth"], rv["k"], rv["e"]
        confidence = read_pfm(os.path.join(
            eval_dir, "confidence", f"{ref_view:08d}.pfm"))[0]
        ref_img = read_image(os.path.join(
            scan_dir, img_folder, f"{ref_view:08d}.jpg"))

        svs = [store.get(sv) for sv in src_views]
        (src_depths, src_ks, src_es), src_valid = pad_sources(
            [np.stack([v["depth"] for v in svs]),
             np.stack([v["k"] for v in svs]),
             np.stack([v["e"] for v in svs])], max_s)

        depth_avg, geo_mask, photo_mask, final_mask = fuse_view(
            ref_depth, confidence, ref_k, ref_e,
            src_depths, src_ks, src_es,
            photo_thresh, nconditions, thre1, thre2, src_valid=src_valid)

        if filter_folder:
            write_mask_png(os.path.join(filter_folder,
                                        f"{ref_view:08d}_photo.png"), photo_mask)
            write_mask_png(os.path.join(filter_folder,
                                        f"{ref_view:08d}_geo.png"), geo_mask)
            write_mask_png(os.path.join(filter_folder,
                                        f"{ref_view:08d}_final.png"), final_mask)
            write_pfm(os.path.join(filter_folder, f"{ref_view}_depth_est.pfm"),
                      (ref_depth * final_mask).astype(np.float32))

        h, w = depth_avg.shape
        ys, xs = np.nonzero(final_mask)
        if len(ys):
            d = depth_avg[ys, xs]
            pix = np.stack([xs, ys, np.ones_like(xs)]).astype(np.float64)
            cam = np.linalg.inv(ref_k) @ (pix * d)
            world = np.linalg.inv(ref_e) @ np.vstack([cam, np.ones_like(d)])
            verts.append(world[:3].T.astype(np.float32))
            colors.append((ref_img[:h, :w][ys, xs] * 255).astype(np.uint8))

        if log_fn:
            log_fn(f"view {ref_view:>3}: photo/geo/final = {photo_mask.sum()}/"
                   f"{geo_mask.sum()}/{final_mask.sum()}  ({time.time()-t0:.2f}s)")

    xyz = np.concatenate(verts, axis=0) if verts else np.zeros((0, 3), np.float32)
    rgb = np.concatenate(colors, axis=0) if colors else np.zeros((0, 3), np.uint8)
    ensure_dir(os.path.dirname(out_ply) or ".")
    write_ply(out_ply, xyz, rgb)
    if log_fn:
        log_fn(f"saved {len(xyz)} points -> {out_ply}")
    return xyz
