"""Fusion C: pcd-style visibility fusion.

Behavioural twin of reference tools/pcd/fusion.py: probability filter ->
visibility filter -> occlusion-aware z-buffer fusion -> visibility filter ->
view-averaged depth -> visibility filter -> small-segment removal ->
back-projection to a world point cloud.

TPU-native split: all projection / resampling / violation counting runs as
jitted JAX ops over full (S, H, W) grids (static shapes — the reference's
dynamic valid-pixel flattening is replaced by masks); the two sequential
cores (per-pixel z-buffer election, component flood fill) run in the native
C library (fusion/native.py, native/fusion_core.cpp).

Convention note: this pipeline treats pixel centers at (+0.5, +0.5) like the
reference pcd tool (tools/pcd/utils/utils.py:get_pixel_grids), which differs
by half a pixel from the model/filter tools — preserved for parity.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mdfnet_tpu.data.formats import (
    ensure_dir, read_cam_file, read_image, read_pair_file, read_pfm)
from mdfnet_tpu.fusion.native import segment_filter, zbuffer_elect
from mdfnet_tpu.fusion.ply import write_ply
from mdfnet_tpu.fusion.pairs import _find_pair_file


def _centers(h, w):
    """Pixel-center homogeneous grid (3, H*W), +0.5 convention."""
    y = jnp.arange(h, dtype=jnp.float32) + 0.5
    x = jnp.arange(w, dtype=jnp.float32) + 0.5
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx.reshape(-1), yy.reshape(-1),
                      jnp.ones(h * w, jnp.float32)], axis=0)


def _img2world(pix, depth_flat, k, e):
    """(3,N) center pixels at depths -> (3,N) world. Zero depth -> origin-ish."""
    cam = jnp.linalg.inv(k) @ pix * depth_flat[None]
    cam_h = jnp.concatenate([cam, jnp.ones((1, cam.shape[1]))], axis=0)
    return (jnp.linalg.inv(e) @ cam_h)[:3]


def _world2img(world, k, e):
    """(3,N) world -> (x, y center-conv, depth)."""
    cam_h = jnp.concatenate([world, jnp.ones((1, world.shape[1]))], axis=0)
    cam = (e @ cam_h)[:3]
    pix = k @ cam
    z = cam[2]
    return pix[0] / z, pix[1] / z, z


def _nearest_sample(depth_map, x, y):
    """Nearest sampling in center convention: cell = round(x - 0.5)."""
    h, w = depth_map.shape
    xi = jnp.rint(x - 0.5).astype(jnp.int32)
    yi = jnp.rint(y - 0.5).astype(jnp.int32)
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    vals = depth_map[yi, xi]
    return jnp.where(ok, vals, 0.0), ok


@jax.jit
def reproject_all(ref_depth, ref_k, ref_e, src_depths, src_ks, src_es,
                  src_valid=None):
    """Ref->src->ref reprojection for every src.

    Returns (x, y, d, in_range): each (S, H, W); (x, y) center-convention ref
    coords of the reprojected point, d its depth in the ref camera; in_range
    marks samples that landed inside the src image on valid src depth
    (twin of reference get_reproj, tools/pcd/fusion.py:29-54).
    """
    h, w = ref_depth.shape
    pix = _centers(h, w)
    d_flat = ref_depth.reshape(-1)
    world = _img2world(pix, d_flat, ref_k, ref_e)

    def per_src(src_depth, src_k, src_e):
        xs, ys, _ = _world2img(world, src_k, src_e)
        d_s, in_img = _nearest_sample(src_depth, xs, ys)
        ok = in_img & (d_s > 1e-9)
        src_pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=0)
        w_back = _img2world(src_pix, d_s, src_k, src_e)
        xr, yr, dr = _world2img(w_back, ref_k, ref_e)
        valid = ok & (d_flat > 1e-9)
        return (xr.reshape(h, w), yr.reshape(h, w), dr.reshape(h, w),
                valid.reshape(h, w))

    xr, yr, dr, rng = jax.vmap(per_src)(src_depths, src_ks, src_es)
    if src_valid is not None:
        rng = rng & src_valid[:, None, None]
    return xr, yr, dr, rng


@partial(jax.jit, static_argnames=("vthresh",))
def visibility_masks(ref_depth, xr, yr, dr, in_range,
                     dist_thresh: float = 1.0, rel_thresh: float = 0.01,
                     vthresh: int = 4):
    """Per-src agreement masks + the >= (vthresh-1) vote
    (twin of reference vis_filter, tools/pcd/fusion.py:56-63)."""
    h, w = ref_depth.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5, indexing="ij")
    dist = jnp.sqrt((xr - xx[None]) ** 2 + (yr - yy[None]) ** 2)
    depth_ok = jnp.abs(ref_depth[None] - dr) < \
        jnp.maximum(ref_depth[None], dr) * rel_thresh
    masks = in_range & (dist < dist_thresh) & depth_ok
    mask = masks.sum(0) >= (vthresh - 1)
    return masks, mask


@jax.jit
def averaged_depth(ref_depth, dr, masks):
    """View-averaged depth over agreeing srcs (reference ave_fusion)."""
    s = jnp.where(masks, dr, 0.0).sum(0)
    return (s + ref_depth) / (masks.sum(0) + 1)


@jax.jit
def _candidates_and_violations(ref_depth, ref_k, ref_e,
                               src_depths, src_ks, src_es, src_valid=None):
    """Build the z-buffer candidate set for one ref view.

    Candidates = ref's own pixels + every src pixel projected into ref
    ((1+S)*H*W entries). For each candidate, count violations: srcs whose
    measured depth at the candidate's projection exceeds the candidate's
    depth there (it would occlude what that src actually sees) — twin of
    reference vis_fusion (tools/pcd/fusion.py:69-98).

    Returns (xy (M,2) ref center coords, d (M,) ref-frame depth,
    violation (M,) int32, cand_valid (M,) bool).
    """
    s, h, w = src_depths.shape
    pix = _centers(h, w)

    # src pixels -> ref
    def src_to_ref(src_depth, src_k, src_e):
        world = _img2world(pix, src_depth.reshape(-1), src_k, src_e)
        xr, yr, dr = _world2img(world, ref_k, ref_e)
        return xr, yr, dr, src_depth.reshape(-1) > 1e-9

    xs, ys, ds, vs = jax.vmap(src_to_ref)(src_depths, src_ks, src_es)
    if src_valid is not None:
        vs = vs & src_valid[:, None]
    ref_flat = ref_depth.reshape(-1)
    x_all = jnp.concatenate([pix[0][None], xs], 0).reshape(-1)
    y_all = jnp.concatenate([pix[1][None], ys], 0).reshape(-1)
    d_all = jnp.concatenate([ref_flat[None], ds], 0).reshape(-1)
    valid = jnp.concatenate([(ref_flat > 1e-9)[None], vs], 0).reshape(-1)

    # re-lift candidates through the REF camera at their ref-frame depth
    # (the reference re-lifts via idx_img2world on the ref cam, :90)
    cand_pix = jnp.stack([x_all, y_all, jnp.ones_like(x_all)], axis=0)
    world = _img2world(cand_pix, d_all, ref_k, ref_e)

    def violations(src_depth, src_k, src_e):
        xs_, ys_, dz = _world2img(world, src_k, src_e)
        d_s, _ = _nearest_sample(src_depth, xs_, ys_)
        return (d_s > dz).astype(jnp.int32)

    vio = jax.vmap(violations)(src_depths, src_ks, src_es)
    if src_valid is not None:
        vio = vio * src_valid.astype(jnp.int32)[:, None]
    vio = vio.sum(0)
    xy = jnp.stack([x_all, y_all], axis=1)
    return xy, d_all, vio, valid


def zbuffer_fusion(ref_depth: np.ndarray, ref_k, ref_e,
                   src_depths: np.ndarray, src_ks, src_es,
                   src_valid=None) -> np.ndarray:
    """Occlusion-aware fused depth for one ref view (JAX candidates + native
    election)."""
    xy, d, vio, valid = _candidates_and_violations(
        jnp.asarray(ref_depth), jnp.asarray(ref_k), jnp.asarray(ref_e),
        jnp.asarray(src_depths), jnp.asarray(src_ks), jnp.asarray(src_es),
        None if src_valid is None else jnp.asarray(src_valid))
    xy = np.asarray(xy)
    d = np.where(np.asarray(valid), np.asarray(d), 0.0).astype(np.float32)
    vio = np.asarray(vio)
    return zbuffer_elect(d, xy, vio, ref_depth > 1e-9)


def _normals_from_depth(depth: np.ndarray, k: np.ndarray, e: np.ndarray
                        ) -> np.ndarray:
    """Per-pixel normals from depth-map gradients, oriented to the camera.

    Documented deviation: the reference estimates normals with open3d kNN-PCA
    over the fused cloud (tools/pcd/fusion.py:248-254); depth-gradient normals
    are equivalent for benchmark use and stay on-device friendly.
    """
    h, w = depth.shape
    pix = np.asarray(_centers(h, w))
    world = np.asarray(_img2world(jnp.asarray(pix), jnp.asarray(depth.reshape(-1)),
                                  jnp.asarray(k), jnp.asarray(e)))
    pts = world.T.reshape(h, w, 3)
    dx = np.gradient(pts, axis=1)
    dy = np.gradient(pts, axis=0)
    n = np.cross(dx.reshape(-1, 3), dy.reshape(-1, 3))
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    n = n / np.maximum(norm, 1e-12)
    center = -e[:3, :3].T @ e[:3, 3]
    to_cam = center[None] - pts.reshape(-1, 3)
    flip = (n * to_cam).sum(1, keepdims=True) < 0
    return np.where(flip, -n, n).astype(np.float32)


def fuse_scan_pcd(scan_dir: str, eval_dir: str, out_ply: str,
                  img_folder: str = "images", cam_folder: str = "cams",
                  prob_thresh: float = 0.8, nviews: int = 10, vthresh: int = 4,
                  seg_window: int = 4, seg_diff: float = 1e-3,
                  seg_size: int = 10, with_normals: bool = True,
                  log_fn=print) -> np.ndarray:
    """Full pcd pipeline over a scan (twin of reference get_cloud).

    Memory-lean: per-view arrays live in a disk-spilling LRU ViewStore
    (bounded host RSS at Tanks scale — the reference chunks its candidate
    sets similarly, tools/pcd/fusion.py:88-97), images are loaded lazily at
    the final color step only, and sources are padded to the scan's max
    count so every consistency kernel compiles ONCE per scan.
    """
    from mdfnet_tpu.fusion.view_store import ViewStore, pad_sources

    _, pairs = read_pair_file(_find_pair_file(scan_dir))
    view_ids = [r for r, _ in pairs]
    srcs_of = {r: [s for s in srcs if s in view_ids][:nviews]
               for r, srcs in pairs}
    max_s = max(len(v) for v in srcs_of.values())

    def load_view(vid):
        d = read_pfm(os.path.join(eval_dir, "depth_est", f"{vid:08d}.pfm"))[0]
        conf = read_pfm(os.path.join(eval_dir, "confidence",
                                     f"{vid:08d}.pfm"))[0]
        k, e, _ = read_cam_file(os.path.join(scan_dir, cam_folder,
                                             f"{vid:08d}_cam.txt"))
        mask = conf > prob_thresh
        return {"depth": (d * mask).astype(np.float32), "mask": mask,
                "k": k, "e": e}

    store = ViewStore(load_view, maxsize=4 * max_s)

    def gather(vid):
        rv = store.get(vid)
        svs = [store.get(s) for s in srcs_of[vid]]
        padded, valid = pad_sources(
            [np.stack([v["depth"] for v in svs]),
             np.stack([v["k"] for v in svs]),
             np.stack([v["e"] for v in svs])], max_s)
        return rv, padded, valid

    def batch_vis_filter():
        # two sweeps (compute from OLD depths, then apply) with the interim
        # masks parked in the store so they spill with their views
        for vid in view_ids:
            rv, (sd, sk, se), valid = gather(vid)
            xr, yr, dr, rng = reproject_all(
                jnp.asarray(rv["depth"]), jnp.asarray(rv["k"]),
                jnp.asarray(rv["e"]), jnp.asarray(sd), jnp.asarray(sk),
                jnp.asarray(se), jnp.asarray(valid))
            _, mask = visibility_masks(jnp.asarray(rv["depth"]),
                                       xr, yr, dr, rng, vthresh=vthresh)
            store.update(vid, vnew=np.asarray(mask))
        for vid in view_ids:
            v = store.get(vid)
            mask = v["mask"] & v["vnew"]
            store.update(vid, mask=mask, depth=v["depth"] * mask,
                         vnew=np.zeros((), np.uint8))

    batch_vis_filter()

    # z-buffer fusion
    for vid in view_ids:
        rv, (sd, sk, se), valid = gather(vid)
        fused = zbuffer_fusion(rv["depth"], rv["k"], rv["e"], sd, sk, se,
                               src_valid=valid)
        store.update(vid, vnew=fused)
        if log_fn:
            log_fn(f"zbuffer {vid:>3}: {int((fused > 0).sum())} px")
    for vid in view_ids:
        v = store.get(vid)
        store.update(vid, depth=v["vnew"] * v["mask"],
                     vnew=np.zeros((), np.uint8))

    batch_vis_filter()

    # view-averaged depth
    for vid in view_ids:
        rv, (sd, sk, se), valid = gather(vid)
        xr, yr, dr, rng = reproject_all(
            jnp.asarray(rv["depth"]), jnp.asarray(rv["k"]),
            jnp.asarray(rv["e"]), jnp.asarray(sd), jnp.asarray(sk),
            jnp.asarray(se), jnp.asarray(valid))
        masks, _ = visibility_masks(jnp.asarray(rv["depth"]),
                                    xr, yr, dr, rng, vthresh=vthresh)
        store.update(vid, vnew=np.asarray(averaged_depth(
            jnp.asarray(rv["depth"]), dr, masks)))
    for vid in view_ids:
        v = store.get(vid)
        store.update(vid, depth=v["vnew"] * v["mask"],
                     vnew=np.zeros((), np.uint8))

    batch_vis_filter()

    # small segment removal
    for vid in view_ids:
        v = store.get(vid)
        seg_mask = segment_filter(v["depth"], seg_window, seg_diff, seg_size)
        mask = v["mask"] & seg_mask
        store.update(vid, mask=mask, depth=v["depth"] * mask)

    # back-project (ref images loaded lazily, used once each)
    verts, colors, normals = [], [], []
    for vid in view_ids:
        v = store.get(vid)
        d = v["depth"]
        m = v["mask"] & (d > 1e-9)
        if not m.any():
            continue
        h, w = d.shape
        pix = np.asarray(_centers(h, w))
        world = np.asarray(_img2world(jnp.asarray(pix),
                                      jnp.asarray(d.reshape(-1)),
                                      jnp.asarray(v["k"]),
                                      jnp.asarray(v["e"]))).T
        sel = m.reshape(-1)
        img = read_image(os.path.join(scan_dir, img_folder,
                                      f"{vid:08d}.jpg"))
        verts.append(world[sel].astype(np.float32))
        colors.append((img[:h, :w].reshape(-1, 3)[sel] * 255)
                      .astype(np.uint8))
        if with_normals:
            normals.append(_normals_from_depth(d, v["k"], v["e"])[sel])
    store.close()

    xyz = np.concatenate(verts, 0) if verts else np.zeros((0, 3), np.float32)
    rgb = np.concatenate(colors, 0) if colors else np.zeros((0, 3), np.uint8)
    nrm = np.concatenate(normals, 0) if (normals and with_normals) else None
    ensure_dir(os.path.dirname(out_ply) or ".")
    write_ply(out_ply, xyz, rgb, nrm)
    if log_fn:
        log_fn(f"saved {len(xyz)} points -> {out_ply}")
    return xyz


def voxel_downsample(xyz: np.ndarray, rgb: np.ndarray | None = None,
                     normals: np.ndarray | None = None, voxel: float = 1.0):
    """Voxel-grid downsampling: one averaged point per occupied voxel.

    Replaces the reference's open3d voxel_down_sample option
    (tools/pcd/fusion.py:256-263; o3d is not available in this environment).
    """
    if len(xyz) == 0:
        return xyz, rgb, normals
    keys = np.floor(xyz / voxel).astype(np.int64)
    # dense voxel hash via lexsort + group boundaries
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    k = keys[order]
    new_group = np.r_[True, (k[1:] != k[:-1]).any(1)]
    group_id = np.cumsum(new_group) - 1
    n_groups = group_id[-1] + 1

    def average(values):
        sums = np.zeros((n_groups, values.shape[1]), np.float64)
        np.add.at(sums, group_id, values[order])
        counts = np.bincount(group_id).astype(np.float64)
        return (sums / counts[:, None])

    out_xyz = average(xyz).astype(np.float32)
    out_rgb = (average(rgb).round().astype(np.uint8)
               if rgb is not None else None)
    out_nrm = None
    if normals is not None:
        n = average(normals)
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        out_nrm = (n / np.maximum(norm, 1e-12)).astype(np.float32)
    return out_xyz, out_rgb, out_nrm
