"""DTU Acc/Comp/Overall metric in Python.

Faithful reimplementation of the reference's MATLAB evaluation
(tools/matlab_linux/matlab2015/: BaseEvalMain_web.m, PointCompareMain.m,
MaxDistCP.m, reducePts_haa.m):

- the fused cloud is stochastically thinned to a 0.2 mm minimum spacing
  (reducePts_haa.m — random visit order, each kept point suppresses its
  neighbours);
- Acc  = mean/median nearest-neighbour distance data->GT over points inside
  the scan's ObsMask voxel grid, outliers >= 20 mm discarded;
- Comp = mean/median distance GT->data over GT points above the scan's
  ground plane, outliers >= 20 mm discarded;
- distances are computed with a KD-tree and capped at 60 mm
  (MaxDistCP.m's chunked search is an optimisation, not a semantic);
- Overall = (mean Acc + mean Comp) / 2, averaged over the 22 eval scans
  (BaseEvalMain_web.m:23,63,100).

Requires the official DTU SampleSet on disk (Points/stl plys + ObsMask/Plane
.mat files) — external data, loaded with scipy.io.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def reduce_points(pts: np.ndarray, dst: float = 0.2,
                  seed: Optional[int] = 0) -> np.ndarray:
    """Stochastic thinning: keep a subset with pairwise spacing >= dst.

    Grid-hash equivalent of reducePts_haa.m: visit points in random order;
    each kept point suppresses every unvisited point within dst.
    """
    n = len(pts)
    if n == 0:
        return pts
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)

    cell = np.floor(pts / dst).astype(np.int64)
    # hash cells -> point lists
    from collections import defaultdict
    buckets: Dict[Tuple[int, int, int], list] = defaultdict(list)
    for i, c in enumerate(map(tuple, cell)):
        buckets[c].append(i)

    alive = np.ones(n, bool)
    keep = np.zeros(n, bool)
    dst2 = dst * dst
    neighbor_offsets = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                        for dz in (-1, 0, 1)]
    for i in order:
        if not alive[i]:
            continue
        keep[i] = True
        cx, cy, cz = cell[i]
        p = pts[i]
        for ox, oy, oz in neighbor_offsets:
            for j in buckets.get((cx + ox, cy + oy, cz + oz), ()):
                if alive[j] and j != i:
                    d = pts[j] - p
                    if d @ d < dst2:
                        alive[j] = False
        alive[i] = False
    return pts[keep]


def nn_distances(query: np.ndarray, target: np.ndarray,
                 max_dist: float = 60.0) -> np.ndarray:
    """Nearest-neighbour distance from each query point into target, capped
    at max_dist (PointCompareMain.m MaxDist=60)."""
    if len(target) == 0:
        return np.full(len(query), max_dist, np.float64)
    from scipy.spatial import cKDTree
    tree = cKDTree(target)
    d, _ = tree.query(query, k=1, distance_upper_bound=max_dist)
    return np.minimum(d, max_dist)


def _mask_lookup(pts: np.ndarray, obs_mask: np.ndarray, bb: np.ndarray,
                 res: float) -> np.ndarray:
    """ObsMask voxel test: Qv = round((p - BB_low)/Res + 1), 1-indexed
    (PointCompareMain.m:36-46)."""
    qv = np.round((pts - bb[0][None]) / res + 1).astype(np.int64)
    inside = ((qv > 0) & (qv <= np.asarray(obs_mask.shape)[None])).all(1)
    out = np.zeros(len(pts), bool)
    idx = qv[inside] - 1
    out[inside] = obs_mask[idx[:, 0], idx[:, 1], idx[:, 2]] > 0
    return out


def evaluate_scan(data_pts: np.ndarray, stl_pts: np.ndarray,
                  obs_mask: Optional[np.ndarray] = None,
                  bb: Optional[np.ndarray] = None, res: float = 1.0,
                  plane: Optional[np.ndarray] = None,
                  dst: float = 0.2, max_dist: float = 60.0,
                  outlier: float = 20.0, seed: int = 0) -> Dict[str, float]:
    """Acc/Comp for one scan.

    Args:
        data_pts: (N, 3) fused cloud; stl_pts: (M, 3) GT structured light
            (assumed pre-thinned like the official stl plys).
        obs_mask/bb/res: observability voxel grid (None = no masking).
        plane: (4,) ground plane; GT point q kept when plane @ [q, 1] > 0.
    """
    data = reduce_points(np.asarray(data_pts, np.float64), dst, seed)

    d_data = nn_distances(data, stl_pts, max_dist)
    if obs_mask is not None and bb is not None:
        in_mask = _mask_lookup(data, obs_mask, bb, res)
    else:
        in_mask = np.ones(len(data), bool)
    acc_d = d_data[in_mask]
    acc_d = acc_d[acc_d < outlier]

    d_stl = nn_distances(stl_pts, data, max_dist)
    if plane is not None:
        above = (np.concatenate([stl_pts, np.ones((len(stl_pts), 1))], 1)
                 @ np.asarray(plane).reshape(4)) > 0
    else:
        above = np.ones(len(stl_pts), bool)
    comp_d = d_stl[above]
    comp_d = comp_d[comp_d < outlier]

    return {
        "acc_mean": float(np.mean(acc_d)) if len(acc_d) else float(max_dist),
        "acc_median": float(np.median(acc_d)) if len(acc_d) else float(max_dist),
        "comp_mean": float(np.mean(comp_d)) if len(comp_d) else float(max_dist),
        "comp_median": float(np.median(comp_d)) if len(comp_d) else float(max_dist),
    }


def load_scan_gt(sample_set_path: str, scan: int, margin: int = 10):
    """Load a scan's GT from the official DTU SampleSet layout
    (stl ply + ObsMask .mat with ObsMask/BB/Res + Plane .mat with P)."""
    from scipy.io import loadmat
    from mdfnet_tpu.fusion.ply import read_ply
    stl, _ = read_ply(os.path.join(sample_set_path, "Points", "stl",
                                   f"stl{scan:03d}_total.ply"))
    m = loadmat(os.path.join(sample_set_path, "ObsMask",
                             f"ObsMask{scan}_{margin}.mat"))
    p = loadmat(os.path.join(sample_set_path, "ObsMask", f"Plane{scan}.mat"))
    return (stl.astype(np.float64), m["ObsMask"], np.asarray(m["BB"]),
            float(np.asarray(m["Res"]).squeeze()), np.asarray(p["P"]).reshape(4))


def evaluate_dtu(ply_dir: str, sample_set_path: str,
                 scans: Sequence[int] = (1, 4, 9, 10, 11, 12, 13, 15, 23, 24,
                                         29, 32, 33, 34, 48, 49, 62, 75, 77,
                                         110, 114, 118),
                 method: str = "ours", light: str = "l3",
                 log_fn=print) -> Dict[str, float]:
    """Evaluate fused clouds named <method><scan:03d>_<light>.ply over the
    standard 22 eval scans. Returns per-scan and aggregate metrics."""
    from mdfnet_tpu.fusion.ply import read_ply
    per_scan = {}
    for scan in scans:
        cloud, _ = read_ply(os.path.join(ply_dir,
                                         f"{method}{scan:03d}_{light}.ply"))
        stl, obs_mask, bb, res, plane = load_scan_gt(sample_set_path, scan)
        r = evaluate_scan(cloud, stl, obs_mask, bb, res, plane)
        per_scan[scan] = r
        if log_fn:
            log_fn(f"scan {scan}: acc {r['acc_mean']:.4f} "
                   f"comp {r['comp_mean']:.4f}")

    acc = float(np.mean([r["acc_mean"] for r in per_scan.values()]))
    comp = float(np.mean([r["comp_mean"] for r in per_scan.values()]))
    return {"acc": acc, "comp": comp, "overall": (acc + comp) / 2,
            "per_scan": per_scan}
