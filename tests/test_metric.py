"""DTU metric tests: thinning spacing property, NN distances vs brute force,
and a constructed scene where Acc/Comp are known analytically."""
import numpy as np

from mdfnet_tpu.benchmarks.dtu_metric import (
    evaluate_scan, nn_distances, reduce_points)


def test_reduce_points_spacing(rng):
    pts = rng.rand(2000, 3) * 5
    out = reduce_points(pts, dst=0.5, seed=1)
    assert len(out) < len(pts)
    from scipy.spatial import cKDTree
    tree = cKDTree(out)
    d, _ = tree.query(out, k=2)
    assert d[:, 1].min() >= 0.5, "thinning violated min spacing"


def _reduce_points_sequential(pts, dst, seed):
    """The literal reducePts_haa.m greedy (random visit order, each kept
    point suppresses all dst-neighbours) — the oracle for the vectorised
    parallel-rounds implementation."""
    n = len(pts)
    order = np.random.RandomState(seed).permutation(n)
    from scipy.spatial import cKDTree
    tree = cKDTree(pts)
    alive = np.ones(n, bool)
    keep = np.zeros(n, bool)
    for i in order:
        if not alive[i]:
            continue
        keep[i] = True
        for j in tree.query_ball_point(pts[i], dst):
            if np.sum((pts[j] - pts[i]) ** 2) < dst * dst:
                alive[j] = False
    return keep


def test_reduce_points_matches_sequential_greedy(rng):
    """The vectorised thinning must reproduce the sequential MATLAB greedy
    bit-for-bit (same permutation => same kept set)."""
    for seed in (0, 1, 7):
        pts = rng.rand(5000, 3) * 8
        expected = _reduce_points_sequential(pts, 0.5, seed)
        out = reduce_points(pts, dst=0.5, seed=seed)
        np.testing.assert_array_equal(out, pts[expected])


def test_reduce_points_scales(rng):
    """1M clustered points must thin in seconds (the pure-python version
    took minutes here and hours at DTU's 25M)."""
    import time
    base = rng.rand(50_000, 3) * 100
    pts = (base[None] + rng.randn(20, 1, 3) * 0.3).reshape(-1, 3)
    t0 = time.time()
    out = reduce_points(pts, dst=0.2, seed=0)
    elapsed = time.time() - t0
    assert elapsed < 30.0, f"thinning too slow: {elapsed:.1f}s for 1M points"
    assert 0 < len(out) < len(pts)


def test_nn_distances_matches_bruteforce(rng):
    q = rng.rand(200, 3) * 10
    t = rng.rand(300, 3) * 10
    d = nn_distances(q, t, max_dist=60.0)
    brute = np.sqrt(((q[:, None] - t[None]) ** 2).sum(-1)).min(1)
    np.testing.assert_allclose(d, brute, atol=1e-9)


def test_nn_distance_capped():
    q = np.zeros((5, 3))
    t = np.full((4, 3), 1000.0)
    d = nn_distances(q, t, max_dist=60.0)
    np.testing.assert_array_equal(d, 60.0)


def test_evaluate_scan_known_offsets(rng):
    # GT: dense plane grid; data: same grid shifted 0.5mm in z plus some
    # far outliers that the 20mm threshold must discard
    xs, ys = np.meshgrid(np.arange(0, 50, 0.5), np.arange(0, 50, 0.5))
    stl = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], 1)
    data = stl + np.array([0.0, 0.0, 0.5])
    outliers = rng.rand(100, 3) * 50 + np.array([0, 0, 500.0])
    data = np.concatenate([data, outliers])

    r = evaluate_scan(data, stl, dst=0.2, outlier=20.0)
    # every inlier's NN is exactly 0.5 away; outliers discarded
    np.testing.assert_allclose(r["acc_mean"], 0.5, atol=0.02)
    # GT points are 0.5 from data
    np.testing.assert_allclose(r["comp_mean"], 0.5, atol=0.02)


def test_evaluate_scan_mask_and_plane(rng):
    stl = rng.rand(500, 3) * 20
    data = stl + 0.1  # uniform small error
    # mask excluding half the space: voxel grid over [0,20]^3, res 1
    bb = np.array([[0.0, 0.0, 0.0], [20.0, 20.0, 20.0]])
    obs = np.zeros((21, 21, 21), np.uint8)
    obs[:11] = 1  # x < ~10 observable
    plane = np.array([0.0, 0.0, 1.0, -10.0])  # keep GT with z > 10

    r = evaluate_scan(data, stl, obs_mask=obs, bb=bb, res=1.0, plane=plane)
    assert 0.1 < r["acc_mean"] < 0.25
    assert 0.1 < r["comp_mean"] < 0.25
