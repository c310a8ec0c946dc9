"""Native-core parity vs the reference pcd C++ extension, JIT-compiled from
the read-only mount at test time (never copied)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch


@pytest.fixture(scope="module")
def ref_ext():
    import os
    from torch.utils.cpp_extension import load
    build_dir = "/tmp/mdfnet_ref_ext"
    os.makedirs(build_dir, exist_ok=True)
    return load(name="ref_fusion",
                sources=["/root/reference/tools/pcd/utils/fusion.cpp"],
                extra_cflags=["-std=c++17", "-O3"],
                build_directory=build_dir, verbose=False)


def test_zbuffer_elect_matches_reference(ref_ext, rng):
    from mdfnet_tpu.fusion.native import zbuffer_elect
    m, h, w = 2000, 13, 17
    depth = (rng.rand(m) * 10).astype(np.float32)
    depth[rng.rand(m) < 0.1] = 0.0
    xy = np.stack([rng.rand(m) * (w + 1) - 0.5,
                   rng.rand(m) * (h + 1) - 0.5], 1).astype(np.float32)
    vio = rng.randint(0, 4, m).astype(np.int32)
    valid = rng.rand(h, w) > 0.2

    ref = ref_ext.vis_fusion_core(
        torch.from_numpy(depth), torch.from_numpy(xy),
        torch.from_numpy(vio), torch.from_numpy(valid)).numpy().reshape(h, w)
    ours = zbuffer_elect(depth, xy, vio, valid)
    np.testing.assert_array_equal(ours, ref)


def test_segment_filter_matches_reference(ref_ext, rng):
    from mdfnet_tpu.fusion.native import segment_filter
    h, w = 40, 50
    depth = (600 + 2 * rng.randn(h, w)).astype(np.float32)
    depth[rng.rand(h, w) < 0.35] = 0.0

    for window, diff, size in [(1, 1e-3, 5), (4, 1e-3, 10), (2, 5e-3, 20)]:
        ref = ref_ext.small_seg_core(torch.from_numpy(depth), window, diff,
                                     size).numpy().astype(bool)
        ours = segment_filter(depth, window, diff, size)
        np.testing.assert_array_equal(ours, ref)
