"""Exact spatial sharding of eval inference over the image-height axis.

The workload's analog of sequence/context parallelism (SURVEY.md §5): the
plane-sweep cost volumes at full DTU resolution dominate HBM, and their H
axis is the natural shard dimension. Every device holds an H-band of the
images, features, cost volumes, and outputs; H-stencil ops exchange exactly
the rows they need with mesh neighbours (parallel/halo.py):

- convs / transposed convs swap ``padding`` rows per side (ppermute);
- the 2x bilinear upsamplers swap one row per side;
- plane-sweep warps all-gather the small 2D source features and keep the
  large 3D volumes sharded.

This is **exact** (up to XLA reassociation noise, < 1e-5): unlike
overlap-tiling there is no receptive-field approximation, because each
stencil op gets its true neighbour rows. Memory for every sharded tensor
scales 1/n, enabling full-resolution eval on small-HBM chips — the TPU
equivalent of the reference's only memory lever, cropping
(reference load/dtueval.py:34 crops 1200 -> 1184).

Geometry: each band runs the same cameras as the full image; the band's
global row offset enters through the REFERENCE view's principal point cy
(the unprojected rays then carry global geometry), while source views keep
their true intrinsics because warps sample the all-gathered (global-row)
source features.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mdfnet_tpu.parallel import halo

# band starts must align with the deepest downsampling grid: 1/8 backbone
# features further downsampled 4x (stage-0 3-scale U-Net) or the 1/4
# features downsampled 8x (4-scale U-Nets) -> 32 full-res rows
ALIGN = 32


def spatial_eval_forward(model, variables, mesh: Mesh, imgs, extrinsics,
                         intrinsics, depth_range, axis: str = "spatial"):
    """Run eval forward with H sharded over ``axis`` of ``mesh``.

    Args:
        imgs: (B, V, H, W, 3); H must be divisible by (mesh[axis] * 32).
    Returns:
        {"depth": (B, H, W), "confidence": (B, H, W)} identical (to within
        float reassociation noise) to the unsharded forward.
    """
    n = mesh.shape[axis]
    b, v, h, w, c = imgs.shape
    assert h % (n * ALIGN) == 0, f"H={h} must divide {n}*{ALIGN}"
    # pallas_conv=True IS supported (round 4): the 3D U-Net convs run the
    # fused Pallas kernels band-locally — each band gets its true halo rows
    # (layers.ConvBNReLU3D/TrConvBNReLU3D _pallas_path) — while the backbone
    # and refine fall through to their halo-aware XLA paths. warp_impl=
    # "fused" also composes (round 5): the rowsweep kernel runs band-local
    # ref rows against all-gathered full-height source pair-diffs
    # (models/aggregate.py spatial x fused branch).
    band = h // n

    def band_forward(band_imgs, extr, intr, drange):
        """One device: H-band in, H-band out; halos exchanged per layer."""
        idx = jax.lax.axis_index(axis)
        row0 = (idx * band).astype(jnp.float32)
        # global geometry for band rows: shift ONLY the reference view's cy
        # (source views keep true intrinsics — their features are gathered
        # to full height before sampling)
        intr_shift = intr.at[:, 0, 1, 2].add(-row0)
        with halo.spatial_sharding(axis, n):
            out = model.apply(variables, band_imgs, extr, intr_shift,
                              drange, train=False)
        # replicated global coverage flag: every band's warp contract held
        bad = jax.lax.psum(
            (~out["coverage_ok"]).astype(jnp.int32), axis)
        return out["depth"], out["confidence"], bad == 0

    fn = jax.shard_map(
        band_forward,
        mesh=mesh,
        in_specs=(P(None, None, axis, None, None), P(), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None), P()),
        check_vma=False,
    )
    depth, conf, cover = fn(imgs, extrinsics, intrinsics, depth_range)
    return {"depth": depth, "confidence": conf, "coverage_ok": cover}
