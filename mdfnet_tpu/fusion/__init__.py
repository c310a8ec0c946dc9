"""Depth-map -> point-cloud fusion backends, reimplemented as batched JAX ops
(no CUDA binaries, no torch):

- dynamic_filter: dynamic multi-view consistency filter (fusion A — the main
  method for Tanks & Temples, reference tools/filter/).
- consistency_vote: fusibile-style per-pixel consistency vote (fusion B,
  reference tools/gipuma/ + tools/fusibile/ CUDA binary).
- pcd_fusion: visibility-based fusion with occlusion-aware z-buffer election
  and small-segment removal (fusion C, reference tools/pcd/).
"""

from mdfnet_tpu.fusion.dynamic_filter import (
    fuse_scan, reproject_depth, geometric_consistency)
from mdfnet_tpu.fusion.ply import write_ply, read_ply
