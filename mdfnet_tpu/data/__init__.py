"""Host-side data layer: file codecs, dataset samplers, device pipelines,
synthetic scenes for testing/benchmarking."""

from mdfnet_tpu.data.formats import (
    read_pfm,
    write_pfm,
    read_cam_file,
    read_pair_file,
    read_image,
    write_depth_png,
    write_mask_png,
)
