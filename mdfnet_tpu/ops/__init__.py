"""Performance kernels: sampling, plane-sweep warping, distribution fitting,
depth/confidence regression. Pure jnp (XLA-fused) with optional Pallas paths."""

from mdfnet_tpu.ops.sample import (
    bilinear_sample_2d,
    resize_bilinear_2x,
    resize_nearest_2x,
)
from mdfnet_tpu.ops.warp import homography_warp
from mdfnet_tpu.ops.fitting import (
    fit_gauss0,
    fit_gauss1,
    fit_laplace,
    uniform_hypotheses,
    refined_hypotheses,
)
from mdfnet_tpu.ops.regress import depth_regression, confidence_regression
