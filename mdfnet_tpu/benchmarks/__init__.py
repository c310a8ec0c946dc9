"""Benchmark metrics: DTU Acc/Comp/Overall (Python replacement for the
reference's MATLAB pipeline) and Tanks & Temples submission packaging."""

from mdfnet_tpu.benchmarks.dtu_metric import (
    reduce_points, nn_distances, evaluate_scan, evaluate_dtu)
