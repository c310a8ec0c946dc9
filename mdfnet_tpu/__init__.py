"""mdfnet_tpu — a TPU-native multi-view-stereo framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of MDF-Net ("Multi-distribution
fitting for multi-view stereo"): a 4-scale coarse-to-fine plane-sweep MVS
depth-estimation pipeline with distribution-fitting adaptive depth hypotheses,
plus data pipelines (DTU / BlendedMVS / Tanks & Temples), training/eval loops,
three depth-map fusion backends and DTU benchmark metrics.

Layout
------
- :mod:`mdfnet_tpu.geometry`   — camera math shared by model and fusion
- :mod:`mdfnet_tpu.ops`        — sampling / warping / fitting / regression kernels
- :mod:`mdfnet_tpu.models`     — flax modules + config-driven assembly
- :mod:`mdfnet_tpu.data`       — host-side codecs, dataset samplers, device pipelines
- :mod:`mdfnet_tpu.parallel`   — mesh construction and sharding rules
- :mod:`mdfnet_tpu.fusion`     — depth-map -> point-cloud fusion backends
- :mod:`mdfnet_tpu.benchmarks` — DTU Acc/Comp/Overall metric
- :mod:`mdfnet_tpu.utils`      — checkpoint import, logging, profiling
"""

__version__ = "0.1.0"
