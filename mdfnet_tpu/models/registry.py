"""Config-driven model assembly, preserving the reference's pluggability
(reference config.py:186-218 assembles CoreNet from injected units)."""
from __future__ import annotations

import jax.numpy as jnp

from mdfnet_tpu.config import ModelConfig
from mdfnet_tpu.models.core import CoreNet

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_model(config: ModelConfig | None = None) -> CoreNet:
    config = config or ModelConfig()
    return CoreNet(
        chs=tuple(config.chs),
        ndepths=tuple(config.ndepths),
        curve_classes=tuple(config.curve_classes),
        prob_threshs=tuple(config.prob_threshs),
        ngroups=tuple(config.ngroups),
        warp_impl=config.warp_impl,
        pallas_conv=config.pallas_conv,
        remat=config.remat,
        wfold=config.wfold,
        aggregate_impl=config.aggregate_impl,
        hypo_impl=config.hypo_impl,
        refine_impl=config.refine_impl,
        dtype=_DTYPES[config.compute_dtype],
    )


def count_params(params) -> int:
    import jax
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
