"""Flax modules for the MVS cascade + config-driven assembly registry."""

from mdfnet_tpu.models.backbone import FPN4Scales
from mdfnet_tpu.models.aggregate import VectorAggregate
from mdfnet_tpu.models.regularize import RegularNet3Scales, RegularNet4Scales
from mdfnet_tpu.models.refine import RefineNet2
from mdfnet_tpu.models.core import CoreNet
from mdfnet_tpu.models.registry import build_model
