"""Mesh construction and sharding helpers.

The training strategy is data parallelism over a 1-D ``data`` mesh axis —
the TPU-native replacement for the reference's single-process
torch.nn.DataParallel (reference train.py:24-26, SURVEY.md §2.3): the batch is
sharded over ICI, parameters are replicated, and XLA inserts the gradient
all-reduce automatically from the sharding constraints.

A second optional ``spatial`` axis shards the image-height dimension of the
plane-sweep volumes for eval at resolutions that exceed one chip's HBM
(the workload's analog of sequence/context parallelism, SURVEY.md §5).

Note on BatchNorm: under pjit the train step has global-batch semantics, so
BN statistics are effectively synchronised across the mesh. The reference's
per-replica BN is an artifact of DataParallel, not a design choice; the
synced behaviour is the mathematically cleaner one and is documented here as
a deliberate deviation.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, spatial: int = 1, devices=None) -> Mesh:
    """Create a (data, spatial) mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
        data = n // spatial
    use = data * spatial
    dev_array = np.asarray(devices[:use]).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """device_put a host batch dict with axis-0 sharding over `data`."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
