"""Device-mesh construction and sharding rules (pjit / shard_map over ICI)."""

from mdfnet_tpu.parallel.mesh import (
    make_mesh, batch_sharding, replicated, shard_batch)
