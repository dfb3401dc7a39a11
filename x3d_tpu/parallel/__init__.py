"""Device-mesh parallelism: sharding specs for data-parallel + head tensor-parallel."""

from x3d_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
    shard_state,
    state_shardings,
)
