"""Device-mesh construction and sharding helpers (the SPMD backbone)."""

from ssip_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    build_mesh,
    batch_sharding,
    replicated,
    pad_to_multiple,
    shard_batch,
)
