from posterior_matching_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
)

__all__ = ["batch_sharding", "create_mesh", "replicated_sharding"]
