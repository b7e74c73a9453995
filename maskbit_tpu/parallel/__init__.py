from maskbit_tpu.parallel.mesh import (
    AXES,
    MeshConfig,
    barrier,
    batch_sharding,
    create_mesh,
    is_main_process,
    param_shardings,
    replicated,
    shard_params,
    warmup_collective_rendezvous,
)

__all__ = [
    "AXES", "MeshConfig", "create_mesh", "batch_sharding", "replicated",
    "param_shardings", "shard_params", "is_main_process", "barrier",
    "warmup_collective_rendezvous",
]
