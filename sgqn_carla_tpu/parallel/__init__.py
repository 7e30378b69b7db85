from sgqn_carla_tpu.parallel.mesh import (  # noqa: F401
    MeshSpec,
    make_mesh,
    put_env_batch,
    put_replicated,
    put_sharded,
    replicate,
    shard_batch,
)
