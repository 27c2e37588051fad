from svpc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, shard_batch_multihost, assemble_global_batch,
    replicate, batch_sharding, replicated_sharding,
    shard_params, shard_state_zero1, state_shardings,
)
