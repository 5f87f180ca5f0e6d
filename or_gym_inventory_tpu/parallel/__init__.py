from or_gym_inventory_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, sharded_evaluate, sharded_rollout, initialize_multihost)
