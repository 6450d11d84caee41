"""Device-mesh parallelism: sharding helpers, DP learner, multi-host runtime,
async actor/learner process split."""

from simulate_2048_tpu.parallel.actor_learner import ActorClient, LearnerServer
from simulate_2048_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_pytree_batch,
)
from simulate_2048_tpu.parallel.dp import (
    make_dp_train_step,
    make_dp_train_superstep,
    make_sharded_rollout,
)

__all__ = [
    "ActorClient",
    "LearnerServer",
    "batch_sharding",
    "make_dp_train_step",
    "make_dp_train_superstep",
    "make_mesh",
    "make_sharded_rollout",
    "replicated_sharding",
    "shard_pytree_batch",
]
