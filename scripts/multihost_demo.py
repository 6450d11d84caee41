"""Multi-process (multi-host-shaped) data-parallel training demo.

Each process owns a shard of the global batch; `jax.distributed` wires the
processes into one JAX runtime and the DP train step all-reduces gradients
across them (Gloo on CPU, ICI/DCN on TPU pods). This is the process-level
analogue of the single-process mesh path in ``parallel/dp.py`` and the
framework's multi-host bring-up test (the reference has no distributed code
at all — SURVEY.md §2.6).

Launch one process per host/slice:

  python scripts/multihost_demo.py --num-processes 2 --process-id 0 &
  python scripts/multihost_demo.py --num-processes 2 --process-id 1 &

On a TPU pod, omit the flags — jax.distributed auto-detects.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", default="localhost:29409")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--steps", type=int, default=3)
    args = parser.parse_args()

    from simulate_2048_tpu.utils.platform import respect_env_platforms

    respect_env_platforms()

    import jax

    if args.num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        jax.distributed.initialize()

    import numpy as np
    from dataclasses import replace

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from simulate_2048_tpu.parallel import make_dp_train_step, make_mesh
    from simulate_2048_tpu.training import (
        create_optimizer,
        create_train_state,
        tiny_config,
    )
    from simulate_2048_tpu.training.losses import TrainingTargets

    pid, nproc = jax.process_index(), jax.process_count()
    print(f"process {pid}/{nproc}: {jax.local_device_count()} local / {jax.device_count()} global devices", flush=True)

    per_proc = 8
    cfg = replace(
        tiny_config(), hidden_size=32, num_residual_blocks=1, batch_size=per_proc * nproc
    )
    # Same seed everywhere ⇒ identical initial params on all processes.
    state, network = create_train_state(jax.random.PRNGKey(0), cfg)
    optimizer = create_optimizer(cfg)

    mesh = make_mesh()
    shard = NamedSharding(mesh, P("data"))

    # Each process contributes its LOCAL batch shard; global batch assembles
    # across processes without any host gathering.
    rs = np.random.RandomState(100 + pid)
    k = cfg.num_unroll_steps
    local = TrainingTargets(
        observations=rs.rand(per_proc, k + 1, 16).astype(np.float32),
        actions=rs.randint(0, 4, (per_proc, k)),
        target_policies=np.full((per_proc, k + 1, 4), 0.25, np.float32),
        target_values=rs.rand(per_proc, k + 1).astype(np.float32),
        target_rewards=rs.rand(per_proc, k).astype(np.float32),
    )
    batch = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(shard, x), local
    )
    weights = jax.make_array_from_process_local_data(
        shard, np.ones((per_proc,), np.float32)
    )

    with mesh:
        dp_step = make_dp_train_step(network.apply_fns, cfg, optimizer, mesh)
        for i in range(args.steps):
            state, loss, _ = dp_step(state, batch, weights)
            print(f"process {pid} step {i}: loss {float(loss.total_loss):.6f}", flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
