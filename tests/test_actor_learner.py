"""Asynchronous actor/learner runtime: actors stream trajectories over the
TCP channel, the learner trains from them (never generating games itself)
and publishes parameters back. The reference has no process split at all
(SURVEY.md §2.6); the paper used 1 learner + 4 actor TPUs (PDF App. G)."""

import dataclasses
import threading

import pytest

from simulate_2048_tpu.parallel import ActorClient, LearnerServer
from simulate_2048_tpu.training import Trainer, tiny_config


def micro_config():
    return dataclasses.replace(
        tiny_config(),
        hidden_size=32,
        num_residual_blocks=1,
        num_simulations=4,
        max_trajectory_length=12,
        min_buffer_size=4,
        batch_size=8,
        num_parallel_games=2,
        generation_interval=5,  # doubles as param_sync_interval
        log_interval=5,
        eval_interval=1_000_000,
        checkpoint_interval=1_000_000,
    )


@pytest.mark.timeout(600)
def test_actors_feed_learner_and_pull_params():
    config = micro_config()
    trainer = Trainer(config, seed=0)
    trainer.initialize()
    server = LearnerServer(trainer, port=0).start()

    actor_steps: list[list[int]] = [[], []]

    def run_actor(idx: int, generations: int):
        actor = ActorClient(config, server.address, seed=idx + 1)
        actor.run(generations, on_generation=lambda g, s: actor_steps[idx].append(s))
        actor.close()

    threads = [threading.Thread(target=run_actor, args=(i, 8), daemon=True) for i in range(2)]
    for t in threads:
        t.start()

    try:
        # The learner never generates: every episode in the buffer arrived
        # over the wire.
        server.fill_buffer(timeout_s=300.0, verbose=False)
        assert int(trainer.buffer.size) >= config.min_buffer_size
        assert server.trajectories_received >= 2

        final = server.run(num_steps=10, verbose=False)
        assert final["step"] == 10
        assert int(trainer.state.step) == 10

        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive()

        # A fresh pull after training must see the final published snapshot.
        late_actor = ActorClient(config, server.address, seed=99)
        late_actor.fetch_params()
        assert late_actor.learner_step == 10
        late_actor.close()
    finally:
        server.close()

    # Both actors completed all generations with monotone learner steps.
    assert [len(s) for s in actor_steps] == [8, 8]
    for steps in actor_steps:
        assert steps == sorted(steps), "learner step must be monotone in actor pulls"
    assert server.params_served >= 17
