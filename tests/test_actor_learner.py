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


class TestFailurePaths:
    """Failure-path coverage (VERDICT r2 #8): full-queue backpressure, actor
    death mid-message, corrupt frames, and learner-channel loss."""

    @pytest.fixture()
    def server(self):
        config = micro_config()
        trainer = Trainer(config, seed=0)
        trainer.initialize()
        server = LearnerServer(trainer, port=0).start()
        yield server
        server.close()

    def test_close_terminates_accept_thread(self, server):
        # close() must WAKE the thread blocked in accept() (socket.close alone
        # doesn't on Linux); before the shutdown() fix these threads lingered
        # for the life of the process — three suite-long runs showed them
        # still alive in the final faulthandler dump.
        assert server._accept_thread.is_alive()
        server.close()
        server._accept_thread.join(timeout=5.0)
        assert not server._accept_thread.is_alive()

    def test_full_queue_drops_oldest_never_blocks(self, server):
        import queue as queue_mod

        server._traj_queue = queue_mod.Queue(maxsize=2)
        for payload in ("a", "b", "c", "d"):
            server._enqueue(payload)  # must return promptly even when full
        assert server.trajectories_dropped == 2
        # Freshest-wins: the two NEWEST batches survive.
        assert [server._traj_queue.get_nowait() for _ in range(2)] == ["c", "d"]

    def test_actor_death_mid_message_leaves_server_alive(self, server):
        import socket as socket_mod
        import struct as struct_mod

        # A client dies after sending half a length header...
        sock = socket_mod.create_connection(server.address)
        sock.sendall(b"\x00\x00\x00")
        sock.close()
        # ...and another dies mid-BODY (header promises more than it sends).
        sock = socket_mod.create_connection(server.address)
        sock.sendall(struct_mod.pack("!Q", 1000) + b"partial")
        sock.close()

        # The server must still serve a healthy client.
        actor = ActorClient(micro_config(), server.address, seed=5)
        actor.fetch_params()
        assert actor.learner_step == 0
        actor.close()

    def test_corrupt_frame_drops_connection_not_server(self, server):
        import socket as socket_mod
        import struct as struct_mod

        sock = socket_mod.create_connection(server.address)
        garbage = b"\x93NOT-PICKLE\xff\xfe"
        sock.sendall(struct_mod.pack("!Q", len(garbage)) + garbage)
        # The server drops this connection (no reply); subsequent clients work.
        sock.settimeout(5.0)
        assert sock.recv(1) == b""  # orderly close from the server side
        sock.close()

        actor = ActorClient(micro_config(), server.address, seed=6)
        actor.fetch_params()
        actor.close()

    def test_actor_reconnects_after_channel_loss(self, server):
        actor = ActorClient(micro_config(), server.address, seed=7)
        actor.fetch_params()
        # Simulate a broken channel (learner restart / network blip): the
        # next RPC must transparently redial instead of raising.
        actor._sock.close()
        actor.fetch_params()
        assert actor.reconnects == 1
        assert actor.learner_step == 0
        actor.close()

    def test_exhausted_retries_raise(self):
        config = micro_config()
        trainer = Trainer(config, seed=0)
        trainer.initialize()
        server = LearnerServer(trainer, port=0).start()
        actor = ActorClient(config, server.address, seed=8, connect_timeout_s=1.0)
        # Learner gone for good: listener closed AND the established channel
        # broken — every redial now hits a dead address.
        server.close()
        actor._sock.close()
        with pytest.raises((OSError, ConnectionError)):
            actor.fetch_params()
        actor.close()
