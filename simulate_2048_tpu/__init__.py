"""simulate_2048_tpu — a TPU-native Stochastic MuZero framework for 2048.

A from-scratch rebuild of the capabilities of ``schalappe/simulate_2048``
(reference layout documented in SURVEY.md), designed TPU-first:

- ``ops``      — lane-friendly, jit/vmap-able board kernels on exponent boards,
                 a counter-based (Threefry-2x32) spawn RNG spec, Pallas kernels.
- ``engine``   — a scalar NumPy engine with the reference's public API
                 (parity oracle + manual play backend).
- ``env``      — functional JAX environment (`GameState` pytree, batched,
                 fully on-device rollout drivers).
- ``models``   — the six Stochastic MuZero Flax networks (h, f, phi, psi, g, e).
- ``search``   — in-repo batched stochastic MCTS (array tree, decision/chance
                 interleaving, PUCT + progressive chance selection) under jit.
- ``training`` — losses, device-resident prioritized replay, on-device
                 self-play, optax learner, orbax checkpointing, trainer.
- ``parallel`` — device-mesh / sharding helpers and the multi-host runtime.
- ``utils``    — encoders, metrics, profiling harnesses.
"""

__version__ = "0.1.0"
