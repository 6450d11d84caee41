"""Platform selection that honors the JAX_PLATFORMS environment variable.

Some TPU attachment layers (e.g. the axon PJRT plugin's sitecustomize)
force ``jax_platforms`` via ``jax.config`` at interpreter start, which
silently overrides a user's ``JAX_PLATFORMS=cpu``. Entry points call
:func:`respect_env_platforms` so the env var wins again.
"""

from __future__ import annotations

import os


def respect_env_platforms() -> None:
    """Re-apply JAX_PLATFORMS from the environment to jax.config."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent compilation cache (big win on remote-compile backends)."""
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
