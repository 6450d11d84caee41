"""Host-side utilities: encoders, normalizers, metrics, profiling."""

from simulate_2048_tpu.utils.encoding import encode, encode_flatten, normalize_reward

__all__ = ["encode", "encode_flatten", "normalize_reward"]
