# Developer entry points (counterpart of the reference Makefile:1-71).

PY ?= python

.PHONY: test test-fast test-cov lint bench train-tiny train-small train-full eval play dryrun lock

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

# Coverage target (reference Makefile:32-33). pytest-cov is not in this
# image; fall back to plain pytest with a notice when it is absent.
test-cov:
	$(PY) -c "import pytest_cov" 2>/dev/null \
		&& $(PY) -m pytest tests/ -q --cov=simulate_2048_tpu --cov-report=term-missing \
		|| { echo "pytest-cov not installed; running without coverage"; $(PY) -m pytest tests/ -q; }

# Re-pin the dependency lockfile from the live environment (the reference
# pins via uv.lock; this environment is pre-baked and offline, so the lock
# records exactly what the parity/perf claims ran against).
lock:
	$(PY) -m pip freeze > requirements.lock

lint:
	ruff check simulate_2048_tpu tests scripts || true

bench:
	$(PY) bench.py

bench-training:
	$(PY) scripts/benchmark_training.py --mode small

train-tiny:
	$(PY) -m simulate_2048_tpu.train --mode tiny --steps 200

train-small:
	$(PY) -m simulate_2048_tpu.train --mode small

train-full:
	$(PY) -m simulate_2048_tpu.train --mode full

eval:
	$(PY) -m simulate_2048_tpu.evaluate --mode small --games 10 --checkpoint-dir checkpoints

play:
	$(PY) -m simulate_2048_tpu.play

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
