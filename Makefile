# Developer entry points (counterpart of the reference Makefile:1-71).

PY ?= python

.PHONY: test test-fast lint bench train-tiny train-small train-full eval play dryrun

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

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
