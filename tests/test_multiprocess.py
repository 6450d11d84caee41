"""Multi-process distributed integration: two JAX processes joined via
jax.distributed (Gloo on CPU) run the data-parallel train step on sharded
batches and must agree on the loss bit-for-bit — the framework's multi-host
path, testable on one machine."""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(300)
def test_two_process_dp_train_step_agrees():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "multihost_demo.py"),
                "--coordinator",
                "localhost:29417",
                "--num-processes",
                "2",
                "--process-id",
                str(i),
                "--steps",
                "2",
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outputs.append(out)
        assert p.returncode == 0, out

    losses = {}
    for out in outputs:
        for pid, step, loss in re.findall(r"process (\d) step (\d): loss ([\d.]+)", out):
            losses.setdefault((int(step)), {})[int(pid)] = float(loss)
    assert losses, f"no loss lines parsed: {outputs}"
    for step, by_pid in losses.items():
        assert len(by_pid) == 2
        assert by_pid[0] == by_pid[1], f"step {step}: {by_pid}"
