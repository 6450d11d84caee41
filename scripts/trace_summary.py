"""Summarize a jax.profiler perfetto trace: top device ops by total time.

The TPU-native profiling loop used to optimize this framework (upgrade over
the reference's broken cProfile harness, ``scripts/profile_mcts.py:40``):

  1. capture:   python scripts/benchmark_mcts.py --trace /tmp/trace …
                (or ``utils.profiling.trace`` around any workload)
  2. summarize: python scripts/trace_summary.py /tmp/trace
  3. map hot fusions back to source: jit the workload, ``.lower(…).compile()
     .as_text()``, and grep the fusion name — its ``metadata`` carries the
     originating source_file:source_line.

This is how the MCTS gather/scatter pathology was found (docs/project.md,
"MCTS optimization history").
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import sys
from pathlib import Path


def summarize(trace_path: Path, top: int = 30) -> None:
    with gzip.open(trace_path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "TPU" in pid_names.get(e.get("pid"), "") and e.get("dur"):
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            total += e["dur"]
    print(f"devices: {pid_names}")
    print(f"total device-op time: {total / 1e3:.1f} ms over {sum(cnt.values())} events")
    for name, d in dur.most_common(top):
        print(f"{d / 1e3:9.2f} ms  x{cnt[name]:<6} {name[:110]}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("trace", help="trace dir (plugins/profile/**.trace.json.gz found inside) or the .json.gz itself")
    parser.add_argument("--top", type=int, default=30)
    args = parser.parse_args()

    path = Path(args.trace)
    if path.is_dir():
        candidates = sorted(path.glob("**/*.trace.json.gz"))
        if not candidates:
            sys.exit(f"no *.trace.json.gz under {path}")
        path = candidates[-1]
    summarize(path, args.top)


if __name__ == "__main__":
    main()
