"""Micro-benchmarks of the scalar NumPy engine ops at board sizes 4/6/8.

Counterpart of the reference's ``tests/test_perf_utils.py:12-52`` (timeit
harness over ``slide_and_merge`` and ``illegal_actions``).

Usage: ``python scripts/bench_engine_ops.py``
"""

from __future__ import annotations

import json
import sys
import timeit
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from simulate_2048_tpu.engine.board import slide_and_merge
from simulate_2048_tpu.engine.moves import illegal_actions, legal_actions_mask


def random_board(size: int, rs: np.random.RandomState) -> np.ndarray:
    exp = rs.randint(0, 11, size=(size, size))
    exp[rs.rand(size, size) < 0.4] = 0
    return (2 ** exp.astype(np.int64)) * (exp > 0)


def main() -> None:
    rs = np.random.RandomState(0)
    results = []
    for size in (4, 6, 8):
        board = random_board(size, rs)
        n = 2000
        t_slide = timeit.timeit(lambda: slide_and_merge(board), number=n) / n
        t_illegal = timeit.timeit(lambda: illegal_actions(board), number=n) / n
        t_mask = timeit.timeit(lambda: legal_actions_mask(board), number=n) / n
        results.append(
            {
                "board_size": size,
                "slide_and_merge_us": t_slide * 1e6,
                "illegal_actions_us": t_illegal * 1e6,
                "legal_actions_mask_us": t_mask * 1e6,
            }
        )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
