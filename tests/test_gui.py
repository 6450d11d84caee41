"""GUI smoke tests (headless Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np


def test_window_board_renders_and_handles_keys():
    from simulate_2048_tpu.gui import TILE_COLORS, WindowBoard

    window = WindowBoard(title="test", size=4)
    board = np.array([[0, 2, 4, 8], [16, 32, 64, 128], [256, 512, 1024, 2048], [4096, 0, 0, 2]])
    window.show_image(board)  # includes a >2048 tile (fallback color)
    assert not window.closed

    events = []
    window.register_key_handler(lambda e: events.append(e.key))
    window.fig.canvas.key_press_event("left") if hasattr(window.fig.canvas, "key_press_event") else None
    window.close()
    assert window.closed
    assert 2048 in TILE_COLORS
