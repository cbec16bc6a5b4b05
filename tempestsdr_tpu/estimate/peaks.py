"""Interactive peak utilities — the plot widget's selection logic
(PlotVisualizer.java) as plain functions for API/CLI clients."""

from __future__ import annotations

import numpy as np


def best_peak_around(values: np.ndarray, idx: int, area: int) -> int:
    """Snap a selection to the strongest bin in a window around `idx`
    (PlotVisualizer.getBestIdAround, :144-163; window = the GUI's
    'area around cursor' spinner, Main.java:563-572)."""
    n = len(values)
    start = max(min(idx - area // 2, n - 1), 0)
    end = max(min(idx + area // 2, n), start + 1)
    return start + int(np.argmax(values[start:end]))


def fps_from_lag(lag: int, samplerate: float) -> float:
    """Frame plot index -> refresh rate (Main.java:1301-1303 fps transformer)."""
    return samplerate / lag


def lag_from_fps(fps: float, samplerate: float) -> int:
    return int(round(samplerate / fps))


def height_from_lags(frame_lag: int, line_lag: int) -> int:
    """Line plot index + frame lag -> total line count
    (Main.java:1346-1349 height transformer)."""
    return int(round(frame_lag / line_lag))
