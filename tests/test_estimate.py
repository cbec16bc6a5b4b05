"""Estimator-layer unit tests: VESA matching, peak utilities, convergence."""

import numpy as np

from tempestsdr_tpu.estimate import (
    VIDEO_MODES,
    AutoResolution,
    best_peak_around,
    find_closest_mode,
    fps_from_lag,
    height_from_lags,
    lag_from_fps,
)
from tempestsdr_tpu.events import PLOT_ID, PlotEvent


def test_vesa_table_complete():
    assert len(VIDEO_MODES) == 80  # VideoMode.java:25-106
    m = find_closest_mode(60, 628)
    assert m.name == "800x600 @ 60Hz" and m.width == 1056


def test_vesa_exact_and_fallback():
    # exact (width,height) + nearest refresh (VideoMode.java:147-163)
    m = find_closest_mode(74.0, 1066, width=1688)
    assert m.name == "1280x1024 @ 75Hz"
    # height fallback on distance (:171-186)
    m = find_closest_mode(60.0, 630)
    assert m.height in (628, 631)
    # unknown width -> None
    assert find_closest_mode(60.0, 628, width=9999) is None


def test_peak_utilities():
    v = np.zeros(100)
    v[40] = 1.0
    v[70] = 3.0
    assert best_peak_around(v, 42, 10) == 40  # snaps inside window
    assert best_peak_around(v, 42, 100) == 70  # wide window finds global
    assert best_peak_around(v, 0, 4) in (0, 1)
    sr = 8e6
    assert lag_from_fps(fps_from_lag(133333, sr), sr) == 133333
    assert height_from_lags(133333, 212) == 629


def test_autoresolution_requires_consistency():
    """Different estimates each round must never converge
    (Main.java:1255-1268 consistency map)."""
    sr = 2e6
    ar = AutoResolution(sr)
    rng = np.random.default_rng(0)
    for k in range(10):
        fplot = rng.random(1000)
        fplot[300 + 40 * k] = 10.0  # moving peak
        lplot = rng.random(50)
        lplot[20] = 10.0
        ar.feed(PlotEvent(PLOT_ID.FRAME, 23000, fplot, sr))
        est = ar.feed(PlotEvent(PLOT_ID.LINE, 15, lplot, sr))
        assert est is None
    # stable peak converges after exactly 4 consistent rounds
    ar.reset()
    got = None
    for k in range(10):
        fplot = np.zeros(1000)
        fplot[333] = 5.0
        lplot = np.zeros(50)
        lplot[25] = 5.0
        ar.feed(PlotEvent(PLOT_ID.FRAME, 33000, fplot, sr))
        got = ar.feed(PlotEvent(PLOT_ID.LINE, 15, lplot, sr))
        if got:
            assert k == 3, k
            break
    assert got is not None
    assert abs(got.refreshrate - sr / 33333) < 0.01
    assert got.height == round(33333 / 40)
