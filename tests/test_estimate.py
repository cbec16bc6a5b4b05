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


def test_zoomable_scale_and_zoomed_decimation_match_widget():
    """ZoomableXScale ops (ZoomableXScale.java) + the zoomed populateData
    (PlotVisualizer.java:200-247) against literal transliterations, across
    zoom/pan interaction sequences."""
    import math

    import numpy as np

    from tempestsdr_tpu.estimate.plotrender import decimate_max_zoomed
    from tempestsdr_tpu.estimate.scales import ZoomableXScale

    class Oracle:  # ZoomableXScale.java, literal
        def __init__(self, mn, mx, mzv, max_pixels):
            self.max_pixels = max_pixels
            self.min_value, self.max_value = mn, mx
            self.max_zoom_val = mzv
            self.offset_val, self.offset_px = 0.0, 0
            self.scale = 1.0
            self.calc()

        def calc(self):
            self.ovp = self.max_pixels / ((self.max_value - self.min_value) * self.scale)
            self.opv = ((self.max_value - self.min_value) * self.scale) / self.max_pixels
            if self.p2vr(self.max_pixels) < self.max_zoom_val:
                self.scale = self.max_zoom_val / (self.max_value - self.min_value)
                self.ovp = self.max_pixels / ((self.max_value - self.min_value) * self.scale)
                self.opv = ((self.max_value - self.min_value) * self.scale) / self.max_pixels

        def p2va(self, px):
            return px * self.opv + self.offset_val + self.min_value

        def p2vr(self, px):
            return px * self.opv

        def v2pa(self, v):
            return int(math.trunc((v - self.min_value) * self.ovp)) - self.offset_px

        def v2pr(self, v):
            return int(math.trunc(v * self.ovp))

        def set_px(self, px):
            self.offset_px = px
            self.offset_val = self.p2vr(px)

        def set_val(self, v):
            self.offset_val = v
            self.offset_px = self.v2pr(v)

        def autofix(self):
            if self.offset_px < 0:
                self.set_px(0)
            if self.p2va(self.max_pixels) > self.max_value:
                self.set_val(self.max_value - self.p2vr(self.max_pixels) - self.min_value)
            if self.offset_px < 0:
                self.scale, self.offset_val, self.offset_px = 1.0, 0.0, 0
                self.calc()

        def move_px(self, off):
            self.set_px(self.offset_px - off)
            self.autofix()

        def zoom_around(self, px, coeff):
            val = self.p2va(px)
            self.scale *= coeff
            self.calc()
            self.set_val(self.offset_val - self.p2va(px) + val)
            self.autofix()

    def populate_oracle(data, nwidth, sc):  # PlotVisualizer.java:200-247
        size = len(data)
        highest = lowest = data[0]
        max_index, max_val = 0, data[0]
        prev_px = 0
        first_id = int(min(max(sc.p2va(0), 0), size))
        last_id = int(min(max(sc.p2va(nwidth) + 1, 0), size))
        visdata = np.empty(nwidth)
        localmax = data[min(first_id, size - 1)]
        for idx in range(first_id, last_id):
            val = data[idx]
            px = sc.v2pa(idx)
            if 0 <= px < nwidth:
                if prev_px != px:
                    if localmax > highest:
                        highest = localmax
                    elif localmax < lowest:
                        lowest = localmax
                    for i in range(prev_px, px):
                        visdata[i] = localmax
                    localmax = val
                    prev_px = px
                elif val > localmax:
                    localmax = val
            if val > max_val:
                max_val, max_index = val, idx
        visdata[prev_px:] = localmax
        return visdata, lowest, highest, max_index

    rng = np.random.default_rng(11)
    size, nwidth = 5000, 320
    data = rng.random(size)
    data[3777] = 7.0

    sc = ZoomableXScale(0, size, 1.0, max_pixels=nwidth)
    orc = Oracle(0, size, 1.0, nwidth)
    # interaction script: wheel zooms around cursor positions, drags, reset
    script = [("z", 160, 0.95), ("z", 160, 0.95), ("z", 40, 0.95 ** 4),
              ("m", 25), ("m", -300), ("z", 300, 1 / 0.95), ("m", 1000),
              ("z", 10, 0.5), ("z", 10, 0.5), ("z", 10, 0.5), ("m", -5)]
    for step in script:
        if step[0] == "z":
            sc.zoom_around(step[1], step[2])
            orc.zoom_around(step[1], step[2])
        else:
            sc.move_offset_with_pixels(step[1])
            orc.move_px(step[1])
        assert (sc.offset_px, sc.scale) == (orc.offset_px, orc.scale)
        assert sc.offset_val == orc.offset_val
        for px in (0, 1, nwidth // 2, nwidth):
            assert sc.pixels_to_value_absolute(px) == orc.p2va(px)
        vd, lo, hi, mi = decimate_max_zoomed(data, nwidth, sc)
        ovd, olo, ohi, omi = populate_oracle(data, nwidth, orc)
        np.testing.assert_array_equal(vd, ovd)
        assert (lo, hi, mi) == (olo, ohi, omi), step
    sc.reset()
    orc.scale, orc.offset_val, orc.offset_px = 1.0, 0.0, 0
    orc.calc()
    vd, lo, hi, mi = decimate_max_zoomed(data, nwidth, sc)
    ovd, olo, ohi, omi = populate_oracle(data, nwidth, orc)
    np.testing.assert_array_equal(vd, ovd)
    assert (lo, hi, mi) == (olo, ohi, omi)


def test_get_best_id_around_matches_widget():
    """Exact getBestIdAround semantics (PlotVisualizer.java:144-163)
    against a literal transliteration, including the -1 out-of-range
    contract and first-max tie resolution."""
    import numpy as np
    from tempestsdr_tpu.estimate.peaks import get_best_id_around

    def oracle(data, px, area_px):
        size = len(data)
        start_id = px - area_px // 2
        if start_id >= size:
            return -1
        if start_id < 0:
            start_id = 0
        end_id = px + area_px // 2
        if end_id < 0:
            return -1
        if end_id > size:
            end_id = size
        bestid = start_id
        mx = data[bestid]
        for i in range(start_id + 1, end_id):
            if data[i] > mx:
                mx = data[i]
                bestid = i
        return bestid

    rng = np.random.default_rng(7)
    data = rng.random(200)
    data[60] = data[61] = 9.0  # tie -> lowest index
    for idx in (-250, -5, 0, 3, 60, 61, 100, 198, 199, 205, 400):
        for area in (0, 1, 2, 7, 30, 1000):
            assert get_best_id_around(data, idx, area) == oracle(data, idx, area), (idx, area)


def test_select_fps_and_height_transformers():
    """The click transformers (Main.java:1315-1321, 1352-1361)."""
    import numpy as np
    from tempestsdr_tpu.estimate.peaks import select_fps, select_height

    sr = 2_000_000
    offset = sr // 87
    vals = np.full(sr // 55 - offset, 0.1)
    vals[sr // 60 - offset] = 1.0
    lag, fps = select_fps(vals, offset, sr, around_lag=sr // 60 - 40, area=100)
    assert lag == sr // 60
    assert abs(fps - sr / lag) < 1e-9
    assert select_fps(vals, offset, sr, around_lag=10 * sr, area=4) is None

    l_off = 40
    lvals = np.full(300, 0.1)
    lvals[56 - l_off] = 1.0
    llag, height = select_height(lvals, l_off, frame_lag=lag,
                                 around_lag=58, area=8)
    assert llag == 56
    assert height == round(lag / 56)
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


def test_plot_render_decimation_matches_widget_loop():
    """decimate_max must reproduce PlotVisualizer.populateData (:200-247):
    boundary-only lowest/highest tracking seeded from data[0], column fills
    with the running local max, global argmax."""
    import numpy as np
    from tempestsdr_tpu.estimate.plotrender import decimate_max

    def oracle(data, nwidth):
        # literal transliteration of the Java loop
        size = len(data)
        visdata = np.empty(nwidth)
        highest = lowest = data[0]
        max_index, max_val = 0, data[0]
        prev_px, localmax = 0, data[0]
        for idx in range(size):
            val = data[idx]
            px = int(idx * nwidth / size)
            if 0 <= px < nwidth:
                if prev_px != px:
                    if localmax > highest:
                        highest = localmax
                    elif localmax < lowest:
                        lowest = localmax
                    for i in range(prev_px, px):
                        visdata[i] = localmax
                    localmax = val
                    prev_px = px
                elif val > localmax:
                    localmax = val
            if val > max_val:
                max_val, max_index = val, idx
        visdata[prev_px:] = localmax
        return visdata, lowest, highest, max_index

    rng = np.random.default_rng(3)
    peaked = rng.random(1000)
    peaked[700] = 5.0  # global peak
    cases = [
        (peaked, 64),
        (rng.random(40), 64),   # size < nwidth: skipped columns
        (rng.random(64), 64),   # 1:1
        (np.full(300, 2.5), 32),  # constant data
        (rng.random(997), 64),  # size not a multiple of nwidth
    ]
    for data, nwidth in cases:
        vd, lo, hi, mi = decimate_max(data, nwidth)
        ovd, olo, ohi, omi = oracle(data, nwidth)
        np.testing.assert_array_equal(vd, ovd)
        assert (lo, hi, mi) == (olo, ohi, omi), (nwidth, len(data))


def test_plot_render_image_and_labels():
    import numpy as np
    from tempestsdr_tpu.estimate.plotrender import render_plot

    sr = 8_000_000
    offset = sr // 87
    n = sr // 55 - offset
    data = np.full(n, 1e-3)
    peak = sr // 60 - offset  # 60 fps lag
    data[peak] = 1.0

    img, info = render_plot(data, offset=offset, samplerate=sr, kind="frame",
                            nwidth=320, nheight=120)
    assert img.shape == (120, 320) and img.dtype == np.uint8
    assert info["max_index"] == peak
    assert abs(info["value"] - 60.0) < 0.05
    assert "fps" in info["label"]
    # the curve must reach the top at the peak column
    peak_px = int(peak * 320 / n)
    assert img[:, peak_px].max() == 255
    assert img[0, peak_px] == 255  # peak maps to the top row

    # line plot: height label via frame_lag/line_lag (Main.java:1346-1349)
    line_off = int(sr / (1500 * 87))
    ln = int(sr / (590 * 55)) - line_off
    ldata = np.full(ln, 1e-3)
    lines = 628
    line_lag = int(round(sr / (60.0 * lines)))
    ldata[line_lag - line_off] = 1.0
    _, linfo = render_plot(ldata, offset=line_off, samplerate=sr, kind="line",
                           frame_lag=sr // 60)
    assert "px" in linfo["label"]
    assert abs(linfo["value"] - lines) <= 2


def test_plot_render_save(tmp_path):
    import numpy as np
    from tempestsdr_tpu.estimate.plotrender import render_plot, save_plot

    data = np.abs(np.sin(np.arange(500) / 7.0)) + 1e-3
    img, _ = render_plot(data, offset=100, samplerate=1e6, kind="frame")
    p = str(tmp_path / "plot.pgm")
    save_plot(img, p)
    assert (tmp_path / "plot.pgm").stat().st_size > 100


def test_meter_renderers():
    import numpy as np
    from tempestsdr_tpu.estimate.meters import (
        HIGHEST_DB,
        LOWEST_DB,
        db_to_px,
        render_autogain_meter,
        render_snr_meter,
        val_to_db,
    )

    # dB mapping matches LogScale (LogScale.java:113-134)
    assert abs(val_to_db(1.0)) < 1e-12
    assert abs(val_to_db(0.1) + 10.0) < 1e-12
    assert db_to_px(HIGHEST_DB, 240) == 0
    assert db_to_px(LOWEST_DB, 240) == 240

    m = render_autogain_meter(0.01, 0.9)
    assert m.shape == (240, 32)
    inside = m[:, 0][m[:, 0] != 96]
    assert len(inside) > 10  # gradient band exists
    assert inside.min() < 40 and inside.max() > 200  # spans dark->bright

    # degenerate span -> plain background
    assert (render_autogain_meter(0.5, 0.5) == 96).all()

    s = render_snr_meter(0.5)  # -3.01 dB, inside scale
    ys = np.where(s[:, 0] == 255)[0]
    assert len(ys) == 1
    assert abs(int(ys[0]) - db_to_px(val_to_db(0.5), 240)) <= 1
    assert (render_snr_meter(0.0) == 96).all()  # out of scale -> no marker
