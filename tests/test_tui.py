"""Terminal viewer — unit tests for the curses-free core (tui.py): the key
decoder, HoldButton-style acceleration (HoldButton.java + Main.java:1012-1020),
the half-block renderer, the controller key->API mapping (Main.java:605-651,
938-1010), and the live framerate nudge riding the PLL refresh delta."""

import contextlib
import os
import time

import numpy as np
import pytest

from tempestsdr_tpu import tui
from tempestsdr_tpu.config import (
    PIXEL_SPECIAL_VALUE_G,
    PLL_HEADROOM_FRAC,
    PipelineConfig,
)
from tempestsdr_tpu.params import DIRECTION, PARAM, Params


# ---- decode_keys ----


def test_decode_plain_and_arrows():
    keys, rest = tui.decode_keys(b"q\x1b[A\x1b[D")
    assert keys == ["q", "UP", "LEFT"]
    assert rest == b""


def test_decode_shift_arrows_xterm_modifiers():
    keys, _ = tui.decode_keys(b"\x1b[1;2C\x1b[1;2B")
    assert keys == ["SHIFT_RIGHT", "SHIFT_DOWN"]


def test_decode_incomplete_escape_kept_as_remainder():
    keys, rest = tui.decode_keys(b"a\x1b[1;")
    assert keys == ["a"]
    assert rest == b"\x1b[1;"
    keys, rest = tui.decode_keys(rest + b"2A")
    assert keys == ["SHIFT_UP"] and rest == b""


def test_decode_bare_escape():
    keys, rest = tui.decode_keys(b"\x1bq")
    assert keys == ["ESC", "q"] and rest == b""


# ---- hold acceleration ----


def test_hold_counter_accumulates_within_gap_and_resets_on_gap():
    h = tui.HoldCounter(gap_s=0.25)
    assert h.click("LEFT", 0.00) == 1
    assert h.click("LEFT", 0.05) == 2
    assert h.click("LEFT", 0.10) == 3
    assert h.click("LEFT", 0.40) == 1  # gap = release + fresh hold
    assert h.click("RIGHT", 0.41) == 1  # different key resets


def test_framerate_change_amount_matches_reference_quadratic_cap():
    # onFrameRateChanged (Main.java:1012-1014): clicks^2 * 1e-8, cap 0.05
    assert tui.framerate_change_amount(1) == pytest.approx(1e-8)
    assert tui.framerate_change_amount(100) == pytest.approx(1e-4)
    assert tui.framerate_change_amount(3000) == 0.05  # 9e-2 capped


# ---- renderer ----


def test_downsample_mean_exact_on_uniform_blocks():
    img = np.kron(np.array([[10.0, 20.0], [30.0, 40.0]]), np.ones((8, 8)))
    out = tui.downsample_mean(img, 2, 2)
    np.testing.assert_allclose(out, [[10, 20], [30, 40]])


def test_frame_to_cells_shape_invert_and_markers():
    f = np.zeros((64, 64), np.float32)
    f[:32] = 1.0
    cells = tui.frame_to_cells(f, cols=8, rows=4)
    assert cells.shape == (8, 8, 3)
    assert cells.dtype == np.uint8
    assert np.all(cells[0] == 255) and np.all(cells[-1] == 0)
    inv = tui.frame_to_cells(f, cols=8, rows=4, invert=True)
    assert np.all(inv[0] == 0) and np.all(inv[-1] == 255)
    # a solid marker region renders as its pure colour (TSDRLibraryNDK.c:234-269)
    fm = np.full((64, 64), PIXEL_SPECIAL_VALUE_G, np.float32)
    g = tui.frame_to_cells(fm, cols=4, rows=2)
    assert np.all(g[..., 1] == 255) and np.all(g[..., 0] == 0)


def test_cells_to_ansi_halfblocks():
    cells = np.zeros((2, 3, 3), np.uint8)
    cells[0] = 255  # top pixel white, bottom black
    (line,) = tui.cells_to_ansi(cells)
    assert line.count("▀") == 3
    assert "38;2;255;255;255" in line and "48;2;0;0;0" in line
    assert line.endswith("\x1b[0m")
    # identical colour pairs emit the SGR prefix once
    assert line.count("38;2;255;255;255") == 1


# ---- controller against a fake TSDR ----


class FakeTSDR:
    def __init__(self):
        self.calls = []
        self.session = None
        self._params = Params()

    def sync(self, pixels, direction):
        self.calls.append(("sync", pixels, DIRECTION(direction)))

    def nudge_framerate(self, d):
        self.calls.append(("nudge", d))
        return 60.0 + d

    def set_base_freq(self, f):
        self.calls.append(("freq", f))

    def set_gain(self, g):
        self.calls.append(("gain", g))

    def set_param(self, p, v):
        self.calls.append(("param", PARAM(p), v))


def make_ctl():
    rx = FakeTSDR()
    t = {"now": 100.0}
    ctl = tui.TuiController(rx, now=lambda: t["now"])
    return rx, ctl, t


def test_controller_sync_keys_accelerate_like_holdbutton():
    rx, ctl, t = make_ctl()
    ctl.handle_key("SHIFT_LEFT")
    t["now"] += 0.05
    ctl.handle_key("SHIFT_LEFT")
    t["now"] += 0.05
    ctl.handle_key("h")  # different key -> fresh hold
    assert rx.calls == [
        ("sync", 1, DIRECTION.LEFT),
        ("sync", 2, DIRECTION.LEFT),
        ("sync", 1, DIRECTION.LEFT),
    ]
    assert "Move: Left" in ctl.status.osd


def test_controller_framerate_keys_signed_quadratic():
    rx, ctl, t = make_ctl()
    ctl.handle_key("LEFT")
    t["now"] += 0.05
    ctl.handle_key("LEFT")
    t["now"] += 0.05
    ctl.handle_key("RIGHT")
    assert rx.calls[0] == ("nudge", -1e-8)
    assert rx.calls[1] == ("nudge", -4e-8)
    assert rx.calls[2] == ("nudge", 1e-8)  # new key -> clicks reset
    assert "Framerate:" in ctl.status.osd


def test_controller_freq_gain_and_toggles():
    rx, ctl, _ = make_ctl()
    ctl.seed(400e6, 0.5)
    ctl.handle_key("UP")
    ctl.handle_key("DOWN")
    ctl.handle_key("G")
    ctl.handle_key("a")  # PLL defaults ON in Params -> toggles off
    ctl.handle_key("s")  # autoshift defaults off -> on
    ctl.handle_key("r")
    ctl.handle_key("d")
    assert ("freq", 400e6 + 50e3) in rx.calls
    assert ("freq", 400e6) in rx.calls
    assert ("gain", 0.55) in rx.calls
    assert ("param", PARAM.FRAMERATE_PLL, 0) in rx.calls
    assert ("param", PARAM.AUTOSHIFT, 1) in rx.calls
    assert ("param", PARAM.AUTOCORR_PLOTS_RESET, 1) in rx.calls
    assert ("param", PARAM.AUTOCORR_DUMP, 1) in rx.calls


def test_controller_snapshot_and_quit(tmp_path):
    rx, ctl, _ = make_ctl()
    ctl.snapshot_dir = str(tmp_path)
    ctl.handle_key("p")
    assert "no frame yet" in ctl.status.osd
    ctl.on_frame(np.zeros((8, 8), np.float32))
    ctl.handle_key("p")
    assert (tmp_path / "snapshot_0001.pgm").exists()
    ctl.handle_key("i")
    assert ctl.invert
    ctl.handle_key("q")
    assert ctl.quit


def test_status_line_width_and_fields():
    rx, ctl, _ = make_ctl()
    from tempestsdr_tpu.events import VALUE_ID, ValueEvent

    ctl.on_value(ValueEvent(VALUE_ID.AUTOGAIN_VALUES, 0.1, 0.9))
    ctl.on_value(ValueEvent(VALUE_ID.SNR, 12.5, 0))
    ctl.on_value(ValueEvent(VALUE_ID.AUTOCORRECT_FRAMES_COUNT, 7, 0))
    line = ctl.status_line(200)
    assert len(line) == 200
    assert "snr 12.5 dB" in line and "ac 7" in line
    assert len(ctl.status_line(20)) == 20


def test_controller_view_cycle_and_plot_render():
    rx, ctl, _ = make_ctl()
    from tempestsdr_tpu.events import PLOT_ID, PlotEvent

    # no frame/plots yet -> nothing to draw in any view
    assert ctl.render_cells(10, 5) is None
    ctl.handle_key("v")
    assert ctl.view == "frame"
    assert ctl.render_cells(10, 5) is None

    # feed plot events: a clear peak in each window
    fvals = np.ones(500)
    fvals[120] = 100.0
    lvals = np.ones(300)
    lvals[40] = 50.0
    ctl.on_plot(PlotEvent(PLOT_ID.FRAME, 1000, fvals, 8e6))
    ctl.on_plot(PlotEvent(PLOT_ID.LINE, 50, lvals, 8e6))

    cells = ctl.render_cells(64, 20)
    assert cells.shape == (40, 64, 3)
    assert cells.max() == 255  # the curve reached the image
    line = ctl.status_line(120)
    assert "[frame plot]" in line and "fps" in line  # peak label = fps

    ctl.handle_key("v")
    assert ctl.view == "line"
    cells = ctl.render_cells(64, 20)
    assert cells is not None
    # line-view label is the height transformer's "N px" (Main.java:1330-1344)
    assert "px" in ctl.status_line(120)

    ctl.handle_key("v")
    assert ctl.view == "video"


# ---- the live nudge through a real session ----


def test_session_nudge_refreshrate_live_and_clamped():
    """The nudge lands in the carried PLL refresh_delta at the next block
    and saturates at the static headroom (config.PLL_HEADROOM_FRAC)."""
    from tempestsdr_tpu.api import TSDR

    rx = TSDR(block_samples=4096)
    rx.load_source("synthetic", "64 40 60 1000000 0.05")
    rx.set_resolution(64, 60.0)
    rx.set_param(PARAM.FRAMERATE_PLL, 0)  # isolate the manual nudge
    rx.set_param(PARAM.AUTOCORR_PLOTS_OFF, 1)

    seen = []
    lim = 60.0 * PLL_HEADROOM_FRAC

    def on_frame(f):
        seen.append(rx.session.current_refreshrate())
        if len(seen) == 1:
            got = rx.nudge_framerate(0.5 * lim)
            assert got == pytest.approx(60.0 + 0.5 * lim)
        elif len(seen) == 2:
            got = rx.nudge_framerate(10 * lim)  # saturates
            assert got == pytest.approx(60.0 + lim)

    rx.start(on_frame=on_frame, max_frames=4)
    assert seen[0] == pytest.approx(60.0)
    assert any(v == pytest.approx(60.0 + 0.5 * lim) for v in seen[1:])
    assert seen[-1] == pytest.approx(60.0 + lim)
    # stopped sessions nudge the nominal rate for the next start
    rx.stop()
    assert rx.nudge_framerate(1.0) == pytest.approx(61.0)
    rx.close()


def test_run_tui_end_to_end_over_pty():
    """Full shell smoke: stream a synthetic source through run_tui on a real
    pty, inject keys (framerate nudge + quit), and check that half-block
    video and the status bar were written to the terminal."""
    import fcntl
    import pty
    import struct
    import termios as tm
    import threading

    from tempestsdr_tpu.api import TSDR

    master, slave = pty.openpty()
    fcntl.ioctl(slave, tm.TIOCSWINSZ, struct.pack("HHHH", 24, 80, 0, 0))
    sin = os.fdopen(slave, "rb", buffering=0, closefd=False)
    sout = os.fdopen(slave, "w", buffering=1, closefd=False)

    rx = TSDR(block_samples=4096)
    rx.load_source("synthetic", "64 40 60 1000000 0.05")
    rx.set_resolution(64, 60.0)
    rx.set_param(PARAM.AUTOCORR_PLOTS_OFF, 1)

    result = {}

    def go():
        result["frames"] = tui.run_tui(
            rx, max_frames=200, redraw_hz=60.0, stdin=sin, stdout=sout)

    t = threading.Thread(target=go, daemon=True)
    t.start()

    chunks = []
    stop_drain = threading.Event()

    def drain():  # keep the pty buffer empty or run_tui's writes block
        while not stop_drain.is_set():
            try:
                chunks.append(os.read(master, 65536))
            except OSError:
                return

    d = threading.Thread(target=drain, daemon=True)
    d.start()
    deadline = time.time() + 60
    while time.time() < deadline and b"\xe2\x96\x80" not in b"".join(chunks):
        time.sleep(0.02)  # wait for the first half-block (U+2580) frame
    os.write(master, b"\x1b[C")  # RIGHT: framerate nudge
    os.write(master, b"q")
    t.join(timeout=60)
    alive = t.is_alive()
    stop_drain.set()
    out = b"".join(chunks)
    assert not alive
    assert b"\xe2\x96\x80" in out  # half-block video reached the terminal
    assert b"fps" in out  # status bar
    assert result["frames"] >= 1
    for fd in (master, slave):
        with contextlib.suppress(OSError):
            os.close(fd)


def test_nudge_framerate_idle_adjusts_nominal():
    from tempestsdr_tpu.api import TSDR

    rx = TSDR()
    rx.set_resolution(600, 60.0)
    assert rx.nudge_framerate(0.05) == pytest.approx(60.05)
    assert rx.nudge_framerate(-0.1) == pytest.approx(59.95)
