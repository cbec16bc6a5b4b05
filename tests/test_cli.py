"""CLI + snapshot tests (headless GUI-equivalents)."""

import os

import numpy as np

from tempestsdr_tpu import cli
from tempestsdr_tpu.snapshot import frame_to_rgb, save_frame
from tempestsdr_tpu.config import PIXEL_SPECIAL_VALUE_G


def test_cli_end_to_end(tmp_path, capsys):
    out = tmp_path / "frames"
    rc = cli.main([
        "--source", "synthetic",
        "--source-params", "100 200 50 1000000 0.01",
        "--height", "100", "--rate", "50",
        "--block-samples", "8192",
        "--frames", "8",
        "--out", str(out), "--save-every", "4",
        "--no-pll", "--no-autocorr",
    ])
    assert rc == 0
    files = sorted(os.listdir(out))
    assert files, "no snapshots written"
    assert files[0].endswith(".pgm")
    captured = capsys.readouterr().out
    assert "done: 8 frames" in captured


def test_cli_auto_resolution(capsys):
    rc = cli.main([
        "--source", "synthetic",
        "--source-params", "600 111 60 2000000 0.01",
        "--height", "400", "--rate", "55",
        "--block-samples", "16384",
        "--blocks", "60",
        "--no-pll", "--auto-resolution", "--quiet",
    ])
    assert rc == 0


def test_cli_auto_apply_restarts_at_detected_mode(capsys):
    """--auto-apply: detect the mode, stop, set_resolution, stream again
    (GUI AUT behaviour)."""
    rc = cli.main([
        "--source", "synthetic",
        "--source-params", "600 111 60 2000000 0.01",
        "--height", "400", "--rate", "55",
        "--block-samples", "16384",
        "--blocks", "60",
        "--no-pll", "--auto-resolution", "--auto-apply",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "AUTO-RESOLUTION" in out
    # the detected geometry's step compiles while the first session still
    # streams (live-setresolution semantics) ...
    assert "warm compile ready" in out
    # ... and only then is the mode applied
    assert out.index("warm compile ready") < out.index("applying detected mode")


def test_cli_manual_lag_selection_applies(capsys):
    """--select-lag/--select-line-lag: the headless plot click
    (getBestIdAround snap + fps/height transformers) feeds the geometry
    derivation and --auto-apply restarts at it (Main.java:563-572,
    1315-1321, 1352-1361)."""
    sr = 2_000_000
    frame_lag = sr // 60  # 33333
    rc = cli.main([
        "--source", "synthetic",
        "--source-params", "600 111 60 2000000 0.01",
        "--height", "400", "--rate", "55",
        "--block-samples", "16384",
        "--blocks", "60",
        "--no-pll",
        # around-lag deliberately off-peak: the snap must find 33333
        "--select-lag", f"{frame_lag - 40},100",
        "--select-line-lag", "56,8",
        "--auto-apply",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MANUAL-SELECT: 60.00 Hz" in out
    assert "applying detected mode" in out


def test_snapshot_formats(tmp_path):
    frame = np.linspace(0, 1, 40 * 30, dtype=np.float32).reshape(40, 30)
    frame[3, 3] = PIXEL_SPECIAL_VALUE_G
    p = str(tmp_path / "f.pgm")
    save_frame(frame, p)
    with open(p, "rb") as f:
        head = f.read(2)
    assert head == b"P5"
    pn = str(tmp_path / "f.npy")
    save_frame(frame, pn)
    np.testing.assert_array_equal(np.load(pn), frame)
    rgb = frame_to_rgb(frame)
    assert tuple(rgb[3, 3]) == (0, 255, 0)  # green marker
    assert rgb[0, 0, 0] == rgb[0, 0, 1] == rgb[0, 0, 2]


def test_cli_plot_out(tmp_path, capsys):
    plots = tmp_path / "plots"
    rc = cli.main([
        "--source", "synthetic",
        "--source-params", "100 200 50 1000000 0.01",
        "--height", "100", "--rate", "50",
        "--block-samples", "8192",
        "--frames", "6",
        "--plot-out", str(plots),
        "--no-pll",
    ])
    assert rc == 0
    files = sorted(os.listdir(plots))
    assert any("autocorr_frame" in f for f in files)
    assert any("autocorr_line" in f for f in files)
    captured = capsys.readouterr().out
    assert "plot frame: peak" in captured


def test_prefs_roundtrip(tmp_path):
    from tempestsdr_tpu.prefs import Preferences

    path = str(tmp_path / "prefs.json")
    p = Preferences(path)
    assert p.get("height", 628) == 628  # fresh store -> defaults
    p.put("height", 314)
    p.put("rate", 75.0)
    p.save()
    q = Preferences(path)
    assert q.get("height") == 314 and q.get("rate") == 75.0
    # corrupt store behaves as empty, never raises
    with open(path, "w") as f:
        f.write("{nope")
    r = Preferences(path)
    assert r.get("height", 1) == 1


def test_cli_save_and_use_prefs(tmp_path, capsys):
    prefs = str(tmp_path / "prefs.json")
    rc = cli.main([
        "--source", "synthetic",
        "--source-params", "100 200 50 1000000 0.01",
        "--height", "100", "--rate", "50",
        "--block-samples", "8192", "--frames", "2",
        "--no-pll", "--no-autocorr", "--quiet",
        "--save-prefs", "--prefs-path", prefs,
    ])
    assert rc == 0
    import json
    with open(prefs) as f:
        saved = json.load(f)
    assert saved["source"] == "synthetic" and saved["height"] == 100
    assert saved["no_autocorr"] is True

    # second run: everything (source, geometry, toggles) from the store;
    # explicit flags still win over saved values
    rc = cli.main([
        "--use-prefs", "--prefs-path", prefs,
        "--block-samples", "8192", "--frames", "2", "--no-pll", "--quiet",
    ])
    assert rc == 0

    # no source anywhere -> argparse error (exit 2)
    import pytest
    with pytest.raises(SystemExit) as e:
        cli.main(["--frames", "1"])
    assert e.value.code == 2
