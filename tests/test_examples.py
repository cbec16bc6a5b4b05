"""Smoke-run every example script end-to-end (CPU, tiny geometry).

The examples are plain subprocess entry points; run them with a PYTHONPATH
that excludes this environment's axon sitecustomize so they execute on the
default CPU backend like they would on any non-TPU machine."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(REPO, "examples")


def _clean_env(extra=None):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    env["PYTHONPATH"] = REPO  # no axon sitecustomize -> plain CPU jax
    env["JAX_PLATFORMS"] = "cpu"
    if extra:
        env.update(extra)
    return env


def run_example(args, tmp_path, extra_env=None, timeout=420):
    r = subprocess.run(
        [sys.executable] + args,
        cwd=str(tmp_path),
        env=_clean_env(extra_env),
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    d = tmp_path_factory.mktemp("excap")
    path = d / "cap.bin"
    r = subprocess.run(
        [sys.executable, os.path.join(EX, "make_test_capture.py"), str(path), "0.4"],
        capture_output=True,
        text=True,
        timeout=120,
        env=_clean_env(),
    )
    assert r.returncode == 0, r.stderr
    assert path.stat().st_size == int(0.4 * 8e6) * 2
    return str(path)


def test_example_replay_capture(capture, tmp_path):
    out = run_example(
        [os.path.join(EX, "replay_capture.py"), capture, "8000000", "uint8", "4"],
        tmp_path,
    )
    assert "frames" in out
    frames_dir = tmp_path / "frames"
    assert frames_dir.is_dir() and any(frames_dir.iterdir())


def test_example_auto_detect_mode(capture, tmp_path):
    out = run_example(
        [os.path.join(EX, "auto_detect_mode.py"), capture, "8000000", "uint8"],
        tmp_path,
    )
    assert "detected:" in out, out
    # capture geometry is 628 lines @ 60 Hz (1056x628 VESA total)
    assert "60" in out and "628" in out.replace("\n", " "), out
    assert "plot peak:" in out, out
    assert (tmp_path / "autocorr_line.pgm").exists()


def test_example_multi_target(tmp_path):
    out = run_example(
        [os.path.join(EX, "multi_target.py"), "3"],
        tmp_path,
    )
    assert "frames per channel" in out, out
    assert "target 2:" in out, out


def test_example_reference_plugin(capture, tmp_path, tmp_path_factory):
    import shutil

    import test_cplugin
    from tempestsdr_tpu import native as native_io

    if not os.path.isdir(test_cplugin.REF) or shutil.which("gcc") is None \
            or not native_io.available():
        pytest.skip("reference source, gcc, or native IO unavailable")
    so = test_cplugin._build_plugin(tmp_path_factory.mktemp("explug"), "ex")
    out = run_example(
        [os.path.join(EX, "reference_plugin.py"), so,
         f"{capture} 8000000 uint8"],
        tmp_path,
    )
    assert "streamed 8 frames" in out, out
    assert "loaded:" in out, out


def test_example_multi_channel(tmp_path):
    out = run_example(
        [os.path.join(EX, "multi_channel.py"), "4"],
        tmp_path,
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert out.strip(), "no output"
