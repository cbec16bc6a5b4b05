"""Source layer tests: RawFile replay (both the pure-Python and native C++
paths), format handling, loop mode, ring-overflow drop accounting."""

import numpy as np
import pytest

from tempestsdr_tpu.sources import RawFileSource, load_source
from tempestsdr_tpu.errors import TSDRError


@pytest.fixture(scope="module")
def iq_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("iq") / "capture.bin"
    data = rng.integers(0, 256, size=100_000, dtype=np.uint8)
    path.write_bytes(data.tobytes())
    return str(path), data


def _collect(src, block_samples, n_blocks):
    out = []
    for blk in src.stream(block_samples):
        out.append(blk)
        if len(out) >= n_blocks:
            src.stop()
            break
    return out


@pytest.mark.parametrize("native", [False, True])
def test_rawfile_replays_bytes_in_order(iq_file, native):
    path, data = iq_file
    if native:
        from tempestsdr_tpu import native as native_io

        if not native_io.available():
            pytest.skip("no native toolchain")
    src = RawFileSource(loop=True, native=native)
    src.init(f"{path} 1000000 uint8")
    assert src.samplerate() == 1e6
    blocks = _collect(src, 4096, 13)
    got = np.concatenate([b.samples for b in blocks])
    expect = np.tile(data, 2)[: got.size]
    np.testing.assert_array_equal(got, expect)
    assert all(b.dropped == 0 for b in blocks)
    assert got.dtype == np.uint8


def test_rawfile_formats(tmp_path):
    for fmt, dtype in [("float", np.float32), ("int8", np.int8), ("int16", np.int16),
                       ("uint16", np.uint16)]:
        p = tmp_path / f"f.{fmt}"
        arr = (np.arange(64) % 17).astype(dtype)
        p.write_bytes(arr.tobytes())
        src = RawFileSource(loop=True, native=False)
        src.init(f"{p} 8000 {fmt}")
        blk = next(iter(src.stream(16)))
        assert blk.samples.dtype == dtype
        np.testing.assert_array_equal(blk.samples, arr[:32])
        src.stop()


def test_synthetic_bad_params():
    from tempestsdr_tpu.errors import TSDRStatus
    from tempestsdr_tpu.sources.synthetic import SyntheticSource

    for bad in ("not numbers at all", "600 111", "0 111 60 2e6", ""):
        src = SyntheticSource()
        with pytest.raises(TSDRError) as ei:
            src.init(bad)
        assert ei.value.status == TSDRStatus.PLUGIN_PARAMETERS_WRONG


def test_rawfile_bad_params():
    src = RawFileSource()
    with pytest.raises(TSDRError):
        src.init("onlyname")
    with pytest.raises(TSDRError):
        src.init("name 1000 complex128")
    with pytest.raises(TSDRError):
        src.init("name -5 uint8")


def test_rawfile_option_tokens(tmp_path):
    """Optional trailing params: throttle / stretch=N / noloop (the
    reference's compile-time replay knobs as runtime options)."""
    p = tmp_path / "c.bin"
    p.write_bytes(np.arange(4096, dtype=np.uint8).tobytes())
    src = RawFileSource(native=False)
    src.init(f"{p} 1000000 uint8 stretch=2 noloop")
    assert src._throttle and src._stretch == 2.0 and not src._loop
    blocks = list(src.stream(512))
    assert len(blocks) == 4  # noloop: exactly one pass
    with pytest.raises(TSDRError):
        RawFileSource().init(f"{p} 1000000 uint8 bogus")


def test_rawfile_quoted_filename(tmp_path):
    p = tmp_path / "my capture.bin"
    p.write_bytes(np.zeros(1024, np.uint8).tobytes())
    src = RawFileSource(native=False)
    src.init(f'"{p}" 1000 uint8')
    blk = next(iter(src.stream(128)))
    assert blk.samples.size == 256
    src.stop()


def test_registry_loads_by_name(iq_file):
    path, _ = iq_file
    src = load_source("rawfile", f"{path} 2000000 uint8")
    assert "RawFile" in src.name()
    src.cleanup()


@pytest.mark.parametrize("native", [False, True])
def test_wav_autodetection(tmp_path, native):
    """Bare-filename WAV init (TSDRFileSource.java:43-85): samplerate and
    bit depth from the header, data starts past the 44-byte header."""
    if native:
        from tempestsdr_tpu import native as native_io

        if not native_io.available():
            pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    data = rng.integers(-32768, 32767, size=2000, dtype=np.int16)
    sr = 2_048_000
    hdr = (b"RIFF" + (36 + data.nbytes).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (2).to_bytes(2, "little") + sr.to_bytes(4, "little")
           + (sr * 4).to_bytes(4, "little") + (4).to_bytes(2, "little")
           + (16).to_bytes(2, "little")
           + b"data" + data.nbytes.to_bytes(4, "little"))
    p = tmp_path / "cap.wav"
    p.write_bytes(hdr + data.tobytes())
    src = RawFileSource(loop=True, native=native)
    src.init(str(p))
    assert src.samplerate() == sr
    blk = next(iter(src.stream(500)))
    assert blk.samples.dtype == np.int16
    np.testing.assert_array_equal(blk.samples, data[:1000])
    src.stop()


def test_native_ring_drop_accounting():
    from tempestsdr_tpu import native as native_io

    if not native_io.available():
        pytest.skip("no native toolchain")
    ring = native_io.Ring(1024)
    assert ring.write(b"a" * 512)
    assert ring.write(b"b" * 512)
    assert not ring.write(b"c" * 128)  # overflow -> dropped whole
    # the gap sits AFTER the 1024 buffered bytes: its count must not be
    # released until the reader has consumed PAST the gap position (strict
    # maturation — the take after the first post-gap read attributes the
    # drop to the block that follows the gap, never the one before it)
    assert ring.take_dropped() == 0
    buf = bytearray(600)
    got = ring.read_into(memoryview(buf))
    assert got == 600 and bytes(buf[:512]) == b"a" * 512
    assert ring.take_dropped() == 0  # 424 pre-gap bytes still buffered
    buf2 = bytearray(424)
    assert ring.read_into(memoryview(buf2)) == 424
    # all pre-gap bytes consumed but nothing beyond the gap yet: a take
    # here would pin the drop on the PRE-gap block — must stay pending
    assert ring.take_dropped() == 0
    assert ring.write(b"d" * 64)
    buf3 = bytearray(64)
    assert ring.read_into(memoryview(buf3)) == 64
    assert ring.take_dropped() == 128  # matured with the post-gap read
    assert ring.take_dropped() == 0
    ring.close()


class FakeRtlTcpServer:
    """In-process rtl_tcp server: sends the RTL0 header, records commands,
    and streams a synthetic u8 IQ capture (rtl_tcp.c wire format)."""

    def __init__(self, iq_bytes: bytes):
        import socket
        import struct
        import threading

        self.iq = iq_bytes
        self.commands = []
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self._struct = struct
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        import struct

        conn, _ = self.srv.accept()
        conn.settimeout(0.2)
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))  # R820T, 29 gains
        pos = 0
        try:
            while not self._stop.is_set():
                try:
                    data = conn.recv(5)
                    while len(data) >= 5:
                        cmd, val = struct.unpack(">BI", data[:5])
                        self.commands.append((cmd, val))
                        data = data[5:]
                except TimeoutError:
                    pass
                except OSError:
                    break
                chunk = self.iq[pos:pos + 65536]
                if len(chunk) < 65536:  # loop the capture
                    chunk = chunk + self.iq[: 65536 - len(chunk)]
                    pos = 65536 - (len(self.iq) - pos)
                else:
                    pos += 65536
                try:
                    conn.sendall(chunk)
                except OSError:
                    break
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def stop(self):
        self._stop.set()
        try:
            self.srv.close()
        except OSError:
            pass


def test_rtltcp_source_end_to_end():
    """rtl_tcp driver against an in-process protocol-faithful server: header
    parsing, rate/freq/gain commands, u8 block streaming through a full
    Session producing frames, and a live retune mid-stream."""
    import jax.numpy as jnp
    from tempestsdr_tpu import native as native_io
    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.sources.base import load_source
    from tempestsdr_tpu.sources.rtltcp import (
        CMD_SET_FREQ,
        CMD_SET_GAIN,
        CMD_SET_GAIN_MODE,
        CMD_SET_SAMPLE_RATE,
    )
    from tempestsdr_tpu.sources.synthetic import render_test_pattern, synth_iq
    from tempestsdr_tpu.stream.session import Session, SessionCallbacks

    if not native_io.available():
        pytest.skip("native IO runtime unavailable")

    lines, twidth, refresh, sr = 100, 200, 50.0, 1e6
    raster = render_test_pattern(lines, twidth)
    iq = synth_iq(raster, samplerate=sr, pixelclock=lines * twidth * refresh,
                  n_samples=int(4 * sr / refresh), noise=0.01, dtype=np.uint8)
    server = FakeRtlTcpServer(iq.tobytes())
    try:
        src = load_source(
            "rtltcp",
            f"127.0.0.1 {server.port} {sr:.0f} freq=433000000 gain=0.5",
        )
        assert src.block_dtype() == np.uint8
        cfg = PipelineConfig(samplerate=sr, height=lines, refreshrate=refresh,
                             block_samples=8192, autocorr=False)
        frames = []
        sess = Session(cfg, Params(framerate_pll=False), src,
                       SessionCallbacks(on_frame=frames.append))

        def on_frame(f):
            if len(frames) == 3:
                sess.set_basefreq(433_250_000)  # live retune mid-stream

        sess.callbacks.on_frame = lambda f: (frames.append(f), on_frame(f))
        n = sess.run(max_frames=8)
        assert n == 8
        assert frames[0].shape == (lines, cfg.width)
        # frames carry the raster (not noise): consecutive frames correlate
        cc = np.corrcoef(frames[-1].ravel(), frames[-2].ravel())[0, 1]
        assert cc > 0.8, cc
        assert (src.tuner_type, src.tuner_gain_count) == (5, 29)
    finally:
        server.stop()
    cmds = dict()
    for c, v in server.commands:
        cmds.setdefault(c, []).append(v)
    assert cmds[CMD_SET_SAMPLE_RATE] == [int(sr)]
    assert cmds[CMD_SET_FREQ][0] == 433_000_000
    assert 433_250_000 in cmds[CMD_SET_FREQ]  # the live retune arrived
    assert cmds[CMD_SET_GAIN_MODE] == [1]
    assert cmds[CMD_SET_GAIN] == [248]  # 0.5 * 49.6 dB in tenths


def test_rtltcp_bad_params_and_no_server():
    from tempestsdr_tpu.errors import TSDRError
    from tempestsdr_tpu.sources.base import load_source

    with pytest.raises(TSDRError):
        load_source("rtltcp", "localhost")  # too few params
    with pytest.raises(TSDRError):
        load_source("rtltcp", "localhost notaport 1e6")
    src = load_source("rtltcp", "127.0.0.1 1 1000000")  # port 1: refused
    with pytest.raises(TSDRError):
        next(iter(src.stream(4096)))


def test_simulated_live_source_seam_end_to_end():
    """The live-plugin seam (TSDRPlugin_UHD.cpp:264-294 semantics) driven
    through a full Session: an independent producer thread pushes paced IQ
    into the native ring in non-blocking CB_FULL mode; overflow drops are
    genuinely missing samples reported via samples_dropped; the pipeline's
    whole-frame compensation keeps the raster aligned across the overload."""
    import jax
    import numpy as np
    from tempestsdr_tpu import native as native_io
    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.sources.base import load_source
    from tempestsdr_tpu.stream.session import Session, SessionCallbacks

    if not native_io.available():
        pytest.skip("native IO runtime unavailable")

    lines, twidth, refresh, sr = 100, 200, 50.0, 1e6
    # ring=2 chunks: pausing the consumer mid-run guarantees overflow.
    src = load_source("simlive", f"{lines} {twidth} {refresh} {sr} 0.0 pace=0 ring=2")
    cfg = PipelineConfig(samplerate=sr, height=lines, refreshrate=refresh,
                         block_samples=8192, autocorr=False)
    frames = []
    sess = Session(cfg, Params(framerate_pll=False), src,
                   SessionCallbacks(on_frame=frames.append))

    # Phase 1: streaming works with the producer live (pace=0 = produce at
    # full speed; a 2-chunk ring may already overflow, which is fine).
    n_warm = sess.run(max_frames=8)
    assert n_warm == 8
    baseline = frames[-1]

    # Phase 2: stall the consumer while the producer keeps going — the tiny
    # ring MUST overflow (chunk ~0.06 s, stall 0.5 s >> 2-chunk capacity).
    frames.clear()
    src2 = load_source("simlive", f"{lines} {twidth} {refresh} {sr} 0.0 pace=1 ring=2")
    sess2 = Session(cfg, Params(framerate_pll=False), src2,
                    SessionCallbacks(on_frame=frames.append))
    stream_iter = iter(src2.stream(cfg.block_samples))
    # drive the session loop manually to inject the stall deterministically
    import time
    from tempestsdr_tpu.stream.pipeline import StepControls
    import jax.numpy as jnp

    dropped_total = 0
    got_frames = []
    for i, blk in enumerate(stream_iter):
        if i == 4:
            time.sleep(0.8)  # consumer stall: >> ring capacity in time
        dropped_total += blk.dropped
        ctrl = StepControls(jnp.int64(blk.dropped), jnp.int32(0), jnp.float32(0.0))
        sess2.state, out = sess2._step(sess2.state, jnp.asarray(blk.samples), ctrl)
        if bool(out.frame_valid):
            got_frames.append(np.asarray(out.frame))
        if len(got_frames) >= 14:
            break
    src2.stop()
    assert dropped_total > 0, "stalled consumer never overflowed the ring"
    # drops must be whole chunks (the ring drops whole pushes like CB_FULL)
    chunk = max(int(0.06 * sr), 1024)
    assert dropped_total % chunk == 0
    # raster stays frame-aligned after the overload: late frames correlate
    # with the pre-stall baseline
    post = got_frames[-1]
    cc = np.corrcoef(post.ravel(), baseline.ravel())[0, 1]
    assert cc > 0.9, f"raster lost alignment across live overload: corr {cc}"


def test_session_tracks_dropped_total():
    """samples_dropped propagates into Session.samples_dropped_total."""
    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.sources.base import Source, SourceBlock
    from tempestsdr_tpu.sources.synthetic import render_test_pattern, synth_iq
    from tempestsdr_tpu.stream.session import Session, SessionCallbacks

    lines, twidth, refresh, sr = 100, 200, 50.0, 1e6

    class Droppy(Source):
        def init(self, params):
            self.raster = render_test_pattern(lines, twidth)
            self.pos = 0
            self.block = 0

        def name(self):
            return "droppy"

        def samplerate(self):
            return sr

        def stream(self, block_samples):
            while True:
                dropped = 7777 if self.block == 3 else 0
                self.pos += dropped
                blk = synth_iq(self.raster, samplerate=sr,
                               pixelclock=lines * twidth * refresh,
                               n_samples=block_samples, start_sample=self.pos,
                               noise=0.0)
                self.pos += block_samples
                self.block += 1
                yield SourceBlock(blk, dropped)

        def stop(self):
            pass

    src = Droppy()
    src.init("")
    cfg = PipelineConfig(samplerate=sr, height=lines, refreshrate=refresh,
                         block_samples=8192, autocorr=False)
    sess = Session(cfg, Params(framerate_pll=False), src, SessionCallbacks())
    sess.run(max_blocks=6)
    assert sess.samples_dropped_total == 7777


# ---------------------------------------------------------------------------
# External-process meta-source (the ExtIO P5 equivalent, sources/subproc.py)
# ---------------------------------------------------------------------------

def _exec_params(rate, fmt, *opts, cmd):
    import shlex

    return " ".join([str(rate), fmt, *opts, "--",
                     " ".join(shlex.quote(c) for c in cmd)])


def _py(code):
    import sys

    return [sys.executable, "-u", "-c", code]


def _native_or_skip():
    from tempestsdr_tpu import native as native_io

    if not native_io.available():
        pytest.skip("native IO runtime unavailable")


def test_exec_source_streams_child_stdout_in_order():
    """Any program writing interleaved IQ to stdout is a source — the
    ExtIO-dll-hosting capability re-based on a child process."""
    _native_or_skip()
    src = load_source("exec", _exec_params(
        1_000_000, "u8",
        cmd=_py("import sys; sys.stdout.buffer.write(bytes(range(256)) * 256)"),
    ))
    assert src.block_dtype() == np.uint8
    blocks = _collect(src, 8192, 4)
    got = np.concatenate([b.samples for b in blocks])
    expect = np.tile(np.arange(256, dtype=np.uint8), 256)[: got.size]
    assert np.array_equal(got, expect)
    assert all(b.dropped == 0 for b in blocks)


def test_exec_source_stdin_control():
    """control=stdin: FREQ/GAIN line protocol on the child's stdin (the
    SetHWLO equivalent, TSDRPlugin_ExtIO.c:307-319 polling loop)."""
    _native_or_skip()
    child = _py(
        "import sys\n"
        "w = sys.stdout.buffer\n"
        "w.write(b'\\x01' * 65536); w.flush()\n"
        "for line in sys.stdin:\n"
        "    t = line.split()\n"
        "    if t and t[0] == 'FREQ':\n"
        "        w.write(bytes([int(t[1]) % 256]) * 65536); w.flush()\n"
    )
    src = load_source("exec", _exec_params(
        1_000_000, "u8", "control=stdin", cmd=child))
    it = src.stream(32768)  # block = 65536 bytes
    first = next(it)
    assert (first.samples == 1).all()
    src.set_basefreq(7)
    second = next(it)
    assert (second.samples == 7).all()
    src.stop()


def test_exec_source_restart_control():
    """control=restart: {freq} re-substituted into the argv template and the
    child respawned (the Mirics device-reset retune fallback analog,
    TSDRPlugin_Mirics.c:132-155)."""
    _native_or_skip()
    code = ("import sys, time\n"
            "sys.stdout.buffer.write(bytes([int(sys.argv[1]) % 256]) * 65536)\n"
            "sys.stdout.buffer.flush()\n"
            "time.sleep(600)\n")
    cmd = _py(code) + ["{freq}"]
    src = load_source("exec", _exec_params(
        1_000_000, "u8", "control=restart", "freq=3", cmd=cmd))
    it = src.stream(32768)
    first = next(it)
    assert (first.samples == 3).all()
    src.set_basefreq(9)
    second = next(it)
    assert (second.samples == 9).all()
    src.stop()


def test_exec_source_crash_isolation():
    """A buggy producer can only kill its own process: the stream ends
    cleanly and last_error carries the exit status + stderr tail — the
    process-isolation replacement for ExtIO's VEH/longjmp hack
    (TSDRPlugin_ExtIO.c:49-73)."""
    _native_or_skip()
    child = _py(
        "import sys\n"
        "sys.stdout.buffer.write(b'\\x05' * 16384); sys.stdout.buffer.flush()\n"
        "sys.stderr.write('simulated hardware fault'); sys.exit(3)\n"
    )
    src = load_source("exec", _exec_params(1_000_000, "u8", cmd=child))
    blocks = list(src.stream(8192))  # 16384 bytes = exactly 1 block
    assert len(blocks) == 1
    assert (blocks[0].samples == 5).all()
    assert "rc=3" in src.last_error()
    assert "simulated hardware fault" in src.last_error()


def test_exec_i24_conversion():
    """24-bit LE signed PCM -> f32 (the ExtIO exthwUSBdata24 conversion,
    TSDRPlugin_ExtIO.c:125-155): golden unit vectors + end-to-end."""
    from tempestsdr_tpu.sources.subproc import _i24le_to_f32

    raw = bytes([
        0x01, 0x00, 0x00,   # +1 -> 1/2^23
        0xFF, 0xFF, 0xFF,   # -1 -> -1/2^23
        0x00, 0x00, 0x80,   # -2^23 -> -1.0
        0xFF, 0xFF, 0x7F,   # 2^23-1
    ])
    got = _i24le_to_f32(raw)
    expect = np.array([1, -1, -(1 << 23), (1 << 23) - 1],
                      np.float32) / np.float32(1 << 23)
    assert np.array_equal(got, expect)

    _native_or_skip()
    n = 4096  # samples -> 2*n*3 bytes per block
    child = _py(
        "import sys\n"
        f"sys.stdout.buffer.write(bytes([0x00, 0x00, 0x80]) * (2 * {n}))\n"
    )
    src = load_source("exec", _exec_params(1_000_000, "i24", cmd=child))
    assert src.block_dtype() == np.float32
    blk = next(iter(src.stream(n)))
    assert blk.samples.dtype == np.float32
    assert (blk.samples == -1.0).all()
    src.stop()


def test_exec_source_session_end_to_end(tmp_path):
    """A third-party producer (a process replaying a capture) drives a full
    Session to frames — the ExtIO capability demonstrated on the real
    pipeline."""
    _native_or_skip()
    from tempestsdr_tpu.config import PipelineConfig
    from tempestsdr_tpu.params import Params
    from tempestsdr_tpu.sources.synthetic import render_test_pattern, synth_iq
    from tempestsdr_tpu.stream.session import Session, SessionCallbacks

    lines, twidth, refresh, sr = 100, 200, 50.0, 1e6
    raster = render_test_pattern(lines, twidth)
    iq = synth_iq(raster, samplerate=sr, pixelclock=lines * twidth * refresh,
                  n_samples=int(3 * sr / refresh), noise=0.01, dtype=np.uint8)
    path = tmp_path / "capture.bin"
    path.write_bytes(iq.tobytes())
    child = _py(
        "import sys\n"
        f"sys.stdout.buffer.write(open({str(path)!r}, 'rb').read())\n"
    )
    src = load_source("exec", _exec_params(int(sr), "u8", cmd=child))
    cfg = PipelineConfig(samplerate=sr, height=lines, refreshrate=refresh,
                         block_samples=8192, autocorr=False)
    frames = []
    sess = Session(cfg, Params(framerate_pll=False), src,
                   SessionCallbacks(on_frame=frames.append))
    n = sess.run(max_frames=2)
    assert n == 2
    assert frames[0].shape == (lines, cfg.width)


def test_exec_bad_params():
    with pytest.raises(TSDRError):
        load_source("exec", "1000000 u8")  # no -- command
    with pytest.raises(TSDRError):
        load_source("exec", "1000000 pcm -- cat")  # unknown format
    with pytest.raises(TSDRError):
        load_source("exec", "1000000 u8 control=telnet -- cat")
    with pytest.raises(TSDRError):
        load_source("exec", "notarate u8 -- cat")


def test_exec_freq_offset_absolute_from_center():
    """set_freq_offset must tune to center+offset with an IMMUTABLE center
    (shiftfreq semantics, TSDRLibrary.c:208-211): repeated equal offsets —
    the superband hop pattern — must NOT compound, and offset 0 must return
    to the center."""
    _native_or_skip()
    child = _py(
        "import sys\n"
        "w = sys.stdout.buffer\n"
        "w.write(b'\\x01' * 65536); w.flush()\n"
        "for line in sys.stdin:\n"
        "    t = line.split()\n"
        "    if t and t[0] == 'FREQ':\n"
        "        w.write(bytes([int(t[1]) % 256]) * 65536); w.flush()\n"
    )
    src = load_source("exec", _exec_params(
        1_000_000, "u8", "control=stdin", cmd=child))
    it = src.stream(32768)  # block = 65536 bytes
    assert (next(it).samples == 1).all()
    src.set_basefreq(100)
    assert (next(it).samples == 100).all()
    src.set_freq_offset(10)
    assert (next(it).samples == 110).all()
    src.set_freq_offset(10)  # same hop again: absolute, not compounding
    assert (next(it).samples == 110).all()
    src.set_freq_offset(0)  # hop home
    assert (next(it).samples == 100).all()
    src.stop()


def test_exec_freq_offset_respawn_argv():
    """control=restart: the {freq} placeholder is substituted with
    center+offset, and a later absolute retune resets the offset."""
    _native_or_skip()
    code = ("import sys, time\n"
            "sys.stdout.buffer.write(bytes([int(sys.argv[1]) % 256]) * 65536)\n"
            "sys.stdout.buffer.flush()\n"
            "time.sleep(600)\n")
    cmd = _py(code) + ["{freq}"]
    src = load_source("exec", _exec_params(
        1_000_000, "u8", "control=restart", "freq=50", cmd=cmd))
    it = src.stream(32768)
    assert (next(it).samples == 50).all()
    src.set_freq_offset(25)
    assert (next(it).samples == 75).all()
    src.set_freq_offset(25)  # not 100 — offsets are from the fixed center
    assert (next(it).samples == 75).all()
    src.set_basefreq(200)  # absolute tune: new center, offset cleared
    assert (next(it).samples == 200).all()
    # respawned-away children exit rc=-15 BY DESIGN — healthy retunes must
    # not poison last_error (only the CURRENT child reports)
    assert src.last_error() == ""
    src.stop()
    assert src.last_error() == ""  # stop() termination isn't an error either


def test_exec_chatty_stderr_drained():
    """A producer spamming stderr (hackrf_transfer-style periodic stats) must
    not wedge: without a continuous drain the child blocks on a full stderr
    pipe (~64 KiB) before ever producing stdout. Also checks the rc and the
    ROLLING tail (the final message survives 200 KiB of earlier noise)."""
    import threading

    _native_or_skip()
    child = _py(
        "import sys\n"
        "for i in range(200):\n"
        "    sys.stderr.write('stat line %d\\n' % i + 'x' * 1000)\n"
        "sys.stderr.flush()\n"
        "sys.stdout.buffer.write(b'\\x02' * 16384); sys.stdout.buffer.flush()\n"
        "sys.stderr.write('final diagnostic')\n"
        "sys.exit(9)\n"
    )
    src = load_source("exec", _exec_params(1_000_000, "u8", cmd=child))
    result = {}

    def run():
        result["blocks"] = list(src.stream(8192))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "stream wedged on undrained stderr"
    assert len(result["blocks"]) == 1
    assert (result["blocks"][0].samples == 2).all()
    assert "rc=9" in src.last_error()
    assert "final diagnostic" in src.last_error()


def test_exec_spawn_failure_resets_state():
    """A failed spawn must close the native ring and leave the source
    stopped (not half-running) so a retry starts clean."""
    _native_or_skip()
    src = load_source("exec", _exec_params(
        1_000_000, "u8", cmd=["/nonexistent/binary/for/this/test"]))
    with pytest.raises(TSDRError):
        next(iter(src.stream(4096)))
    assert src._running is False
    assert src._ring is None
    # a second attempt fails the same clean way (no stale-state crash)
    with pytest.raises(TSDRError):
        next(iter(src.stream(4096)))


def test_rtltcp_freq_offset_absolute_from_center():
    """rtltcp set_freq_offset: CMD_SET_FREQ at center+offset, stored center
    untouched (superband hops must not compound)."""
    import time

    from tempestsdr_tpu import native as native_io
    from tempestsdr_tpu.sources.base import load_source
    from tempestsdr_tpu.sources.rtltcp import CMD_SET_FREQ

    if not native_io.available():
        pytest.skip("native IO runtime unavailable")
    server = FakeRtlTcpServer(bytes(range(256)) * 1024)
    try:
        src = load_source(
            "rtltcp", f"127.0.0.1 {server.port} 1000000 freq=433000000")
        it = src.stream(4096)
        next(it)
        src.set_freq_offset(1_000_000)
        src.set_freq_offset(1_000_000)  # same hop twice -> same tune
        src.set_freq_offset(0)
        deadline = time.time() + 5
        while (sum(1 for c, _ in server.commands if c == CMD_SET_FREQ) < 4
               and time.time() < deadline):
            time.sleep(0.05)
        src.stop()
    finally:
        server.stop()
    freqs = [v for c, v in server.commands if c == CMD_SET_FREQ]
    assert freqs == [433_000_000, 434_000_000, 434_000_000, 433_000_000]
    assert src._freq == 433_000_000
