"""Public API surface tests (tsdr_* parity — TSDRLibrary.h:62-76)."""

import numpy as np
import pytest

from tempestsdr_tpu.api import TSDR
from tempestsdr_tpu.errors import TSDRError, TSDRStatus
from tempestsdr_tpu.params import PARAM


LINES, TWIDTH, REFRESH, SR = 100, 200, 50.0, 1e6


def make_api():
    api = TSDR(block_samples=8192)
    api.load_source("synthetic", f"{LINES} {TWIDTH} {REFRESH} {SR} 0.01")
    api.set_resolution(LINES, REFRESH)
    return api


def test_api_streams_frames():
    api = make_api()
    frames = []
    n = api.start(on_frame=frames.append, max_frames=3)
    assert n == 3 and len(frames) == 3
    assert frames[0].shape == (LINES, api.session.config.width)
    api.close()


def test_set_parameter_double_mirrors_reference_stub():
    """tsdr_setparameter_double (TSDRLibrary.c:613-620): ids 0-1 accepted
    (value has no DSP effect in the reference either), others raise
    TSDR_INVALID_PARAMETER."""
    api = TSDR()
    api.set_parameter_double(0, 1.5)
    api.set_parameter_double(1, -2.5)
    assert api._params_double == [1.5, -2.5]
    for bad in (-1, 2, 99):
        with pytest.raises(TSDRError) as ei:
            api.set_parameter_double(bad, 0.0)
        assert ei.value.status == TSDRStatus.INVALID_PARAMETER


def test_set_param_int_validates_and_applies():
    api = make_api()
    api.set_param(PARAM.AUTOSHIFT, 1)
    assert api._params.autoshift
    api.set_param(PARAM.AUTOSHIFT, 0)
    assert not api._params.autoshift
    with pytest.raises(ValueError):
        api.set_param(99, 1)
    api.close()


def test_resolution_change_requires_stop():
    api = make_api()
    api.start(on_frame=lambda f: None, max_frames=1, background=False)
    # not running anymore (run returned) -> allowed
    api.set_resolution(120, 60.0)
    assert api._height == 120
    api.close()


def test_set_extra_params_live_flip():
    """TPU-native extras (fast_sync, resampler, ...) flip live through
    TSDR.set_extra_params with carried state surviving, like set_param."""
    import numpy as np

    import tempestsdr_tpu as tsdr

    rx = tsdr.TSDR(block_samples=8192)
    rx.load_source("synthetic", "100 200 50 1000000 0.01")
    rx.set_resolution(100, 50.0)
    frames = []

    def on_frame(f):
        frames.append(f)
        if len(frames) == 4:
            rx.set_extra_params(fast_sync=True)

    rx.start(on_frame=on_frame, max_frames=10)
    assert len(frames) == 10
    assert rx._params.fast_sync
    assert all(np.isfinite(f).all() for f in frames)
