"""Signal sources.

The reference's L1 is a 10-function C plugin ABI resolved via dlopen
(TempestSDR/src/include/TSDRPlugin.h:49-60, TSDRPluginLoader.c). Here the
seam is a Python protocol with the same capability surface; the RawFile
source (the reference's reproducibility/benchmark harness,
TSDRPlugin_RawFile) and a synthetic emanation generator (the test fixture the
reference never had) are built in. Real-hardware sources (UHD/Mirics/SDRplay
equivalents) plug in through the same protocol, optionally backed by the
native IO runtime in ..native.
"""

from .base import Source, SourceBlock, load_source  # noqa: F401
from .rawfile import RawFileSource  # noqa: F401
from .synthetic import SyntheticSource, render_test_pattern, synth_iq  # noqa: F401
from .live import SimulatedLiveSource  # noqa: F401
from .rtltcp import RtlTcpSource  # noqa: F401
from .subproc import ExternalProcessSource  # noqa: F401
from .cplugin import CPluginSource  # noqa: F401
