"""Monitor several independent targets on one device with MultiSession
(BASELINE config 5 as a product API — the reference's JNI layer is a
singleton and can only ever drive one receiver per process).

usage: python examples/multi_target.py [n_targets]
"""

import sys

import numpy as np

from tempestsdr_tpu.config import PipelineConfig
from tempestsdr_tpu.params import Params
from tempestsdr_tpu.sources.synthetic import SyntheticSource
from tempestsdr_tpu.stream import MultiSession

C = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SR, LINES, REFRESH = 1e6, 100, 50.0

sources = []
for c in range(C):
    s = SyntheticSource()
    s.init(f"{LINES} {200 + 8 * c} {REFRESH} {SR} 0.02")  # distinct emitters
    sources.append(s)

cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                     block_samples=8192, autocorr=False)
last = {}


def on_frame(channel, frame):
    last[channel] = frame


ms = MultiSession(cfg, Params(framerate_pll=False), sources, on_frame=on_frame)
ms.run(max_frames=4 * C)

print(f"{C} targets, frames per channel: {ms.frames_total}")
for c in sorted(last):
    f = last[c]
    print(f"  target {c}: frame {f.shape}, range [{f.min():.3f}, {f.max():.3f}]")
assert len(last) == C
