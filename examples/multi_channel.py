"""Config 5: N independent emitters, channel-data-parallel on a device mesh.

usage: [JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8]
       python examples/multi_channel.py [n_channels]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from tempestsdr_tpu.config import PipelineConfig
from tempestsdr_tpu.params import Params
from tempestsdr_tpu.parallel import make_mesh, make_channel_step, stack_states
from tempestsdr_tpu.stream.pipeline import StepControls
from tempestsdr_tpu.sources.synthetic import render_test_pattern, synth_iq

C = int(sys.argv[1]) if len(sys.argv) > 1 else min(8, len(jax.devices()))
SR, LINES, TWIDTH, REFRESH = 1e6, 100, 200, 50.0

cfg = PipelineConfig(samplerate=SR, height=LINES, refreshrate=REFRESH,
                     block_samples=8192, autocorr=False)
mesh = make_mesh(n_channel=min(C, len(jax.devices())), n_time=1)
step = make_channel_step(cfg, Params(framerate_pll=False), mesh)
states = stack_states(cfg, C)
ctrl = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (C,) + x.shape),
                    StepControls.default())

# each channel watches a different emitter (different random pattern)
rasters = [render_test_pattern(LINES, TWIDTH, seed=c) for c in range(C)]
pos = 0
frames = {}
for b in range(40):
    raws = jnp.stack([
        jnp.asarray(synth_iq(rasters[c], samplerate=SR,
                             pixelclock=LINES * TWIDTH * REFRESH,
                             n_samples=cfg.block_samples, start_sample=pos,
                             noise=0.01, seed=c))
        for c in range(C)
    ])
    pos += cfg.block_samples
    states, outs = step(states, raws, ctrl)
    fv = np.asarray(outs.frame_valid)
    for c in np.nonzero(fv)[0]:
        frames[int(c)] = np.asarray(outs.frame[c])

print(f"{C} channels over mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}: "
      f"{len(frames)} channels produced frames")
for c, f in sorted(frames.items()):
    cc = np.corrcoef(f.ravel(), rasters[c].repeat(2, axis=1)[:, :f.shape[1]].ravel())[0, 1]
    print(f"  channel {c}: frame range [{f.min():.2f}, {f.max():.2f}]")
