"""Time-sharded wideband pipeline — config 4 (overlap-save halo exchange).

One wideband IQ stream is too fast for a single chip's ingest: split each
block into T contiguous time shards across the mesh's 'time' axis. Per
block:

  - demod + (optional) FIR run shard-locally; FIR and resampler edges need
    the previous shard's tail samples, exchanged with lax.ppermute over ICI
    (the overlap-save halo; the reference's analog is the resampler's
    `contrib`/`offset` carry, dsp.c:256-307);
  - the resampler's pixel->sample mapping is affine in the exact fixed-point
    phase, so every shard computes its own global pixel range with *no*
    communication (ownership: pixel p belongs to the shard whose segment
    contains floor(a_p));
  - pixels land in the replicated frame accumulator via one psum (positions
    past the fold fill are always zero, so add == place);
  - per-frame post-processing and the autocorrelation estimator run
    replicated on psum/all_gather results (cheap relative to the per-sample
    stages, which are the wideband bottleneck).

All carried state is replicated; every step's carry update is derived from
collective results, so replication is preserved by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FRAC_BITS, PipelineConfig
from ..params import Params
from ..ops.demod import am_demod, normalize_iq
from ..ops.fir import design_lowpass_fir
from ..ops.resample import (
    box_resample_range,
    box_resample_range_strided,
    nn_resample_range,
    plan_strided,
    resample_counts,
)
from ..ops.autocorr import accumulate_running_mean, autocorrelation_magnitude
from ..stream.pipeline import StepControls, _post_process
from ..stream.state import StreamState, StepOutputs


def _ceil_div(a, b):
    return -((-a) // b)


def _make_body(config: PipelineConfig, params: Params, T: int):
    """Per-device body of the time-sharded step (runs inside shard_map over
    the 'time' axis; vmap-able over a local channel axis for the combined
    {ch, time} grid)."""
    if config.frames_per_block > 1:
        raise ValueError(
            "time-sharded step supports one frame per block (the wideband "
            "config shards a sub-frame block across devices); shrink "
            "block_samples below one frame's worth of samples"
        )
    n = config.block_samples
    if n % T:
        raise ValueError("block_samples must divide by the time-axis size")
    S = n // T
    taps = config.resample_taps
    frame_pixels = config.frame_pixels
    h, w = config.height, config.width
    fb_len = frame_pixels + config.max_block_pixels
    inv0_fix = config.inv0_fix
    r0 = config.pixelrate / config.samplerate
    max_pix_local = int(S * r0 * 1.02) + 2
    block2 = int(round(2 * frame_pixels * config.samples_per_pixel))
    run_autocorr = config.autocorr and not params.autocorr_plots_off
    if run_autocorr:
        ac_round = config.ac_round_samples
        ac_fft = config.ac_fft_size
        fw_off, fw_len = config.ac_frame_window
        lw_off, lw_len = config.ac_line_window
    fir_n = params.fir_lowpass_taps
    if fir_n:
        fir_taps = jnp.asarray(
            design_lowpass_fir(fir_n, min(1.0 / config.samples_per_pixel, 0.98))
        )
    # resampler routing (mirrors the single-chip _pick_resampler): the
    # strided form whenever the geometry plan exists and the caller didn't
    # pin the chunked one; Mosaic variants fall back to the XLA strided form
    # inside shard_map (same carries/weights, no kernel dependency)
    nn_mode = bool(params.nearest_neighbour)
    use_strided = (
        not nn_mode
        and params.resampler != "chunked"
        and plan_strided(config.samples_per_pixel, config.resample_taps) is not None
    )

    def _shift_right(seg_tail):
        """Send each shard's tail to its right neighbour (left halo)."""
        return lax.ppermute(seg_tail, "time", [(i, i + 1) for i in range(T - 1)])

    def step(state: StreamState, raw_seg, controls: StepControls):
        t_idx = lax.axis_index("time")
        env = am_demod(normalize_iq(raw_seg))  # (S,)

        # ---- drop compensation (replicated scalar math, as single-chip)
        dropped = controls.samples_dropped.astype(jnp.int64)
        skip_before = jnp.maximum(state.phase_fix, 0) >> FRAC_BITS
        new_skip = jnp.where(dropped > 0, (skip_before - dropped) % block2, skip_before)
        phase = state.phase_fix + ((new_skip - skip_before) << FRAC_BITS)
        drop_all = phase >= (jnp.int64(n) << FRAC_BITS)

        # ---- autocorrelation on the gathered envelope (replicated)
        if run_autocorr:
            env_full = lax.all_gather(env, "time", tiled=True)  # (n,)
            purge = dropped != 0
            fed = (~drop_all) & (~purge)
            fill0 = jnp.where(purge, 0, state.ac_fill)
            written = lax.dynamic_update_slice(state.ac_buf, env_full, (fill0,))
            ac_buf = jnp.where(fed, written, state.ac_buf)
            ac_fill = jnp.where(fed, fill0 + n, fill0)
            round_done = ac_fill >= ac_round

            def ac_round_fn(ops):
                buf, avg_f, avg_l, calls, last_full = ops
                r = autocorrelation_magnitude(buf[:ac_fft])
                calls = calls + 1
                avg_f = accumulate_running_mean(avg_f, r[fw_off : fw_off + fw_len], calls)
                avg_l = accumulate_running_mean(avg_l, r[lw_off : lw_off + lw_len], calls)
                last_full = r[: ac_fft // 2]
                buf = jnp.concatenate([buf[ac_round:], jnp.zeros((ac_round,), jnp.float32)])
                return buf, avg_f, avg_l, calls, last_full

            ac_buf, ac_avg_frame, ac_avg_line, ac_calls, ac_last_full = lax.cond(
                round_done,
                ac_round_fn,
                lambda ops: ops,
                (ac_buf, state.ac_avg_frame, state.ac_avg_line, state.ac_calls,
                 state.ac_last_full),
            )
            ac_fill = jnp.where(round_done, ac_fill - ac_round, ac_fill)
        else:
            round_done = jnp.asarray(False)
            ac_buf, ac_fill = state.ac_buf, state.ac_fill
            ac_avg_frame, ac_avg_line, ac_calls = (
                state.ac_avg_frame,
                state.ac_avg_line,
                state.ac_calls,
            )
            ac_last_full = state.ac_last_full

        # ---- optional FIR with left-halo exchange (overlap-save)
        if fir_n:
            halo = _shift_right(env[S - (fir_n - 1):])
            halo = jnp.where(t_idx == 0, state.fir_tail, halo)
            xc = jnp.concatenate([halo, env])
            env = lax.conv_general_dilated(
                xc[None, None, :],
                fir_taps[::-1][None, None, :],
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
            )[0, 0].astype(jnp.float32)
            fir_tails = lax.all_gather(xc[xc.shape[0] - (fir_n - 1):], "time")
            fir_tail = fir_tails[T - 1]
        else:
            fir_tail = state.fir_tail

        # ---- per-shard pixel range from the exact phase (no communication)
        delta = state.pll.refresh_delta
        corr_factor = delta / (jnp.float32(config.refreshrate) + delta)
        inv_corr = jnp.round(jnp.float32(inv0_fix) * corr_factor).astype(jnp.int64)
        inv_fix = jnp.int64(inv0_fix) - inv_corr

        n_out, phase2 = resample_counts(phase, inv_fix, n)
        n_out64 = n_out.astype(jnp.int64)
        seg_start = t_idx.astype(jnp.int64) * S
        p_start = jnp.clip(
            _ceil_div((seg_start << FRAC_BITS) - phase, inv_fix), 0, n_out64
        )
        p_end = jnp.clip(
            _ceil_div(((seg_start + S) << FRAC_BITS) - phase, inv_fix), 0, n_out64
        )

        if nn_mode:
            # NN's sample index (n*p)//n_out ignores the phase, so it can
            # land outside the taps halo — resample from the full gathered
            # post-FIR envelope instead (dsp.c:274-277 global mapping)
            env_full_rs = lax.all_gather(env, "time", tiled=True)  # (n,)
            pix_local = nn_resample_range(
                env_full_rs, n_out, p_start, p_end,
                n_samples=n, max_pix=max_pix_local,
            )
            new_tail = env_full_rs[n - taps:]
        else:
            # resampler halos (post-FIR envelope)
            left = _shift_right(env[S - taps:])
            left = jnp.where(t_idx == 0, state.tail, left)
            right = lax.ppermute(env[:taps], "time",
                                 [(i, i - 1) for i in range(1, T)])
            x_local = jnp.concatenate([left, env, right])  # (S + 2*taps,)
            tails = lax.all_gather(env[S - taps:], "time")
            new_tail = tails[T - 1]
            range_resample = (
                box_resample_range_strided if use_strided else box_resample_range
            )
            pix_local = range_resample(
                x_local,
                phase,
                inv_fix,
                p_start,
                p_end,
                seg_start,
                max_pix=max_pix_local,
                taps=taps,
                inv_nominal=config.samples_per_pixel,
            )

        # ---- manual sync skip + fold via psum (add == place: slots past the
        # fold fill are zero by invariant)
        pend = (state.skip_pixels + controls.syncoffset) % frame_pixels
        k = jnp.minimum(pend, n_out)
        k64 = k.astype(jnp.int64)
        shift = jnp.clip(k64 - p_start, 0, max_pix_local).astype(jnp.int32)
        pix2 = lax.dynamic_slice(
            jnp.concatenate([pix_local, jnp.zeros((max_pix_local,), jnp.float32)]),
            (shift,),
            (max_pix_local,),
        )
        count = jnp.maximum(p_end - jnp.maximum(p_start, k64), 0).astype(jnp.int32)
        target0 = (
            state.fill.astype(jnp.int64) + jnp.maximum(p_start, k64) - k64
        ).astype(jnp.int32)
        masked = jnp.where(jnp.arange(max_pix_local, dtype=jnp.int32) < count, pix2, 0.0)
        contrib = lax.dynamic_update_slice(
            jnp.zeros((fb_len,), jnp.float32), masked, (target0,)
        )
        framebuf = state.framebuf + lax.psum(contrib, "time")
        n_valid = n_out - k
        pend = pend - k
        fill2 = state.fill + n_valid
        emit = fill2 >= frame_pixels

        # ---- per-frame post-processing (replicated)
        def do_emit(ops):
            framebuf, fill2, screen, ag, sx, sy, pll = ops
            frame2d = framebuf[:frame_pixels].reshape(h, w)
            result, screen, ag, sx, sy, pll = _post_process(
                config, params, frame2d, screen, ag, sx, sy, pll, controls.motionblur
            )
            framebuf = jnp.concatenate(
                [framebuf[frame_pixels:], jnp.zeros((frame_pixels,), jnp.float32)]
            )
            return framebuf, fill2 - frame_pixels, screen, ag, sx, sy, pll, result

        def no_emit(ops):
            framebuf, fill2, screen, ag, sx, sy, pll = ops
            return framebuf, fill2, screen, ag, sx, sy, pll, jnp.zeros((h, w), jnp.float32)

        ag = (state.ag_min, state.ag_max, state.ag_snr)
        framebuf, fill, screen, ag, sync_x, sync_y, pll, frame_out = lax.cond(
            emit,
            do_emit,
            no_emit,
            (framebuf, fill2, state.screenbuffer, ag, state.sync_x, state.sync_y, state.pll),
        )

        new_state = StreamState(
            phase_fix=phase2,
            tail=new_tail,
            fir_tail=fir_tail,
            skip_pixels=pend,
            fill=fill,
            framebuf=framebuf,
            screenbuffer=screen,
            ag_min=ag[0],
            ag_max=ag[1],
            ag_snr=ag[2],
            sync_x=sync_x,
            sync_y=sync_y,
            pll=pll,
            runs=state.runs + emit.astype(jnp.int32),
            frame_count=state.frame_count + emit.astype(jnp.int64),
            ac_buf=ac_buf,
            ac_fill=ac_fill,
            ac_avg_frame=ac_avg_frame,
            ac_avg_line=ac_avg_line,
            ac_calls=ac_calls,
            ac_last_full=ac_last_full,
        )
        outputs = StepOutputs(
            frame=frame_out,
            frame_valid=emit,
            n_pixels=n_out,
            refreshrate=jnp.float32(config.refreshrate) + pll.refresh_delta,
            pll_locked=pll.locked,
            ag_min=ag[0],
            ag_max=ag[1],
            ag_snr=ag[2],
            sync_dx=sync_x.dx,
            sync_dy=sync_y.dx,
            ac_frame_plot=ac_avg_frame,
            ac_line_plot=ac_avg_line,
            ac_plot_valid=round_done,
            ac_calls=ac_calls,
        )
        return new_state, outputs

    return step


def make_time_sharded_step(config: PipelineConfig, params: Params, mesh: Mesh):
    """Build jit(shard_map(step)) over the mesh's 'time' axis.

    Signature matches the single-chip step: (state, raw[2*block], controls)
    -> (state, outputs); raw is sharded over time, state replicated.
    """
    T = mesh.shape["time"]
    body = _make_body(config, params, T)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("time"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    rep = NamedSharding(mesh, P())
    time_shard = NamedSharding(mesh, P("time"))
    return jax.jit(
        sharded,
        in_shardings=(rep, time_shard, rep),
        out_shardings=(rep, rep),
        donate_argnums=0,
    )


def make_grid_step(config: PipelineConfig, params: Params, mesh: Mesh):
    """Combined {channel, time} sharding: channels data-parallel over 'ch',
    each channel's block time-sharded over 'time' (configs 4+5 together).

    Arguments carry a leading channel axis: state leaves [C, ...] sharded
    P('ch') (replicated over time), raw [C, 2*block] sharded P('ch','time'),
    controls [C] sharded P('ch'). The per-device body is UNROLLED over its
    local channels (their count is static inside shard_map) rather than
    vmapped: the vmapped program class faults the current remote TPU
    runtime (STATUS.md round 2), and unrolling keeps each channel's 'time'
    collectives the plain single-channel forms.
    """
    T = mesh.shape["time"]
    body1 = _make_body(config, params, T)

    def body(states, raws, controls):
        news, outs = [], []
        for c in range(raws.shape[0]):  # local channels on this device
            st_c = jax.tree.map(lambda x: x[c], states)
            ct_c = jax.tree.map(lambda x: x[c], controls)
            st2, out = body1(st_c, raws[c], ct_c)
            news.append(st2)
            outs.append(out)
        stack = lambda *xs: jnp.stack(xs)
        return jax.tree.map(stack, *news), jax.tree.map(stack, *outs)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("ch"), P("ch", "time"), P("ch")),
        out_specs=(P("ch"), P("ch")),
        check_vma=False,
    )
    ch = NamedSharding(mesh, P("ch"))
    grid = NamedSharding(mesh, P("ch", "time"))
    return jax.jit(
        sharded,
        in_shardings=(ch, grid, ch),
        out_shardings=(ch, ch),
        donate_argnums=0,
    )
