"""bench.py orchestration survivability (the round-2 lesson: one wedged TPU
session claim must not zero the whole benchmark record).

Runs bench.py as a subprocess on the CPU backend (TSDR_BENCH_CPU=1) — no TPU
session claim involved.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _run(env_extra, args, timeout=300):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(TSDR_BENCH_CPU="1", **env_extra)
    r = subprocess.run(
        [sys.executable, BENCH] + args,
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in stdout:\n{r.stdout}\n{r.stderr}"
    return json.loads(lines[-1]), r


def test_parent_emits_final_json_single_config():
    out, _ = _run({}, ["--config", "1"])
    assert out["metric"] == "iq_ingest_rate_per_chip"
    assert out["configs"]["config1"]["ingest_MSps"] > 0


def test_parent_survives_wedged_child_claim():
    # first child hangs 120 s (simulated wedged claim); the parent must kill
    # it at the 8 s stall timeout, respawn, and still land a real number
    out, r = _run(
        {"TSDR_BENCH_HANG_ONCE_S": "120", "TSDR_BENCH_STALL_S": "8"},
        ["--config", "1"],
    )
    assert "killing child" in r.stderr
    assert out["configs"]["config1"]["ingest_MSps"] > 0
    assert "partial" not in out


def test_cpu_fallback_when_tpu_never_claims():
    # every child hangs on the (simulated) session claim: after the spawn
    # budget the parent must degrade the missing configs to a CPU-backend
    # fallback child and flag the result, instead of emitting zeros
    out, r = _run(
        {"TSDR_BENCH_HANG_ALWAYS_S": "120", "TSDR_BENCH_STALL_S": "6"},
        ["--config", "1"],
    )
    assert "CPU fallback" in r.stderr
    assert out["configs"]["config1"]["ingest_MSps"] > 0
    assert out["configs"]["config1"]["backend"] == "cpu"
    assert "cpu-backend fallback" in out.get("degraded", "")
    assert "partial" not in out


def test_partial_results_survive_late_failure(tmp_path):
    # budget expires after the first config: the final JSON must still carry
    # it, flagged partial with the missing configs listed
    out, _ = _run({"TSDR_BENCH_BUDGET_S": "1"}, [])
    assert out.get("partial") is True
    assert set(out["missing_configs"]) <= {1, 2, 3, 4, 5}
    assert len(out["missing_configs"]) >= 1
