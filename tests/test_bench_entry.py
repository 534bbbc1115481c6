"""Driver-surface smoke tests: bench.py and __graft_entry__ must never
break — the round driver runs them unattended."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_valid_json():
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_SECONDS="0.3",
        BENCH_MAX_LAG="1000",
        BENCH_SEG=str(1 << 16),
        BENCH_ACCUM="xla",
        PYTHONPATH=REPO,
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["metric"] == "corr_throughput"
    assert d["unit"] == "Msamples/s/chip"
    assert d["value"] > 0
    assert "vs_baseline" in d
    st = d["detail"]["steadiness"]
    assert st["verdict"] in ("healthy", "congested")
    assert st["reps"] in (5, 10)
    # Headline is min-of-reps: never slower than the median throughput.
    assert d["value"] >= d["detail"]["median_msamples_per_s"] - 1e-6


def test_bench_congestion_gate():
    """Steadiness gate (round-4 verdict item 1): with congestion-shaped
    harness sleeps injected into 60% of the timed reps, the gate must
    flag the run congested, extend to 10 reps, and keep the min-of-reps
    headline close to the uncongested program latency (the sleeps only
    ever ADD time, so the min must escape through the unperturbed
    reps)."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_SECONDS="0.3",
        BENCH_MAX_LAG="1000",
        BENCH_SEG=str(1 << 16),
        BENCH_ACCUM="xla",
        BENCH_FULL="0",
        BENCH_WARM="0",
        BENCH_CONGESTION_SIM="0.6",
        PYTHONPATH=REPO,
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    st = d["detail"]["steadiness"]
    assert st["verdict"] == "congested", st
    assert st["reps"] == 10
    assert st["spread_ratio_max_over_min"] > 1.5
    # The robust headline survives: min-of-reps ≥ 2x the congested
    # median would mean the min itself was congested — it must not be.
    lat = d["detail"]["headline_latency_s"]
    med = d["detail"]["steady_latency_s"]
    assert lat <= med


def test_graft_entry_contract():
    code = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, %r)
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
assert len(out) == 10
g.dryrun_multichip(8)
g.dryrun_multichip(4)
print("GRAFT OK")
""" % REPO
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "GRAFT OK" in r.stdout


def test_dryrun_multichip_self_forces_cpu_mesh():
    """Round-1 regression: the driver calls dryrun_multichip in a process
    whose backend is ALREADY initialized (possibly on a broken TPU
    client) with no device-count forcing in the environment. The
    function must rebuild an 8-device CPU backend itself. Hermetic
    analogue: a 1-device CPU backend initialized before the call."""
    code = """
import sys; sys.path.insert(0, %r)
import jax
assert len(jax.devices()) == 1, jax.devices()   # hostile: backend frozen small
import __graft_entry__ as g
g.dryrun_multichip(8)
print("SELF-FORCED OK")
""" % REPO
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SELF-FORCED OK" in r.stdout
