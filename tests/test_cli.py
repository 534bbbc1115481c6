"""CLI smoke tests — drive each tool as a subprocess, the way the
reference's CI asserts usage strings (build.yml:51-55) but end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(mod, *args, check=True):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["TDOA_TPU_PLATFORM"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", f"tdoa_tpu.cli.{mod}", *map(str, args)],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    if check and r.returncode != 0:
        raise AssertionError(
            f"{mod} failed ({r.returncode}):\n{r.stdout}\n{r.stderr}"
        )
    return r


@pytest.mark.parametrize(
    "mod",
    [
        "processor",
        "reader",
        "analyzer",
        "fast_analyzer",
        "simulator",
        "weak_signal_simulator",
        "collector",
        "gain_calibrator",
        "simple_corr",
        "correlation_sanity",
        "snr_analysis",
        "stream_processor",
        "caf_search",
    ],
)
def test_usage_strings(mod):
    r = run_cli(mod, "--help")
    assert "usage" in r.stdout.lower()


def test_snr_analysis_output():
    r = run_cli("snr_analysis")
    assert "kx0u" in r.stdout
    assert "Coherent integration" in r.stdout


def test_simple_corr_passes():
    r = run_cli("simple_corr", "--n", 16384)
    assert "ALL PASS" in r.stdout


def test_processor_prior_flag_validation():
    """--prior is validated before any capture is read: malformed or
    out-of-range values exit with the argparse usage error (rc 2)."""
    for bad in ("41.2,-96.0", "a,b,c", "41.2,-96.0,-5", "95,0,10"):
        r = run_cli("processor", "--prior", bad,
                    "162400000", "101900000", "stations.csv",
                    "a.dat", "b.dat", "c.dat", check=False)
        assert r.returncode == 2, (bad, r.stderr)
        assert "--prior" in r.stderr, (bad, r.stderr)
    # A southern-hemisphere prior starts with "-"; the CLI must accept
    # the space-separated form, not demand --prior=VALUE. (The value
    # parses; the run then fails on the missing capture file, rc 2 with
    # a file error rather than an argparse --prior error.)
    r = run_cli("processor", "--prior", "-33.9,18.4,25",
                "162400000", "101900000", "stations.csv",
                "a.dat", "b.dat", "c.dat", check=False)
    assert "--prior" not in r.stderr, r.stderr


@pytest.mark.slow
def test_sim_to_processor_workflow(tmp_path, station_csv):
    """The full documented workflow: simulator → reader → analyzer →
    processor (docs/usage.md capability)."""
    r = run_cli(
        "simulator",
        "--duration-s", 0.4,
        "--out", str(tmp_path),
        "--clock-offsets-us", 12, -7, 23,
    )
    assert "wrote" in r.stdout
    dats = sorted(str(p) for p in tmp_path.glob("sim-*.dat"))
    assert len(dats) == 3

    r = run_cli("reader", dats[0])
    assert "RESULT: OK" in r.stdout

    r = run_cli("fast_analyzer", dats[0])
    assert r.stdout.startswith("REF,")

    r = run_cli("correlation_sanity", dats[0])
    assert "PASS" in r.stdout

    r = run_cli(
        "processor",
        162400000, 101900000, station_csv, *dats,
        "--max-lag", 512, "--seg-len", 65536,
        "--geojson", str(tmp_path / "fix.geojson"),
    )
    assert "Position fix:" in r.stdout
    import json as _json

    fc = _json.load(open(tmp_path / "fix.geojson"))
    assert fc["type"] == "FeatureCollection"
    kinds = [f["properties"]["kind"] for f in fc["features"]]
    assert kinds.count("station") == 3
    assert "reference_tx" in kinds and "fix" in kinds
    assert kinds.count("error_ellipse") == 2
    fixf = next(f for f in fc["features"]
                if f["properties"]["kind"] == "fix")
    lon, lat = fixf["geometry"]["coordinates"][:2]  # RFC 7946 order
    assert abs(lat - 41.3089) < 0.01 and abs(lon + 96.0262) < 0.01
    # Fix should land near KEVO (41.3089, -96.0262)
    for line in r.stdout.splitlines():
        if line.startswith("Position fix:"):
            lat = float(line.split()[2].rstrip(","))
            lon = float(line.split()[3])
            assert abs(lat - 41.3089) < 0.01
            assert abs(lon + 96.0262) < 0.01


def test_collector_sim_backend(tmp_path):
    r = run_cli(
        "collector",
        162400000, 101900000, 0, "kx0u",
        "--backend", "sim",
        "--duration", 1,
        "--out", str(tmp_path),
    )
    assert "Validated" in r.stdout
    files = list(tmp_path.glob("kx0u-*.dat"))
    assert len(files) == 1


def test_gain_calibrator_sim_backend():
    r = run_cli("gain_calibrator", 162400000, 101900000, "--backend", "sim")
    assert "Recommended collection command" in r.stdout
    assert "converged" in r.stdout


@pytest.mark.slow
def test_stream_processor_watch_mode(tmp_path, station_csv):
    """--watch picks up a window that lands AFTER startup, then exits on
    --idle-exit — the continuous-deployment loop."""
    import threading
    import time as _time

    watch_dir = tmp_path / "inbox"
    watch_dir.mkdir()
    sim_dir = tmp_path / "sim"
    sim_dir.mkdir()
    r = run_cli(
        "simulator", "--duration-s", 0.4, "--out", str(sim_dir),
    )
    dats = sorted(sim_dir.glob("sim-*.dat"))
    assert len(dats) == 3

    def land_files():
        _time.sleep(2.0)
        for p in dats:
            # strip the sim- prefix so station parsing sees {station}-{epoch}
            (watch_dir / p.name[len("sim-"):]).write_bytes(p.read_bytes())

    t = threading.Thread(target=land_files)
    t.start()
    r = run_cli(
        "stream_processor", 162400000, 101900000, station_csv,
        str(watch_dir), "--max-lag", 512, "--seg-len", 65536,
        "--watch", 0.5, "--settle", 0.2, "--idle-exit", 12,
    )
    t.join()
    assert "fix " in r.stdout
    assert "exiting watch" in r.stdout


@pytest.mark.slow
def test_stream_processor_solve_velocity(tmp_path, station_csv):
    """--solve-velocity: the per-window FDOA velocity is fused into the
    track — the FIRST window already reports the emitter's speed."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    sim_dir = tmp_path / "sim"
    sim_dir.mkdir()
    run_cli(
        "simulator", "--duration-s", 0.4,
        "--velocity", 150, -80, 0, "--out", str(sim_dir),
    )
    for p in sorted(sim_dir.glob("sim-*.dat")):
        (inbox / p.name[len("sim-"):]).write_bytes(p.read_bytes())
    r = run_cli(
        "stream_processor", 162400000, 101900000, station_csv,
        str(inbox), "--max-lag", 512, "--seg-len", 65536,
        "--solve-velocity",
    )
    import re
    m = re.search(r"v=\(([-+0-9.]+),([-+0-9.]+)\)", r.stdout)
    assert m, r.stdout
    ve, vn = float(m.group(1)), float(m.group(2))
    # One window in: velocity already ~(150, -80) m/s, not ~0.
    assert abs(ve - 150) < 15 and abs(vn + 80) < 15, (ve, vn)


@pytest.mark.slow
def test_stream_processor_multi_emitter_tracks(tmp_path, station_csv):
    """--multi-emitter in the stream: two co-channel emitters become two
    independent tracks with stable ids across windows."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    sim_dir = tmp_path / "sim"
    sim_dir.mkdir()
    # Two windows of the same two-emitter scene (epochs differ).
    for ep_off in (0, 1):
        run_cli(
            "simulator", "--duration-s", 0.3,
            "--interferer", 41.05, -95.99, 340, 1.0,
            "--clock-offsets-us", 5, -9, 14,
            "--seed", 7 + ep_off, "--out", str(sim_dir),
        )
        epoch = 1_800_000_000 + ep_off * 10
        for p in sorted(sim_dir.glob("sim-*.dat")):
            station = p.name[len("sim-"):].rsplit("-", 1)[0]
            (inbox / f"{station}-{epoch}.dat").write_bytes(p.read_bytes())
            p.unlink()
    r = run_cli(
        "stream_processor", 162400000, 101900000, station_csv,
        str(inbox), "--max-lag", 512, "--seg-len", 32768,
        "--multi-emitter", 2,
    )
    import re
    ids = set(re.findall(r"(target(?:-\d+)?) 4", r.stdout))
    # Two distinct track ids, each updated in both windows.
    assert len(ids) == 2, r.stdout
    for tid in ids:
        assert r.stdout.count(f"{tid} 4") == 2, r.stdout


@pytest.mark.slow
def test_stream_joint_moving_and_static_tracks(tmp_path, station_csv):
    """Stream with --solve-velocity --multi-emitter: a moving emitter
    and a static co-channel interferer become two tracks, the mover's
    with its velocity fused from its OWN FDOA set."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    sim_dir = tmp_path / "sim"
    sim_dir.mkdir()
    run_cli(
        "simulator", "--duration-s", 0.4,
        "--velocity", 120, -60, 0,
        "--interferer", 41.05, -95.99, 340, 1.0,
        "--clock-offsets-us", 5, -9, 14,
        "--seed", 5, "--out", str(sim_dir),
    )
    for p in sorted(sim_dir.glob("sim-*.dat")):
        (inbox / p.name[len("sim-"):]).write_bytes(p.read_bytes())
    r = run_cli(
        "stream_processor", 162400000, 101900000, station_csv,
        str(inbox), "--max-lag", 512, "--seg-len", 65536,
        "--solve-velocity", "--multi-emitter", 2,
    )
    import re
    lines = [l for l in r.stdout.splitlines() if "target-" in l]
    assert len(lines) == 2, r.stdout
    speeds = {}
    for l in lines:
        tid = re.search(r"(target-\d+)", l).group(1)
        ve, vn = map(float, re.search(r"v=\(([-+0-9.]+),([-+0-9.]+)\)", l).groups())
        speeds[tid] = (ve**2 + vn**2) ** 0.5
    fast = max(speeds.values())
    slow = min(speeds.values())
    # First window: the mover's track already carries ~134 m/s.
    assert 110 < fast < 160, speeds
    assert slow < 80, speeds


@pytest.mark.slow
def test_stream_processor_state_resume(tmp_path, station_csv):
    """--state: a restarted stream service resumes its tracks and skips
    already-processed epochs instead of starting cold and reprocessing
    the whole directory."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    sim_dir = tmp_path / "sim"
    sim_dir.mkdir()
    state = tmp_path / "state.json"

    def land(ep_off):
        run_cli("simulator", "--duration-s", 0.3, "--seed", 11 + ep_off,
                "--out", str(sim_dir))
        epoch = 1_800_000_000 + ep_off * 10
        for p in sorted(sim_dir.glob("sim-*.dat")):
            station = p.name[len("sim-"):].rsplit("-", 1)[0]
            (inbox / f"{station}-{epoch}.dat").write_bytes(p.read_bytes())
            p.unlink()

    land(0)
    land(1)
    jsonl = tmp_path / "windows.jsonl"
    args = ("stream_processor", 162400000, 101900000, station_csv,
            str(inbox), "--max-lag", 512, "--seg-len", 32768,
            "--state", str(state), "--jsonl", str(jsonl))
    r1 = run_cli(*args)
    assert r1.stdout.count("[1 updates]") == 1, r1.stdout
    assert r1.stdout.count("[2 updates]") == 1, r1.stdout
    assert state.exists()

    # --jsonl: one machine-readable record per (window, target).
    import json
    recs = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert len(recs) == 2
    assert recs[0]["track"]["n_updates"] == 1
    assert recs[1]["track"]["n_updates"] == 2
    assert {"lat", "lon", "rms_residual_m"} <= set(recs[0]["fix"])

    # Restart over the same directory plus one NEW window: the old
    # epochs are skipped (not reprinted) and the resumed track
    # continues counting from where it left off.
    land(2)
    r2 = run_cli(*args)
    assert "resumed 1 track(s) / 2 processed epoch(s)" in r2.stderr, r2.stderr
    assert "[1 updates]" not in r2.stdout, r2.stdout
    assert r2.stdout.count("[3 updates]") == 1, r2.stdout

    # A corrupted-but-parseable checkpoint (truncated track vector)
    # must fall back to a fresh start — reprocess everything — not
    # crash or resume poisoned tracks.
    import json
    st = json.loads(state.read_text())
    next(iter(st["tracks"].values()))["pos_enu"] = [1.0, 2.0]
    state.write_text(json.dumps(st))
    r3 = run_cli(*args)
    assert "starting fresh" in r3.stderr, r3.stderr
    assert r3.stdout.count("[3 updates]") == 1, r3.stdout

    # A station coordinate corrected in the CSV moves the saved ENU
    # frame: the state must be refused, not resumed shifted. (~10 m
    # latitude moves sit under allclose's default rtol at 41 deg —
    # regression for the rtol=0 requirement.)
    moved_csv = tmp_path / "moved.csv"
    moved_csv.write_text(
        open(station_csv).read().replace("41.18660274289527",
                                         "41.18670000000000")
    )
    r4 = run_cli("stream_processor", 162400000, 101900000,
                 str(moved_csv), str(inbox), "--max-lag", 512,
                 "--seg-len", 32768, "--state", str(state))
    assert "station coordinates changed" in r4.stderr, r4.stderr


@pytest.mark.slow
def test_live_service_loop(tmp_path, station_csv):
    """The continuous live service: three independent collector
    processes in --repeat mode produce epoch-aligned windows (shared
    NTP + identical arguments, no rendezvous), and stream_processor
    consumes the directory into per-window fixes — the loop the
    reference leaves to humans/cron (docs/usage.md:21-52)."""
    import json
    import time as _time

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["TDOA_TPU_PLATFORM"] = "cpu"

    # Explicit shared start epoch far enough out that all three
    # subprocesses finish importing before the first window.
    epoch0 = int(_time.time()) + 12
    interval = 8
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tdoa_tpu.cli.collector",
             "162400000", "101900000", str(epoch0), st,
             "--backend", "sim", "--duration", "1",
             "--repeat", "2", "--interval", str(interval),
             "--out", str(inbox)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for st in ("kx0u", "n3pay", "kf0mtl")
    ]
    outs = [pr.communicate(timeout=300)[0] for pr in procs]
    for pr, out in zip(procs, outs):
        assert pr.returncode == 0, out
        assert "Service done: 2/2 windows valid" in out, out
    names = sorted(p.name for p in inbox.glob("*.dat"))
    assert len(names) == 6, names  # 3 stations x 2 windows each
    # The first window is strictly aligned across stations. Later
    # windows stay on the shared grid but may skip slots when a
    # capture overruns the interval (loaded CI machine), so only the
    # guaranteed-common first epoch is asserted station-by-station.
    for st in ("kx0u", "n3pay", "kf0mtl"):
        assert f"{st}-{epoch0}.dat" in names, names

    jsonl = tmp_path / "live.jsonl"
    run_cli(
        "stream_processor", 162400000, 101900000, station_csv,
        str(inbox), "--max-lag", 512, "--seg-len", 65536,
        "--jsonl", str(jsonl),
    )
    recs = [json.loads(line) for line in jsonl.read_text().splitlines()]
    assert epoch0 in {r["epoch"] for r in recs}
    for r in recs:
        # KEVO ground truth (conftest omaha_stations tgt_tx_lla)
        assert abs(r["fix"]["lat"] - 41.3089) < 0.01, r
        assert abs(r["fix"]["lon"] + 96.0262) < 0.01, r


def test_collector_epoch_grid():
    """Missed-window skipping stays on the absolute epoch grid."""
    from tdoa_tpu.cli.collector import _next_epoch

    # Normal case: capture finished inside its slot.
    assert _next_epoch(100, 10, 105.0) == (110, 0)
    # Overran one slot: skip it, stay on the grid.
    assert _next_epoch(100, 10, 112.0) == (120, 1)
    # Landing exactly on a grid point is still "in the past" (no time
    # left to wait for it).
    assert _next_epoch(100, 10, 110.0) == (120, 1)
    # Overran several slots.
    assert _next_epoch(100, 10, 147.0) == (150, 4)
