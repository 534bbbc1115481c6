"""Coverage/GDOP planning tool (cli/coverage.py)."""

import subprocess
import sys

import numpy as np

from tdoa_tpu.cli.coverage import coverage_grid


STATIONS = np.array(
    [
        [41.18660274289527, -95.96064116595667, 355.69],
        [41.24669616513154, -96.08366304481238, 329.0],
        [41.32916620016985, -96.03513381562004, 373.18],
    ]
)


def test_center_beats_far_outside():
    center = STATIONS.mean(axis=0)[None, :]
    far = center + np.array([[1.0, 1.0, 0.0]])  # ~140 km away
    cov = coverage_grid(STATIONS, np.concatenate([center, far]), 0.1e-6)
    assert cov["semi_major_m"][0] < cov["semi_major_m"][1] / 10


def test_uncertainty_scales_linearly_with_sigma():
    pt = STATIONS.mean(axis=0)[None, :]
    a = coverage_grid(STATIONS, pt, 0.1e-6)
    b = coverage_grid(STATIONS, pt, 0.2e-6)
    np.testing.assert_allclose(
        b["semi_major_m"], 2 * a["semi_major_m"], rtol=1e-6
    )
    # GDOP is geometry-only: invariant to sigma.
    np.testing.assert_allclose(a["gdop"], b["gdop"], rtol=1e-6)


def test_emitter_on_station_line_is_degenerate():
    """For an emitter on the line through collinear stations every
    range-difference gradient points along that line — the cross-line
    coordinate is unobservable and the covariance must blow up.
    (Off-axis points near collinear stations remain locally well-
    conditioned; the collinear pathology there is the global mirror
    ambiguity, which is the multistart solver's job, not this map's.)"""
    line = np.array(
        [[41.0, -96.0, 350.0], [41.1, -96.0, 350.0], [41.2, -96.0, 350.0]]
    )
    on_line = np.array([[41.35, -96.0, 350.0]])
    off_line = np.array([[41.1, -95.9, 350.0]])
    cov = coverage_grid(line, np.concatenate([on_line, off_line]), 0.1e-6)
    assert (
        not np.isfinite(cov["semi_major_m"][0])
        or cov["semi_major_m"][0] > 100 * cov["semi_major_m"][1]
    )
    assert np.isfinite(cov["semi_major_m"][1])


def test_cli_runs_and_writes_csv(tmp_path, station_csv):
    out = tmp_path / "cov.csv"
    res = subprocess.run(
        [sys.executable, "-m", "tdoa_tpu.cli.coverage", station_csv,
         "--stations", "kx0u", "n3pay", "kf0mtl", "--n", "9",
         "--csv-out", str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    assert "Coverage map: 3 stations" in res.stdout
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "lat,lon,semi_major_m,semi_minor_m,azimuth_deg,gdop"
    assert len(lines) == 1 + 81
    row = lines[1].split(",")
    assert len(row) == 6


def test_cli_rejects_unknown_station(station_csv):
    res = subprocess.run(
        [sys.executable, "-m", "tdoa_tpu.cli.coverage", station_csv,
         "--stations", "nope1", "nope2", "nope3"],
        capture_output=True, text=True)
    assert res.returncode == 2
