"""GeoJSON export (io/geojson.py): coordinate-order correctness,
ellipse geometry, and feature inventory."""

import numpy as np

from tdoa_tpu.geo import lla_to_ecef, lla_to_enu
from tdoa_tpu.io.geojson import (
    ellipse_ring,
    result_feature_collection,
    tracks_feature_collection,
)
from tdoa_tpu.pipeline.processor import TDOAResult
from tdoa_tpu.pipeline.streaming import TargetTracker
from tdoa_tpu.solve import solve_fix, station_pairs
from tdoa_tpu.utils.constants import SPEED_OF_LIGHT

LLA3 = np.array(
    [
        [41.18660274289527, -95.96064116595667, 355.69],
        [41.24669616513154, -96.08366304481238, 329.0],
        [41.32916620016985, -96.03513381562004, 373.18],
    ]
)
NAMES = ("kx0u", "n3pay", "kf0mtl")
TX = np.array([41.30888549464701, -96.02619229605524, 356.0])


def _result():
    st = lla_to_ecef(LLA3)
    pairs = station_pairs(3)
    d = np.linalg.norm(st - lla_to_ecef(TX), axis=-1)
    tdoa = (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT
    fix = solve_fix(LLA3, tdoa, tdoa_sigma_s=[2e-8] * 3)
    m = len(pairs)
    return TDOAResult(
        fix=fix,
        station_names=list(NAMES),
        pair_idx=pairs,
        tgt_delay_samples=np.zeros(m),
        ref_delay_samples=np.zeros((m, 2)),
        clock_offset_samples=np.zeros(m),
        corrected_tdoa_samples=tdoa * 2e6,
        tdoa_seconds=tdoa,
        quality=np.full(m, 50.0),
        peak_value=np.ones(m),
        tdoa_std_s=np.full(m, 2e-8),
        warnings=["example warning"],
        velocity_enu=np.array([30.0, 40.0, 0.0]),
    )


def test_ellipse_ring_geometry():
    center = np.array([41.3, -96.0, 350.0])
    ring = ellipse_ring(center, 200.0, 80.0, 30.0, k_sigma=2.0)
    assert ring[0] == ring[-1]  # closed
    # Every vertex's ENU distance from the center lies between the
    # scaled semi-minor and semi-major.
    for lon, lat in ring[:-1]:
        en = lla_to_enu(np.array([lat, lon, center[2]]), center)[:2]
        r = np.linalg.norm(en)
        assert 2.0 * 80.0 - 1.0 <= r <= 2.0 * 200.0 + 1.0
    # t=0 lies on the major axis: azimuth 30 deg east of north.
    lon0, lat0 = ring[0]
    e, n = lla_to_enu(np.array([lat0, lon0, center[2]]), center)[:2]
    az = np.degrees(np.arctan2(e, n)) % 360.0
    assert abs(az - 30.0) < 1.0
    assert abs(np.hypot(e, n) - 400.0) < 1.0


def test_ellipse_ring_winding_and_antimeridian():
    """RFC 7946 §3.1.6: exterior rings wind counterclockwise and close
    exactly; a ring straddling ±180° must stay continuous (unwrapped),
    not jump 360° mid-ring into a globe-wrapping polygon."""
    ring = ellipse_ring(np.array([41.3, -96.0, 350.0]), 200.0, 80.0, 30.0)
    # Shoelace signed area in lon/lat degrees: positive = CCW.
    xy = np.asarray(ring)
    area2 = float(np.sum(
        xy[:-1, 0] * xy[1:, 1] - xy[1:, 0] * xy[:-1, 1]
    ))
    assert area2 > 0.0
    assert ring[0] == ring[-1]

    ring_am = ellipse_ring(
        np.array([0.0, 179.9999, 0.0]), 5000.0, 3000.0, 10.0
    )
    lons = np.asarray([p[0] for p in ring_am])
    assert np.abs(np.diff(lons)).max() < 1.0, "360-degree jump mid-ring"


def test_result_feature_collection():
    res = _result()
    fc = result_feature_collection(
        res, LLA3, NAMES,
        ref_tx_lla=np.array([41.257, -95.955, 349.0]),
    )
    assert fc["type"] == "FeatureCollection"
    kinds = [f["properties"]["kind"] for f in fc["features"]]
    assert kinds.count("station") == 3
    assert "reference_tx" in kinds
    assert kinds.count("error_ellipse") == 2
    assert "course" in kinds  # velocity present
    fix = next(f for f in fc["features"] if f["properties"]["kind"] == "fix")
    lon, lat, _ = fix["geometry"]["coordinates"]
    # RFC 7946: [lon, lat] — a swap would put 41 in the lon slot.
    assert abs(lat - TX[0]) < 0.01 and abs(lon - TX[1]) < 0.01
    assert fix["properties"]["warnings"] == ["example warning"]
    assert abs(fix["properties"]["speed_mps"] - 50.0) < 0.1
    assert abs(fix["properties"]["heading_deg"] - 36.87) < 0.5
    course = next(f for f in fc["features"]
                  if f["properties"]["kind"] == "course")
    a, b = course["geometry"]["coordinates"]
    # 50 m/s for 60 s = 3 km lead.
    lead = lla_to_enu(
        np.array([b[1], b[0], TX[2]]), np.array([a[1], a[0], TX[2]])
    )[:2]
    assert abs(np.linalg.norm(lead) - 3000.0) < 10.0
    # Round-trips through the json module.
    import json

    json.loads(json.dumps(fc))


def test_tracks_feature_collection():
    st = lla_to_ecef(LLA3)
    pairs = station_pairs(3)
    d = np.linalg.norm(st - lla_to_ecef(TX), axis=-1)
    tdoa = (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT
    tracker = TargetTracker(LLA3)
    for k in range(3):
        tracker.update(float(k), {"t": tdoa})
    fc = tracks_feature_collection(
        tracker, LLA3, NAMES,
        history={"t": [[41.30, -96.03], [41.31, -96.02]]},
    )
    kinds = [f["properties"]["kind"] for f in fc["features"]]
    assert kinds.count("station") == 3
    assert "track" in kinds and "trail" in kinds
    tr = next(f for f in fc["features"] if f["properties"]["kind"] == "track")
    assert tr["properties"]["n_updates"] == 3
    lon, lat, _ = tr["geometry"]["coordinates"]
    assert abs(lat - TX[0]) < 0.01 and abs(lon - TX[1]) < 0.01
    trail = next(f for f in fc["features"]
                 if f["properties"]["kind"] == "trail")
    assert trail["geometry"]["coordinates"][0] == [-96.03, 41.30]
    # No calibrated window covariances -> no track ellipse exported.
    assert "ellipse_1sigma_m" not in tr["properties"]
    assert "track_error_ellipse" not in kinds


def test_tracks_feature_collection_kalman_ellipse():
    """A Kalman track (windows carried cov_en) exports its own 1σ
    covariance: ellipse props on the track point + a polygon ring."""
    st = lla_to_ecef(LLA3)
    pairs = station_pairs(3)
    d = np.linalg.norm(st - lla_to_ecef(TX), axis=-1)
    tdoa = (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT
    tracker = TargetTracker(LLA3)
    p0 = lla_to_enu(TX, tracker.origin)
    for k in range(3):
        tracker.update(float(k), {"t": tdoa}, positions_enu={"t": p0},
                       covs_en={"t": np.diag([400.0, 100.0])})
    fc = tracks_feature_collection(tracker, LLA3, NAMES)
    tr = next(f for f in fc["features"] if f["properties"]["kind"] == "track")
    ell = tr["properties"]["ellipse_1sigma_m"]
    assert ell["semi_major"] >= ell["semi_minor"] > 0.0
    ring = next(f for f in fc["features"]
                if f["properties"]["kind"] == "track_error_ellipse")
    coords = np.asarray(ring["geometry"]["coordinates"][0])
    assert coords.shape[1] == 2 and len(coords) >= 16
    # Ring centered on the track position (lon, lat order).
    lon, lat, _ = tr["geometry"]["coordinates"]
    assert abs(coords[:, 0].mean() - lon) < 1e-3
    assert abs(coords[:, 1].mean() - lat) < 1e-3
