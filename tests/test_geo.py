"""Geodesy tests, anchored to the reference deployment's published
baselines (PROJECT_NOTES.md:25-27)."""

import numpy as np

from tdoa_tpu.geo import (
    lla_to_ecef,
    ecef_to_lla,
    lla_to_enu,
    enu_to_lla,
    baselines,
)


def test_lla_ecef_roundtrip():
    rng = np.random.default_rng(0)
    lla = np.stack(
        [
            rng.uniform(-80, 80, 50),
            rng.uniform(-179, 179, 50),
            rng.uniform(-100, 5000, 50),
        ],
        axis=-1,
    )
    back = ecef_to_lla(lla_to_ecef(lla))
    np.testing.assert_allclose(back[:, :2], lla[:, :2], atol=1e-9)
    np.testing.assert_allclose(back[:, 2], lla[:, 2], atol=1e-5)


def test_known_baselines(omaha_stations):
    # PROJECT_NOTES.md: kx0u–n3pay 12.29 km, kx0u–kf0mtl 17.02 km,
    # n3pay–kf0mtl 10.02 km.
    bl = dict(baselines(omaha_stations["station_lla"]))
    assert abs(bl[(0, 1)] - 12_290) < 60
    assert abs(bl[(0, 2)] - 17_020) < 60
    assert abs(bl[(1, 2)] - 10_020) < 60


def test_enu_roundtrip(omaha_stations):
    lla = omaha_stations["station_lla"]
    origin = lla.mean(axis=0)
    enu = lla_to_enu(lla, origin)
    back = enu_to_lla(enu, origin)
    np.testing.assert_allclose(back, lla, atol=1e-7)
    # ENU distances match ECEF chord distances for short baselines.
    d01 = np.linalg.norm(enu[0] - enu[1])
    assert abs(d01 - 12_290) < 60


def test_lla_ecef_roundtrip_poles():
    """Height must survive the round trip at and near the poles, where
    the naive h = p/cos(lat) − N blows up."""
    pts = np.array([
        [90.0, 0.0, 500.0],
        [-90.0, 45.0, -100.0],
        [89.9999, 10.0, 123.0],
        [0.0, 180.0, 42.0],
    ])
    rt = ecef_to_lla(lla_to_ecef(pts))
    np.testing.assert_allclose(rt[:, 0], pts[:, 0], atol=1e-9)
    np.testing.assert_allclose(rt[:, 2], pts[:, 2], atol=1e-6)
