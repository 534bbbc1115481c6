"""Multilateration solver tests: exact synthetic TDOAs must reproduce the
planted transmitter (the reference solver dropped the third pair and was
never tested — processor.go:962-968)."""

import numpy as np
import jax.numpy as jnp

from tdoa_tpu.geo import lla_to_enu
from tdoa_tpu.solve import solve_fix, solve_tdoa_enu, station_pairs
from tdoa_tpu.utils.constants import SPEED_OF_LIGHT


def _exact_tdoas(station_lla, tx_lla):
    from tdoa_tpu.geo import lla_to_ecef

    st = lla_to_ecef(station_lla)
    tx = lla_to_ecef(tx_lla)
    d = np.linalg.norm(st - tx, axis=-1)
    pairs = station_pairs(len(station_lla))
    return (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT, pairs


def test_recovers_planted_transmitter(omaha_stations):
    s = omaha_stations
    tdoas, _ = _exact_tdoas(s["station_lla"], s["tgt_tx_lla"])
    fix = solve_fix(s["station_lla"], tdoas)
    # KEVO sits inside the network: metre-level recovery expected.
    err_en = lla_to_enu(
        np.array([fix.lat, fix.lon, s["tgt_tx_lla"][2]]), s["tgt_tx_lla"]
    )
    assert np.linalg.norm(err_en[:2]) < 5.0
    assert fix.rms_residual_m < 1.0


def test_exterior_transmitter_ghosts(omaha_stations):
    """Outside the network the hyperbolae intersect twice; multi-start must
    surface the true position among the candidates, each with ~zero
    residual (the ghost is a property of 3-station TDOA, not the solver)."""
    s = omaha_stations
    tx = np.array([41.10, -96.20, 350.0])  # outside the triangle
    tdoas, _ = _exact_tdoas(s["station_lla"], tx)
    fix = solve_fix(s["station_lla"], tdoas)
    assert fix.rms_residual_m < 1.0  # reported fix satisfies the TDOAs
    errs = [
        np.linalg.norm(lla_to_enu(np.array([c[0], c[1], tx[2]]), tx)[:2])
        for c in fix.candidates_lla
    ]
    assert min(errs) < 100.0  # truth is among the candidates


def test_noisy_tdoas_with_weights(omaha_stations):
    s = omaha_stations
    tdoas, _ = _exact_tdoas(s["station_lla"], s["tgt_tx_lla"])
    rng = np.random.default_rng(0)
    noisy = tdoas + rng.normal(0, 25e-9, tdoas.shape)  # 25 ns ≈ 0.05 sample
    fix = solve_fix(s["station_lla"], noisy, weights=[1.0, 1.0, 1.0])
    err_en = lla_to_enu(
        np.array([fix.lat, fix.lon, s["tgt_tx_lla"][2]]), s["tgt_tx_lla"]
    )
    assert np.linalg.norm(err_en[:2]) < 150.0


def test_solver_is_jit_batched(omaha_stations):
    """vmap over a batch of TDOA sets — the multi-target tracking shape."""
    import jax

    s = omaha_stations
    origin = s["station_lla"].mean(axis=0)
    enu = jnp.asarray(lla_to_enu(s["station_lla"], origin), jnp.float32)
    pairs = jnp.asarray(station_pairs(3))

    tdoas, _ = _exact_tdoas(s["station_lla"], s["tgt_tx_lla"])
    rd = jnp.asarray(tdoas * SPEED_OF_LIGHT, jnp.float32)
    batch = jnp.stack([rd, rd * 1.001, rd * 0.999])

    pos, rms = jax.vmap(lambda r: solve_tdoa_enu(enu, pairs, r))(batch)
    assert pos.shape == (3, 3)
    truth_enu = lla_to_enu(s["tgt_tx_lla"], origin)
    assert np.linalg.norm(np.asarray(pos[0][:2]) - truth_enu[:2]) < 10.0


def test_antimeridian_network():
    """A network straddling ±180° must get a local ENU origin (an
    arithmetic longitude mean would put it ~120° away) and recover a
    planted transmitter."""
    stations = np.array([
        [52.0, 179.92, 10.0],
        [52.08, -179.95, 20.0],
        [51.95, -179.88, 5.0],
    ])
    tx = np.array([52.02, 179.99, 0.0])
    from tdoa_tpu.geo import lla_to_ecef

    st_ecef = lla_to_ecef(stations)
    d = np.linalg.norm(st_ecef - lla_to_ecef(tx), axis=-1)
    pairs = station_pairs(3)
    tdoas = (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT
    fix = solve_fix(stations, tdoas)
    assert abs(fix.lat - tx[0]) < 0.01
    # Longitude distance modulo 360.
    dlon = (fix.lon - tx[1] + 180.0) % 360.0 - 180.0
    assert abs(dlon) < 0.02
    assert fix.rms_residual_m < 10.0


def test_gated_pair_does_not_tighten_ellipse():
    """A zero-weight (quality-gated) pair must not shrink the reported
    covariance even if its sigma is tiny."""
    stations = np.array([
        [41.30, -96.02, 300.0],
        [41.36, -95.95, 310.0],
        [41.25, -95.90, 305.0],
    ])
    tx = np.array([41.31, -95.97, 300.0])
    from tdoa_tpu.geo import lla_to_ecef

    d = np.linalg.norm(lla_to_ecef(stations) - lla_to_ecef(tx), axis=-1)
    pairs = station_pairs(3)
    tdoas = (d[pairs[:, 1]] - d[pairs[:, 0]]) / SPEED_OF_LIGHT
    sig = np.array([1e-8, 1e-8, 1e-12])  # third pair: absurdly confident
    full = solve_fix(stations, tdoas, weights=[1.0, 1.0, 1.0],
                     tdoa_sigma_s=sig)
    gated = solve_fix(stations, tdoas, weights=[1.0, 1.0, 0.0],
                      tdoa_sigma_s=sig)
    # Gating the overconfident pair must grow the ellipse.
    assert gated.ellipse[0] > full.ellipse[0] * 1.3


def test_power_ranking_picks_true_candidate():
    """Two timing-equivalent candidates, amplitudes planted by 1/r at
    the TRUE one: the path-loss consistency score must prefer it, be
    invariant to overall transmit power, and survive per-station gain
    differences when the REF block is supplied for calibration."""
    from tdoa_tpu.geo import lla_to_ecef
    from tdoa_tpu.solve import rank_candidates_by_power

    stations = np.array([
        [41.30, -96.02, 300.0],
        [41.36, -95.95, 310.0],
        [41.25, -95.90, 305.0],
    ])
    true_c = np.array([41.32, -95.99, 320.0])
    ghost_c = np.array([41.10, -96.20, 320.0])
    ref_tx = np.array([41.257, -95.955, 349.0])

    d_true = np.linalg.norm(
        lla_to_ecef(stations) - lla_to_ecef(true_c), axis=-1)
    d_ref = np.linalg.norm(
        lla_to_ecef(stations) - lla_to_ecef(ref_tx), axis=-1)
    cands = np.stack([ghost_c, true_c])  # ghost listed first

    # Equal gains, arbitrary TX power: score is scale-invariant.
    for tx_power in (1.0, 37.0):
        p_tgt = tx_power / d_true**2
        s = rank_candidates_by_power(cands, stations, p_tgt)
        assert s[1] < 0.02 and s[0] > s[1] + 0.1, s

    # Per-station gains skew raw powers; REF calibration removes them.
    gains = np.array([1.0, 6.3, 0.2])
    p_tgt = gains / d_true**2
    p_ref = 5.0 * gains / d_ref**2
    raw = rank_candidates_by_power(cands, stations, p_tgt)
    cal = rank_candidates_by_power(
        cands, stations, p_tgt, ref_power=p_ref, ref_tx_lla=ref_tx)
    assert raw[1] > 0.1  # uncalibrated: gains corrupt the profile
    assert cal[1] < 0.02 and cal[0] > cal[1] + 0.1, (raw, cal)


def test_refit_to_candidate_swaps_and_repropagates(omaha_stations):
    """refit_to_candidate moves the fix to candidate k, reorders the
    candidate arrays, and recomputes the ellipse at the new geometry."""
    from tdoa_tpu.solve import refit_to_candidate

    stations = omaha_stations["station_lla"]
    tx = np.array([41.10, -96.20, 350.0])  # outside the triangle: ghosts
    tdoas, pairs = _exact_tdoas(stations, tx)
    sig = np.full(3, 2e-9)
    fix = solve_fix(stations, tdoas, tdoa_sigma_s=sig)
    assert fix.candidates_lla is not None and len(fix.candidates_lla) > 1
    new = refit_to_candidate(fix, 1, stations, pairs, tdoa_sigma_s=sig)
    np.testing.assert_allclose(
        [new.lat, new.lon], fix.candidates_lla[1][:2], atol=1e-9)
    np.testing.assert_allclose(
        new.candidates_lla[1], fix.candidates_lla[0], atol=1e-12)
    assert new.rms_residual_m == fix.candidates_rms[1]
    assert new.ellipse is not None and np.isfinite(new.ellipse[0])
    # The original is untouched (dataclasses.replace semantics).
    assert fix.candidates_rms[0] <= fix.candidates_rms[1]
