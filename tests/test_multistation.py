"""Beyond the 3-station minimum: 4-5 station networks, 3D solves, and
redundant-pair robustness (the reference was hard-wired to exactly the
first two pairs; the rebuild must scale with C(n,2))."""

import numpy as np
import jax.numpy as jnp

from tdoa_tpu.geo import lla_to_ecef, lla_to_enu
from tdoa_tpu.pipeline import TDOAProcessor
from tdoa_tpu.pipeline.processor import ProcessorConfig
from tdoa_tpu.io.stations import Station, StationTable
from tdoa_tpu.sim import SimScene, simulate_scene
from tdoa_tpu.solve import solve_fix, station_pairs
from tdoa_tpu.utils.constants import SPEED_OF_LIGHT

FIVE_LLA = np.array(
    [
        [41.18660274289527, -95.96064116595667, 355.69],
        [41.24669616513154, -96.08366304481238, 329.0],
        [41.32916620016985, -96.03513381562004, 373.18],
        [41.26, -95.90, 340.0],
        [41.36, -96.12, 360.0],
    ]
)
NAMES = ("kx0u", "n3pay", "kf0mtl", "st4", "st5")


def _exact_tdoas(lla, tx):
    st = lla_to_ecef(lla)
    d = np.linalg.norm(st - lla_to_ecef(tx), axis=-1)
    p = station_pairs(len(lla))
    return (d[p[:, 1]] - d[p[:, 0]]) / SPEED_OF_LIGHT, p


def test_five_station_solve_all_pairs():
    tx = np.array([41.28, -96.01, 350.0])
    tdoas, p = _exact_tdoas(FIVE_LLA, tx)
    assert len(p) == 10  # C(5,2)
    fix = solve_fix(FIVE_LLA, tdoas)
    err = np.linalg.norm(
        lla_to_enu(np.array([fix.lat, fix.lon, tx[2]]), tx)[:2]
    )
    assert err < 5.0


def test_five_station_3d_solve():
    """With 5 stations and elevation spread, z becomes weakly observable."""
    tx = np.array([41.28, -96.01, 1850.0])  # airborne transmitter
    tdoas, _ = _exact_tdoas(FIVE_LLA, tx)
    fix = solve_fix(FIVE_LLA, tdoas, solve_z=True)
    err2d = np.linalg.norm(
        lla_to_enu(np.array([fix.lat, fix.lon, tx[2]]), tx)[:2]
    )
    assert err2d < 50.0
    # Flat networks observe altitude poorly; just demand the right side
    # of the ground.
    assert fix.elev > 600.0


def test_four_station_pipeline_end_to_end():
    names = NAMES[:4]
    lla = FIVE_LLA[:4]
    scene = SimScene(
        station_names=names,
        station_lla=lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=np.array([41.30888549464701, -96.02619229605524, 356.0]),
        block_len=1 << 16,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6, -2e-6]),
        seed=41,
    )
    captures, truth = simulate_scene(scene)
    table = StationTable(
        stations=[Station(n, *row) for n, row in zip(names, lla)],
        reference_tx=Station("162400000", *scene.ref_tx_lla),
    )
    proc = TDOAProcessor(
        ProcessorConfig(
            ref_freq=scene.ref_freq, tgt_freq=scene.tgt_freq,
            seg_len=None, max_lag=512,
        ),
        table,
    )
    res = proc.process_captures({n: captures[n] for n in names})
    assert len(res.pair_idx) == 6  # C(4,2)
    np.testing.assert_allclose(
        res.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=0.5
    )
    err = np.linalg.norm(
        lla_to_enu(
            np.array([res.fix.lat, res.fix.lon, scene.tgt_tx_lla[2]]),
            scene.tgt_tx_lla,
        )[:2]
    )
    assert err < 150.0


def test_broken_station_detected_and_survived():
    """Failure injection: one of four stations returns pure noise (dead
    antenna). The pipeline must flag its pairs as weak and the
    quality-weighted solve must still land, carried by the healthy
    pairs — recovery the reference (which hard-used the first two pairs)
    had no path to."""
    import jax

    names = NAMES[:4]
    lla = FIVE_LLA[:4]
    scene = SimScene(
        station_names=names,
        station_lla=lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=np.array([41.30888549464701, -96.02619229605524, 356.0]),
        block_len=1 << 16,
        seed=47,
    )
    captures, truth = simulate_scene(scene)
    # Break station 4: pure noise in every block.
    keys = jax.random.split(jax.random.PRNGKey(99), 6)
    broken = tuple(
        0.1 * (jax.random.normal(keys[2 * b], (1 << 16,))
               + 1j * jax.random.normal(keys[2 * b + 1], (1 << 16,))).astype(
            jnp.complex64)
        for b in range(3)
    )
    caps = {n: captures[n] for n in names}
    caps["st4"] = broken

    table = StationTable(
        stations=[Station(n, *row) for n, row in zip(names, lla)],
        reference_tx=Station("162400000", *scene.ref_tx_lla),
    )
    proc = TDOAProcessor(
        ProcessorConfig(
            ref_freq=scene.ref_freq, tgt_freq=scene.tgt_freq,
            seg_len=1 << 13, max_lag=512,
        ),
        table,
    )
    res = proc.process_captures(caps)
    # Broken-station pairs flagged...
    assert any("weak correlation" in w for w in res.warnings)
    # ...and their quality is far below the healthy pairs'.
    st4_pairs = [k for k, (i, j) in enumerate(res.pair_idx)
                 if "st4" in (res.station_names[i], res.station_names[j])]
    healthy = [k for k in range(len(res.pair_idx)) if k not in st4_pairs]
    assert max(res.quality[k] for k in st4_pairs) < min(
        res.quality[k] for k in healthy
    )
    # Fix still lands near the planted transmitter.
    err = np.linalg.norm(
        lla_to_enu(
            np.array([res.fix.lat, res.fix.lon, scene.tgt_tx_lla[2]]),
            scene.tgt_tx_lla,
        )[:2]
    )
    assert err < 500.0


def _five_station_scene(seed=53):
    scene = SimScene(
        station_names=NAMES,
        station_lla=FIVE_LLA,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=np.array([41.30888549464701, -96.02619229605524, 356.0]),
        block_len=1 << 16,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6, -2e-6, 7e-6]),
        seed=seed,
    )
    captures, truth = simulate_scene(scene)
    table = StationTable(
        stations=[Station(n, *row) for n, row in zip(NAMES, FIVE_LLA)],
        reference_tx=Station("162400000", *scene.ref_tx_lla),
    )
    return scene, {n: captures[n] for n in NAMES}, table


def _roll_tgt(caps, name, shift):
    """Plant a consistent timing bias at one station: delay its TGT
    block by ``shift`` samples (REF blocks untouched, so the clock
    correction stays honest and every pair involving the station comes
    out ``shift`` samples wrong — the signature of a multipath lock)."""
    r1, tgt, r2 = caps[name]
    caps = dict(caps)
    caps[name] = (r1, jnp.roll(tgt, shift), r2)
    return caps


def test_outlier_station_excluded_five_stations():
    """Leave-one-station-out rejection: with 5 stations, the uniquely
    identifying exclusion is found, the station is dropped, and the fix
    recovers the planted transmitter."""
    scene, caps, table = _five_station_scene()
    caps = _roll_tgt(caps, "st4", 160)  # 80 us bias ~ 24 km
    proc = TDOAProcessor(
        ProcessorConfig(
            ref_freq=scene.ref_freq, tgt_freq=scene.tgt_freq,
            seg_len=None, max_lag=512,
        ),
        table,
    )
    res = proc.process_captures(caps)
    assert res.excluded_stations == ["st4"], res.warnings
    assert any("excluded as outlier" in w for w in res.warnings)
    err = np.linalg.norm(
        lla_to_enu(
            np.array([res.fix.lat, res.fix.lon, scene.tgt_tx_lla[2]]),
            scene.tgt_tx_lla,
        )[:2]
    )
    assert err < 150.0, err
    # Opt-out control: rejection disabled leaves the corrupted set in
    # place — inconsistency flagged, nothing excluded, fix dragged.
    proc_off = TDOAProcessor(
        ProcessorConfig(
            ref_freq=scene.ref_freq, tgt_freq=scene.tgt_freq,
            seg_len=None, max_lag=512, outlier_rejection=False,
        ),
        table,
    )
    res_off = proc_off.process_captures(caps)
    assert res_off.excluded_stations is None
    assert any("internally inconsistent" in w for w in res_off.warnings)


def test_two_outliers_excluded_six_stations():
    """With 6 stations, two corrupted stations are identified by the
    pair-exclusion round (no single exclusion restores consistency; a
    unique pair of exclusions does) and both dropped from the fix."""
    six_lla = np.vstack([FIVE_LLA, [41.20, -96.16, 345.0]])
    six_names = NAMES + ("st6",)
    scene = SimScene(
        station_names=six_names,
        station_lla=six_lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=np.array([41.30888549464701, -96.02619229605524, 356.0]),
        block_len=1 << 16,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6, -2e-6, 7e-6, -4e-6]),
        seed=59,
    )
    captures, _ = simulate_scene(scene)
    table = StationTable(
        stations=[Station(n, *row) for n, row in zip(six_names, six_lla)],
        reference_tx=Station("162400000", *scene.ref_tx_lla),
    )
    caps = {n: captures[n] for n in six_names}
    caps = _roll_tgt(caps, "st4", 160)
    caps = _roll_tgt(caps, "n3pay", -120)
    proc = TDOAProcessor(
        ProcessorConfig(
            ref_freq=scene.ref_freq, tgt_freq=scene.tgt_freq,
            seg_len=None, max_lag=512,
        ),
        table,
    )
    res = proc.process_captures(caps)
    assert res.excluded_stations is not None
    assert sorted(res.excluded_stations) == ["n3pay", "st4"], res.warnings
    err = np.linalg.norm(
        lla_to_enu(
            np.array([res.fix.lat, res.fix.lon, scene.tgt_tx_lla[2]]),
            scene.tgt_tx_lla,
        )[:2]
    )
    assert err < 150.0, err


def test_two_outlier_stations_inconclusive():
    """Two corrupted stations of five: no single exclusion restores
    consistency, so the test must refuse to pick (advisory warning, no
    exclusion) rather than drop an arbitrary station."""
    scene, caps, table = _five_station_scene()
    caps = _roll_tgt(caps, "st4", 160)
    caps = _roll_tgt(caps, "n3pay", -120)
    proc = TDOAProcessor(
        ProcessorConfig(
            ref_freq=scene.ref_freq, tgt_freq=scene.tgt_freq,
            seg_len=None, max_lag=512,
        ),
        table,
    )
    res = proc.process_captures(caps)
    assert res.excluded_stations is None
    assert any("leave-one-station-out test is inconclusive" in w
               for w in res.warnings), res.warnings
    assert any("internally inconsistent" in w for w in res.warnings)


def test_one_bad_pair_downweighted():
    """Redundancy pays: with 5 stations, one corrupted TDOA (zero weight)
    must not break the fix — the exact failure mode the reference's
    2-pair solver could not survive."""
    tx = np.array([41.30, -96.04, 352.0])
    tdoas, p = _exact_tdoas(FIVE_LLA, tx)
    bad = tdoas.copy()
    bad[3] += 30e-6  # a wildly wrong measurement
    w = np.ones(len(p))
    w[3] = 0.0
    fix = solve_fix(FIVE_LLA, bad, weights=w)
    err = np.linalg.norm(
        lla_to_enu(np.array([fix.lat, fix.lon, tx[2]]), tx)[:2]
    )
    assert err < 10.0
