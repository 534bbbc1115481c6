"""FDOA velocity solver (solve/fdoa.py) + tracker integration."""

import numpy as np

from tdoa_tpu.pipeline.streaming import TargetTracker
from tdoa_tpu.solve.fdoa import expected_fdoa_hz, solve_velocity_enu
from tdoa_tpu.solve.multilateration import station_pairs


ST = np.array(
    [[0.0, 0.0, 0.0], [12000.0, 2000.0, 20.0], [4000.0, 10000.0, -10.0],
     [-6000.0, 7000.0, 5.0]]
)
PAIRS = station_pairs(4)
FC = 101.9e6


def test_velocity_roundtrip_exact():
    pos = np.array([3000.0, 4000.0, 0.0])
    vel = np.array([25.0, -12.0, 0.0])
    nu = expected_fdoa_hz(ST, PAIRS, pos, vel, FC)
    sol = solve_velocity_enu(ST, PAIRS, pos, nu, FC)
    np.testing.assert_allclose(sol.vel_enu, vel, atol=1e-9)
    assert sol.residual_hz < 1e-12
    assert abs(sol.speed - np.linalg.norm(vel)) < 1e-9


def test_velocity_noisy_weighted():
    rng = np.random.default_rng(3)
    pos = np.array([5000.0, 1000.0, 0.0])
    vel = np.array([-40.0, 30.0, 0.0])
    nu = expected_fdoa_hz(ST, PAIRS, pos, vel, FC)
    noisy = nu + rng.normal(0.0, 0.5, nu.shape)  # 0.5 Hz CAF noise
    sol = solve_velocity_enu(ST, PAIRS, pos, noisy, FC,
                             weights=np.ones(len(PAIRS)))
    # dnu/dv ~ fc/c ~ 0.34 Hz per m/s; 0.5 Hz noise -> few-m/s error.
    assert np.linalg.norm(sol.vel_enu - vel) < 10.0
    assert sol.residual_hz < 2.0


def test_velocity_sign_convention_matches_caf():
    """ops/caf.py: positive nu means station j up-shifted = emitter
    closing on j faster than on i. Emitter moving straight at station 1
    (pair (0,1): j=1) must produce positive nu on that pair."""
    pos = np.array([3000.0, 1000.0, 0.0])
    to_st1 = ST[1] - pos
    vel = 50.0 * to_st1 / np.linalg.norm(to_st1)
    nu = expected_fdoa_hz(ST, PAIRS, pos, vel, FC)
    k01 = [i for i, p in enumerate(PAIRS) if tuple(p) == (0, 1)][0]
    assert nu[k01] > 0


def test_tracker_fdoa_gives_instant_velocity():
    """With FDOA the very first window knows the velocity; without it
    the alpha-beta tracker needs several windows to converge."""
    lla = np.array(
        [[41.18, -95.96, 355.0], [41.24, -96.08, 329.0],
         [41.32, -96.03, 373.0]]
    )
    pairs = station_pairs(3)
    from tdoa_tpu.geo import lla_to_enu
    tr = TargetTracker(lla)
    st_enu = np.asarray(tr.enu, np.float64)
    pos = np.array([2000.0, 3000.0, 0.0])
    vel = np.array([35.0, -20.0, 0.0])

    def tdoas(p):
        d = np.linalg.norm(st_enu - p[None, :], axis=-1)
        return (d[pairs[:, 1]] - d[pairs[:, 0]]) / 299792458.0

    nu = expected_fdoa_hz(st_enu, pairs, pos, vel, FC)
    tracks = tr.update(0.0, {"t1": tdoas(pos)}, fdoa_hz={"t1": nu},
                       carrier_hz=FC)
    v0 = tracks["t1"].vel_enu
    assert np.linalg.norm(v0 - vel) < 2.0  # first window, already there

    tr2 = TargetTracker(lla)
    tr2.update(0.0, {"t1": tdoas(pos)})
    assert np.linalg.norm(tr2.tracks["t1"].vel_enu) < 1e-9  # knows nothing

    # And tracking a moving emitter with FDOA keeps velocity locked.
    for i in range(1, 4):
        p = pos + vel * (10.0 * i)
        nu = expected_fdoa_hz(st_enu, pairs, p, vel, FC)
        tr.update(10.0 * i, {"t1": tdoas(p)}, fdoa_hz={"t1": nu},
                  carrier_hz=FC)
    assert np.linalg.norm(tr.tracks["t1"].vel_enu - vel) < 2.0


def test_e2e_moving_emitter_velocity_recovery():
    """Full moving-emitter loop: simulated captures with a linearly
    drifting TGT delay (per-station Doppler) -> CAF delay-Doppler per
    pair -> FDOA least squares -> emitter velocity, within ~1 m/s."""
    import jax.numpy as jnp

    from tdoa_tpu.geo import lla_to_enu
    from tdoa_tpu.ops.caf import caf_pairs
    from tdoa_tpu.ops.cplx import C, from_complex
    from tdoa_tpu.sim.scene import SimScene, simulate_scene

    names = ("a", "b", "c")
    lla = np.array(
        [[41.18, -95.96, 355.0], [41.24, -96.08, 329.0],
         [41.32, -96.03, 373.0]]
    )
    tgt = np.array([41.30, -96.02, 356.0])
    vel = np.array([150.0, -80.0, 0.0])
    sc = SimScene(
        station_names=names, station_lla=lla,
        ref_tx_lla=np.array([41.25, -95.95, 349.0]),
        tgt_tx_lla=tgt, block_len=1 << 18,
        tgt_velocity_enu=vel, seed=5,
    )
    caps, truth = simulate_scene(sc)
    pairs = station_pairs(3)
    x = C(
        jnp.stack([from_complex(caps[n][1]).re for n in names]),
        jnp.stack([from_complex(caps[n][1]).im for n in names]),
    )
    res = caf_pairs(x, jnp.asarray(pairs), sample_rate=sc.sample_rate,
                    max_lag=256, seg_len=1 << 13, n_doppler=64)
    nu = np.asarray(res.doppler_hz)
    # CAF Dopplers match the scene's truth table.
    np.testing.assert_allclose(nu, truth.tgt_fdoa_hz, atol=1.0)
    # Delays still match geometry (motion must not break timing).
    np.testing.assert_allclose(
        np.asarray(res.delay), truth.tgt_tdoa_samples, atol=0.5
    )
    origin = lla.mean(axis=0)
    sol = solve_velocity_enu(
        lla_to_enu(lla, origin), pairs, lla_to_enu(tgt, origin),
        nu, sc.tgt_freq,
    )
    assert np.linalg.norm(sol.vel_enu - vel) < 3.0
    assert sol.residual_hz < 1.0


def test_static_scene_has_zero_fdoa_truth():
    from tdoa_tpu.sim.scene import SimScene, compute_truth

    sc = SimScene(
        station_names=("a", "b", "c"),
        station_lla=np.array(
            [[41.18, -95.96, 355.0], [41.24, -96.08, 329.0],
             [41.32, -96.03, 373.0]]
        ),
        ref_tx_lla=np.array([41.25, -95.95, 349.0]),
        tgt_tx_lla=np.array([41.30, -96.02, 356.0]),
    )
    t = compute_truth(sc)
    np.testing.assert_allclose(t.tgt_fdoa_hz, 0.0)
    np.testing.assert_allclose(t.tgt_delay_rate, 0.0)


def test_drift_doppler_measured_by_caf():
    """drift_doppler=True models the LO-offset aspect of clock drift;
    the CAF must measure the implied differential Doppler
    (~f_tgt * d_ppm * 1e-6 per pair) even with no emitter motion."""
    import jax.numpy as jnp

    from tdoa_tpu.ops.caf import caf_pairs
    from tdoa_tpu.ops.cplx import C, from_complex
    from tdoa_tpu.sim.scene import SimScene, simulate_scene

    names = ("a", "b", "c")
    drifts = np.array([0.4, -0.2, 0.1])  # ppm -> ~61/-31/15 Hz at VHF
    sc = SimScene(
        station_names=names,
        station_lla=np.array(
            [[41.18, -95.96, 355.0], [41.24, -96.08, 329.0],
             [41.32, -96.03, 373.0]]
        ),
        ref_tx_lla=np.array([41.25, -95.95, 349.0]),
        tgt_tx_lla=np.array([41.30, -96.02, 356.0]),
        block_len=1 << 18,
        clock_drifts_ppm=drifts,
        drift_doppler=True,
        seed=9,
    )
    caps, truth = simulate_scene(sc)
    expected = -sc.tgt_freq * 1e-6 * (
        drifts[truth.pair_idx[:, 1]] - drifts[truth.pair_idx[:, 0]]
    )
    np.testing.assert_allclose(truth.tgt_fdoa_hz, expected, atol=1e-9)
    pairs = truth.pair_idx
    x = C(
        jnp.stack([from_complex(caps[n][1]).re for n in names]),
        jnp.stack([from_complex(caps[n][1]).im for n in names]),
    )
    res = caf_pairs(x, jnp.asarray(pairs), sample_rate=sc.sample_rate,
                    max_lag=256, seg_len=1 << 13, n_doppler=64)
    np.testing.assert_allclose(
        np.asarray(res.doppler_hz), expected, atol=2.0
    )


def test_processor_solve_velocity_e2e():
    """Full processor path on a moving emitter with imperfect clocks:
    --solve-velocity measures the CAF Doppler, deramp-and-correlates
    the TDOAs (motion smears the plain correlation), re-solves the fix,
    and least-squares the velocity with an honest uncertainty."""
    from tdoa_tpu.geo import lla_to_enu
    from tdoa_tpu.io.stations import Station, StationTable
    from tdoa_tpu.pipeline.processor import ProcessorConfig, TDOAProcessor
    from tdoa_tpu.sim.scene import SimScene, simulate_scene

    names = ("kx0u", "n3pay", "kf0mtl")
    lla = np.array(
        [[41.18660274289527, -95.96064116595667, 355.69],
         [41.24669616513154, -96.08366304481238, 329.0],
         [41.32916620016985, -96.03513381562004, 373.18]]
    )
    ref_tx = np.array([41.25703803095629, -95.95512763589404, 349.07])
    tgt = np.array([41.30888549464701, -96.02619229605524, 356.0])
    vel = np.array([150.0, -80.0, 0.0])
    sc = SimScene(
        station_names=names, station_lla=lla, ref_tx_lla=ref_tx,
        tgt_tx_lla=tgt, block_len=1 << 18, tgt_velocity_enu=vel,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]), seed=5,
    )
    caps, truth = simulate_scene(sc)
    table = StationTable(
        stations=[Station(n, *lla[i]) for i, n in enumerate(names)],
        reference_tx=Station("162400000", *ref_tx),
    )
    proc = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6, max_lag=512,
                        solve_velocity=True),
        table,
    )
    res = proc.process_captures({n: caps[n] for n in names})

    assert res.velocity_enu is not None
    # Velocity within a few m/s and consistent with its own 1-sigma.
    err = res.velocity_enu - vel
    assert np.linalg.norm(err) < 5.0, (res.velocity_enu, vel)
    assert res.velocity_sigma_enu is not None
    assert np.all(np.abs(err[:2]) < 5.0 * res.velocity_sigma_enu[:2] + 1.0)
    # Motion detected -> deramp path replaced the smeared plain fix.
    assert any("deramp-and-correlate" in w for w in res.warnings)
    fix_err = np.linalg.norm(
        lla_to_enu(np.array([res.fix.lat, res.fix.lon, tgt[2]]), tgt)[:2]
    )
    assert fix_err < 150.0, fix_err
    # And a static scene must not trip the motion path.
    sc2 = SimScene(
        station_names=names, station_lla=lla, ref_tx_lla=ref_tx,
        tgt_tx_lla=tgt, block_len=1 << 17,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]), seed=5,
    )
    caps2, _ = simulate_scene(sc2)
    res2 = proc.process_captures({n: caps2[n] for n in names})
    assert not any("deramp-and-correlate" in w for w in res2.warnings)
    assert np.linalg.norm(res2.velocity_enu) < 10.0


def test_joint_separation_moving_plus_static_emitter():
    """The hardest co-channel case: equal-power static interferer plus
    a 134 m/s mover. The mover's Doppler decorrelates the plain
    full-block correlation entirely (invisible to lag-only
    association); joint (lag, Doppler) association on the CAF surface
    plus per-emitter deramp refinement separates both, locates both,
    and attributes each its own velocity."""
    from tdoa_tpu.geo import lla_to_enu
    from tdoa_tpu.io.stations import Station, StationTable
    from tdoa_tpu.pipeline.processor import ProcessorConfig, TDOAProcessor
    from tdoa_tpu.sim.scene import SimScene, simulate_scene

    names = ("kx0u", "n3pay", "kf0mtl")
    lla = np.array(
        [[41.18660274289527, -95.96064116595667, 355.69],
         [41.24669616513154, -96.08366304481238, 329.0],
         [41.32916620016985, -96.03513381562004, 373.18]]
    )
    tgt = np.array([41.30888549464701, -96.02619229605524, 356.0])
    intf = np.array([41.05, -95.99, 340.0])
    vel = np.array([120.0, -60.0, 0.0])
    sc = SimScene(
        station_names=names, station_lla=lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=tgt, block_len=1 << 18, tgt_velocity_enu=vel,
        interferer_lla=intf, interferer_amplitude=1.0,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]), seed=5,
    )
    caps, _ = simulate_scene(sc)
    table = StationTable(
        stations=[Station(n, *lla[i]) for i, n in enumerate(names)],
        reference_tx=Station("162400000", 41.25703803095629,
                             -95.95512763589404, 349.07),
    )
    proc = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6, max_lag=512,
                        solve_velocity=True, multi_emitter=2),
        table,
    )
    res = proc.process_captures({n: caps[n] for n in names})
    assert res.emitters is not None and len(res.emitters) == 2

    def fix_dist(e, ref_lla):
        est = np.array([e.fix.lat, e.fix.lon, ref_lla[2]])
        return np.linalg.norm(lla_to_enu(est, ref_lla)[:2])

    mover = min(res.emitters, key=lambda e: fix_dist(e, tgt))
    static = min(res.emitters, key=lambda e: fix_dist(e, intf))
    assert mover is not static
    assert fix_dist(mover, tgt) < 1000.0
    assert fix_dist(static, intf) < 1000.0
    # Velocity attribution: the mover's ~134 m/s recovered within a few
    # m/s; the static one consistent with zero (its own sigma).
    assert mover.velocity_enu is not None
    assert np.linalg.norm(mover.velocity_enu - vel) < 10.0
    assert static.velocity_enu is not None
    sig = np.maximum(static.velocity_sigma_enu, 1.0)
    assert np.all(np.abs(static.velocity_enu[:2]) < 3.0 * sig[:2] + 2.0)


def test_joint_separation_four_stations():
    """Joint separation scales past the minimum network: 4 stations
    (6 pairs, 3 anchor pairs — exercises the hypothesis enumeration and
    cross-pair consistency beyond one cross pair)."""
    from tdoa_tpu.geo import lla_to_enu
    from tdoa_tpu.io.stations import Station, StationTable
    from tdoa_tpu.pipeline.processor import ProcessorConfig, TDOAProcessor
    from tdoa_tpu.sim.scene import SimScene, simulate_scene

    names = ("kx0u", "n3pay", "kf0mtl", "w0arp")
    lla = np.array(
        [[41.18660274289527, -95.96064116595667, 355.69],
         [41.24669616513154, -96.08366304481238, 329.0],
         [41.32916620016985, -96.03513381562004, 373.18],
         [41.21, -95.90, 345.0]]
    )
    tgt = np.array([41.30888549464701, -96.02619229605524, 356.0])
    intf = np.array([41.05, -95.99, 340.0])
    vel = np.array([120.0, -60.0, 0.0])
    sc = SimScene(
        station_names=names, station_lla=lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=tgt, block_len=1 << 18, tgt_velocity_enu=vel,
        interferer_lla=intf, interferer_amplitude=1.0,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6, -3e-6]), seed=5,
    )
    caps, _ = simulate_scene(sc)
    table = StationTable(
        stations=[Station(n, *lla[i]) for i, n in enumerate(names)],
        reference_tx=Station("162400000", 41.25703803095629,
                             -95.95512763589404, 349.07),
    )
    proc = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6, max_lag=512,
                        solve_velocity=True, multi_emitter=2),
        table,
    )
    res = proc.process_captures({n: caps[n] for n in names})
    assert res.emitters is not None and len(res.emitters) == 2

    def dist(e, ref):
        est = np.array([e.fix.lat, e.fix.lon, ref[2]])
        return np.linalg.norm(lla_to_enu(est, ref)[:2])

    mover = min(res.emitters, key=lambda e: dist(e, tgt))
    static = min(res.emitters, key=lambda e: dist(e, intf))
    assert mover is not static
    assert dist(mover, tgt) < 1000.0
    assert dist(static, intf) < 2000.0
    assert np.linalg.norm(mover.velocity_enu - vel) < 10.0
    assert np.linalg.norm(static.velocity_enu[:2]) < 30.0


def test_lo_compensation_restores_drifting_clocks():
    """Realistic TCXO LO offsets (drift_doppler=True) smear EVERY
    block's correlation — including the REF blocks the clock correction
    depends on, poisoning the whole chain (fix ~1.2 km off).
    lo_compensation='auto' probes the REF block with the CAF, solves
    per-station LO offsets, derotates all blocks (scaled by each
    carrier), and recovers the fix to meters."""
    from tdoa_tpu.geo import lla_to_enu
    from tdoa_tpu.io.stations import Station, StationTable
    from tdoa_tpu.pipeline.processor import ProcessorConfig, TDOAProcessor
    from tdoa_tpu.sim.scene import SimScene, simulate_scene

    names = ("kx0u", "n3pay", "kf0mtl")
    lla = np.array(
        [[41.18660274289527, -95.96064116595667, 355.69],
         [41.24669616513154, -96.08366304481238, 329.0],
         [41.32916620016985, -96.03513381562004, 373.18]]
    )
    tgt = np.array([41.30888549464701, -96.02619229605524, 356.0])
    sc = SimScene(
        station_names=names, station_lla=lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=tgt, block_len=1 << 18,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]),
        clock_drifts_ppm=np.array([0.08, -0.05, 0.02]),
        drift_doppler=True, seed=7,
    )
    caps, truth = simulate_scene(sc)
    table = StationTable(
        stations=[Station(n, *lla[i]) for i, n in enumerate(names)],
        reference_tx=Station("162400000", 41.25703803095629,
                             -95.95512763589404, 349.07),
    )

    def run(lo):
        proc = TDOAProcessor(
            ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6,
                            max_lag=512, lo_compensation=lo),
            table,
        )
        res = proc.process_captures({n: caps[n] for n in names})
        return res, np.linalg.norm(
            lla_to_enu(np.array([res.fix.lat, res.fix.lon, tgt[2]]),
                       tgt)[:2]
        )

    res_off, err_off = run("off")
    res_on, err_on = run("auto")
    assert err_off > 500.0  # the failure mode is real
    assert err_on < 100.0, err_on
    assert any("LO offsets" in w for w in res_on.warnings)
    # The compensated TDOAs match geometric truth sub-sample.
    by = {n: k for k, n in enumerate(names)}
    order = [by[n] for n in res_on.station_names]
    tau = truth.station_delays_samples[:, 1]
    want = np.array(
        [tau[order[j]] - tau[order[i]] for i, j in res_on.pair_idx]
    )
    assert np.abs(res_on.corrected_tdoa_samples - want).max() < 0.5
    # Disciplined clocks: auto probe must be a no-op (no warning).
    sc2 = SimScene(
        station_names=names, station_lla=lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=tgt, block_len=1 << 17,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]), seed=7,
    )
    caps2, _ = simulate_scene(sc2)
    proc2 = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6, max_lag=512,
                        lo_compensation="auto"),
        table,
    )
    res2 = proc2.process_captures({n: caps2[n] for n in names})
    assert not any("LO offsets" in w for w in res2.warnings)


def test_lo_compensation_large_clock_offsets_prealigned():
    """ADVICE r1: the LO probe's CAF window is ±2048 samples, but raw
    REF lags include clock offsets that can reach thousands of samples.
    The probe must pre-align stations from a coarse full-window
    correlation instead of silently failing its PSR gate. Offsets of
    ~2 ms (4000 samples) put every raw REF lag far outside the probe
    window; with pre-alignment the fix still lands within meters."""
    from tdoa_tpu.geo import lla_to_enu
    from tdoa_tpu.io.stations import Station, StationTable
    from tdoa_tpu.pipeline.processor import ProcessorConfig, TDOAProcessor
    from tdoa_tpu.sim.scene import SimScene, simulate_scene

    names = ("kx0u", "n3pay", "kf0mtl")
    lla = np.array(
        [[41.18660274289527, -95.96064116595667, 355.69],
         [41.24669616513154, -96.08366304481238, 329.0],
         [41.32916620016985, -96.03513381562004, 373.18]]
    )
    tgt = np.array([41.30888549464701, -96.02619229605524, 356.0])
    sc = SimScene(
        station_names=names, station_lla=lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=tgt, block_len=1 << 18,
        clock_offsets_s=np.array([2.1e-3, -1.7e-3, 0.4e-3]),
        clock_drifts_ppm=np.array([0.08, -0.05, 0.02]),
        drift_doppler=True, seed=7,
    )
    caps, truth = simulate_scene(sc)
    table = StationTable(
        stations=[Station(n, *lla[i]) for i, n in enumerate(names)],
        reference_tx=Station("162400000", 41.25703803095629,
                             -95.95512763589404, 349.07),
    )
    proc = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6,
                        max_lag=12000, lo_compensation="auto"),
        table,
    )
    res = proc.process_captures({n: caps[n] for n in names})
    assert any("LO offsets" in w for w in res.warnings), res.warnings
    assert not any("skipped" in w for w in res.warnings), res.warnings
    err = np.linalg.norm(
        lla_to_enu(np.array([res.fix.lat, res.fix.lon, tgt[2]]), tgt)[:2]
    )
    assert err < 100.0, err
    by = {n: k for k, n in enumerate(names)}
    order = [by[n] for n in res.station_names]
    tau = truth.station_delays_samples[:, 1]
    want = np.array(
        [tau[order[j]] - tau[order[i]] for i, j in res.pair_idx]
    )
    assert np.abs(res.corrected_tdoa_samples - want).max() < 0.5


def test_lo_compensation_with_velocity_no_double_correction():
    """Regression: with LO compensation the drift Doppler is already
    removed from the signal; adding the REF-measured drift term again
    would bias the velocity ~tens of m/s. The hardest single-emitter
    case — moving emitter + drifting TCXO LOs + offset clocks — must
    recover the velocity to a few m/s."""
    from tdoa_tpu.io.stations import Station, StationTable
    from tdoa_tpu.pipeline.processor import ProcessorConfig, TDOAProcessor
    from tdoa_tpu.sim.scene import SimScene, simulate_scene

    names = ("kx0u", "n3pay", "kf0mtl")
    lla = np.array(
        [[41.18660274289527, -95.96064116595667, 355.69],
         [41.24669616513154, -96.08366304481238, 329.0],
         [41.32916620016985, -96.03513381562004, 373.18]]
    )
    vel = np.array([120.0, -60.0, 0.0])
    sc = SimScene(
        station_names=names, station_lla=lla,
        ref_tx_lla=np.array([41.25703803095629, -95.95512763589404, 349.07]),
        tgt_tx_lla=np.array([41.30888549464701, -96.02619229605524, 356.0]),
        block_len=1 << 18, tgt_velocity_enu=vel,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]),
        clock_drifts_ppm=np.array([0.08, -0.05, 0.02]),
        drift_doppler=True, seed=7,
    )
    caps, _ = simulate_scene(sc)
    table = StationTable(
        stations=[Station(n, *lla[i]) for i, n in enumerate(names)],
        reference_tx=Station("162400000", 41.25703803095629,
                             -95.95512763589404, 349.07),
    )
    proc = TDOAProcessor(
        ProcessorConfig(ref_freq=162.4e6, tgt_freq=101.9e6, max_lag=512,
                        lo_compensation="auto", solve_velocity=True),
        table,
    )
    res = proc.process_captures({n: caps[n] for n in names})
    assert any("LO offsets" in w for w in res.warnings)
    assert res.velocity_enu is not None
    assert np.linalg.norm(res.velocity_enu - vel) < 10.0, res.velocity_enu
