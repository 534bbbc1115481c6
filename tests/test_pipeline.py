"""End-to-end: simulator → .dat files → processor → fix.

This is the reference's validation ladder (simulator.go:289 "Test with:
./processor ... sim-*.dat") turned into an automated round-trip test, with
the clock-offset physics the reference never exercised.
"""

import os

import numpy as np
import pytest

from tdoa_tpu.geo import lla_to_enu
from tdoa_tpu.pipeline import TDOAProcessor
from tdoa_tpu.sim import (
    SimScene,
    NoiseProfile,
    WEAK_REF_PROFILE,
    STRONG_TGT_PROFILE,
    simulate_scene,
    write_scene_captures,
)

BLOCK = 1 << 17  # ~65 ms blocks keep CPU tests fast


def _scene(omaha, **kw):
    return SimScene(
        station_names=omaha["names"],
        station_lla=omaha["station_lla"],
        ref_tx_lla=omaha["ref_tx_lla"],
        tgt_tx_lla=omaha["tgt_tx_lla"],
        ref_freq=omaha["ref_freq"],
        tgt_freq=omaha["tgt_freq"],
        block_len=BLOCK,
        **kw,
    )


def _fix_error_m(fix, tgt_lla):
    est = np.array([fix.lat, fix.lon, tgt_lla[2]])
    return np.linalg.norm(lla_to_enu(est, tgt_lla)[:2])


def test_truth_tables(omaha_stations):
    from tdoa_tpu.sim.scene import compute_truth

    scene = _scene(omaha_stations, clock_offsets_s=np.array([0.0, 5e-6, -3e-6]))
    truth = compute_truth(scene)
    # TDOAs bounded by baseline/c: < 57 us → < 114 samples
    assert np.all(np.abs(truth.tgt_tdoa_samples) < 114)
    # Clock offsets dominate the raw measured delays
    assert np.abs(truth.measured_tgt_delay - truth.tgt_tdoa_samples).max() > 1


def test_e2e_ideal_in_memory(omaha_stations, station_csv):
    scene = _scene(omaha_stations)
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv, seg_len=None, max_lag=512
    )
    res = proc.process_captures(
        {n: captures[n] for n in scene.station_names}
    )
    np.testing.assert_allclose(
        res.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=0.5
    )
    assert _fix_error_m(res.fix, scene.tgt_tx_lla) < 150.0
    assert not res.warnings


def test_e2e_with_clock_offsets(omaha_stations, station_csv):
    """Per-station clock errors of ±100 samples must cancel through the
    dual-frequency REF correction (the capability the reference's capture
    format exists to enable)."""
    scene = _scene(
        omaha_stations,
        clock_offsets_s=np.array([12e-6, -31e-6, 48e-6]),  # 24–96 samples
        clock_drifts_ppm=np.array([0.5, -0.3, 0.2]),
        seed=3,
    )
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv, seg_len=None, max_lag=512
    )
    res = proc.process_captures({n: captures[n] for n in scene.station_names})
    # Raw TGT delays are clock-corrupted ...
    assert np.abs(res.tgt_delay_samples - truth.tgt_tdoa_samples).max() > 10
    # ... corrected TDOAs are not.
    np.testing.assert_allclose(
        res.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=0.5
    )
    assert _fix_error_m(res.fix, scene.tgt_tx_lla) < 200.0


def test_e2e_weak_signal(omaha_stations, station_csv):
    """Weak-REF impairment profile (weak_signal_simulator.go parity):
    noise, impulses, phase drift, DC — the fix must survive."""
    scene = _scene(
        omaha_stations,
        ref_profile=WEAK_REF_PROFILE,
        tgt_profile=STRONG_TGT_PROFILE,
        clock_offsets_s=np.array([5e-6, -8e-6, 2e-6]),
        seed=7,
    )
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=1 << 15, max_lag=512,
    )
    res = proc.process_captures({n: captures[n] for n in scene.station_names})
    # At this SNR (−6…−9 dB), bandwidth (~30 kHz) and duration (65 ms) the
    # TDOA CRLB is ~1–2 samples — the estimator must be at that floor, not
    # above it. Real 10 s blocks integrate 150× longer (see
    # test_integration_time_tightens_tdoa).
    np.testing.assert_allclose(
        res.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=3.5
    )
    assert _fix_error_m(res.fix, scene.tgt_tx_lla) < 1500.0


def test_e2e_through_dat_files(omaha_stations, station_csv, tmp_path):
    """Full byte-contract round trip: simulate → write u8 .dat → filename
    station recovery → processor → fix (the reference's whole offline
    workflow, docs/usage.md:139-150)."""
    scene = _scene(omaha_stations, seed=11)
    paths, truth = write_scene_captures(scene, str(tmp_path))
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv, seg_len=None, max_lag=512
    )
    res = proc.process_files(sorted(paths.values()))
    # The processor orders stations by filename; recompute the expected
    # TDOAs for its pair ordering from the per-station truth delays.
    tau_tgt = dict(
        zip(scene.station_names, truth.station_delays_samples[:, 1])
    )
    want = [
        tau_tgt[res.station_names[j]] - tau_tgt[res.station_names[i]]
        for i, j in res.pair_idx
    ]
    np.testing.assert_allclose(res.corrected_tdoa_samples, want, atol=0.5)
    assert _fix_error_m(res.fix, scene.tgt_tx_lla) < 200.0
    assert set(res.station_names) == set(scene.station_names)


def test_integration_time_tightens_tdoa(omaha_stations):
    """Doubling integration time must shrink weak-signal TDOA error —
    the coherent-integration gain the reference documents but never
    demonstrates (snr_analysis.go:83-88)."""
    import jax.numpy as jnp
    from tdoa_tpu.ops.corr import correlate_pairs
    from tdoa_tpu.sim.scene import simulate_scene

    rms = {}
    for blk in (1 << 14, 1 << 17):
        sq = []
        for seed in (23, 24, 25):
            scene = _scene(omaha_stations, seed=seed)
            scene = SimScene(**{**scene.__dict__, "block_len": blk,
                                "ref_profile": NoiseProfile(
                                    signal_amplitude=0.2, noise_amplitude=0.28)})
            captures, truth = simulate_scene(scene)
            x = jnp.stack([captures[n][0] for n in scene.station_names])
            res = correlate_pairs(
                x, jnp.asarray(truth.pair_idx), max_lag=256,
                seg_len=1 << 13, weighting="ht",
            )
            sq.append((np.asarray(res.delay) - truth.measured_ref_delay[:, 0]) ** 2)
        rms[blk] = float(np.sqrt(np.mean(sq)))
    # 8× the integration should buy ~√8 ≈ 2.8× tighter TDOAs; accept ≥ 1.6×.
    assert rms[1 << 17] < rms[1 << 14] / 1.6


def test_e2e_fm_mode(omaha_stations, station_csv):
    """Audio-domain correlation (mode='fm'): the 'FM demod to aid
    correlation' capability (reference README.md:3-7, unwired there).
    Timing is audio-bandwidth-limited, so tolerances are coarser than IQ
    mode but must survive a strong LO/carrier rotation unscathed."""
    scene = _scene(omaha_stations, seed=31, clock_offsets_s=np.array([8e-6, -4e-6, 15e-6]))
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=None, max_lag=512, mode="fm", fm_decim=8,
    )
    res = proc.process_captures({n: captures[n] for n in scene.station_names})
    np.testing.assert_allclose(
        res.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=16.0
    )
    assert _fix_error_m(res.fix, scene.tgt_tx_lla) < 4000.0


def test_processor_requires_three_stations(omaha_stations, station_csv):
    scene = _scene(omaha_stations)
    captures, _ = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(scene.ref_freq, scene.tgt_freq, station_csv)
    two = {n: captures[n] for n in scene.station_names[:2]}
    with pytest.raises(ValueError):
        proc.process_captures(two)


def test_clock_drift_reported(omaha_stations, station_csv):
    """Per-pair clock drift measured from the two REF blocks must match
    the simulated drift rates."""
    drifts = np.array([2.0, -3.0, 1.0])  # ppm
    scene = _scene(omaha_stations, clock_drifts_ppm=drifts, seed=51)
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv, seg_len=None, max_lag=512
    )
    res = proc.process_captures({n: captures[n] for n in scene.station_names})
    want = np.array([
        drifts[j] - drifts[i] for i, j in res.pair_idx
    ])
    np.testing.assert_allclose(res.clock_drift_ppm, want, atol=0.3)


def test_duplicate_station_files_rejected(
    omaha_stations, station_csv, tmp_path
):
    """Two .dat files resolving to one station must error, not silently
    drop a capture."""
    import shutil

    scene = _scene(omaha_stations, seed=11)
    paths, _ = write_scene_captures(scene, str(tmp_path))
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv, seg_len=None, max_lag=512
    )
    first = sorted(paths.values())[0]
    dup = str(tmp_path / ("copy-" + os.path.basename(first)))
    shutil.copy(first, dup)
    with pytest.raises(ValueError, match="one file per station"):
        proc.process_files(sorted(paths.values()) + [dup])


def test_e2e_multipath_prefers_direct_path(omaha_stations, station_csv):
    """A specular echo at 0.6x amplitude, ~30 samples of excess delay,
    must not capture the correlation peak: GCC weighting keeps the fix
    on the direct (first-arrival) path. Urban-reflection robustness the
    reference never modeled."""
    from tdoa_tpu.sim.scene import NoiseProfile

    mp = NoiseProfile(
        multipath_amplitude=0.6, multipath_delay_samples=30.0
    )
    scene = _scene(
        omaha_stations,
        ref_profile=mp,
        tgt_profile=mp,
        clock_offsets_s=np.array([8e-6, -15e-6, 22e-6]),
        seed=13,
    )
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=1 << 15, max_lag=512,
    )
    res = proc.process_captures({n: captures[n] for n in scene.station_names})
    # The echo sits ~30 samples late; locking onto it would show as a
    # many-sample TDOA bias. Direct-path lock keeps errors ~1 sample.
    np.testing.assert_allclose(
        res.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=3.0
    )
    assert _fix_error_m(res.fix, scene.tgt_tx_lla) < 1500.0


def test_e2e_cochannel_interferer(omaha_stations, station_csv):
    """A second emitter on the target frequency at half the target's
    power: the correlator's dominant peak stays on the target and the
    fix holds; at equal power the quality gate must flag trouble rather
    than silently return a confident wrong fix."""
    def run(amp):
        scene = _scene(
            omaha_stations,
            clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]),
            interferer_lla=np.array([41.36, -95.90, 340.0]),
            interferer_amplitude=amp,
            seed=17,
        )
        captures, truth = simulate_scene(scene)
        proc = TDOAProcessor.from_csv(
            scene.ref_freq, scene.tgt_freq, station_csv,
            seg_len=1 << 15, max_lag=512,
        )
        res = proc.process_captures(
            {n: captures[n] for n in scene.station_names}
        )
        return res, truth

    res, truth = run(0.5)
    np.testing.assert_allclose(
        res.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=3.0
    )
    assert _fix_error_m(res.fix, omaha_stations["tgt_tx_lla"]) < 1500.0

    # Equal-power interferer: either the TDOAs still match the target or
    # the result is flagged (low quality / warnings) — never a silently
    # confident wrong answer.
    res_eq, truth_eq = run(1.0)
    err = np.abs(res_eq.corrected_tdoa_samples - truth_eq.tgt_tdoa_samples)
    flagged = bool(res_eq.warnings) or (np.asarray(res_eq.quality) < 8.0).any()
    assert (err.max() < 3.0) or flagged


def test_clock_drift_with_truncated_analysis_window(
    omaha_stations, station_csv
):
    """truncate_samples shortens the analysis window but NOT the capture-
    time spacing of the REF blocks — the drift time base must use the
    original block length (regression: drift came out blocks/window x
    too large)."""
    drifts = np.array([4.0, -2.0, 1.0])  # ppm
    scene = _scene(omaha_stations, clock_drifts_ppm=drifts, seed=52)
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=None, max_lag=512,
        truncate_samples=BLOCK // 2,  # analyze half of each block
    )
    res = proc.process_captures({n: captures[n] for n in scene.station_names})
    want = np.array([drifts[j] - drifts[i] for i, j in res.pair_idx])
    np.testing.assert_allclose(res.clock_drift_ppm, want, atol=1.5)


def test_e2e_multi_emitter_separation(omaha_stations, station_csv):
    """An equal-power co-channel interferer is not just flagged: with
    multi_emitter=2 the processor separates BOTH emitters — each
    associated TDOA set is cycle-consistent and its fix lands near its
    own transmitter (the reference can only ever report one argmax).

    The interferer location is chosen so every pair's two TDOAs are
    separated by >> the correlation peak width (~40 samples for the
    ~50 kHz-wide simulated FM signal at 2 Msps) — closer emitters merge
    into one correlation peak and are physically unresolvable in the
    lag domain (association.py documents this limit)."""
    intf_lla = np.array([41.05, -95.99, 340.0])
    scene = _scene(
        omaha_stations,
        clock_offsets_s=np.array([5e-6, -9e-6, 14e-6]),
        interferer_lla=intf_lla,
        interferer_amplitude=1.0,
        seed=17,
    )
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=1 << 15, max_lag=512, multi_emitter=2,
    )
    res = proc.process_captures({n: captures[n] for n in scene.station_names})

    assert res.emitters is not None and len(res.emitters) == 2
    # Each separated set must match one transmitter's geometric TDOAs.
    from tdoa_tpu.geo import lla_to_ecef

    def true_tdoa(tx):
        st = lla_to_ecef(scene.station_lla)
        d = np.linalg.norm(st - lla_to_ecef(tx), axis=-1)
        tau = d / 299792458.0 * scene.sample_rate
        return tau[truth.pair_idx[:, 1]] - tau[truth.pair_idx[:, 0]]

    errs = {}
    for tx_name, tx in (("tgt", scene.tgt_tx_lla), ("intf", intf_lla)):
        best = min(
            np.abs(e.tdoa_samples - true_tdoa(tx)).max()
            for e in res.emitters
        )
        errs[tx_name] = best
    assert errs["tgt"] < 1.0, errs
    assert errs["intf"] < 1.0, errs
    # And the fixes themselves: one near each emitter.
    tgt_fix_err = min(
        _fix_error_m(e.fix, scene.tgt_tx_lla) for e in res.emitters
    )
    intf_fix_err = min(_fix_error_m(e.fix, intf_lla) for e in res.emitters)
    assert tgt_fix_err < 1500.0
    assert intf_fix_err < 2500.0
    # Association quality is reported.
    assert all(e.max_inconsistency_samples < 3.0 for e in res.emitters)


def test_multi_emitter_single_source_yields_one(omaha_stations, station_csv):
    """With no interferer, multi_emitter=2 must NOT invent a second
    emitter from noise/sidelobe peaks."""
    scene = _scene(
        omaha_stations, clock_offsets_s=np.array([0.0, 5e-6, -3e-6])
    )
    captures, _ = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=1 << 15, max_lag=512, multi_emitter=2,
    )
    res = proc.process_captures({n: captures[n] for n in scene.station_names})
    assert res.emitters is not None and len(res.emitters) == 1
    assert _fix_error_m(res.emitters[0].fix, scene.tgt_tx_lla) < 1500.0


def test_fm_mode_plain_weighting_recovers_large_shift():
    """Regression (found on hardware): GCC whitening on demodulated
    audio votes the peak to lag 0 — the audio occupies only the bottom
    of the decimated band and the empty bins carry common segment-edge
    leakage. FM mode must use plain power weighting; a 96-IQ-sample
    shift must come back exactly even when the caller asks for ht."""
    import jax
    import jax.numpy as jnp

    from tdoa_tpu.ops.cplx import C
    from tdoa_tpu.pipeline.processor import process_blocks
    from tdoa_tpu.sim import fm_source

    fs = 2e6
    n = 1 << 16
    shift = 96
    blocks = []
    for bk in range(3):
        src = np.asarray(fm_source(jax.random.PRNGKey(40 + bk), n, fs))
        st2 = np.roll(src, shift) if bk == 1 else src
        sig = np.stack([src, src, st2])
        blocks.append(
            C(jnp.asarray(sig.real, jnp.float32),
              jnp.asarray(sig.imag, jnp.float32))
        )
    out = process_blocks(
        blocks[0], blocks[1], blocks[2],
        jnp.asarray([[0, 1], [0, 2], [1, 2]], jnp.int32),
        jnp.zeros(3, jnp.float32),
        max_lag=512, weighting="ht", mode="fm", fm_decim=8,
    )
    tdoa = np.asarray(out[0])
    np.testing.assert_allclose(tdoa, [0.0, shift, shift], atol=2.0)
