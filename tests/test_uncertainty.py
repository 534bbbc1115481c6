"""Uncertainty reporting: the phase-slope standard error must be
*calibrated* (predict the actual estimator scatter) and propagate into a
sane position covariance — error bars the reference never had."""

import numpy as np
import jax
import jax.numpy as jnp

from tdoa_tpu.ops.corr import correlate_two
from tdoa_tpu.pipeline import TDOAProcessor
from tdoa_tpu.sim import (
    NoiseProfile,
    SimScene,
    fm_source,
    fractional_delay,
    simulate_scene,
)
from tdoa_tpu.solve.multilateration import error_ellipse, fix_covariance_enu


def test_delay_std_tracks_actual_error():
    """Over many noise draws, |error| / σ̂ should be O(1): the reported
    standard error is neither wildly optimistic nor useless."""
    n = 1 << 15
    base = fm_source(jax.random.PRNGKey(0), n, 2e6)
    b0 = fractional_delay(base, jnp.float32(17.25))
    zs = []
    for seed in range(8):
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed + 10), 4)
        na = 0.6 * (jax.random.normal(k1, (n,)) + 1j * jax.random.normal(k2, (n,)))
        nb = 0.6 * (jax.random.normal(k3, (n,)) + 1j * jax.random.normal(k4, (n,)))
        res = correlate_two(
            base + na.astype(jnp.complex64), b0 + nb.astype(jnp.complex64),
            max_lag=128, seg_len=1 << 12, weighting="ht",
        )
        err = float(res.delay) - 17.25
        zs.append(err / max(float(res.delay_std), 1e-9))
    z = np.abs(zs)
    # Calibrated within a factor of ~4 (the WLS σ is approximate for
    # wrapped phases): typical |z| near 1, never hundreds.
    assert np.median(z) < 4.0
    assert np.median(z) > 0.05


def test_noisier_signal_reports_larger_std():
    n = 1 << 15
    base = fm_source(jax.random.PRNGKey(1), n, 2e6)
    b0 = fractional_delay(base, jnp.float32(-9.5))

    def std_at(noise):
        k1, k2 = jax.random.split(jax.random.PRNGKey(77))
        nb = noise * (jax.random.normal(k1, (n,)) + 1j * jax.random.normal(k2, (n,)))
        res = correlate_two(
            base, b0 + nb.astype(jnp.complex64),
            max_lag=128, seg_len=1 << 12, weighting="ht",
        )
        return float(res.delay_std)

    assert std_at(1.0) > 2.0 * std_at(0.05)


def test_pipeline_reports_ellipse(omaha_stations):
    s = omaha_stations
    scene = SimScene(
        station_names=s["names"],
        station_lla=s["station_lla"],
        ref_tx_lla=s["ref_tx_lla"],
        tgt_tx_lla=s["tgt_tx_lla"],
        block_len=1 << 16,
        ref_profile=NoiseProfile(signal_amplitude=0.3, noise_amplitude=0.1),
        tgt_profile=NoiseProfile(signal_amplitude=0.3, noise_amplitude=0.1),
        seed=3,
    )
    captures, _ = simulate_scene(scene)
    from tdoa_tpu.io.stations import Station, StationTable
    from tdoa_tpu.pipeline.processor import ProcessorConfig

    table = StationTable(
        stations=[Station(n, *r) for n, r in zip(s["names"], s["station_lla"])],
        reference_tx=Station("162400000", *s["ref_tx_lla"]),
    )
    proc = TDOAProcessor(
        ProcessorConfig(ref_freq=s["ref_freq"], tgt_freq=s["tgt_freq"],
                        seg_len=1 << 13, max_lag=512),
        table,
    )
    res = proc.process_captures({n: captures[n] for n in s["names"]})
    assert res.tdoa_std_s is not None
    assert np.all(res.tdoa_std_s > 0)
    assert res.fix.ellipse is not None
    maj, mnr, az = res.fix.ellipse
    assert 0 < mnr <= maj
    assert maj < 2000.0  # sane scale for this SNR
    assert 0.0 <= az < 180.0


def test_covariance_geometry():
    """A long thin network measures across-baseline worse than along —
    the ellipse must reflect the geometry."""
    st = np.array([[0.0, 0.0, 0.0], [10000.0, 0.0, 0.0], [20000.0, 0.0, 0.0],
                   [5000.0, 400.0, 0.0]])
    pairs = np.array([(i, j) for i in range(4) for j in range(i + 1, 4)])
    pos = np.array([10000.0, 5000.0, 0.0])
    cov = fix_covariance_enu(st, pairs, pos, np.full(len(pairs), 30.0))
    maj, mnr, az = error_ellipse(cov)
    assert maj > mnr
    # Stations lie along east — north (across) is the weak direction:
    # the major axis points near north (azimuth ≈ 0/180).
    assert az < 40 or az > 140
