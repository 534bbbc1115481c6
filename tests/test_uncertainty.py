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


def test_correlated_covariance_reduces_to_independent():
    """With zero station bias the sandwich covariance IS the
    independent model (the W = 1/diag(Σ) weights make
    JᵀWΣWJ = JᵀWJ exactly when Σ is diagonal)."""
    from tdoa_tpu.solve.multilateration import (
        fix_covariance_enu_correlated,
    )

    st = np.array([[0.0, 0.0, 0.0], [12000.0, 2000.0, 0.0],
                   [4000.0, 11000.0, 0.0]])
    pairs = np.array([(0, 1), (0, 2), (1, 2)])
    pos = np.array([5000.0, 4000.0, 0.0])
    sig = np.array([25.0, 40.0, 30.0])
    cov_i = fix_covariance_enu(st, pairs, pos, sig)
    cov_c = fix_covariance_enu_correlated(
        st, pairs, pos, sig, np.zeros(3)
    )
    np.testing.assert_allclose(cov_c, cov_i, rtol=1e-9)


def test_correlated_covariance_inflates_with_station_bias():
    """A shared-station echo bias drags correlated pairs together —
    the sandwich covariance must be LARGER than the independent model
    fed the same per-pair totals (σ_n² + τ_i² + τ_j²), because the
    independent model averages down exactly the error component that
    does not average."""
    from tdoa_tpu.solve.multilateration import (
        fix_covariance_enu_correlated,
    )

    st = np.array([[0.0, 0.0, 0.0], [12000.0, 2000.0, 0.0],
                   [4000.0, 11000.0, 0.0]])
    pairs = np.array([(0, 1), (0, 2), (1, 2)])
    pos = np.array([5000.0, 4000.0, 0.0])
    sig_n = np.array([20.0, 20.0, 20.0])
    tau = np.array([100.0, 100.0, 100.0])
    totals = np.sqrt(sig_n**2 + tau[pairs[:, 0]]**2 + tau[pairs[:, 1]]**2)
    cov_i = fix_covariance_enu(st, pairs, pos, totals)
    cov_c = fix_covariance_enu_correlated(st, pairs, pos, sig_n, tau)
    # Same diagonal measurement totals, but the correlated model keeps
    # the common-mode bias: strictly more uncertainty in trace.
    assert np.trace(cov_c) > np.trace(cov_i)
    # Monte Carlo ground truth: simulate the actual error model and
    # check the sandwich predicts the fix-error scatter it implies.
    rng = np.random.default_rng(3)
    si, sj = st[pairs[:, 0]], st[pairs[:, 1]]
    ui = (pos - si) / np.linalg.norm(pos - si, axis=-1, keepdims=True)
    uj = (pos - sj) / np.linalg.norm(pos - sj, axis=-1, keepdims=True)
    jac = (uj - ui)[:, :2]
    w = 1.0 / totals**2
    solve_mat = np.linalg.inv(jac.T @ (jac * w[:, None])) @ (
        jac * w[:, None]
    ).T
    errs = []
    for _ in range(4000):
        b = rng.normal(0.0, tau)
        e = rng.normal(0.0, sig_n) + b[pairs[:, 1]] - b[pairs[:, 0]]
        errs.append(solve_mat @ e)
    emp = np.cov(np.asarray(errs).T)
    np.testing.assert_allclose(cov_c, emp, rtol=0.15, atol=1.0)


def test_station_bias_apportion():
    """σ_pair² ≈ τ_i² + τ_j² recovery: exact at 3 stations, clipped
    nonnegative when one station is clean."""
    from tdoa_tpu.dsp.multipath import station_bias_apportion

    pairs = np.array([(0, 1), (0, 2), (1, 2)])
    tau_true = np.array([0.9, 0.0, 1.4])
    sig = np.sqrt(tau_true[pairs[:, 0]]**2 + tau_true[pairs[:, 1]]**2)
    tau = station_bias_apportion(pairs, 3, sig)
    np.testing.assert_allclose(tau, tau_true, atol=1e-9)
    # Environment floor (every pair at the same σ) splits evenly.
    tau_f = station_bias_apportion(pairs, 3, np.full(3, 0.7))
    np.testing.assert_allclose(tau_f, np.full(3, 0.7 / np.sqrt(2)),
                               atol=1e-9)
    # Overdetermined (5 stations) with a negative-LS station: stays
    # nonnegative and reproduces the pair budget where it matters.
    pairs5 = np.array([(i, j) for i in range(5) for j in range(i + 1, 5)])
    tau5_true = np.array([1.2, 0.0, 0.6, 0.0, 0.9])
    sig5 = np.sqrt(
        tau5_true[pairs5[:, 0]]**2 + tau5_true[pairs5[:, 1]]**2
    )
    tau5 = station_bias_apportion(pairs5, 5, sig5)
    assert np.all(tau5 >= 0.0)
    np.testing.assert_allclose(tau5, tau5_true, atol=1e-6)


def test_split_bounds_round_robin():
    """The K-group split distributes a non-divisible segment count
    round-robin (group sizes q or q+1): dumping the remainder into one
    group would give it up to 2x the others' variance and miscalibrate
    the equal-group _SPLIT_STD_SCALE constants."""
    from tdoa_tpu.ops.corr import _split_bounds

    for n_seg, k in [(8, 4), (9, 4), (11, 4), (3, 2), (5, 2), (100, 4)]:
        b = _split_bounds(n_seg, k, 10)
        sizes = np.diff(b) // 10
        assert b[0] == 0 and b[-1] == n_seg * 10
        assert sizes.sum() == n_seg
        assert sizes.max() - sizes.min() <= 1  # round-robin, not dump


def test_auto_seg_len_contract():
    """Short captures shrink to hold >=8 Welch segments; long captures
    keep the configured segment; never below max_lag or the 4096
    frequency-resolution floor; None passes through."""
    from tdoa_tpu.ops.corr import auto_seg_len

    assert auto_seg_len(131072, 512, 65536) == 16384  # 8 segments
    assert auto_seg_len(1 << 21, 512, 65536) == 65536  # already >=8
    assert auto_seg_len(131072, 512, None) is None
    assert auto_seg_len(16384, 512, 16384) >= 4096  # floor holds
    # max_lag floor: seg//2 must stay > max_lag
    assert auto_seg_len(1 << 15, 8192, 1 << 14) == 1 << 14


def test_split_sigma_unequal_groups():
    """K=4 split sigma with a non-divisible segment count (S=11): the
    delay stays exact and the sigma finite/positive — the remainder
    round-robin must not corrupt the full-capture accumulation."""
    from tdoa_tpu.ops.corr import correlate_pairs_planar
    from tdoa_tpu.ops.cplx import C

    n_seg, seg = 11, 4096
    n = n_seg * seg
    base = fm_source(jax.random.PRNGKey(5), n, 2e6)
    d = fractional_delay(base, jnp.float32(33.0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    d = d + 0.1 * (jax.random.normal(k1, (n,))
                   + 1j * jax.random.normal(k2, (n,))).astype(jnp.complex64)
    x = C(jnp.stack([jnp.real(base), jnp.real(d)]),
          jnp.stack([jnp.imag(base), jnp.imag(d)]))
    res = correlate_pairs_planar(
        x, jnp.asarray([[0, 1]]), max_lag=128, seg_len=seg, weighting="ht",
    )
    assert abs(float(res.delay[0]) - 33.0) < 0.15
    s = float(res.delay_std[0])
    assert np.isfinite(s) and s > 0


def test_process_blocks_tgt_std_commensurate():
    """process_blocks' 9th element is the TGT block's own sigma: the
    composite corrected_std must be >= it (REF clock variance only adds),
    and with clock_correction=False they are identical."""
    from tdoa_tpu.ops.cplx import C
    from tdoa_tpu.pipeline.processor import process_blocks

    n = 1 << 15
    blocks = []
    for bk in range(3):
        src = fm_source(jax.random.PRNGKey(50 + bk), n, 2e6)
        sigs = [src, fractional_delay(src, jnp.float32(12.0 if bk == 1 else 0.0))]
        k1, k2 = jax.random.split(jax.random.PRNGKey(60 + bk))
        noisy = [
            s + 0.3 * (jax.random.normal(jax.random.fold_in(k1, i), (n,))
                       + 1j * jax.random.normal(jax.random.fold_in(k2, i), (n,))
                       ).astype(jnp.complex64)
            for i, s in enumerate(sigs)
        ]
        blocks.append(C(jnp.stack([jnp.real(s) for s in noisy]),
                        jnp.stack([jnp.imag(s) for s in noisy])))
    pairs = jnp.asarray([[0, 1]], jnp.int32)
    geo = jnp.zeros(1, jnp.float32)
    out = process_blocks(blocks[0], blocks[1], blocks[2], pairs, geo,
                         max_lag=128, seg_len=1 << 12, weighting="ht")
    corr_std, tgt_std = np.asarray(out[6]), np.asarray(out[8])
    assert corr_std[0] >= tgt_std[0] - 1e-6
    out_nc = process_blocks(blocks[0], blocks[1], blocks[2], pairs, geo,
                            max_lag=128, seg_len=1 << 12, weighting="ht",
                            clock_correction=False)
    np.testing.assert_allclose(np.asarray(out_nc[6]), np.asarray(out_nc[8]))


def test_split_sigma_catches_contiguous_corruption():
    """Bursty corruption (the second HALF of one station replaced by
    noise) must inflate the split empirical sigma. Regression for a
    selection-bias leak: weighting every group's zoom probe with the
    FULL capture's HT factor selects exactly the bins where even the
    corrupted groups' noise phasors aligned with the full delay, so
    the corrupted groups zoomed to the full estimate and sigma
    collapsed to 0.003 while half the capture was junk (caught by the
    on-chip split-half check). Leave-one-out probe weights restore the
    honest answer."""
    from tdoa_tpu.ops.cplx import C
    from tdoa_tpu.ops.corr import correlate_pairs_planar

    n = 1 << 15
    seg = 1 << 12  # 8 segments -> K=4 contiguous groups of 2
    shift = 21
    kr, ki = jax.random.split(jax.random.PRNGKey(3))
    br = jax.random.normal(kr, (n,), jnp.float32)
    bi = jax.random.normal(ki, (n,), jnp.float32)
    x = C(
        jnp.stack([br, jnp.roll(br, shift)]),
        jnp.stack([bi, jnp.roll(bi, shift)]),
    )
    noise = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (2, n, 2))
    xn = C(x.re + noise[..., 0], x.im + noise[..., 1])
    pairs = jnp.asarray([[0, 1]], jnp.int32)
    kw = {"max_lag": 64, "seg_len": seg, "fft_len": 1 << 13,
          "weighting": "ht"}
    clean = correlate_pairs_planar(xn, pairs, **kw)
    s_clean = float(clean.delay_std[0])
    assert abs(float(clean.delay[0]) - shift) < 0.05
    assert 0.0 < s_clean < 0.1, s_clean

    # The corrupted-group zoom peak is a uniform draw over the +-16
    # window, so one draw of sigma_emp can land small by chance —
    # assert over a few noise realizations like the streaming test.
    s_wrecks = []
    for ks in (5, 6, 7):
        wr = jax.random.normal(jax.random.PRNGKey(ks), (n // 2, 2),
                               jnp.float32)
        xw = C(
            xn.re.at[1, n // 2:].set(wr[:, 0]),
            xn.im.at[1, n // 2:].set(wr[:, 1]),
        )
        res = correlate_pairs_planar(xw, pairs, **kw)
        # The clean half still anchors the delay estimate.
        assert abs(float(res.delay[0]) - shift) < 0.2
        s_wrecks.append(float(res.delay_std[0]))
    assert max(s_wrecks) > max(10.0 * s_clean, 0.5), (s_wrecks, s_clean)
