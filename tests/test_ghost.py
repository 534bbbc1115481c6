"""Unit tests for the unified ghost posterior (solve/ghost.py) and the
band-limited signal-power estimator feeding its power evidence.

The end-to-end behavior (real scenes, swaps, warnings) lives in
tests/test_monte_carlo.py's regression scenes and the
scripts/ghost_calibration.py validation artifacts (GHOSTCAL_*.json:
zero wrong swaps on three seed bases); these pin the component
contracts the calibration rests on."""

import numpy as np
import jax.numpy as jnp
import pytest

from tdoa_tpu.ops.cplx import C
from tdoa_tpu.solve.ghost import (
    DECISION_THRESHOLD_NATS,
    POWER_LOG_SIGMA,
    ghost_posterior,
)


def test_power_only_decision_scales_with_contrast():
    """Strong power contrast decides; weak contrast abstains — the
    margin is the calibrated log-likelihood difference, not a fixed
    score gap."""
    strong = ghost_posterior(
        2, power_scores=np.array([0.6, 0.05]), n_stations=3,
    )
    assert strong.best == 1
    assert strong.decided
    assert strong.margin_nats > DECISION_THRESHOLD_NATS
    weak = ghost_posterior(
        2, power_scores=np.array([0.12, 0.05]), n_stations=3,
    )
    assert not weak.decided  # 1.5·(0.12²−0.05²)/σ_p² ≈ 0.66 nats
    assert weak.components["power"].shape == (2,)


def test_prior_outside_candidate_is_crushed():
    """A candidate 0.5·R beyond the prior edge loses by > 5 nats (the
    round-3 'authoritative unique-in-prior' behavior, recovered from
    the soft barrier); one grazing the edge only leans."""
    v = ghost_posterior(
        2, prior_dist_m=np.array([200.0, 1500.0]),
        prior_radius_m=1000.0,
    )
    assert v.best == 0 and v.decided and v.margin_nats > 5.0
    graze = ghost_posterior(
        2, prior_dist_m=np.array([200.0, 1100.0]),
        prior_radius_m=1000.0,
    )
    assert not graze.decided


def test_fdoa_speed_barrier_decides_without_dof():
    """An exactly-determined velocity fit (dof 0) has a vacuous
    residual, but an unphysical fitted speed at the ghost is still
    evidence (the 1944 m/s regression, monte_carlo moving seed
    1009)."""
    v = ghost_posterior(
        2,
        fdoa_resid_hz=np.array([0.1, 0.1]), fdoa_dof=0,
        speeds_mps=np.array([105.0, 1944.0]), max_speed_mps=700.0,
    )
    assert v.best == 0 and v.decided
    # Residual evidence with dof works alone too.
    v2 = ghost_posterior(
        2, fdoa_resid_hz=np.array([0.2, 2.0]), fdoa_dof=1,
        speeds_mps=np.array([100.0, 120.0]), max_speed_mps=700.0,
    )
    assert v2.best == 0 and v2.decided


def test_no_evidence_abstains():
    v = ghost_posterior(2)
    assert not v.decided
    assert v.margin_nats == 0.0
    assert v.components == {}


def test_evidence_combines_additively():
    """Two individually-insufficient signals that agree must decide
    together — the point of a posterior over a cascade of
    separately-thresholded rules."""
    kw = dict(
        power_scores=np.array([0.05, 0.16]), n_stations=3,
        prior_dist_m=np.array([100.0, 1220.0]), prior_radius_m=1000.0,
    )
    v = ghost_posterior(2, **kw)
    p_only = ghost_posterior(2, power_scores=kw["power_scores"],
                             n_stations=3)
    pr_only = ghost_posterior(2, prior_dist_m=kw["prior_dist_m"],
                              prior_radius_m=kw["prior_radius_m"])
    assert not p_only.decided and not pr_only.decided
    assert v.decided and v.best == 0
    assert v.margin_nats == pytest.approx(
        p_only.margin_nats + pr_only.margin_nats, rel=1e-9)


def test_station_signal_power_recovers_profile_under_noise():
    """The regression behind the round-4 noisy-ghost fix: a 1/r
    amplitude profile with 100x power contrast, buried under noise
    10-100x above the weak stations' signals, must come back within
    ~2 dB per station — mean |x|² reads the weak stations ~10x high
    (noise-dominated) and prefers the distant ghost."""
    from tdoa_tpu.pipeline.processor import (
        _station_mean_power,
        _station_signal_power,
    )

    rng = np.random.default_rng(7)
    n = 1 << 18
    t = np.arange(n)
    # Narrowband-ish signal: filtered noise in ~10% of the band,
    # common to all stations (same emitter), scaled per station.
    spec = np.zeros(n, np.complex128)
    band = slice(int(0.37 * n), int(0.47 * n))
    spec[band] = rng.normal(size=band.stop - band.start) + 1j * rng.normal(
        size=band.stop - band.start)
    base = np.fft.ifft(spec)
    base /= np.sqrt(np.mean(np.abs(base) ** 2))
    amps = np.array([0.05, 0.5, 0.055])  # ~100x power contrast
    noise_amp = 0.3
    x = np.stack([
        a * base + noise_amp * (
            rng.normal(size=n) + 1j * rng.normal(size=n)
        ) / np.sqrt(2.0)
        for a in amps
    ])
    blk = C(jnp.asarray(x.real, jnp.float32),
            jnp.asarray(x.imag, jnp.float32))
    est = _station_signal_power(blk)
    true_p = amps ** 2
    # Relative profile within ~2 dB per station (0.23 nepers on log a).
    log_ratio = 0.5 * np.log(est / true_p)
    log_ratio -= log_ratio.mean()  # common scale is irrelevant
    assert np.all(np.abs(log_ratio) < 0.23), (est, true_p)
    # And the raw mean-power profile is indeed unusable here (weak
    # stations read ≥ 5x high) — the reason the estimator exists.
    raw = _station_mean_power(blk)
    assert raw[0] / true_p[0] > 5.0


def test_station_signal_power_pure_noise_falls_back():
    """No detectable band ⇒ the estimator degrades to mean power
    instead of inventing structure from floor residue."""
    from tdoa_tpu.pipeline.processor import (
        _station_mean_power,
        _station_signal_power,
    )

    rng = np.random.default_rng(11)
    n = 1 << 17
    x = (rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n)))
    x *= np.array([0.1, 0.3, 0.2])[:, None]
    blk = C(jnp.asarray(x.real, jnp.float32),
            jnp.asarray(x.imag, jnp.float32))
    est = _station_signal_power(blk)
    raw = _station_mean_power(blk)
    np.testing.assert_allclose(est, raw, rtol=1e-6)


def test_power_lane_self_calibrates_on_model_violation():
    """When the 1/r model fits NO candidate (best score >> σ_p — a
    cross-band gain-calibration failure), the power lane must degrade
    its own confidence instead of deciding on calibration noise
    (round-5: a ±6 dB cross-band spread produced a wrong swap at
    frozen σ_p). Clean scenes (best score ≤ σ_p) are unchanged."""
    from tdoa_tpu.solve.ghost import ghost_posterior

    # Clean: true candidate fits well — power decides as calibrated.
    v = ghost_posterior(
        2, power_scores=np.array([0.05, 0.6]), n_stations=3)
    assert v.decided and v.best == 0

    # Model violated: BOTH scores far above σ_p (mostly calibration
    # noise); the same score DIFFERENCE must no longer decide.
    v2 = ghost_posterior(
        2, power_scores=np.array([0.55, 0.78]), n_stations=3)
    assert not v2.decided
    # Margin collapsed relative to the frozen-σ form.
    frozen = 0.5 * 3 * (0.78**2 - 0.55**2) / 0.15**2
    assert v2.margin_nats < 0.2 * frozen

    # FDOA must then carry the decision (the ghost-fdoa regime).
    v3 = ghost_posterior(
        2, power_scores=np.array([0.55, 0.78]), n_stations=3,
        fdoa_resid_hz=np.array([0.1, 0.1]), fdoa_dof=0,
        speeds_mps=np.array([120.0, 5000.0]), max_speed_mps=700.0)
    assert v3.decided and v3.best == 0


def test_host_subsample_contiguous_power_ranking():
    """HostCapture.subsample_planar must feed `_station_signal_power`
    contiguous runs at the ORIGINAL sample rate. The old bare-stride
    subsample decimated by block_len // 2^20 — a per-station factor —
    so the same emitter tone landed on different FFT bins per station
    and the "common band" summed signal bins on one station and noise
    bins on another, destroying the amplitude contrast the 1/r ghost
    ranking scores."""
    import jax.numpy as jnp

    from tdoa_tpu.io.datfile import IQ_CENTER, IQ_SCALE
    from tdoa_tpu.pipeline.processor import (
        HostCapture,
        _station_signal_power,
    )
    from tdoa_tpu.ops.cplx import C

    rng = np.random.default_rng(7)
    f_sig = 0.02  # narrowband emitter (cycles/sample)

    def capture(sig_amp: float, block_len: int) -> HostCapture:
        t = np.arange(block_len)
        z = (sig_amp * np.exp(2j * np.pi * f_sig * t)
             + 0.05 * (rng.standard_normal(block_len)
                       + 1j * rng.standard_normal(block_len)))
        i = np.clip(np.round(z.real / 4.0 * IQ_SCALE + IQ_CENTER),
                    0, 255).astype(np.uint16)
        q = np.clip(np.round(z.imag / 4.0 * IQ_SCALE + IQ_CENTER),
                    0, 255).astype(np.uint16)
        u16 = (i | (q << 8)).astype(np.uint16)
        return HostCapture(u16=np.tile(u16, 3), block_len=block_len)

    # DIFFERENT block lengths: the old code gave these strides 4 and 2.
    strong = capture(1.0, 1 << 22)
    weak = capture(0.1, 1 << 21)  # 10x amplitude = 100x power contrast
    subs = [c.subsample_planar(1) for c in (strong, weak)]
    # Equal sample counts regardless of block length (stackable, equal
    # FFT bins) — the per-station-stride form only matched by luck.
    assert subs[0].re.shape[0] == subs[1].re.shape[0] == 1 << 20
    x = C(jnp.stack([s.re for s in subs]), jnp.stack([s.im for s in subs]))
    p = _station_signal_power(x)
    contrast = float(p[0] / p[1])
    assert 50.0 < contrast < 200.0, contrast


def test_host_subsample_stack_straddles_limit():
    """A capture set whose per-station block lengths STRADDLE the
    subsample limit (one station below 2^20 samples, one above) yields
    different per-station sample counts; the stack helper must trim to
    the shortest instead of raising on ragged shapes (advisor round-4),
    and the power ranking must survive the truncation."""
    import jax.numpy as jnp

    from tdoa_tpu.io.datfile import IQ_CENTER, IQ_SCALE
    from tdoa_tpu.pipeline.processor import (
        HostCapture,
        _stack_station_subsamples,
        _station_signal_power,
    )

    rng = np.random.default_rng(11)
    f_sig = 0.02

    def capture(sig_amp: float, block_len: int) -> HostCapture:
        t = np.arange(block_len)
        z = (sig_amp * np.exp(2j * np.pi * f_sig * t)
             + 0.05 * (rng.standard_normal(block_len)
                       + 1j * rng.standard_normal(block_len)))
        i = np.clip(np.round(z.real / 4.0 * IQ_SCALE + IQ_CENTER),
                    0, 255).astype(np.uint16)
        q = np.clip(np.round(z.imag / 4.0 * IQ_SCALE + IQ_CENTER),
                    0, 255).astype(np.uint16)
        u16 = (i | (q << 8)).astype(np.uint16)
        return HostCapture(u16=np.tile(u16, 3), block_len=block_len)

    strong = capture(1.0, 1 << 22)   # above the 2^20 limit
    weak = capture(0.1, 1 << 19)     # below it: whole block returned
    subs = [c.subsample_planar(1) for c in (strong, weak)]
    assert subs[0].re.shape[0] != subs[1].re.shape[0]  # the ragged case
    x = _stack_station_subsamples(subs)
    assert x.re.shape == (2, 1 << 19)
    p = _station_signal_power(x)
    contrast = float(p[0] / p[1])
    assert 50.0 < contrast < 200.0, contrast
