"""CAF (delay-Doppler) tests: joint recovery of lag and frequency offset,
and the failure mode it exists to fix (plain correlation washing out
under Doppler)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdoa_tpu.ops.caf import caf_pairs
from tdoa_tpu.ops.corr import correlate_pairs_planar
from tdoa_tpu.ops.cplx import C
from tdoa_tpu.sim import fm_source, fractional_delay

FS = 2e6


def _pair_with(delay, doppler_hz, n=1 << 19, seed=0, noise=0.0):
    a = fm_source(jax.random.PRNGKey(seed), n, FS)
    b = fractional_delay(a, jnp.float32(delay))
    t = jnp.arange(n) / FS
    b = b * jnp.exp(2j * jnp.pi * doppler_hz * t).astype(jnp.complex64)
    if noise:
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed + 99), 4)
        a = a + noise * (jax.random.normal(k1, (n,)) + 1j * jax.random.normal(k2, (n,)))
        b = b + noise * (jax.random.normal(k3, (n,)) + 1j * jax.random.normal(k4, (n,)))
    x = jnp.stack([a, b])
    return C(jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))


PAIRS = jnp.asarray([[0, 1]], jnp.int32)


def test_caf_recovers_delay_and_doppler():
    x = _pair_with(delay=37.5, doppler_hz=9.0)
    res = caf_pairs(x, PAIRS, FS, max_lag=128, seg_len=1 << 14, n_doppler=33)
    assert float(res.delay[0]) == pytest.approx(37.5, abs=0.2)
    assert float(res.doppler_hz[0]) == pytest.approx(9.0, abs=1.0)


def test_caf_zero_doppler_matches_correlator():
    x = _pair_with(delay=-21.25, doppler_hz=0.0)
    res = caf_pairs(x, PAIRS, FS, max_lag=128, seg_len=1 << 14, n_doppler=17)
    assert float(res.delay[0]) == pytest.approx(-21.25, abs=0.1)
    assert abs(float(res.doppler_hz[0])) < 1.0


def test_doppler_kills_plain_correlation_caf_survives():
    """The motivating failure: 12 Hz of relative Doppler over 0.26 s of
    coherent integration rotates segment phases through ~3 full turns —
    the plain accumulated correlation collapses while the CAF keeps the
    full integration gain."""
    x = _pair_with(delay=50.0, doppler_hz=12.0, noise=1.0, seed=5)
    plain = correlate_pairs_planar(
        x, PAIRS, max_lag=128, seg_len=1 << 14, weighting="phat"
    )
    caf = caf_pairs(x, PAIRS, FS, max_lag=128, seg_len=1 << 14, n_doppler=33)
    # −3 dB per-sample SNR + sub-bin Doppler residual: ~1-sample noise
    # floor; the contrast with the collapsed plain path is the point.
    assert float(caf.delay[0]) == pytest.approx(50.0, abs=1.5)
    # The plain path either misses the delay or reports a far weaker peak.
    plain_err = abs(float(plain.delay[0]) - 50.0)
    assert plain_err > 1.0 or float(caf.peak_value[0]) > 3 * float(
        plain.peak_value[0]
    )


def test_caf_surface_shape():
    x = _pair_with(delay=10.0, doppler_hz=3.0, n=1 << 17)
    res = caf_pairs(x, PAIRS, FS, max_lag=64, seg_len=1 << 13, n_doppler=9)
    assert res.surface.shape == (1, 9, 129)
