"""Fused Pallas correlator vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdoa_tpu.ops.corr import correlate_pairs_fused, correlate_pairs_planar
from tdoa_tpu.ops.cplx import C
from tdoa_tpu.ops.pallas.corr_accum import SEG_LEN
from tdoa_tpu.sim import fm_source, fractional_delay


def test_fused_matches_xla_path():
    n = SEG_LEN * 4
    base = fm_source(jax.random.PRNGKey(0), n, 2e6)
    sigs = [base, fractional_delay(base, jnp.float32(33.75)),
            fractional_delay(base, jnp.float32(-11.5))]
    x = jnp.stack(sigs)
    xp = C(jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))
    pairs_t = ((0, 1), (0, 2), (1, 2))
    fused = correlate_pairs_fused(xp, pairs_t, max_lag=128, weighting="ht")
    xla = correlate_pairs_planar(
        xp, jnp.asarray(np.array(pairs_t, np.int32)),
        max_lag=128, seg_len=SEG_LEN, fft_len=65536, weighting="ht",
    )
    np.testing.assert_allclose(
        np.asarray(fused.delay), np.asarray(xla.delay), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(fused.delay), [33.75, -11.5, -45.25], atol=0.05
    )
