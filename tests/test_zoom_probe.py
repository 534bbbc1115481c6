"""Fused split-σ probe kernel (ops/pallas/zoom_probe.py) vs the XLA
LOO-weight + zoom-DFT path it replaces on TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdoa_tpu.ops.cplx import C
from tdoa_tpu.ops.corr import _weight_factor, _zoom_corr_delay
from tdoa_tpu.ops.pallas.zoom_probe import (
    HALF_WIDTH,
    TILE,
    loo_zoom_delays_pallas,
    zoom_probe_supported,
)


def _mk_probe_case(K=4, n_st=3, F=4096, seed=0):
    """Per-group cross-spectra of clean pure delays + a small noise
    floor: every probe window has one unambiguous peak, so kernel-vs-XLA
    comparison measures numerics, not argmax tie-breaking."""
    rng = np.random.default_rng(seed)
    pairs = tuple(
        (i, j) for i in range(n_st) for j in range(i + 1, n_st)
    )
    m = len(pairs)
    delays = rng.uniform(-40, 40, size=m)
    f = np.fft.fftfreq(F)
    # Band-limited source spectrum shared by the pair; per-group noise.
    s2 = np.exp(-((np.arange(F) % F) / F - 0.5) ** 2 * 40.0)
    s2 = np.fft.fftshift(s2) + 0.01
    cr = np.zeros((K, m, F), np.float32)
    ci = np.zeros((K, m, F), np.float32)
    psd = np.zeros((K, n_st, F), np.float32)
    for k in range(K):
        jitter = rng.normal(scale=0.05, size=m)
        for p, d in enumerate(delays):
            ang = -2.0 * np.pi * f * (d + jitter[p])
            w = s2 * (1.0 + 0.1 * rng.standard_normal(F))
            cr[k, p] = (w * np.cos(ang)).astype(np.float32)
            ci[k, p] = (w * np.sin(ang)).astype(np.float32)
        for s in range(n_st):
            psd[k, s] = (s2 * (1.0 + 0.05 * rng.standard_normal(F))
                         + 0.02).astype(np.float32)
    coarse = np.round(delays).astype(np.float32)
    n_seg_total = 4 * K
    q, r = divmod(n_seg_total, K)
    n_seg_loo = np.repeat(
        n_seg_total - (q + (np.arange(K) < r).astype(np.int64)), m
    ).astype(np.float32)
    return pairs, cr, ci, psd, coarse, n_seg_loo


def _xla_probe(pairs, cr, ci, psd, coarse, n_seg_loo, F, max_lag, eps):
    """The exact XLA probe block from ops.corr._combine_splits."""
    K, m, _ = cr.shape
    n_st = psd.shape[1]
    cr_g = jnp.asarray(cr)
    ci_g = jnp.asarray(ci)
    psd_g = jnp.asarray(psd)
    cr_full = jnp.sum(cr_g, axis=0)
    ci_full = jnp.sum(ci_g, axis=0)
    psd_full = jnp.sum(psd_g, axis=0)
    loo_cross = C(
        (cr_full[None] - cr_g).reshape(K * m, -1),
        (ci_full[None] - ci_g).reshape(K * m, -1),
    )
    loo_psd = (psd_full[None] - psd_g).reshape(K * n_st, -1)
    pair_idx = jnp.asarray(np.array(pairs, np.int32))
    pair_big = (
        jnp.tile(pair_idx, (K, 1))
        + (jnp.arange(K, dtype=jnp.int32).repeat(m)[:, None] * n_st)
    )
    s_k = _weight_factor(
        loo_cross, loo_psd, pair_big, "ht", eps,
        jnp.asarray(n_seg_loo)[:, None],
    )
    return _zoom_corr_delay(
        C(cr_g.reshape(K * m, -1) * s_k, ci_g.reshape(K * m, -1) * s_k),
        jnp.tile(jnp.asarray(coarse), K), F, max_lag,
    ).reshape(K, m)


def test_zoom_probe_matches_xla_path():
    F, max_lag, eps = 4096, 128, 1e-3
    pairs, cr, ci, psd, coarse, n_seg_loo = _mk_probe_case(F=F)
    ds_xla = _xla_probe(pairs, cr, ci, psd, coarse, n_seg_loo,
                        F, max_lag, eps)
    ds_k = loo_zoom_delays_pallas(
        C(jnp.asarray(cr), jnp.asarray(ci)), jnp.asarray(psd),
        pairs, jnp.asarray(coarse), jnp.asarray(n_seg_loo), F, eps,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(ds_k), np.asarray(ds_xla), atol=2e-3
    )


def test_zoom_probe_negative_delays_int_deramp():
    """Negative coarse delays go through the two's-complement bitwise
    AND residue — must match the XLA int32 mod path exactly."""
    F, max_lag, eps = 4096, 128, 1e-3
    pairs, cr, ci, psd, coarse, n_seg_loo = _mk_probe_case(F=F, seed=3)
    coarse = -np.abs(coarse) - 7.0
    ds_xla = _xla_probe(pairs, cr, ci, psd, coarse, n_seg_loo,
                        F, max_lag, eps)
    ds_k = loo_zoom_delays_pallas(
        C(jnp.asarray(cr), jnp.asarray(ci)), jnp.asarray(psd),
        pairs, jnp.asarray(coarse), jnp.asarray(n_seg_loo), F, eps,
        interpret=True,
    )
    # The probes' true peaks sit >16 lags from the forced-wrong coarse
    # delay, so windows saturate — but both paths must saturate the
    # same way (identical windows).
    np.testing.assert_allclose(
        np.asarray(ds_k), np.asarray(ds_xla), atol=2e-3
    )


def test_zoom_probe_support_gate():
    assert zoom_probe_supported(65536, 20000, "ht")
    assert zoom_probe_supported(4096, 512, "ml")
    assert not zoom_probe_supported(65536, 20000, "phat")
    assert not zoom_probe_supported(1024, 128, "ht")  # < TILE
    assert not zoom_probe_supported(65536, 40000, "ht")  # int32 guard


def test_zoom_probe_vmem_gate():
    """Geometries whose live set exceeds the 100 MB scoped-VMEM ceiling
    must be rejected (advisor round-4 medium: the vmem_limit_bytes
    request silently clamps and 16-24-station probes would be a Mosaic
    compile failure on chip). The chip-validated 12-station geometry
    (K=4, m=66) must still pass; 16 stations (m=120) must not."""
    # 12 stations, K=4: KM=264 rows — chip-validated, fits.
    assert zoom_probe_supported(65536, 20000, "ht", K=4, m=66, n_st=12)
    # 16 stations, K=4: KM=480 rows — formula exceeds the ceiling.
    assert not zoom_probe_supported(65536, 20000, "ht", K=4, m=120,
                                    n_st=16)
    # 24 stations: far past it.
    assert not zoom_probe_supported(65536, 20000, "ht", K=4, m=276,
                                    n_st=24)
    # The gate arithmetic must be the SAME formula the kernel requests
    # with (no drift between gate and request).
    from tdoa_tpu.ops.pallas.zoom_probe import (
        VMEM_CEILING,
        _vmem_need_bytes,
    )

    assert _vmem_need_bytes(4 * 66, 4 * 12) <= VMEM_CEILING
    assert _vmem_need_bytes(4 * 120, 4 * 16) > VMEM_CEILING


def test_fused_corr_routes_probe_kernel(monkeypatch):
    """correlate_pairs_fused with the probe kernel forced (it runs in
    interpret mode on CPU) must match the XLA probe path it replaces
    on TPU."""
    from tdoa_tpu.ops import corr as corr_mod
    from tdoa_tpu.ops.corr import correlate_pairs_fused
    from tdoa_tpu.ops.pallas.corr_accum import SEG_LEN

    rng = np.random.default_rng(11)
    n = SEG_LEN * 8  # K = 4
    t = np.arange(n)
    base = (np.exp(1j * 2 * np.pi * 0.011 * t)
            + 0.3 * rng.standard_normal(n)).astype(np.complex64)
    moved = np.roll(base, 9)
    x = C(
        jnp.asarray(np.stack([base.real, moved.real]), jnp.float32),
        jnp.asarray(np.stack([base.imag, moved.imag]), jnp.float32),
    )
    pairs = ((0, 1),)
    ref = correlate_pairs_fused(x, pairs, max_lag=512, weighting="ht",
                                remove_dc=True)
    monkeypatch.setattr(corr_mod, "_FORCE_PROBE_KERNEL", True)
    try:
        jax.clear_caches()  # the routing decision is trace-time
        routed = correlate_pairs_fused(
            x, pairs, max_lag=512, weighting="ht", remove_dc=True)
        assert abs(float(routed.delay[0]) - 9.0) < 0.05
        np.testing.assert_allclose(
            float(routed.delay[0]), float(ref.delay[0]), atol=1e-4
        )
        np.testing.assert_allclose(
            float(routed.delay_std[0]), float(ref.delay_std[0]),
            rtol=0.02, atol=1e-4,
        )
    finally:
        # Drop the routed executable from the jit cache so later tests
        # retrace with the un-forced routing.
        jax.clear_caches()
