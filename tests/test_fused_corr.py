"""Fused Pallas correlator vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest
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


def test_fused_dc_removal_linearity():
    """remove_dc folds in at finalize (FFT(x−m) = FFT(x) − m·D); it must
    match explicitly demeaning the signal before the kernel."""
    from tdoa_tpu.ops.pallas.corr_accum import accumulate_cross_spectra_pallas

    n = SEG_LEN * 2
    key = jax.random.PRNGKey(3)
    kr, ki = jax.random.split(key)
    re = jax.random.normal(kr, (2, n), jnp.float32) + 0.21
    im = jax.random.normal(ki, (2, n), jnp.float32) - 0.13
    x = C(re, im)
    pairs = ((0, 1),)
    cross_dc, psd_dc, energy_dc = accumulate_cross_spectra_pallas(
        x, pairs, remove_dc=True
    )
    x_dm = C(re - jnp.mean(re, axis=-1, keepdims=True),
             im - jnp.mean(im, axis=-1, keepdims=True))
    cross_ref, psd_ref, energy_ref = accumulate_cross_spectra_pallas(
        x_dm, pairs, remove_dc=False
    )
    scale = float(jnp.max(jnp.abs(cross_ref.re)))
    np.testing.assert_allclose(
        np.asarray(cross_dc.re) / scale, np.asarray(cross_ref.re) / scale,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cross_dc.im) / scale, np.asarray(cross_ref.im) / scale,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(energy_dc), np.asarray(energy_ref), rtol=1e-4
    )


def test_fused_prescale_is_unit_rms_normalization():
    """Deferred per-station scaling must equal pre-scaling the signal."""
    from tdoa_tpu.ops.pallas.corr_accum import accumulate_cross_spectra_pallas

    n = SEG_LEN
    key = jax.random.PRNGKey(4)
    kr, ki = jax.random.split(key)
    re = 3.7 * jax.random.normal(kr, (2, n), jnp.float32)
    im = 3.7 * jax.random.normal(ki, (2, n), jnp.float32)
    x = C(re, im)
    pairs = ((0, 1),)
    cross_s, psd_s, energy_s = accumulate_cross_spectra_pallas(
        x, pairs, prescale=True
    )
    rms = jnp.sqrt(jnp.mean(re**2 + im**2, axis=-1, keepdims=True))
    xn = C(re / rms, im / rms)
    cross_n, psd_n, energy_n = accumulate_cross_spectra_pallas(
        xn, pairs, prescale=False
    )
    scale = float(jnp.max(jnp.abs(cross_n.re)))
    np.testing.assert_allclose(
        np.asarray(cross_s.re) / scale, np.asarray(cross_n.re) / scale,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(psd_s) / scale, np.asarray(psd_n) / scale, atol=1e-4
    )
    # prescale reports energy = sample count (unit-RMS convention).
    np.testing.assert_allclose(np.asarray(energy_s), float(n), rtol=1e-4)


def test_fused_multi_segment_step_pads_odd_counts():
    """segs_per_step=2 on an ODD segment count (the per-slice split
    layout's 111/110-segment slices) must zero-pad the grid exactly:
    cross/PSD/energy equal the segs_per_step=1 result (same segments,
    contributions combined in registers before each accumulator RMW;
    zero segments contribute nothing and the finalize divides by the
    REAL count — round-4 verdict item 2)."""
    from tdoa_tpu.ops.pallas.corr_accum import accumulate_cross_spectra_pallas

    n = SEG_LEN * 5  # odd: 5 % 2 == 1 → one zero pad segment
    key = jax.random.PRNGKey(9)
    kr, ki = jax.random.split(key)
    re = jax.random.normal(kr, (3, n), jnp.float32) + 0.11
    im = jax.random.normal(ki, (3, n), jnp.float32) - 0.07
    x = C(re, im)
    pairs = ((0, 1), (0, 2), (1, 2))
    c1, p1, e1 = accumulate_cross_spectra_pallas(
        x, pairs, remove_dc=True, segs_per_step=1)
    c2, p2, e2 = accumulate_cross_spectra_pallas(
        x, pairs, remove_dc=True, segs_per_step=2)
    scale = float(jnp.max(jnp.abs(c1.re)))
    np.testing.assert_allclose(np.asarray(c2.re) / scale,
                               np.asarray(c1.re) / scale, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2.im) / scale,
                               np.asarray(c1.im) / scale, atol=1e-5)
    # Register-combined contributions change the f32 addition order;
    # a few bins land ~1e-4 relative apart.
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=3e-4)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1),
                               rtol=1e-6)


def test_slice_segs_per_step_rule(monkeypatch):
    """Default: 1 everywhere — multi-segment steps measured SLOWER on
    chip even at 12 stations (SEGSTEP_AB.json: +18.5 ms queued; the
    live per-segment spectra cost more than the halved accumulator RMW
    saves). Env override remains for measurement."""
    from tdoa_tpu.ops.corr import _slice_segs_per_step

    monkeypatch.delenv("TDOA_TPU_SEGS_PER_STEP", raising=False)
    assert _slice_segs_per_step(3) == 1
    assert _slice_segs_per_step(66) == 1
    monkeypatch.setenv("TDOA_TPU_SEGS_PER_STEP", "2")
    assert _slice_segs_per_step(66) == 2
    monkeypatch.setenv("TDOA_TPU_SEGS_PER_STEP", "4")
    assert _slice_segs_per_step(3) == 4


def test_fused_accepts_bf16_blocks():
    """bf16 planar input (the TPU path's native storage) must flow
    through and deliver the same delays as f32 input."""
    n = SEG_LEN * 2
    base = fm_source(jax.random.PRNGKey(5), n, 2e6)
    sigs = [base, fractional_delay(base, jnp.float32(17.25))]
    x = jnp.stack(sigs)
    xp = C(jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))
    x16 = C(xp.re.astype(jnp.bfloat16), xp.im.astype(jnp.bfloat16))
    pairs_t = ((0, 1),)
    f32res = correlate_pairs_fused(xp, pairs_t, max_lag=64, weighting="ht",
                                   remove_dc=True)
    b16res = correlate_pairs_fused(x16, pairs_t, max_lag=64, weighting="ht",
                                   remove_dc=True)
    np.testing.assert_allclose(
        np.asarray(b16res.delay), np.asarray(f32res.delay), atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(b16res.delay), [17.25], atol=0.05)


def test_fused_production_config_bf16_remove_dc():
    """The exact kernel configuration process_blocks runs on TPU
    (precision='bf16', remove_dc=True): bf16 scratch round-trip, bf16
    DFT/stage-1-cut matrices, DC-bin mean + spectral-sum algebra. Small
    input — interpret-mode bf16 matmuls are slow on CPU."""
    from tdoa_tpu.ops.pallas.corr_accum import accumulate_cross_spectra_pallas

    n = SEG_LEN * 2
    key = jax.random.PRNGKey(9)
    kr, ki = jax.random.split(key)
    re = jax.random.normal(kr, (2, n), jnp.float32) + 0.17
    im = jax.random.normal(ki, (2, n), jnp.float32) - 0.09
    x16 = C(re.astype(jnp.bfloat16), im.astype(jnp.bfloat16))
    pairs = ((0, 1),)
    cross16, psd16, energy16 = accumulate_cross_spectra_pallas(
        x16, pairs, precision="bf16", remove_dc=True, prescale=True
    )
    # Reference: f32 kernel on explicitly demeaned+normalized bf16 values.
    re32 = x16.re.astype(jnp.float32)
    im32 = x16.im.astype(jnp.float32)
    re32 = re32 - jnp.mean(re32, axis=-1, keepdims=True)
    im32 = im32 - jnp.mean(im32, axis=-1, keepdims=True)
    rms = jnp.sqrt(jnp.mean(re32**2 + im32**2, axis=-1, keepdims=True))
    xr = C(re32 / rms, im32 / rms)
    cross_ref, psd_ref, energy_ref = accumulate_cross_spectra_pallas(
        xr, pairs, precision="f32"
    )
    scale = float(jnp.max(jnp.abs(cross_ref.re)))
    # bf16 matmul operands vs f32: bounded relative error on the spectra.
    np.testing.assert_allclose(
        np.asarray(cross16.re) / scale, np.asarray(cross_ref.re) / scale,
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(energy16), np.asarray(energy_ref), rtol=1e-3
    )


def test_fused_rejects_aliased_max_lag():
    """max_lag beyond the kernel's zero-pad slack would return circularly
    aliased correlations; it must be an error, not silence."""
    from tdoa_tpu.ops.corr import correlate_pairs_fused
    from tdoa_tpu.ops.pallas.corr_accum import FFT_LEN, SEG_LEN
    from tdoa_tpu.ops.cplx import C

    x = C(jnp.zeros((2, SEG_LEN), jnp.float32),
          jnp.zeros((2, SEG_LEN), jnp.float32))
    with pytest.raises(ValueError, match="alias-free"):
        correlate_pairs_fused(x, ((0, 1),), max_lag=FFT_LEN - SEG_LEN + 1)


def test_fused_rejects_short_capture():
    from tdoa_tpu.ops.pallas.corr_accum import (
        SEG_LEN, accumulate_cross_spectra_pallas)
    from tdoa_tpu.ops.cplx import C

    x = C(jnp.zeros((2, SEG_LEN - 100), jnp.float32),
          jnp.zeros((2, SEG_LEN - 100), jnp.float32))
    with pytest.raises(ValueError, match="shorter than one kernel segment"):
        accumulate_cross_spectra_pallas(x, ((0, 1),))


def test_dc_heavy_input_stays_finite():
    """The DC-removal finalize algebra cancels large near-equal terms and
    can round a PSD bin slightly negative; HT's sqrt must never NaN
    (regression: an 8-station hardware run had one station's REF block
    peg every pair at the window edge with quality=NaN)."""
    rng = np.random.default_rng(3)
    n = 2 * SEG_LEN
    sig = rng.standard_normal(n).astype(np.float32) * 0.05
    x = C(
        jnp.stack([sig + 0.0055, np.roll(sig, 9) + 0.0048]),
        jnp.stack([sig * 0.5 - 0.003, np.roll(sig, 9) * 0.5 + 0.004]),
    )
    res = correlate_pairs_fused(
        x, ((0, 1),), max_lag=256, weighting="ht", remove_dc=True
    )
    assert np.isfinite(np.asarray(res.corr)).all()
    assert np.isfinite(float(res.quality[0]))
    assert abs(float(res.delay[0]) - 9.0) < 0.1


def test_fused_capacity_gate():
    """The station limit is a VMEM-capacity computation, not a magic
    number: 8/12/16 stations fit v5e's budget in ONE invocation (16
    validated on chip, BENCHLOG round 2); 17+ pair-tile across up to
    MAX_PAIR_CHUNKS invocations; past that (or when the per-station
    accumulators alone bust the budget) the router falls back to XLA —
    the per-chunk FFT/input redundancy is unvalidated territory."""
    from tdoa_tpu.ops.pallas.corr_accum import (
        MAX_PAIR_CHUNKS,
        fused_capacity_ok,
        fused_max_pairs,
    )

    for n_st in (3, 8, 12, 16):
        m = n_st * (n_st - 1) // 2
        assert fused_max_pairs(n_st, remove_dc=True) >= m, n_st
    for n_st in (17, 20, 24):
        m = n_st * (n_st - 1) // 2
        # Tiled: supported, but not in one invocation.
        assert fused_capacity_ok(n_st, m, remove_dc=True), n_st
        cap = fused_max_pairs(n_st, remove_dc=True)
        assert cap < m <= MAX_PAIR_CHUNKS * cap, n_st
    for n_st in (32, 64, 300):
        m = n_st * (n_st - 1) // 2
        assert not fused_capacity_ok(n_st, m, remove_dc=True), n_st
    # f32 operands double the input footprint: the cap must shrink.
    assert (fused_max_pairs(20, precision="f32")
            < fused_max_pairs(20, precision="bf16"))
    # Grouped (split-σ) invocations are additionally capped at the
    # chip-validated rank-4 output window size: rank-4 windows past
    # (1, 28, R, R) fault the TPU worker (GROUPED_PAIR_WINDOW_CAP,
    # chip-bisected round 3) — a harder limit than VMEM.
    from tdoa_tpu.ops.pallas.corr_accum import GROUPED_PAIR_WINDOW_CAP

    for n_st in (12, 16, 20):
        assert (fused_max_pairs(n_st, remove_dc=True, n_splits=4)
                <= GROUPED_PAIR_WINDOW_CAP), n_st
    # The cap only binds grouped layouts; single-bank (rank-3 refs)
    # keeps the pure VMEM bound.
    assert fused_max_pairs(12, remove_dc=True) > GROUPED_PAIR_WINDOW_CAP


def test_fused_twelve_stations_interpret():
    """12-station (66-pair) kernel correctness in interpret mode: the
    capacity-gated extension beyond the round-1 8-station limit."""
    import numpy as np
    from tdoa_tpu.ops.corr import correlate_pairs_fused
    from tdoa_tpu.ops.cplx import C
    from tdoa_tpu.ops.pallas.corr_accum import SEG_LEN
    from tdoa_tpu.solve.multilateration import station_pairs
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    n = SEG_LEN
    base = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    shifts = [3 * k for k in range(12)]
    sig = np.stack([np.roll(base, s) for s in shifts])
    x = C(jnp.asarray(sig.real), jnp.asarray(sig.imag))
    pairs = tuple(map(tuple, station_pairs(12).tolist()))
    r = correlate_pairs_fused(x, pairs, max_lag=128, weighting="ht",
                              precision="f32", remove_dc=True)
    want = np.array([shifts[j] - shifts[i] for i, j in pairs])
    err = np.abs(np.asarray(r.delay) - want).max()
    assert err < 0.05, err


def test_fused_split_half_full_capture_prescale():
    """The split-half error-bar path must scale BOTH halves by the FULL
    capture's per-station RMS. Per-half unit-RMS scaling (the bug this
    pins) amplifies a quiet half to parity with the loud half, breaking
    the halves-sum-to-full invariant under nonstationary power; the
    planar path, which normalizes once before splitting, is the oracle."""
    n = SEG_LEN * 2
    base = fm_source(jax.random.PRNGKey(7), n, 2e6)
    moved = fractional_delay(base, jnp.float32(21.25))
    x = jnp.stack([base, moved])
    xp = C(jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))
    # Emitter keys on mid-capture at station 1: quiet first half.
    gain = jnp.concatenate(
        [jnp.full(SEG_LEN, 0.05, jnp.float32),
         jnp.full(n - SEG_LEN, 1.0, jnp.float32)]
    )
    xp = C(xp.re.at[1].mul(gain), xp.im.at[1].mul(gain))
    fused = correlate_pairs_fused(xp, ((0, 1),), max_lag=128, weighting="ht")
    planar = correlate_pairs_planar(
        xp, jnp.asarray([[0, 1]], np.int32), max_lag=128,
        seg_len=SEG_LEN, fft_len=65536, weighting="ht",
    )
    assert abs(float(fused.delay[0]) - 21.25) < 0.05, float(fused.delay[0])
    np.testing.assert_allclose(
        float(fused.delay[0]), float(planar.delay[0]), atol=2e-3
    )
    # Same data, same split-half estimator: the sigmas agree too.
    np.testing.assert_allclose(
        float(fused.delay_std[0]), float(planar.delay_std[0]), rtol=0.05,
        atol=1e-4,
    )


def test_fused_pair_tiling_matches_single_invocation():
    """Pair lists past one invocation's VMEM budget split into chunks
    (fused_max_pairs); the stitched cross-spectra and the per-station
    outputs must match the single-invocation result exactly — the
    chunks run the identical kernel on identical inputs."""
    from tdoa_tpu.ops.pallas.corr_accum import (
        accumulate_cross_spectra_pallas,
        fused_max_pairs,
    )

    assert fused_max_pairs(17) >= 1  # 17+ stations are now supported
    n_st, n = 5, SEG_LEN
    key = jax.random.PRNGKey(3)
    sig = jax.random.normal(key, (2, n_st, n), jnp.float32)
    x = C(sig[0], sig[1])
    pairs = tuple((i, j) for i in range(n_st) for j in range(i + 1, n_st))
    one = accumulate_cross_spectra_pallas(
        x, pairs, remove_dc=True, prescale=True)
    tiled = accumulate_cross_spectra_pallas(
        x, pairs, remove_dc=True, prescale=True, _force_max_pairs=4)
    np.testing.assert_array_equal(np.asarray(tiled[0].re),
                                  np.asarray(one[0].re))
    np.testing.assert_array_equal(np.asarray(tiled[0].im),
                                  np.asarray(one[0].im))
    np.testing.assert_array_equal(np.asarray(tiled[1]), np.asarray(one[1]))
    np.testing.assert_array_equal(np.asarray(tiled[2]), np.asarray(one[2]))


def test_fused_grouped_splits_match_separate_invocations():
    """The grouped split-sigma layout (n_splits=K, one invocation, K
    accumulator banks — the round-3 headline-regression fix) must be
    numerically identical to K separate kernel calls on the
    _split_bounds slices, and the banks must sum to the full-capture
    K=1 accumulators (linearity)."""
    from tdoa_tpu.ops.corr import _split_bounds
    from tdoa_tpu.ops.pallas.corr_accum import (
        accumulate_cross_spectra_pallas,
    )

    n_st, n_seg, K = 3, 5, 2
    n = SEG_LEN * n_seg
    key = jax.random.PRNGKey(7)
    sig = jax.random.normal(key, (2, n_st, n), jnp.float32)
    # A per-station DC offset so remove_dc has real work per group.
    x = C(sig[0] + jnp.arange(n_st, dtype=jnp.float32)[:, None] * 0.1,
          sig[1])
    pairs = ((0, 1), (0, 2), (1, 2))

    for remove_dc in (False, True):
        grouped = accumulate_cross_spectra_pallas(
            x, pairs, remove_dc=remove_dc, n_splits=K)
        assert grouped[0].re.shape[0] == K
        assert grouped[1].shape[0] == K and grouped[2].shape[0] == K

        bounds = _split_bounds(n_seg, K, SEG_LEN)
        for k in range(K):
            sl = slice(bounds[k], bounds[k + 1])
            single = accumulate_cross_spectra_pallas(
                C(x.re[:, sl], x.im[:, sl]), pairs,
                remove_dc=remove_dc)
            np.testing.assert_allclose(
                np.asarray(grouped[0].re[k]), np.asarray(single[0].re),
                rtol=0, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(grouped[0].im[k]), np.asarray(single[0].im),
                rtol=0, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(grouped[1][k]), np.asarray(single[1]),
                rtol=0, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(grouped[2][k]), np.asarray(single[2]),
                rtol=1e-6, atol=0)

        if not remove_dc:
            # Groups sum to the full-capture accumulation (the
            # invariant the split-sigma finalize relies on) — up to f32
            # reassociation: the full path accumulates every segment
            # into ONE bank while the grouped path sums K separately
            # accumulated banks, so entries of magnitude ~1e8 differ at
            # the ~1e-7 relative level, not bitwise.
            full = accumulate_cross_spectra_pallas(x, pairs)
            scale = float(np.abs(np.asarray(full[0].re)).max())
            np.testing.assert_allclose(
                np.asarray(jnp.sum(grouped[0].re, axis=0)),
                np.asarray(full[0].re), rtol=0, atol=1e-5 * scale)
            np.testing.assert_allclose(
                np.asarray(jnp.sum(grouped[0].im, axis=0)),
                np.asarray(full[0].im), rtol=0, atol=1e-5 * scale)
            np.testing.assert_allclose(
                np.asarray(jnp.sum(grouped[1], axis=0)),
                np.asarray(full[1]), rtol=1e-5, atol=1e-5 * scale)
            np.testing.assert_allclose(
                np.asarray(jnp.sum(grouped[2], axis=0)),
                np.asarray(full[2]), rtol=1e-5, atol=0)


def test_fused_split_per_slice_fallback_matches_grouped(monkeypatch):
    """Big networks whose pair list exceeds ONE grouped invocation's
    budget (fused_max_pairs with n_splits=K) take the round-2 per-slice
    scheme (K single-bank invocations) instead of the grouped layout —
    a pair-TILED grouped invocation would re-run every per-station FFT
    per chunk (the round-4 12-station plateau). Both layouts must
    produce the same CorrResult. Forced here by denying grouped
    capacity, so the 3-station geometry exercises the fallback branch
    cheaply."""
    import tdoa_tpu.ops.pallas.corr_accum as ca

    n_st, n_seg = 3, 8  # split_k -> K=4
    n = SEG_LEN * n_seg
    key = jax.random.PRNGKey(11)
    sig = jax.random.normal(key, (2, n_st, n), jnp.float32)
    base = fm_source(key, n, 2e6)
    br = jnp.real(base).astype(jnp.float32)
    bi = jnp.imag(base).astype(jnp.float32)
    x = C(sig[0] * 0.05 + jnp.stack([br] * n_st),
          sig[1] * 0.05 + jnp.stack([bi] * n_st))
    pairs = ((0, 1), (0, 2), (1, 2))

    grouped = correlate_pairs_fused(x, pairs, max_lag=512, remove_dc=True)

    real_cap = ca.fused_max_pairs

    def deny_grouped(n_st_, remove_dc=True, precision="bf16",
                     segs_per_step=1, n_splits=1):
        if n_splits > 1:
            return 0
        return real_cap(n_st_, remove_dc, precision, segs_per_step,
                        n_splits=n_splits)

    monkeypatch.setattr(ca, "fused_max_pairs", deny_grouped)
    per_slice = correlate_pairs_fused(x, pairs, max_lag=512,
                                      remove_dc=True)

    np.testing.assert_allclose(np.asarray(per_slice.delay),
                               np.asarray(grouped.delay), atol=1e-3)
    np.testing.assert_allclose(np.asarray(per_slice.delay_std),
                               np.asarray(grouped.delay_std),
                               rtol=0.05, atol=1e-4)
    np.testing.assert_allclose(np.asarray(per_slice.corr),
                               np.asarray(grouped.corr),
                               rtol=0, atol=1e-4)


def test_raw_mode_matches_in_call_finalize():
    """finalize=False + an external _finalize_banks call must equal the
    in-call finalized output exactly (the A/B measurement harness in
    scripts/headline_profile.py builds on this equivalence)."""
    from tdoa_tpu.ops.pallas.corr_accum import (
        _finalize_banks,
        accumulate_cross_spectra_pallas,
    )

    n = SEG_LEN * 2
    base = fm_source(jax.random.PRNGKey(3), n, 2e6)
    moved = fractional_delay(base, jnp.float32(7.5))
    x = jnp.stack([base, moved])
    xp = C(jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))
    pairs = ((0, 1),)
    cross, psd, energy = accumulate_cross_spectra_pallas(
        xp, pairs, remove_dc=True, prescale=False
    )
    raw = accumulate_cross_spectra_pallas(
        xp, pairs, remove_dc=True, prescale=False, finalize=False
    )
    cross2, psd2, energy2 = _finalize_banks(
        raw[0][None], raw[1][None], raw[2][None], raw[3][None],
        raw[4][None], np.asarray(pairs, np.int32),
        np.asarray([n // SEG_LEN], np.float32), True, False,
    )
    # Same math, different XLA fusion boundaries: equality holds to
    # f32 rounding (measured max rel diff ~2e-6), not bit-exactly.
    np.testing.assert_allclose(np.asarray(cross.re),
                               np.asarray(cross2.re[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cross.im),
                               np.asarray(cross2.im[0]), rtol=1e-5,
                               atol=1e-3 * float(np.abs(cross.re).max()))
    np.testing.assert_allclose(np.asarray(psd), np.asarray(psd2[0]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(energy),
                               np.asarray(energy2[0]), rtol=1e-5)
