"""Batched FFT cross-correlation with GCC weighting — the hot path.

Replaces the reference's O(maxLag·N) time-domain search
(processor.go:646-736, ~4×10¹⁰ MACs per pair) and its dead
frequency-domain path (processor.go:539-616, which applied a forward DFT
where an inverse belonged) with the textbook O(N log N) scheme, shaped for
TPU:

- signals for all stations are FFT'd **once per segment** and every station
  pair reuses them (cross-spectra are outer products on the pair axis);
- long captures stream through fixed-size segments under ``lax.scan``,
  coherently accumulating the cross-power spectrum on device — this is the
  "coherent integration" the reference approximates blockwise
  (processor.go:682-726) done exactly, with O(seg) memory;
- GCC weighting (PHAT / SCOT / none) is applied to the *accumulated*
  spectrum, then one inverse FFT per pair yields the correlation, and the
  peak is refined to sub-sample precision (ops/peaks.py).

Sign convention: for pair ``(i, j)`` the cross-spectrum is
``X_j · conj(X_i)``, so a **positive** delay means the signal arrives at
station *j* later than at station *i* — matching the solver's convention
(solve/multilateration.py).

Correctness window: with FFT length ≥ seg_len + max_lag the circular
correlation equals the linear one for all |lag| ≤ max_lag (zero-padding
argument), so the ±max_lag window carries no wraparound alias.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdoa_tpu.ops.peaks import parabolic_peak, peak_quality
from tdoa_tpu.utils.constants import DEFAULT_MAX_LAG


def next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def correlation_lags(max_lag: int) -> np.ndarray:
    """Lag axis for the correlation window: [-max_lag, ..., +max_lag]."""
    return np.arange(-max_lag, max_lag + 1)


class CorrResult(NamedTuple):
    delay: jax.Array  # [m] sub-sample delay estimate (samples)
    peak_value: jax.Array  # [m] normalized peak magnitude
    quality: jax.Array  # [m] peak-to-sidelobe ratio
    corr: jax.Array  # [m, 2*max_lag+1] normalized |correlation| window


def _accumulate_cross_spectra(x, pair_idx, seg_len, fft_len):
    """Scan segments, accumulating per-pair cross-spectra and per-station
    spectral power. Returns (cross [m, F] complex, psd [n_st, F] float,
    energy [n_st] float)."""
    n_st, n = x.shape
    n_seg = n // seg_len
    x = x[:, : n_seg * seg_len]

    def seg_fft(s):
        seg = jax.lax.dynamic_slice(x, (0, s * seg_len), (n_st, seg_len))
        return jnp.fft.fft(seg, n=fft_len, axis=-1)

    def step(carry, s):
        cross_acc, psd_acc = carry
        xf = seg_fft(s)  # [n_st, F]
        cross = xf[pair_idx[:, 1]] * jnp.conj(xf[pair_idx[:, 0]])  # [m, F]
        psd = jnp.abs(xf) ** 2  # [n_st, F]
        return (cross_acc + cross, psd_acc + psd), None

    m = pair_idx.shape[0]
    init = (
        jnp.zeros((m, fft_len), jnp.complex64),
        jnp.zeros((n_st, fft_len), jnp.float32),
    )
    if n_seg == 1:
        (cross, psd), _ = step(init, 0)
    else:
        (cross, psd), _ = jax.lax.scan(step, init, jnp.arange(n_seg))
    energy = jnp.sum(jnp.abs(x) ** 2, axis=-1)
    return cross, psd, energy


def _weight_spectrum(cross, psd, pair_idx, weighting: str, eps: float):
    if weighting == "phat":
        mag = jnp.abs(cross)
        return cross / (mag + eps * jnp.mean(mag, axis=-1, keepdims=True) + 1e-30)
    if weighting == "scot":
        denom = jnp.sqrt(psd[pair_idx[:, 0]] * psd[pair_idx[:, 1]])
        return cross / (denom + eps * jnp.mean(denom, axis=-1, keepdims=True) + 1e-30)
    if weighting in ("ht", "ml"):
        # Hannan–Thomson (maximum-likelihood) GCC: PHAT phase times an
        # SNR weight |γ|²/(1−|γ|²) from the segment-averaged magnitude-
        # squared coherence. Noise-only bins (γ²≈1/S over S segments) are
        # crushed instead of voting with unit weight like plain PHAT — the
        # decisive difference for narrowband signals in wideband noise.
        # With a single segment γ ≡ 1 and the clamp reduces this to a
        # scaled PHAT.
        saa = psd[pair_idx[:, 0]]
        sbb = psd[pair_idx[:, 1]]
        gamma2 = jnp.abs(cross) ** 2 / jnp.maximum(saa * sbb, 1e-30)
        gamma2 = jnp.clip(gamma2, 0.0, 0.98)
        snr_w = gamma2 / (1.0 - gamma2)
        mag = jnp.abs(cross)
        phase = cross / (mag + eps * jnp.mean(mag, axis=-1, keepdims=True) + 1e-30)
        w = snr_w / jnp.maximum(
            jnp.max(snr_w, axis=-1, keepdims=True), 1e-30
        )
        return phase * w
    if weighting == "none":
        return cross
    raise ValueError(f"unknown GCC weighting: {weighting!r}")


def _lag_window(r, max_lag):
    """Reorder the circular correlation to lags [-max_lag, ..., +max_lag]."""
    return jnp.concatenate([r[..., -max_lag:], r[..., : max_lag + 1]], axis=-1)


def _phase_slope_refine(cross, coarse_delay, fft_len):
    """Refine a coarse delay by weighted LS on the cross-spectrum phase.

    For pair spectrum ``C = X_j·conj(X_i)`` a pure delay d gives
    ``C_k ∝ exp(−j2π f_k d)``. Deramp by the coarse estimate, then solve the
    residual slope δ from the small remaining phases, weighting bins by
    |C|² so only coherent (in-band) bins vote. Accuracy is SNR-limited —
    typically ≪ 0.01 sample, well past the ±0.5-sample target
    (docs/audio-pattern-matching.md:128-131 wanted this, unbuilt).
    """
    f = jnp.fft.fftfreq(fft_len).astype(jnp.float32)  # cycles/sample
    deramp = jnp.exp(2j * jnp.pi * f[None, :] * coarse_delay[:, None])
    c = cross * deramp.astype(jnp.complex64)
    w = jnp.abs(cross) ** 2
    phi = jnp.angle(c)
    # Weighted linear regression φ ≈ θ − 2π f δ. The intercept θ absorbs
    # the constant carrier phase offset between the two receivers — without
    # it any LO phase difference would bias the slope.
    sw = jnp.sum(w, axis=-1)
    swf = jnp.sum(w * f[None, :], axis=-1)
    swff = jnp.sum(w * f[None, :] ** 2, axis=-1)
    swp = jnp.sum(w * phi, axis=-1)
    swfp = jnp.sum(w * f[None, :] * phi, axis=-1)
    det = sw * swff - swf * swf
    slope = (sw * swfp - swf * swp) / jnp.maximum(det, 1e-30)
    delta = -slope / (2.0 * jnp.pi)
    # Guard: a garbage coarse peak (no coherence) can put |δ| anywhere;
    # the refinement is only valid within ±1 sample of the coarse peak.
    delta = jnp.clip(delta, -1.0, 1.0)
    return coarse_delay + delta


@functools.partial(
    jax.jit,
    static_argnames=("max_lag", "seg_len", "weighting", "fft_len", "refine"),
)
def correlate_pairs(
    x: jax.Array,  # [n_st, N] complex64 (IQ) or float (audio, cast to complex)
    pair_idx: jax.Array,  # [m, 2] int32
    max_lag: int = DEFAULT_MAX_LAG,
    seg_len: Optional[int] = None,
    weighting: str = "phat",
    eps: float = 1e-3,
    fft_len: Optional[int] = None,
    refine: str = "phase",  # "phase" | "parabolic"
) -> CorrResult:
    """All-pairs GCC cross-correlation with sub-sample peak estimation.

    ``seg_len=None`` correlates the whole signal in one FFT; otherwise the
    capture streams through ``seg_len``-sample segments with on-device
    coherent accumulation (constant memory in capture length).
    """
    if jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.complex64)
    else:
        x = x.astype(jnp.complex64)
    n = x.shape[1]
    if seg_len is None or seg_len >= n:
        seg_len = n
    if max_lag >= seg_len:
        raise ValueError(f"max_lag {max_lag} must be < seg_len {seg_len}")
    if fft_len is None:
        fft_len = next_pow2(seg_len + max_lag)

    cross, psd, energy = _accumulate_cross_spectra(x, pair_idx, seg_len, fft_len)
    weighted = _weight_spectrum(cross, psd, pair_idx, weighting, eps)
    r = jnp.fft.ifft(weighted, axis=-1)  # [m, F]
    win = jnp.abs(_lag_window(r, max_lag))  # [m, 2*max_lag+1]

    if weighting == "none":
        # Normalize to a correlation coefficient: perfect self-match → 1
        # (ifft(A·conj(A))[0] = Σ|a|² by Parseval, so divide by √(E_a·E_b)).
        norm = jnp.sqrt(energy[pair_idx[:, 0]] * energy[pair_idx[:, 1]])
        win = win / jnp.maximum(norm, 1e-30)[:, None]
    # PHAT/SCOT spectra are unit-magnitude, so ifft peaks are already ≤ 1
    # with equality at perfect coherence.

    pos, val = parabolic_peak(win)
    delay = pos - jnp.float32(max_lag)
    if refine == "phase":
        coarse = jnp.round(delay)
        delay = _phase_slope_refine(cross, coarse, fft_len)
    quality = peak_quality(win)
    return CorrResult(delay=delay, peak_value=val, quality=quality, corr=win)


def correlate_two(
    a: jax.Array,
    b: jax.Array,
    max_lag: int = DEFAULT_MAX_LAG,
    **kwargs,
) -> CorrResult:
    """Convenience: correlate one signal pair. Positive delay ⇒ ``b`` lags
    ``a``. Result fields have the pair axis squeezed."""
    x = jnp.stack([a, b])
    res = correlate_pairs(
        x, jnp.array([[0, 1]], jnp.int32), max_lag=max_lag, **kwargs
    )
    return CorrResult(*(v[0] for v in res))
