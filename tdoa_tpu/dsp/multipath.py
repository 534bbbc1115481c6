"""In-peak multipath handling: detection, honest error accounting, and
two-path diagnosis of a contaminated correlation lobe.

The detector (`lobe_centroid_drift`) finds pairs whose main lobe is a
direct-path + in-peak-echo composite — the echo merges with the direct
peak, biases the delay read by 0.5-2.5 samples, and a 3-station fix
absorbs the bias with near-zero residual. Round 2 only WARNED.

**What mitigation is here — and the measured evidence for why.** Three
estimator-replacement designs were built and scored against truth on
the randomized Monte Carlo multipath regime (40 scenes, echoes 15-60
samples behind the direct path at 0.3-0.6 amplitude; per-pair median
|TDOA error| in samples):

  plain GCC-HT peak read (no mitigation)           0.57
  adopt the decomposition's strongest component    3.42
  subtract fitted echo components, re-read peak    3.09
  transfer the model-predicted drag                2.63

Every replacement LOSES to the plain whitened read: HT whitening
already resolves the echo, and the decomposition's component positions
carry the borrowed template's bias (the PSF template comes from another
pair's lobe, which differs by its own residual echo content — measured
2-6 samples of absolute-position bias). So this module does NOT
re-estimate delays. Mitigation = honest accounting:

1. **σ inflation** (`echo_bias_sigma`): the residual echo bias is made
   visible in the error budget via the calibrated lobe-shape statistic,
   so the reported ellipse covers it (multipath-regime 3σ per-pair
   coverage 82% → 95-96% measured; clean scenes untouched).
2. **Diagnosis** (`mitigate_flagged_pairs` + `decompose_lobe`): the
   two-path decomposition still measures the echo's GEOMETRY — excess
   path delay and relative amplitude — which is reliable even when its
   absolute positions are not (the separation is a difference, so the
   template's absolute bias cancels). That is actionable output: an
   operator learns the reflector's excess path length.

Physics of the lobe: each station's received signal is direct + α·echo,
so a pair's cross-correlation is a sum of up to four shifted copies of
one POINT SPREAD FUNCTION (PSF) g — direct×direct (amplitude 1, at the
true TDOA), the two cross terms (amplitude α, at TDOA ± that station's
echo excess), and echo×echo (α²). Components add COHERENTLY (each
carries its own carrier phase), so the decomposition runs on the
COMPLEX correlation window (CorrResult.corr_re/im); and the true TDOA
is the STRONGEST component, not the earliest (the direct_j×echo_i cross
term lands EARLIER than the truth — first-arrival logic is wrong for
cross-correlations).

The PSF is not modeled analytically — it is measured from the SAME
capture: every pair shares the source spectrum and the GCC weighting,
so an unflagged (clean) pair's lobe IS the PSF, up to its own
sub-sample shift and carrier phase (both removed when the template is
extracted).

The reference has no multipath handling of any kind (processor.go's
correlator takes the raw argmax).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


def lobe_centroid_drift(win: np.ndarray, l_narrow: int = 20,
                        l_wide: int = 60) -> np.ndarray:
    """Per-pair main-lobe shape-drift statistic: |power-centroid offset
    at ±l_wide − offset at ±l_narrow| around each correlation peak
    (lags). A clean GCC lobe is symmetric at every width, so the
    centroid barely moves as the window widens; a direct-path + in-peak
    echo composite keeps dragging it toward the echo. Calibrated on the
    Monte Carlo regimes: clean/noisy stay < 0.5, planted 15-60-sample
    echoes at 0.3-0.6 amplitude exceed 1.0 (review hardening kept the
    separation: floor-subtraction removes the noise-floor centroid pull
    at low peak-to-sidelobe, and a peak too close to the window edge
    returns 0 — a clamped one-sided wide window fakes drift ~1.4 on
    clean lobes)."""
    out = []
    for row in win:
        c = _floor_subtracted_centroids(row, (l_wide, l_narrow))
        out.append(0.0 if c is None else abs(c[0] - c[1]))
    return np.asarray(out)


def _floor_subtracted_centroids(
    row: np.ndarray, widths: Tuple[int, ...]
) -> Optional[Tuple[float, ...]]:
    """Power-centroid offsets (lags from the argmax) of one correlation
    window at each half-width in ``widths`` — the shared core of the
    drift and absolute-offset statistics, so their calibration
    hardenings can never desynchronize:

    - sidelobe-floor subtraction: the window is mostly floor, so its
      median estimates the floor robustly (the lobe occupies a few % of
      ±max_lag). Without it the floor's asymmetric noise realization
      pulls the wide centroid ~1.3 samples on healthy peaks barely past
      the quality gate;
    - edge guard: every width must see a symmetric window around the
      peak (a clamped side drags the wide centroid one way on a CLEAN
      lobe, faking drift ~1.4) — returns None when the widest cannot.
    """
    w = np.abs(row).astype(np.float64)  # real or complex windows
    p = int(np.argmax(w))
    if min(p, len(w) - 1 - p) < max(widths):
        return None
    v = np.maximum(w - np.median(w), 0.0)

    def centroid(L):
        seg = v[p - L:p + L + 1] ** 2
        lags = np.arange(-L, L + 1)
        return float(np.sum(lags * seg) / np.maximum(np.sum(seg), 1e-30))

    return tuple(centroid(L) for L in widths)


# Wiring threshold for ref_lobe_echo_consistency (round-5 probe,
# REFECHO_PROBE.json): 80 randomized clean scenes put the statistic's
# ceiling at 0.397 (p50 0.10, p99 0.40); 0.8 is a 2× margin with ZERO
# clean false positives, detecting 14% of the invisible-TGT-echo class
# and 30% of visible echoes whose reflectors are station-local. Crossing
# it confirms the echo environment (σ floor on every pair + warning).
REF_ECHO_CONSISTENCY_THRESHOLD = 0.8


def ref_lobe_echo_consistency(
    win_ref1: np.ndarray,  # [m, W] REF1-block correlation windows
    win_ref2: np.ndarray,  # [m, W] REF2-block windows
    l_wide: int = 60,
) -> np.ndarray:
    """Per-pair INVISIBLE-echo statistic from the dual-REF structure
    (round-5 verdict item 3 probe).

    The two REF blocks are the same transmitter received through the
    same physical channel ~1/3 capture apart. A static reflector
    shapes BOTH REF lobes identically (the echo's centroid drag is a
    channel property), while noise-induced lobe jitter is independent
    between the blocks and centered on zero. The statistic is the
    CONSISTENT part of the two signed centroid offsets:

        s = min(|c1|, |c2|)  if sign(c1) == sign(c2), else 0

    — a same-direction drag on both REF lobes survives; independent
    jitter is killed by the sign test half the time and bounded by the
    smaller magnitude otherwise. This sees echo environments the TGT
    statistics miss (the invisible-echo class: TGT offsets/drift/
    secondary fraction all inside clean ranges), PROVIDED the
    reflectors are station-local so the REF channel traverses them
    too. Calibration/validation: scripts/refecho_probe.py.
    """
    out = []
    for r1, r2 in zip(win_ref1, win_ref2):
        a = _centroid_minus_peak(r1, l_wide)
        b = _centroid_minus_peak(r2, l_wide)
        if a is None or b is None:
            out.append(0.0)
            continue
        out.append(min(abs(a), abs(b)) if a * b > 0 else 0.0)
    return np.asarray(out)


def _centroid_minus_peak(row: np.ndarray, l_wide: int) -> Optional[float]:
    """Signed wide-window power-centroid offset measured from the
    PARABOLIC sub-sample peak, not the integer argmax. The true
    delay's fractional part shifts argmax-relative centroids by up to
    ~±0.8 sample — identically in both REF blocks (same geometry), so
    it masquerades as a consistent deviation and sets the clean floor
    of the consistency statistic (first probe run: clean max 0.80,
    invisible-echo detection 0/18). A clean symmetric lobe's centroid
    coincides with its parabolic vertex, so subtracting the vertex
    cancels the fractional offset while an echo's one-sided drag —
    which moves the wide centroid far more than the 3-point vertex —
    survives."""
    c = _floor_subtracted_centroids(row, (l_wide,))
    if c is None:
        return None
    w = np.abs(row).astype(np.float64)
    p = int(np.argmax(w))
    if p < 1 or p > len(w) - 2:
        return None
    y0, y1, y2 = w[p - 1], w[p], w[p + 1]
    denom = y0 - 2.0 * y1 + y2
    delta = 0.5 * (y0 - y2) / denom if abs(denom) > 1e-30 else 0.0
    return float(c[0] - np.clip(delta, -1.0, 1.0))


def lobe_centroid_offset(win: np.ndarray, l_wide: int = 60) -> np.ndarray:
    """Per-pair |power-centroid(±l_wide) − argmax| (lag samples,
    sidelobe-floor-subtracted like `lobe_centroid_drift`). The
    continuous echo-bias proxy behind `echo_bias_sigma`: ANY coherent
    echo inside ±l_wide drags the first moment toward itself — the
    drag is ≈ α²·sep/(1+α²) for an echo of relative amplitude α at
    separation sep — while a clean lobe's centroid sits on its peak.
    Unlike the drift statistic (wide-vs-narrow centroid DIFFERENCE,
    which a close echo cancels out of by dragging both windows), the
    absolute offset sees close and far echoes alike. Peaks too close to
    the window edge return 0 (no symmetric window)."""
    out = []
    for row in win:
        c = _floor_subtracted_centroids(row, (l_wide,))
        out.append(0.0 if c is None else abs(c[0]))
    return np.asarray(out)


# echo_bias_sigma calibration — measured on 40 randomized Monte Carlo
# scenes per regime (scripts/monte_carlo.py; echoes 15-60 samples at
# 0.3-0.6 amplitude), per-pair |TDOA error| vs 3σ coverage:
#   multipath: 82% baseline → 95-96% with these constants
#   clean:     100% → 100% (no scene's max offset reaches the
#              environment threshold; median inflation ×1.00)
#   noisy:     100% → 100% (σ is already noise-dominated there)
_BIAS_SIGMA_KNEE = 0.3  # offsets below this are clean-lobe jitter
_BIAS_SIGMA_SCALE = 0.4  # samples of σ per sample of excess offset
_ECHO_ENV_THRESHOLD = 1.0  # scene max offset ⇒ echo environment
_ECHO_ENV_FLOOR = 0.7  # σ floor (samples) for every pair in one

# FIX-level station-bias inflation γ: the sandwich covariance
# (solve.fix_covariance_enu_correlated) takes per-STATION echo-bias σ
# apportioned from the per-pair addends above. The per-pair table is
# calibrated against PER-PAIR 3σ coverage; at the fix level the same
# magnitudes under-cover because an echo's drag is a deterministic
# bias within the scene, not a fresh Gaussian draw per pair — the
# quadratic forms need γ·τ to cover the realized drag directions.
# Calibration history (scripts/multipath_fixcov_diag.py): the first
# sweep on the 26-scene seed-9000 base chose γ=2.0 (60/92/92 at
# 1σ/2σ/3σ) and one fresh base (64000) validated at 78/87/91 — but
# three FURTHER fresh bases (67000/70000/71000, 69 detectable-echo
# scenes) measured that γ at only 51/68/75 pooled: the single-base
# validation was a lucky draw, and the echo-bias distribution is
# heavy-tailed (p95 maha 4-8.6 while p50 sits near 1), so one
# Gaussian scale cannot fit both the median and the tail. Pooled
# multi-base sweep (maha replay over the captured covariance inputs):
#   γ=2.0: 51/68/75   γ=3.0: 59/68/88   γ=4.0: 64/75/90
#   γ=5.0: 68/83/93 (chosen)   γ=6.0: 67/87/93   γ=8.0: 74/88/93
# γ=5.0 meets the ≥35/80/90 bar on pooled FRESH data with the smallest
# median over-suppression (p50 maha ~0.4 vs the χ(2) median 1.18 —
# reported echo-scene ellipses run ~2.5-3× conservative at the median;
# the deliberate trade: under-coverage in a hazard regime misleads,
# over-coverage merely widens). The residual ~7% 3σ tail is the
# invisible-echo class (offsets/drift/secondary fraction all inside
# clean-scene ranges — no detector fires, so no model can inflate for
# them).
#
# TWO constants, gated on the scene-level echo-environment
# confirmation (max centroid offset or drift statistic over their
# thresholds): a first attempt shipped γ=5.0 UNgated and clean scenes
# paid for it — their sub-knee lobe jitter produces small nonzero τ,
# and ×5 tripled clean-scene ellipses (clean maha p50 0.34 → 0.10;
# the end-to-end sim drive's 1σ ellipse grew 14.5 → 36 m). Confirmed
# echo environments get the tail-covering γ; unconfirmed scenes keep
# the per-pair-consistent baseline.
STATION_BIAS_FIX_INFLATION = 2.0
# Round-5 recalibration (scripts/multipath_tailcal.py → the committed
# MULTIPATH_CAL_r05.json, six 25-trial bases with raw-τ capture): the
# round-4 γ=5.0 confirmed tier is RETIRED — it was the wrong
# distribution family. The re-measured miss structure shows the 3σ
# tail lives in the UNCONFIRMED class (echoes whose TGT statistics
# stay under the environment thresholds reach maha 4-10 at γ=2), so
# no confirmed-only γ can reach it, while γ=5 over-suppressed the
# confirmed median 2.5-3×. The replacement: ONE γ (the per-pair-
# calibrated 2.0) for every echo-ENGAGED fix, plus the Student-t
# radial tail below. Kept equal to the baseline constant so the two
# tiers collapse; retained as a name for compatibility.
STATION_BIAS_FIX_INFLATION_CONFIRMED = 2.0

# Student-t radial tail for echo-engaged fixes: maha²/2 ~ F(2, ν),
# ν ML-fitted on the pooled engaged-row maha of five fit bases
# (n=114); the kσ confidence CONTOUR is the k·s_k ellipse of the γ=2
# covariance (FixResult.conf_scales). Validated per-base at the
# calibrated thresholds T_k = k·s_k: 3σ coverage 95.5-100% on every
# fit base AND the unseen holdout (78000), pooled 60.3/84.6/99.3% at
# 1σ/2σ/3σ (bar ≥35/80/90), engaged-row p50 maha 0.92 (no
# over-suppression; round-4 shipped 0.4). Gaussian regimes keep
# conf_scales = None ⇒ (1, 1, 1).
ECHO_TAIL_NU = 2.0
ECHO_TAIL_CONF_SCALES = (1.139, 1.788, 4.449)


def echo_bias_sigma(centroid_offset: np.ndarray,
                    env_confirmed: bool = False) -> np.ndarray:
    """Per-pair σ addend (IQ samples) that makes in-peak echo bias
    visible in the error budget — added in quadrature to the
    phase-slope σ.

    Two calibrated terms: a per-pair ramp on the centroid offset, and a
    scene-level floor once the echo ENVIRONMENT is confirmed — by any
    pair's offset crossing the environment threshold, or by the caller
    (``env_confirmed``) when the independent drift statistic crossed
    its own calibrated 1.0 threshold (`lobe_centroid_drift` — more
    sensitive to in-peak composites, where the echo drags the absolute
    centroid only ≈ α²·sep/(1+α²) and can stay under this function's
    threshold while the WIDENING drag keeps growing; round-4
    calibration base: 3 of 26 multipath scenes carried 1-2-sample
    biases at max offsets 0.3-0.95, and 2 of the 3 had drift > 1.0).
    The floor is what closes the tail: an echo environment biases every
    pair (common reflectors), but on some pairs the lobe statistic
    stays low while the 1-2-sample bias remains (measured: 15 of 120
    multipath pairs) — those are only covered by inferring the
    environment from their neighbors."""
    off = np.asarray(centroid_offset, np.float64)
    add = _BIAS_SIGMA_SCALE * np.maximum(off - _BIAS_SIGMA_KNEE, 0.0)
    if env_confirmed or (off.size and float(off.max()) > _ECHO_ENV_THRESHOLD):
        add = np.maximum(add, _ECHO_ENV_FLOOR)
    return add


def station_bias_apportion(
    pair_idx: np.ndarray,  # [m, 2]
    n_st: int,
    pair_sigma: np.ndarray,  # [m] per-pair echo-bias σ (samples)
) -> np.ndarray:
    """Per-STATION echo-bias σ from the per-pair addends (samples).

    ``echo_bias_sigma`` calibrates each PAIR's residual echo bias, but
    the bias physically lives at stations: pair (i, j)'s lobe drag is
    b_j − b_i for latent per-station biases b, so pairs sharing a
    station are correlated — the reason per-pair 3σ coverage (95-96%)
    did not transfer to the fix level (72.7%) under the independent
    2×2 covariance. This solves the variance-apportioning model

        σ_pair² ≈ τ_i² + τ_j²

    by nonnegative least squares (clipped active-set — n_st unknowns,
    C(n_st, 2) equations; exactly determined at 3 stations) and
    returns τ [n_st]. Feed it to
    ``solve.fix_covariance_enu_correlated`` together with the
    PRE-inflation per-pair noise σ."""
    s2 = np.asarray(pair_sigma, np.float64) ** 2
    pair_idx = np.asarray(pair_idx)
    m = pair_idx.shape[0]
    M = np.zeros((m, n_st))
    M[np.arange(m), pair_idx[:, 0]] = 1.0
    M[np.arange(m), pair_idx[:, 1]] = 1.0
    t2 = np.zeros(n_st)
    clipped = np.zeros(n_st, bool)
    for _ in range(n_st + 1):
        free = ~clipped
        if not free.any():
            break
        sol, *_ = np.linalg.lstsq(M[:, free], s2, rcond=None)
        t2 = np.zeros(n_st)
        t2[free] = sol
        neg = t2 < 0.0
        if not neg.any():
            break
        clipped |= neg  # persistent active set — no oscillation
    return np.sqrt(np.maximum(t2, 0.0))


@dataclasses.dataclass
class PathComponent:
    delay: float  # window position, lag samples (same axis as win)
    amp: complex  # complex amplitude


@dataclasses.dataclass
class TwoPathFit:
    """Decomposition result for one pair's lobe."""

    components: List[PathComponent]  # sorted by |amp| descending
    direct_delay: float  # strongest component's position (lag samples)
    resid_1path: float  # rms residual of the best 1-component fit
    resid_2path: float  # rms residual of the joint 2-component fit
    separation: float  # |t2 - t1| of the two strongest, samples
    echo_ratio: float  # |a2| / |a1|
    # |a₂| in units of its own LS standard error (σ_a₂ from the fit
    # residual and the basis Gram matrix): how many sigma the echo
    # component stands above what residual noise could fit.
    echo_significance: float = 0.0

    @property
    def decisive(self) -> bool:
        """Trust the echo DIAGNOSIS only when the fitted echo is REAL:
        resolvable from the direct path, statistically significant
        (residual noise fits spurious components at a few σ; a true
        echo at 0.3-0.6 amplitude measures hundreds), and physically an
        echo (amplitude well below the direct path — a comparable-power
        second component is a co-channel emitter, the association
        path's job). Thresholds measured on synthetic composites
        (tests/test_multipath.py): real echoes fit with
        resid_2path/resid_1path 0.11-0.84 and separations ≥ 3.8; a
        CLEAN noisy lobe overfits into two half-amplitude copies 1.5
        samples apart at ratio 0.99 — the separation floor (2.0) and
        the modest residual-improvement requirement (≤ 0.9) each
        reject it independently. (A STRONG improvement requirement —
        ≤ 0.55 — was tried and rejected: a heavily-merged CONSTRUCTIVE
        composite is fit to ~2% rms by one shifted template, so strict
        ratios fail exactly where mitigation matters most.)"""
        return (
            self.resid_2path <= 0.9 * self.resid_1path
            and 2.0 <= self.separation
            and 0.10 <= self.echo_ratio <= 0.95
            and self.echo_significance >= 5.0
        )


def _fractional_shift(tpl: np.ndarray, delta: float) -> np.ndarray:
    """Shift a short complex template by a fractional number of samples
    (FFT phase ramp; the crop is zero-padded 2x so the wrap-around of
    the circular shift lands in the pad, not the lobe)."""
    n = tpl.size
    pad = np.zeros(2 * n, np.complex128)
    pad[n // 2 : n // 2 + n] = tpl
    f = np.fft.fftfreq(pad.size)
    out = np.fft.ifft(np.fft.fft(pad) * np.exp(-2j * np.pi * f * delta))
    return out[n // 2 : n // 2 + n]


def extract_template(
    win_c: np.ndarray,  # complex [W] clean pair's correlation window
    half: int = 96,
) -> Optional[np.ndarray]:
    """PSF template from a clean pair's lobe: crop ±half around the
    peak, re-center to the sub-sample peak, derotate the peak phase to
    zero, normalize the peak to 1. None when the peak sits too close
    to the window edge for a symmetric crop."""
    mag = np.abs(win_c)
    p = int(np.argmax(mag))
    if p < half + 2 or p > win_c.size - half - 3:
        return None
    # Parabolic sub-sample peak.
    ym1, y0, yp1 = mag[p - 1 : p + 2]
    den = ym1 - 2 * y0 + yp1
    off = 0.5 * (ym1 - yp1) / den if abs(den) > 1e-30 else 0.0
    off = float(np.clip(off, -0.5, 0.5))
    crop = win_c[p - half : p + half + 1].astype(np.complex128)
    crop = _fractional_shift(crop, -off)
    peak = crop[half]
    if abs(peak) < 1e-30:
        return None
    return crop / peak


def _component_basis(
    tpl: np.ndarray, n: int, delays: Sequence[float]
) -> np.ndarray:
    """[len(delays), n] complex basis: the template placed (fractionally)
    at each delay inside an n-sample window, template center at
    index round(delay) + fraction."""
    half = tpl.size // 2
    basis = np.zeros((len(delays), n), np.complex128)
    for k, d in enumerate(delays):
        i = int(np.floor(d))
        frac = d - i
        shifted = _fractional_shift(tpl, frac)
        lo = max(0, i - half)
        hi = min(n, i + half + 1)
        basis[k, lo:hi] = shifted[lo - (i - half) : hi - (i - half)]
    return basis


def decompose_lobe(
    win_c: np.ndarray,  # complex [W] flagged pair's window
    template: np.ndarray,  # from extract_template
    echo_span: float = 40.0,  # how far from the peak an echo may sit
    direct_span: float = 6.0,  # how far the dragged argmax may be off
    grid_step: float = 0.25,
) -> Optional[TwoPathFit]:
    """Joint two-path decomposition of a merged lobe around its peak.

    Exact grid search, not matching pursuit: MP seeds fail on exactly
    the in-peak case (merged components leave one seed; measured on
    sep = 4-sample composites with a 12-sample-wide lobe). Instead the
    model y ≈ a₁·g(λ−d₁) + a₂·g(λ−d₂) is solved in CLOSED FORM at
    every fractional grid pair (d₁ near the argmax, d₂ anywhere within
    ``echo_span``): precompute the basis Gram matrix and correlations
    once, then each (d₁, d₂) costs a 2×2 complex solve — the whole grid
    is a few vectorized numpy ops. The direct delay is the component
    with the LARGER |amplitude| (see module docstring: the truth is the
    strongest, not the earliest).

    Returns None when the peak sits too close to the window edge.
    """
    mag = np.abs(win_c)
    p = int(np.argmax(mag))
    half = template.size // 2
    margin = int(np.ceil(echo_span)) + half
    lo = p - margin
    hi = p + margin + 1
    if lo < 0 or hi > win_c.size:
        return None
    y = win_c[lo:hi].astype(np.complex128)
    n = y.size
    center = p - lo  # argmax position inside the crop

    ds = center + np.arange(-echo_span, echo_span + 1e-9, grid_step)
    B = _component_basis(template, n, ds)  # [D, n]
    c = B.conj() @ y  # [D] correlations <b_d, y>
    G = B.conj() @ B.T  # [D, D] Gram
    y2 = float(np.real(np.vdot(y, y)))
    i_idx = np.flatnonzero(np.abs(ds - center) <= direct_span)

    # --- best 1-path fit ----------------------------------------------
    g_d = np.maximum(np.real(np.diag(G)), 1e-30)
    s1 = np.abs(c) ** 2 / g_d
    k1 = i_idx[int(np.argmax(s1[i_idx]))]
    r1 = float(np.sqrt(max(y2 - s1[k1], 0.0) / n))
    one = TwoPathFit(
        components=[PathComponent(ds[k1] + lo,
                                  complex(c[k1] / g_d[k1]))],
        direct_delay=ds[k1] + lo,
        resid_1path=r1, resid_2path=r1, separation=0.0, echo_ratio=0.0,
    )

    # --- joint 2-path over (d1 ∈ direct grid) × (d2 ∈ full grid) -----
    g11 = g_d[i_idx][:, None]  # [I, 1]
    g22 = g_d[None, :]  # [1, D]
    g12 = G[i_idx, :]  # [I, D]
    c1 = c[i_idx][:, None]
    c2 = c[None, :]
    det = g11 * g22 - np.abs(g12) ** 2
    sep_ok = (
        np.abs(ds[i_idx][:, None] - ds[None, :]) >= 1.0
    ) & (det > 1e-6 * g11 * g22)
    with np.errstate(divide="ignore", invalid="ignore"):
        a1 = (g22 * c1 - g12 * c2) / det
        a2 = (g11 * c2 - np.conj(g12) * c1) / det
        score = np.real(np.conj(c1) * a1 + np.conj(c2) * a2)
    score = np.where(sep_ok, score, -np.inf)
    if not np.isfinite(score).any():
        return one
    # --- multi-start greedy + coordinate-descent refinement ----------
    # A pair correlation of echoing stations has up to FOUR shifted
    # PSF copies (direct×direct, the two cross terms, echo×echo) — a
    # 2-component model mispairs on a 3-component lobe, and the joint
    # residual surface is multimodal (a single descent converged to a
    # 3.4-sample-wrong local minimum on planted direct±cross-term
    # lobes). From each of several well-separated 2-path score maxima:
    # add a third component while it stands ≥5σ above the residual,
    # then alternate — re-scan each component's position against the
    # others' best model until fixed (≤3 rounds) — and keep the start
    # with the lowest final residual.
    def _amps_at(index_list):
        Bk = B[index_list]  # [K, n]
        a, *_ = np.linalg.lstsq(Bk.T, y, rcond=None)
        resid = y - Bk.T @ a
        return a, float(np.sqrt(np.real(np.vdot(resid, resid)) / n)), resid

    def _descend(i0, j0):
        idxs = [int(i_idx[i0]), int(j0)]
        offs = [0.0] * 2  # per-component sub-grid offsets
        amps, r_cur, resid = _amps_at(idxs)
        s3 = np.abs(B.conj() @ resid) ** 2 / g_d
        far = np.min(
            np.abs(ds[:, None] - ds[np.asarray(idxs)][None, :]), axis=1
        ) >= 1.0
        s3 = np.where(far, s3, -np.inf)
        k3 = int(np.argmax(s3))
        if (np.isfinite(s3[k3])
                and np.sqrt(s3[k3]) / max(r_cur, 1e-30) >= 5.0):
            idxs.append(k3)
            offs.append(0.0)
            amps, r_cur, resid = _amps_at(idxs)

        for _ in range(3):
            moved = False
            for k in range(len(idxs)):
                others = [q_ for q_ in range(len(idxs)) if q_ != k]
                y_k = y - B[[idxs[q_] for q_ in others]].T @ amps[others]
                sk = np.abs(B.conj() @ y_k) ** 2 / g_d
                if others:
                    far_k = np.min(
                        np.abs(ds[:, None]
                               - ds[[idxs[q_] for q_ in others]][None, :]),
                        axis=1,
                    ) >= 1.0
                    sk = np.where(far_k, sk, -np.inf)
                # The first component (seeded in the direct span) stays
                # there; echoes roam the full grid.
                if k == 0:
                    allowed = np.full(sk.size, -np.inf)
                    allowed[i_idx] = sk[i_idx]
                    sk = allowed
                nk = int(np.argmax(sk))
                if not np.isfinite(sk[nk]):
                    continue
                # Parabolic sub-grid offset on this component's scan.
                off = 0.0
                if 0 < nk < sk.size - 1 and np.isfinite(sk[nk - 1]) and \
                        np.isfinite(sk[nk + 1]):
                    den = sk[nk - 1] - 2 * sk[nk] + sk[nk + 1]
                    if abs(den) > 1e-30:
                        off = float(np.clip(
                            0.5 * (sk[nk - 1] - sk[nk + 1]) / den,
                            -0.5, 0.5,
                        )) * grid_step
                if nk != idxs[k]:
                    moved = True
                idxs[k] = nk
                offs[k] = off
            amps, r_cur, resid = _amps_at(idxs)
            if not moved:
                break
        return idxs, offs, amps, r_cur

    # Start set: up to 6 mutually-separated score maxima, PLUS starts
    # with the direct component pinned at the window argmax — the
    # unconstrained 2-path optimum systematically drifts d₁ off the
    # argmax to absorb sidelobe structure (a compromise 2-of-3 fit),
    # and every descent from it stays in that wrong basin; cross terms
    # rarely displace the argmax itself, so argmax-pinned starts sit in
    # the true basin.
    order = np.argsort(-score.ravel())
    starts = []
    for flat in order[:400]:
        if not np.isfinite(score.ravel()[flat]):
            break
        i0, j0 = np.unravel_index(int(flat), score.shape)
        if all(abs(ds[i_idx[i0]] - ds[i_idx[i1]]) > 0.75
               or abs(ds[j0] - ds[j1]) > 0.75 for i1, j1 in starts):
            starts.append((i0, j0))
        if len(starts) == 6:
            break
    ic = int(np.argmin(np.abs(ds[i_idx] - center)))  # argmax-pinned d1
    row = score[ic]
    for j0 in np.argsort(-row):
        if not np.isfinite(row[j0]):
            break
        if all(not (i1 == ic and abs(ds[int(j0)] - ds[j1]) <= 0.75)
               for i1, j1 in starts):
            starts.append((ic, int(j0)))
        if sum(1 for i1, _ in starts if i1 == ic) >= 3:
            break
    if not starts:
        return one
    best = None
    for i0, j0 in starts:
        cand = _descend(i0, j0)
        if best is None or cand[3] < best[3]:
            best = cand
    idxs, offs, amps, r2 = best

    # Fine polish: two coordinate rounds on a ±0.6-sample local grid at
    # 0.05 steps per component (the coarse grid + parabolic offsets
    # leave ~0.5-sample error when components share sidelobes).
    pos = [ds[idxs[k]] + offs[k] for k in range(len(idxs))]

    def _basis_resid(positions):
        Bk = _component_basis(template, n, positions)
        a, *_ = np.linalg.lstsq(Bk.T, y, rcond=None)
        resid = y - Bk.T @ a
        return a, float(np.sqrt(np.real(np.vdot(resid, resid)) / n)), Bk

    amps, r2, Bk = _basis_resid(pos)
    for _ in range(2):
        for k in range(len(pos)):
            others = [q_ for q_ in range(len(pos)) if q_ != k]
            y_k = y - Bk[others].T @ amps[others]
            cand_d = pos[k] + np.arange(-0.6, 0.6 + 1e-9, 0.05)
            Bc = _component_basis(template, n, cand_d)
            sc = (np.abs(Bc.conj() @ y_k) ** 2
                  / np.maximum(np.real(np.sum(np.abs(Bc) ** 2, -1)),
                               1e-30))
            pos[k] = float(cand_d[int(np.argmax(sc))])
        amps, r2, Bk = _basis_resid(pos)

    comps = sorted(
        [PathComponent(pos[k] + lo, complex(amps[k]))
         for k in range(len(pos))],
        key=lambda comp: -abs(comp.amp),
    )
    gram = Bk.conj() @ Bk.T
    try:
        ginv = np.linalg.inv(gram)
    except np.linalg.LinAlgError:
        return one
    order2 = np.argsort([-abs(a) for a in amps])
    k2 = int(order2[1])
    sigma_a2 = float(r2 * np.sqrt(max(np.real(ginv[k2, k2]), 0.0)))
    echo_amp = abs(comps[1].amp)
    return TwoPathFit(
        components=comps,
        direct_delay=comps[0].delay,
        resid_1path=r1,
        resid_2path=r2,
        separation=abs(comps[0].delay - comps[1].delay),
        echo_ratio=(echo_amp / max(abs(comps[0].amp), 1e-30)),
        echo_significance=echo_amp / max(sigma_a2, 1e-30),
    )


def mitigate_flagged_pairs(
    win_c: np.ndarray,  # complex [m, W] TGT correlation windows
    flagged: np.ndarray,  # bool [m] — lobe-drift detector verdicts
    quality: np.ndarray,  # [m] peak-to-sidelobe ratios
    lobe_drift: np.ndarray,  # [m] detector statistic
    max_lag: int,
    ref_win_c: Optional[np.ndarray] = None,  # complex [2, m, W] REF1/2
) -> Tuple[np.ndarray, np.ndarray, List[Optional[TwoPathFit]]]:
    """Diagnose every flagged pair's lobe by two-path decomposition
    against a measured PSF template.

    The returned raw delays are DIAGNOSTIC, not replacements — adopting
    them measurably degrades accuracy (module docstring); the reliable
    outputs are each fit's echo separation and amplitude ratio
    (template-bias-free differences), used by the pipeline's warning.

    Template ladder: (1) the cleanest UNFLAGGED TGT pair's lobe — same
    source spectrum and weighting, the exact PSF; (2) when every TGT
    pair is flagged (echoes at every station — the Monte Carlo
    multipath regime), the SAME pair's REF-block lobe: same stations,
    same receivers, and the reference transmitter is typically clean
    LOS — its source spectrum differs, so the fit-quality gate
    (TwoPathFit.decisive) decides whether the borrowed shape explains
    the lobe. A REF lobe is only trusted as a template when it is
    itself clean (its own centroid-drift ≤ 0.5).

    Returns (mitigated_raw_delay [m] — NaN where not mitigated,
    adopted [m] bool — fit decisive, fits [m]).
    """
    m = win_c.shape[0]
    out = np.full(m, np.nan)
    adopted = np.zeros(m, bool)
    fits: List[Optional[TwoPathFit]] = [None] * m
    clean = [
        k for k in range(m)
        if not flagged[k] and quality[k] >= 5.0 and lobe_drift[k] <= 0.5
    ]
    template = None
    if clean:
        # The cleanest pair's lobe is the PSF (shape is
        # pair-independent: same source spectrum, same weighting).
        k_tpl = max(clean, key=lambda k: quality[k])
        template = extract_template(win_c[k_tpl])

    ref_drift = None
    if template is None and ref_win_c is not None:
        ref_drift = [lobe_centroid_drift(rw) for rw in ref_win_c]

    for k in range(m):
        if not flagged[k]:
            continue
        tpl_k = template
        if tpl_k is None and ref_win_c is not None:
            for rb in range(ref_win_c.shape[0]):
                if ref_drift[rb][k] <= 0.5:
                    tpl_k = extract_template(ref_win_c[rb, k])
                    if tpl_k is not None:
                        break
        if tpl_k is None:
            continue
        fit = decompose_lobe(win_c[k], tpl_k)
        fits[k] = fit
        if fit is None:
            continue
        out[k] = fit.direct_delay - max_lag
        adopted[k] = fit.decisive
    return out, adopted, fits
