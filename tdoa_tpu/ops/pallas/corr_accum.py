"""Fused segment-correlator kernel: FFT + cross-spectra + accumulate.

One Pallas program does, per capture segment, what the XLA path spreads
over many HLOs and HBM round-trips:

    load segment (all stations) → 65536-point FFT per signal (two DFT
    matmuls with a twiddle rotation between — all in VMEM) → per-pair
    cross-spectra + per-station PSD + per-station spectral sum →
    accumulate

The accumulators live in VMEM across the whole grid (constant output
index ⇒ Pallas keeps the block resident; nothing is flushed per step),
so the only HBM traffic in the loop is reading each input sample ONCE.
The FFT emits the spectrum in the *digit-permuted* layout [k1, k2]
(true frequency index = 256·k2 + k1) — all accumulators use that layout
consistently, and the caller un-permutes once at finalize (a single
cheap transpose outside the kernel).

Performance notes (measured on v5e, 3 stations × 66.5 Msample block):

- **Zero rows never reach the MXU.** The segment occupies 176 of the
  256 stage-1 rows; instead of zero-padding and contracting over 256,
  stage 1 uses the 256×176 column slice of the DFT matrix — exact by
  linearity, 31% less stage-1 work, and no pad-concatenate copies.
- **Operands are *stored* bf16, not cast bf16.** The MXU multiplies
  bf16 natively; under ``--xla_allow_excess_precision`` an in-kernel
  ``astype(bfloat16)`` is elidable and the matmul silently runs at f32
  operand width. Keeping the input blocks and DFT matrices in bf16
  VMEM, and round-tripping the twiddled intermediate through a bf16
  scratch buffer, pins every matmul to true bf16 operands — the
  arithmetic is bit-identical to the old cast-based path (Mosaic's
  default matmul truncates f32 operands to bf16 anyway) at ~2.5× the
  speed: ~6 ms vs ~15 ms per 66.5 Msample 3-station block.
- **No statistics prologue.** DC removal and RMS normalization need the
  block mean and power — but the mean is the accumulated spectral sum's
  DC bin (X(0) = Σxₙ) and the power is Parseval on the accumulated PSD,
  so both fall out of the kernel's own outputs. DC removal then folds
  in at finalize by linearity: FFT(x−m) = FFT(x) − m·D with D the
  transform of the segment's rectangular window, giving
  Σ(Xⱼ−AⱼD)(Xᵢ−AᵢD)* from the raw accumulators in one cheap
  [n_pairs, fft_len] elementwise pass. RMS prescaling is a per-station
  scalar on the same accumulators. Nothing ever re-reads the signal.

Constraints (by construction): fft_len = 65536 = 256², seg_len = 45056
(= 176·256 rows of data), station count and pair list static. Falls
back to the XLA path for anything else (ops/corr.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdoa_tpu.ops.cplx import C
from tdoa_tpu.utils.platform import default_interpret_mode

R = 256  # radix: fft_len = R*R
SEG_ROWS = 176  # data rows per segment (multiple of 8 — Mosaic sublane rule)
PAD_ROWS = R - SEG_ROWS  # 80 implicit zero rows (never materialized)
FFT_LEN = R * R  # 65536
SEG_LEN = SEG_ROWS * R  # 45056


@functools.lru_cache(maxsize=None)
def _mats() -> Tuple[np.ndarray, ...]:
    j, k = np.meshgrid(np.arange(R), np.arange(R), indexing="ij")
    ang = -2.0 * np.pi * ((j * k) % R) / R
    wr, wi = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)
    # Twiddle T[k1, j2] = exp(-2πi k1 j2 / R²)
    k1, j2 = np.meshgrid(np.arange(R), np.arange(R), indexing="ij")
    tang = -2.0 * np.pi * ((k1 * j2) % FFT_LEN) / FFT_LEN
    tr, ti = np.cos(tang).astype(np.float32), np.sin(tang).astype(np.float32)
    return wr, wi, tr, ti


@functools.lru_cache(maxsize=None)
def _dc_window() -> Tuple[np.ndarray, np.ndarray]:
    """FFT of the segment's rectangular window (SEG_LEN ones, zero-padded
    to FFT_LEN), true frequency order. DC removal folds in with it at
    finalize: FFT(x − m) = FFT(x) − m·D."""
    d = np.fft.fft(np.ones(SEG_LEN), FFT_LEN)
    return d.real.astype(np.float32), d.imag.astype(np.float32)


def _kernel(xr_ref, xi_ref,
            wcr_ref, wci_ref, wr_ref, wi_ref, tr_ref, ti_ref,
            *out_refs,
            n_st: int, pairs: Tuple[Tuple[int, int], ...],
            segs_per_step: int, track_sums: bool,
            group_q: int, group_r: int, grouped: bool):
    if track_sums:
        cr_ref, ci_ref, psd_ref, sr_ref, si_ref, tsr, tsi = out_refs
    else:
        cr_ref, ci_ref, psd_ref, tsr, tsi = out_refs
        sr_ref = si_ref = None
    s = pl.program_id(0)
    # ``grouped`` (n_splits > 1) adds a leading bank axis to the output
    # windows; the single-bank layout keeps the chip-validated rank-3
    # refs. Bisected on hardware (round 3): a rank-4 (1, 66, R, R)
    # cross-spectrum window (12 stations, ~17 MB/window) FAULTS the TPU
    # worker even with a constant index map, while the identical
    # geometry through rank-3 full-array refs runs fine — and rank-4
    # windows ≤ (1, 28, R, R) (~7 MB, 8 stations) also run fine. So
    # rank-4 stays confined to the grouped layout, whose per-bank
    # windows are small by construction.
    bank = (0,) if grouped else ()

    if grouped:
        # Grouped split accumulation: the output BlockSpec maps grid
        # step s to its group's accumulator bank, so Pallas keeps one
        # bank resident and flushes it exactly when the group changes.
        # Re-zero at each group's first step (the freshly fetched bank
        # holds garbage). Groups are contiguous runs of group_q (+1 for
        # the first group_r) steps — mirroring ops.corr._split_bounds.
        lim = group_r * (group_q + 1)
        first = jnp.where(
            s < lim, s % (group_q + 1) == 0,
            (s - lim) % jnp.maximum(group_q, 1) == 0,
        )
    else:
        first = s == 0

    @pl.when(first)
    def _init():
        cr_ref[...] = jnp.zeros_like(cr_ref)
        ci_ref[...] = jnp.zeros_like(ci_ref)
        psd_ref[...] = jnp.zeros_like(psd_ref)
        if track_sums:
            sr_ref[...] = jnp.zeros_like(sr_ref)
            si_ref[...] = jnp.zeros_like(si_ref)

    f32 = jnp.float32
    wcr = wcr_ref[:, :]  # [R, SEG_ROWS] DFT columns hitting the data rows
    wci = wci_ref[:, :]
    wr = wr_ref[:, :]  # [R, R] full DFT (stage 2)
    wi = wi_ref[:, :]
    tr = tr_ref[:, :]
    ti = ti_ref[:, :]

    # Several segments per grid step amortize the per-segment
    # accumulator read-modify-writes: each VMEM-resident accumulator is
    # touched ONCE per step, with the per-segment contributions combined
    # in registers first (the per-pair RMW was measured
    # VMEM-bandwidth-bound at 12 stations — ~12 ms of the 98.5 ms
    # device time; round-4 verdict item 2). The per-segment spectra for
    # the whole step are held live (2·n_st·segs_per_step [R, R] f32 —
    # accounted in _vmem_need), so segs_per_step trades VMEM for
    # accumulator bandwidth. segs_per_step == 1 reproduces the
    # chip-validated round-2 form exactly.
    all_br, all_bi = [], []
    for g in range(segs_per_step):
        r0 = g * SEG_ROWS
        brs, bis = [], []
        for st in range(n_st):
            xr = xr_ref[st, r0 : r0 + SEG_ROWS, :]  # [SEG_ROWS, R], mm dtype
            xi = xi_ref[st, r0 : r0 + SEG_ROWS, :]
            # Stage 1: DFT over rows — W[:, :SEG_ROWS] @ x (zero rows of
            # the padded segment contribute nothing; exact by linearity).
            a_r = (jnp.dot(wcr, xr, preferred_element_type=f32)
                   - jnp.dot(wci, xi, preferred_element_type=f32))
            a_i = (jnp.dot(wcr, xi, preferred_element_type=f32)
                   + jnp.dot(wci, xr, preferred_element_type=f32))
            # Twiddle rotation (f32 elementwise), then materialize the
            # stage-2 operands in mm-dtype scratch: a bare astype is
            # elidable under allow_excess_precision, which would demote
            # the stage-2 matmuls to f32-operand speed.
            tsr[...] = (a_r * tr - a_i * ti).astype(tsr.dtype)
            tsi[...] = (a_r * ti + a_i * tr).astype(tsi.dtype)
            # Stage 2: DFT over columns — t @ W.
            t_r = tsr[...]
            t_i = tsi[...]
            b_r = (jnp.dot(t_r, wr, preferred_element_type=f32)
                   - jnp.dot(t_i, wi, preferred_element_type=f32))
            b_i = (jnp.dot(t_r, wi, preferred_element_type=f32)
                   + jnp.dot(t_i, wr, preferred_element_type=f32))
            brs.append(b_r)
            bis.append(b_i)
        all_br.append(brs)
        all_bi.append(bis)

    def gsum(terms):
        acc = terms[0]
        for t_ in terms[1:]:
            acc = acc + t_
        return acc

    for st in range(n_st):
        psd_ref[bank + (st,)] += gsum(
            [all_br[g][st] * all_br[g][st] + all_bi[g][st] * all_bi[g][st]
             for g in range(segs_per_step)])
        if track_sums:
            # Spectral sums: the DC-removal algebra's ΣX term (and
            # the block mean, via the DC bin) — only paid for when
            # remove_dc needs them.
            sr_ref[bank + (st,)] += gsum(
                [all_br[g][st] for g in range(segs_per_step)])
            si_ref[bank + (st,)] += gsum(
                [all_bi[g][st] for g in range(segs_per_step)])

    for m, (i, j) in enumerate(pairs):
        # X_j · conj(X_i), all step segments combined before the RMW.
        cr_ref[bank + (m,)] += gsum(
            [all_br[g][j] * all_br[g][i] + all_bi[g][j] * all_bi[g][i]
             for g in range(segs_per_step)])
        ci_ref[bank + (m,)] += gsum(
            [all_bi[g][j] * all_br[g][i] - all_br[g][j] * all_bi[g][i]
             for g in range(segs_per_step)])


# The fused path is chip-validated up to a 4-way pair tiling; past
# that the redundant per-chunk FFT/input work erodes the kernel's ~2x
# advantage over the XLA path with no measurement to back it, so the
# router falls back (conservative cost bound, not a VMEM limit).
MAX_PAIR_CHUNKS = 4

# Largest pair count per GROUPED invocation: rank-4 output windows
# fault the TPU worker somewhere between (1, 28, R, R) (~7 MB,
# chip-validated good) and (1, 66, R, R) (~17 MB, chip-bisected fault)
# — see _kernel's bisect note. Grouped invocations stay at the
# validated window size; larger grouped pair lists pair-tile.
GROUPED_PAIR_WINDOW_CAP = 28


def _vmem_need(n_st: int, n_pairs: int, mm_bytes: int, step_rows: int,
               remove_dc: bool, n_banks: int = 1) -> int:
    """The kernel's computed VMEM request in bytes — the ONE copy of
    the footprint arithmetic, shared by the pallas_call budget below
    and the fused_max_pairs inversion (two diverging copies of this
    formula was a review finding).

    ``n_banks > 1`` (the grouped split-σ layout): the output index map
    is no longer constant, so Mosaic double-buffers the accumulator
    windows (the outgoing bank flushes while the next group's loads) —
    the accumulators cost 2x. Chip-measured: the single-bank formula
    under-requested by 3.4 MB at 8 stations / 28 pairs / 2 banks
    (scoped-vmem stack OOM in the round-3 hardware sweep)."""
    accum_bytes = (2 * n_pairs + n_st * (3 if remove_dc else 1)) * R * R * 4
    if n_banks > 1:
        accum_bytes *= 2
    input_bytes = 2 * 2 * n_st * step_rows * R * mm_bytes  # double-buffered
    const_bytes = (2 * R * SEG_ROWS + 2 * R * R) * mm_bytes + 2 * R * R * 4
    scratch_bytes = 2 * R * R * mm_bytes
    # Multi-segment steps hold the whole step's per-segment spectra
    # live (2·n_st per extra segment, [R, R] f32) so every accumulator
    # is read-modify-written once per STEP — the segs_per_step == 1
    # live set was always implicit in the 1.25 headroom (calibrated),
    # so only the extra segments are charged here.
    extra_segs = max(step_rows // SEG_ROWS - 1, 0)
    live_b_bytes = 2 * n_st * extra_segs * R * R * 4
    return (int(1.25 * (accum_bytes + input_bytes + const_bytes
                        + scratch_bytes + live_b_bytes)) + (2 << 20))


def fused_max_pairs(n_st: int, remove_dc: bool = True,
                    precision: str = "bf16",
                    segs_per_step: int = 1,
                    n_splits: int = 1) -> int:
    """Largest pair count ONE kernel invocation can hold in the v5e
    VMEM budget (inverse of _vmem_need; the calibration point is 16
    stations / 120 pairs ≈ 94 MB request, chip-validated in BENCHLOG
    round 2 — the 1.25 factor is headroom).

    Larger pair lists are pair-TILED: accumulate_cross_spectra_pallas
    splits them into chunks of at most this size and runs the kernel
    per chunk, so bigger networks still run at fused-kernel speed —
    each extra chunk re-reads the input and re-runs the per-station
    FFTs, but keeps the VMEM-resident accumulation that makes the
    kernel ~2x the XLA path. Returns 0 when even the per-station
    accumulators alone exceed the budget."""
    base = _vmem_need(n_st, 0, 2 if precision == "bf16" else 4,
                      segs_per_step * SEG_ROWS, remove_dc,
                      n_banks=n_splits)
    spare = (105 << 20) - base
    # Each pair adds 1.25 · 2·R·R·4 bytes to the need (double-buffered
    # when grouped — see _vmem_need's n_banks note).
    per_pair = int(1.25 * 2 * R * R * 4) * (2 if n_splits > 1 else 1)
    cap = max(0, int(spare // per_pair))
    if n_splits > 1:
        # Grouped output windows past the chip-validated size fault the
        # worker (GROUPED_PAIR_WINDOW_CAP) — a harder limit than VMEM.
        cap = min(cap, GROUPED_PAIR_WINDOW_CAP)
    return cap


def fused_flop_model(n_st: int, n_pairs: int, n_seg: int,
                     remove_dc: bool = True, precision: str = "bf16",
                     n_splits: int = 1) -> dict:
    """Static FLOP count for one fused accumulation pass over ``n_seg``
    segments (the round-3 verdict's MFU accountability item). The
    kernel's geometry is fixed, so the count is exact arithmetic, not
    an estimate:

    Per station-segment, on the MXU (1 MAC = 2 FLOPs):
      stage 1:  4 real matmuls [R, SEG_ROWS] @ [SEG_ROWS, R]
      stage 2:  4 real matmuls [R, R] @ [R, R]
    Per station-segment, on the VPU (per FFT bin):
      twiddle rotation 6, PSD accumulate 4, spectral sums 2 (remove_dc)
    Per pair-segment, on the VPU: cross-spectrum accumulate 8 per bin.

    FFT/PSD work multiplies by the pair-tiling chunk count (every chunk
    re-runs the per-station transforms); the pair work does not (pairs
    split across chunks). Mirrors correlate_pairs_fused's routing:
    grouped (n_splits=K) only ever runs untiled; a pair list past the
    grouped budget runs K single-bank invocations whose chunk count
    comes from the single-bank cap. Finalize (un-permute transpose, DC
    algebra, finish stage) is excluded — derived MFU numbers are lower
    bounds."""
    cap1 = fused_max_pairs(n_st, remove_dc, precision, n_splits=1)
    if n_splits > 1:
        cap_g = fused_max_pairs(n_st, remove_dc, precision,
                                n_splits=n_splits)
        chunks = 1 if n_pairs <= cap_g else -(-n_pairs // cap1)
    else:
        chunks = -(-n_pairs // max(cap1, 1))
    mxu_per_st_seg = 8 * R * SEG_ROWS * R + 8 * R * R * R
    vpu_per_st_seg = (6 + 4 + (2 if remove_dc else 0)) * FFT_LEN
    vpu_per_pair_seg = 8 * FFT_LEN
    return {
        "mxu_flops": chunks * n_st * n_seg * mxu_per_st_seg,
        "vpu_flops": (chunks * n_st * n_seg * vpu_per_st_seg
                      + n_pairs * n_seg * vpu_per_pair_seg),
        "fft_chunks": chunks,
    }


def fused_capacity_ok(n_st: int, n_pairs: int,
                      remove_dc: bool = True,
                      precision: str = "bf16",
                      n_splits: int = 1) -> bool:
    """True when the fused path should run this geometry — in one
    invocation, or pair-tiled across at most MAX_PAIR_CHUNKS (past
    that the per-chunk FFT/input redundancy makes the XLA fallback
    the better program; see fused_max_pairs)."""
    cap = fused_max_pairs(n_st, remove_dc, precision, n_splits=n_splits)
    if n_pairs < 1 or cap < 1:
        return False
    return -(-n_pairs // cap) <= MAX_PAIR_CHUNKS


def _finalize_banks(cr, ci, psd, s_r, s_i, pair_arr, seg_g,
                    remove_dc: bool, prescale: bool):
    """Accumulator banks → finalized spectra: un-permute once, fold in
    the DC-removal algebra and (optionally) the deferred unit-RMS
    prescale. Batched over the leading group axis G — the ONE copy of
    the finalize math. The hot path reaches it through the in-call
    finalize below; callers of ``finalize=False`` raw mode (the A/B
    measurement harness in scripts/headline_profile.py, and its
    equivalence test) stack raw invocations and call it directly. A
    production routing that batched the K split slices through here
    was measured 6.3 ms SLOWER than per-slice finalize at 12 stations
    and reverted (BENCHLOG round 4, measured negative #1).

    Inputs are PERMUTED [G, ., R, R] accumulators (true frequency index
    = 256·k2 + k1); ``seg_g`` is the per-group segment count (numpy).
    Returns (cross C[G, m, F], psd [G, n_st, F], energy [G, n_st]).
    """
    G = cr.shape[0]

    # Un-permute once: true index = 256·k2 + k1 ⇒ transpose (k1,k2).
    def unperm(a):
        return jnp.swapaxes(a, -1, -2).reshape(*a.shape[:-2], FFT_LEN)

    cr, ci, psd = unperm(cr), unperm(ci), unperm(psd)  # [G, ., F]
    pair_arr = np.asarray(pair_arr, np.int32)
    seg_g = np.asarray(seg_g, np.float32)
    use_g = jnp.asarray(seg_g * SEG_LEN)  # [G]
    n_seg_g = jnp.asarray(seg_g)  # [G]

    if remove_dc:
        s_r, s_i = unperm(s_r), unperm(s_i)  # [G, n_st, F]
        # Group mean from the spectral sum's DC bin: Σ_seg X(0) = Σ xₙ.
        mean_r = s_r[:, :, 0] / use_g[:, None]  # [G, n_st]
        mean_i = s_i[:, :, 0] / use_g[:, None]
        dr, di = (jnp.asarray(a) for a in _dc_window())
        # A_st = m_st · D  (per-station DC spectrum), [G, n_st, F] planar.
        a_r = mean_r[..., None] * dr - mean_i[..., None] * di
        a_i = mean_r[..., None] * di + mean_i[..., None] * dr
        # Σ(Xⱼ−Aⱼ)(Xᵢ−Aᵢ)* = cross − Aⱼ∘S̄ᵢ − Āᵢ∘Sⱼ + n_seg·Aⱼ∘Āᵢ
        i_idx, j_idx = pair_arr[:, 0], pair_arr[:, 1]
        ajr, aji = a_r[:, j_idx], a_i[:, j_idx]
        air, aii = a_r[:, i_idx], a_i[:, i_idx]
        sir, sii = s_r[:, i_idx], s_i[:, i_idx]
        sjr, sji = s_r[:, j_idx], s_i[:, j_idx]
        ns = n_seg_g[:, None, None]
        cr = (cr - (ajr * sir + aji * sii) - (air * sjr + aii * sji)
              + ns * (ajr * air + aji * aii))
        ci = (ci - (aji * sir - ajr * sii) - (air * sji - aii * sjr)
              + ns * (aji * air - ajr * aii))
        # Σ|X−A|² = psd − 2Re(Ā∘S) + n_seg|A|². The cancellation of
        # large near-equal terms (the DC bin: |X(0)|≈|A(0)|, magnitudes
        # ~(mean·SEG_LEN)²) can round slightly NEGATIVE in f32; clamp —
        # a negative power under HT's sqrt turns the whole spectrum NaN.
        psd = jnp.maximum(
            psd - 2.0 * (a_r * s_r + a_i * s_i)
            + ns * (a_r * a_r + a_i * a_i),
            0.0,
        )
    # Demeaned per-station power via Parseval: Σₙ|x−m|² = (1/F)Σₖ psd'.
    power_dm = jnp.maximum(
        jnp.sum(psd, axis=-1) / FFT_LEN / use_g[:, None], 1e-30
    )  # [G, n_st]

    if prescale:
        # Deferred unit-RMS normalization: per-station scalars
        # (n_splits == 1 here — see the guard in the caller).
        sc = 1.0 / jnp.sqrt(power_dm)  # [1, n_st]
        s_pair = sc[:, pair_arr[:, 0]] * sc[:, pair_arr[:, 1]]
        cr = cr * s_pair[..., None]
        ci = ci * s_pair[..., None]
        psd = psd * (sc * sc)[..., None]
        energy = use_g[:, None] + 0.0 * power_dm
    else:
        energy = power_dm * use_g[:, None]
    return C(cr, ci), psd, energy


@functools.partial(
    jax.jit,
    static_argnames=(
        "pairs", "precision", "interpret", "segs_per_step", "remove_dc",
        "prescale", "vma", "n_splits", "_force_max_pairs", "finalize",
    ),
)
def accumulate_cross_spectra_pallas(
    x: C,  # [n_st, N] planar; N is truncated to a multiple of SEG_LEN
    pairs: Tuple[Tuple[int, int], ...],
    precision: str = "f32",
    interpret: Optional[bool] = None,
    segs_per_step: int = 1,  # 1 measured best on v5e
    remove_dc: bool = False,
    prescale: bool = False,
    vma: Optional[frozenset] = None,
    n_splits: int = 1,
    _force_max_pairs: Optional[int] = None,  # tests: force pair tiling
    finalize: bool = True,
):
    """Fused accumulation. Returns (cross C[m, FFT_LEN], psd [n_st,
    FFT_LEN], energy [n_st]) in TRUE frequency order, matching
    ops.corr._accumulate_cross_spectra with seg_len=SEG_LEN,
    fft_len=FFT_LEN.

    ``precision="bf16"`` stores the input blocks and DFT matrices as
    bf16 so every matmul runs true-bf16 operands (see module notes —
    numerically identical to Mosaic's default f32-operand truncation,
    ~2.5× faster). Passing ``x`` already in bf16 makes the staging
    free; f32 input costs one fused convert pass.

    ``remove_dc`` subtracts each station's block mean; ``prescale``
    normalizes each station to unit RMS. Both are finalize-time algebra
    on the kernel's accumulators (see module notes) — the signal is
    read exactly once either way. ``vma`` declares the outputs' varying
    mesh axes when called inside shard_map (jax check_vma typing).

    ``n_splits=K > 1`` accumulates the capture's K contiguous slices
    into SEPARATE banks (first ``n_seg % K`` groups one segment larger,
    matching ops.corr._split_bounds) and returns a leading group axis:
    (cross C[K, m, F], psd [K, n_st, F], energy [K, n_st]). This is the
    split-σ layout in ONE kernel invocation — the output BlockSpec maps
    each grid step to its group's bank, so per-step VMEM residency is
    unchanged and the banks flush exactly K times. Measured ~11 ms per
    100 s block cheaper than K separate invocations (the per-invocation
    pipeline fill/drain and finalize were the round-2 headline
    regression). DC removal/prescale are per-group algebra on the same
    outputs; the full-capture accumulators are the groups' sum.

    ``finalize=False`` returns the RAW permuted accumulators
    ``(cr, ci, psd[, s_r, s_i])`` (each [., R, R] — or [G, ., R, R]
    when grouped — in the kernel's digit-permuted frequency layout)
    instead of finalized spectra; the caller runs ``_finalize_banks``
    itself. NOT on the hot path: a production routing that stacked K
    raw slice invocations into one batched finalize measured 6.3 ms
    SLOWER than per-slice finalize and was reverted (BENCHLOG round 4);
    the mode remains for the A/B measurement harness
    (scripts/headline_profile.py) and its equivalence test.
    ``prescale`` requires ``finalize``.
    """
    if interpret is None:
        interpret = default_interpret_mode()
    n_st, n = x.re.shape
    if n_splits > 1 and segs_per_step != 1:
        raise ValueError("n_splits > 1 requires segs_per_step == 1 "
                         "(group bounds are defined in segments)")
    if n_splits > 1 and prescale:
        raise ValueError("prescale with n_splits > 1 is ill-defined "
                         "(per-group unit RMS breaks the groups-sum-to-"
                         "full invariant); scale the groups by the full "
                         "capture's RMS in the caller")
    if not finalize and prescale:
        raise ValueError("prescale requires finalize (the deferred RMS "
                         "scale is finalize-time algebra)")
    # Pair tiling: when the pair list exceeds one invocation's VMEM
    # budget, run the kernel over near-equal pair chunks and stitch the
    # cross-spectra back in order. The per-station outputs (psd,
    # energy) are recomputed identically by every chunk — take the
    # first chunk's. This lifts the 16-station single-invocation cap
    # (fused_max_pairs) to arbitrary networks at fused-kernel speed.
    cap = (fused_max_pairs(n_st, remove_dc, precision, segs_per_step,
                           n_splits=n_splits)
           if _force_max_pairs is None else _force_max_pairs)
    if cap < 1:
        raise ValueError(
            f"{n_st} stations: per-station VMEM accumulators alone "
            f"exceed the fused kernel budget; use the XLA path"
        )
    if len(pairs) > cap:
        n_chunks = -(-len(pairs) // cap)
        # Near-equal chunk sizes (q or q+1) so no invocation is tiny.
        q, r = divmod(len(pairs), n_chunks)
        outs, lo = [], 0
        for ch in range(n_chunks):
            hi = lo + q + (1 if ch < r else 0)
            outs.append(accumulate_cross_spectra_pallas(
                x, tuple(pairs[lo:hi]), precision=precision,
                interpret=interpret, segs_per_step=segs_per_step,
                remove_dc=remove_dc, prescale=prescale, vma=vma,
                n_splits=n_splits, _force_max_pairs=_force_max_pairs,
                finalize=finalize,
            ))
            lo = hi
        pair_axis = 0 if n_splits == 1 else 1
        if not finalize:
            # Raw mode: (cr, ci, psd[, s_r, s_i]) tuples — stitch the
            # pair-axis accumulators, keep the first chunk's per-station
            # outputs (identical across chunks).
            cr = jnp.concatenate([o[0] for o in outs], axis=pair_axis)
            ci = jnp.concatenate([o[1] for o in outs], axis=pair_axis)
            return (cr, ci) + tuple(outs[0][2:])
        cross = C(
            jnp.concatenate([o[0].re for o in outs], axis=pair_axis),
            jnp.concatenate([o[0].im for o in outs], axis=pair_axis),
        )
        return cross, outs[0][1], outs[0][2]
    n_seg = n // SEG_LEN
    if n_seg == 0:
        raise ValueError(
            f"capture length {n} is shorter than one kernel segment "
            f"(SEG_LEN={SEG_LEN}); use the XLA path for short signals"
        )
    if n_splits > n_seg:
        raise ValueError(
            f"n_splits {n_splits} exceeds the segment count {n_seg}"
        )
    # Odd segment counts vs multi-segment steps: pad the capture with
    # ZERO segments up to the step multiple (exact — a zero segment
    # contributes nothing to cross/PSD/spectral sums; the finalize
    # divides by the REAL segment count). XLA fuses the pad into the
    # slice copy the kernel operands pay anyway, so the padding is
    # ~free; this is what unblocks segs_per_step > 1 on the per-slice
    # split layout, whose 111/110-segment slices are odd (round-4
    # verdict item 2). n_splits > 1 can't reach here (the
    # segs_per_step == 1 guard above).
    pad_seg = (-n_seg) % segs_per_step
    n_seg_grid = n_seg + pad_seg
    n_steps = n_seg_grid // segs_per_step
    use = n_seg * SEG_LEN
    m = len(pairs)
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    f32 = jnp.float32

    # [n_st, n_seg_grid*SEG_ROWS, R] in mm dtype. For bf16 input this
    # is a free bitcast view; f32 input pays one fused slice+convert
    # copy (the zero-segment pad fuses into the same copy).
    xr_u, xi_u = x.re[:, :use], x.im[:, :use]
    if pad_seg:
        pw = ((0, 0), (0, pad_seg * SEG_LEN))
        xr_u, xi_u = jnp.pad(xr_u, pw), jnp.pad(xi_u, pw)
    x3r = xr_u.reshape(n_st, n_seg_grid * SEG_ROWS, R).astype(mm_dtype)
    x3i = xi_u.reshape(n_st, n_seg_grid * SEG_ROWS, R).astype(mm_dtype)

    wr, wi, tr, ti = _mats()
    consts = (
        jnp.asarray(wr[:, :SEG_ROWS].copy(), mm_dtype),  # stage-1 cut re
        jnp.asarray(wi[:, :SEG_ROWS].copy(), mm_dtype),  # stage-1 cut im
        jnp.asarray(wr, mm_dtype),
        jnp.asarray(wi, mm_dtype),
        jnp.asarray(tr),
        jnp.asarray(ti),
    )

    step_rows = segs_per_step * SEG_ROWS
    # Group geometry (n_splits=1 ⇒ one group spanning the whole grid;
    # the index map is then constant and the bank stays resident for
    # the entire grid, exactly the pre-split behavior).
    G = n_splits
    g_q, g_r = divmod(n_steps, G)
    g_lim = g_r * (g_q + 1)

    def g_of(s):
        if G == 1:
            return 0
        return jnp.where(s < g_lim, s // (g_q + 1),
                         g_r + (s - g_lim) // max(g_q, 1))

    if G > 1:
        big = pl.BlockSpec((1, m, R, R), lambda s: (g_of(s), 0, 0, 0),
                           memory_space=pltpu.VMEM)
        big_st = pl.BlockSpec((1, n_st, R, R), lambda s: (g_of(s), 0, 0, 0),
                              memory_space=pltpu.VMEM)
        shape_m = jax.ShapeDtypeStruct((G, m, R, R), jnp.float32, vma=vma)
        shape_st = jax.ShapeDtypeStruct((G, n_st, R, R), jnp.float32,
                                        vma=vma)
    else:
        # Single bank: the chip-validated rank-3 layout (explicit
        # whole-array windows with a constant index map — byte-for-byte
        # the round-2 form). Large rank-4 windows fault the TPU
        # worker — see the bisect note in _kernel.
        big = pl.BlockSpec((m, R, R), lambda s: (0, 0, 0),
                           memory_space=pltpu.VMEM)
        big_st = pl.BlockSpec((n_st, R, R), lambda s: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        shape_m = jax.ShapeDtypeStruct((m, R, R), jnp.float32, vma=vma)
        shape_st = jax.ShapeDtypeStruct((n_st, R, R), jnp.float32, vma=vma)
    # The spectral-sum accumulators exist only for the DC-removal
    # algebra; without remove_dc they would be dead VMEM and writeback.
    n_out = 5 if remove_dc else 3
    # Mosaic's default scoped-VMEM budget (16 MB) caps the resident
    # accumulators at ~6 stations; request what this call actually
    # needs so larger networks (8 stations = 28 pairs ≈ 20 MB of f32
    # accumulators) compile. v5e has 128 MB of VMEM. (Per-step
    # residency is ONE group's banks, but with n_splits > 1 the
    # changing output index map double-buffers them — see _vmem_need.)
    mm_bytes = 2 if mm_dtype == jnp.bfloat16 else 4
    need = _vmem_need(n_st, m, mm_bytes, step_rows, remove_dc,
                      n_banks=n_splits)
    # Never request less than Mosaic's 16 MB default (a tighter bound
    # buys nothing), never more than a safe fraction of v5e's 128 MB.
    vmem_budget = min(max(need, 16 << 20), 100 << 20)
    outs = pl.pallas_call(
        functools.partial(
            _kernel, n_st=n_st, pairs=pairs, segs_per_step=segs_per_step,
            track_sums=remove_dc, grouped=G > 1,
            group_q=g_q if G > 1 else n_steps, group_r=g_r if G > 1 else 0,
        ),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((n_st, step_rows, R), lambda s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_st, step_rows, R), lambda s: (0, s, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(big, big, big_st) + (big_st, big_st)[: n_out - 3],
        out_shape=(shape_m, shape_m, shape_st)
        + (shape_st, shape_st)[: n_out - 3],
        scratch_shapes=[
            pltpu.VMEM((R, R), mm_dtype),
            pltpu.VMEM((R, R), mm_dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(x3r, x3i, *consts)
    if remove_dc:
        cr, ci, psd, s_r, s_i = outs
    else:
        cr, ci, psd = outs
        s_r = s_i = None
    if not finalize:
        # Raw permuted accumulators, for callers that run
        # _finalize_banks themselves (measurement harness only — the
        # batched production routing measured slower and was reverted;
        # see the docstring).
        return outs
    if G == 1:
        # Re-introduce the unit group axis so the finalize algebra is
        # rank-uniform (it strips it again at the return).
        cr, ci, psd = cr[None], ci[None], psd[None]
        if remove_dc:
            s_r, s_i = s_r[None], s_i[None]

    # Per-group segment counts (groups are contiguous, first g_r groups
    # one step larger; segs_per_step == 1 whenever G > 1). REAL segment
    # counts: zero-pad segments (multi-segment steps, G == 1 only)
    # contribute nothing to the accumulators and must not enter the
    # mean/power divisors.
    if G == 1:
        seg_g = np.array([n_seg], np.float32)
    else:
        seg_g = np.full(G, g_q * segs_per_step, np.float32)
        seg_g[:g_r] += segs_per_step
    cross, psd, energy = _finalize_banks(
        cr, ci, psd, s_r, s_i, np.asarray(pairs, np.int32), seg_g,
        remove_dc, prescale,
    )
    if n_splits == 1:
        return C(cross.re[0], cross.im[0]), psd[0], energy[0]
    return cross, psd, energy
