"""Fused split-σ probe kernel: LOO HT weighting + deramped zoom DFT.

The split empirical error bar (ops/corr.py `_combine_splits`) estimates
each of K sub-capture groups' delay with a ±16-lag zoom DFT around the
full capture's coarse peak, weighting each group's spectrum with the
OTHER groups' (leave-one-out) Hannan–Thomson factor. As XLA ops this
stage materializes a dozen [K·m, F] HBM tensors (LOO subtraction,
magnitude, coherence, weight, deramp phases, sin/cos, weighted planar
spectrum) — measured ~20 ms of the 12-station 30 s device time
(scripts/headline_profile.py attribution_queued,
split_sigma_over_finish_k4_s), against ~0.5 ms of unavoidable HBM
reads.

This kernel computes the whole stage in one pass structure:

  pass 0: stream the group accumulators tile-by-tile, build the LOO
          cross/PSD sums ON THE MXU (0/1 selector matmuls — no
          sublane-axis reshapes), and accumulate the per-row spectral
          means the HT weight needs (Σ|C_loo|, Σ denom);
  pass 1: stream again, form the HT weight per bin, multiply the
          GROUP's own spectrum, deramp by the coarse delay with the
          exact int32 (k·d mod F) trick, and accumulate the 33-lag
          zoom window as two [rows, T] @ [T, 33] matmuls per tile.

Everything intermediate lives in VMEM; HBM traffic is the group
accumulators twice (selectors and the zoom basis are generated
in-kernel from iota) instead of ~10 tensor round-trips.

One deliberate, measurement-invariant difference from the XLA path
(`_weight_factor`): the per-row normalization ``snr_w / max_f(snr_w)``
is DROPPED. It is a positive per-row scalar, and the zoom probe's
output — argmax position plus a three-point parabolic offset (both
scale-invariant) — is identical without it. Dropping it removes the
third row-reduction (a max whose operand depends on the mean-based
floor), which is what lets the kernel run in two passes.

Weighting support: HT/ML only (the shipped estimator ladder's
weighting); callers fall back to the XLA path for PHAT/SCOT/none.
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

TILE = 2048  # frequency-axis tile (lanes per grid step)
HALF_WIDTH = 16  # zoom window: ±16 lags around the coarse peak
W = 2 * HALF_WIDTH + 1
# Mosaic scoped-VMEM request ceiling (vmem_limit_bytes clamps here);
# geometries whose live set exceeds it must take the XLA probe path —
# the clamp is silent, so routing them into the kernel means a Mosaic
# VMEM OOM at compile time on real TPU (advisor round-4, medium).
VMEM_CEILING = 100 << 20


def _vmem_need_bytes(KM: int, KN: int) -> int:
    """The kernel's scoped-VMEM request for K·m pair-group rows and
    K·n_st PSD rows: double-buffered operand tiles plus ~a dozen live
    [KM, TILE] f32 temporaries in the weight chain, with 1.5× headroom
    (chip-validated at 12 stations: 264 rows → 21.8 MB measured,
    formula 67 MB requested, compile + run OK)."""
    return int(1.5 * (16 * KM * TILE * 4 + 2 * (KM + KN) * TILE * 4 * 2))


def _kernel(crg_ref, cig_ref, psd_ref, ij_ref,
            d_ref, nseg_ref,
            accre_ref, accim_ref,
            smag_ref, sden_ref,
            *, fft_len: int, eps: float, K: int, m: int, n_st: int):
    p = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32
    i32 = jnp.int32

    @pl.when(jnp.logical_and(p == 0, t == 0))
    def _zero_sums():
        smag_ref[...] = jnp.zeros_like(smag_ref)
        sden_ref[...] = jnp.zeros_like(sden_ref)

    @pl.when(jnp.logical_and(p == 1, t == 0))
    def _zero_acc():
        accre_ref[...] = jnp.zeros_like(accre_ref)
        accim_ref[...] = jnp.zeros_like(accim_ref)

    crb = crg_ref[...]  # [KM, T] group cross (true frequency order)
    cib = cig_ref[...]
    psb = jnp.maximum(psd_ref[...], 0.0)  # [KN, T]
    KM, KN = K * m, K * n_st
    # LOO-sum selector matrices, built IN-KERNEL from iota comparisons
    # (tiny VPU work per step). Building them host-side and closing
    # over them embeds ~MB-scale constants in the program text, which
    # stalled the remote compile pipeline (bisected: the identical
    # kernel with the same arrays as runtime operands ran in seconds).
    #   lc[r, c]  = 1 iff  pair(c) == pair(r) and group(c) != group(r)
    #   li[r, c'] = 1 iff  st(c') == i_{pair(r)} and grp(c') != grp(r)
    rr = jax.lax.broadcasted_iota(i32, (KM, 1), 0)
    p_r = rr % m
    k_r = rr // m
    cc = jax.lax.broadcasted_iota(i32, (1, KM), 1)
    lc = jnp.logical_and(cc % m == p_r, cc // m != k_r).astype(f32)
    cs = jax.lax.broadcasted_iota(i32, (1, KN), 1)
    s_c = cs % n_st
    k_c = cs // n_st
    i_row = ij_ref[:, 0:1]  # [KM, 1] i32 station i of the row's pair
    j_row = ij_ref[:, 1:2]
    keep = k_c != k_r
    li = jnp.logical_and(s_c == i_row, keep).astype(f32)
    lj = jnp.logical_and(s_c == j_row, keep).astype(f32)
    # LOO sums on the MXU: 0/1 selector matmuls (exact products).
    lre = jnp.dot(lc, crb, preferred_element_type=f32)
    lim_ = jnp.dot(lc, cib, preferred_element_type=f32)
    saa = jnp.dot(li, psb, preferred_element_type=f32)
    sbb = jnp.dot(lj, psb, preferred_element_type=f32)
    mag = jnp.sqrt(lre * lre + lim_ * lim_)
    denom = jnp.sqrt(saa) * jnp.sqrt(sbb)

    rows, tile = mag.shape

    @pl.when(p == 0)
    def _accumulate_sums():
        # Reduce the tile to the 128-lane scratch accumulator (final
        # scalar reduction happens in pass 1). Aligned 128-lane slices
        # instead of a lane-axis reshape (Mosaic-safe).
        ms = mag[:, 0:128]
        ds_ = denom[:, 0:128]
        for j in range(1, tile // 128):
            ms = ms + mag[:, j * 128:(j + 1) * 128]
            ds_ = ds_ + denom[:, j * 128:(j + 1) * 128]
        smag_ref[...] += ms
        sden_ref[...] += ds_

    @pl.when(p == 1)
    def _weight_and_zoom():
        inv_f = f32(1.0 / fft_len)
        mean_mag = jnp.sum(smag_ref[...], axis=-1, keepdims=True) * inv_f
        mean_den = jnp.sum(sden_ref[...], axis=-1, keepdims=True) * inv_f
        # Hannan–Thomson SNR weight from the LOO magnitude-squared
        # coherence, debiased by the LOO segment count (ops.corr.
        # _weight_factor semantics, minus the argmax-invariant
        # row normalization — see module docstring).
        gamma = mag / jnp.maximum(denom, 1e-30)
        gamma2 = jnp.clip(gamma * gamma, 0.0, 0.98)
        s = nseg_ref[...]  # [KM, 1]
        bias = jnp.where(s > 1.0, 1.0 / jnp.maximum(s, 1.0), 0.0)
        gamma2 = jnp.clip(
            (gamma2 - bias) / jnp.maximum(1.0 - bias, 1e-6), 0.0, 0.98)
        snr_w = gamma2 / (1.0 - gamma2)
        snr_w = jnp.where(denom > 1e-9 * mean_den, snr_w, 0.0)
        d_w = mag + f32(eps) * mean_mag + 1e-30
        w = snr_w / d_w
        # Weighted GROUP spectrum (the probe weights the group's own
        # cross-spectrum with the LOO factor).
        wre = crb * w
        wim = cib * w
        # Exact integer deramp: (k·d) mod F via bitwise AND (F = 2^n);
        # two's-complement AND yields the positive residue for negative
        # delays too. k·d stays under 2³¹ (guarded in the wrapper).
        k_idx = (jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                 + t * tile)
        frac = jnp.bitwise_and(k_idx * d_ref[...], fft_len - 1)
        ang = frac.astype(f32) * f32(2.0 * np.pi / fft_len)
        c = jnp.cos(ang)
        sn = jnp.sin(ang)
        dre = wre * c - wim * sn
        dim = wre * sn + wim * c
        # Zoom basis for this tile, in-kernel (same no-big-constants
        # rule as the selectors): ang2 = 2π f δ with f the SIGNED bin
        # frequency (k < F/2 ? k : k − F)/F and δ ∈ [−16, 16].
        k_col = (jax.lax.broadcasted_iota(i32, (tile, 1), 0) + t * tile)
        k_signed = jnp.where(k_col < fft_len // 2, k_col,
                             k_col - fft_len).astype(f32)
        delta = (jax.lax.broadcasted_iota(i32, (1, W), 1)
                 - HALF_WIDTH).astype(f32)
        ang2 = (k_signed * f32(2.0 * np.pi / fft_len)) * delta
        er = jnp.cos(ang2)  # [T, W]
        ei = jnp.sin(ang2)
        accre_ref[...] += (
            jnp.dot(dre, er, preferred_element_type=f32)
            - jnp.dot(dim, ei, preferred_element_type=f32))
        accim_ref[...] += (
            jnp.dot(dre, ei, preferred_element_type=f32)
            + jnp.dot(dim, er, preferred_element_type=f32))


@functools.partial(
    jax.jit,
    static_argnames=("pairs", "fft_len", "eps", "interpret"),
)
def loo_zoom_windows_pallas(
    cross_g: C,  # [K, m, F] per-group cross-spectra (true order)
    psd_g: jax.Array,  # [K, n_st, F]
    pairs: Tuple[Tuple[int, int], ...],
    coarse: jax.Array,  # [m] rounded full-capture coarse delays
    n_seg_loo: jax.Array,  # [K*m] LOO segment counts
    fft_len: int,
    eps: float = 1e-3,
    interpret: Optional[bool] = None,
):
    """Complex zoom windows [K·m, W] around ``coarse`` for every
    (group, pair) probe — the fused equivalent of `_weight_factor` +
    `_zoom_corr_delay` over the stacked LOO batch. The caller takes
    |window|, parabolic-peaks it, and adds ``coarse − HALF_WIDTH``.

    The only non-data operand is the [K·m, 2] per-row station-index
    table; selectors and the zoom basis are generated in-kernel from
    iota (see `_kernel` — MB-scale host-built constants stalled the
    remote compile pipeline).
    """
    if interpret is None:
        interpret = default_interpret_mode()
    K, m, F = cross_g.re.shape
    n_st = psd_g.shape[1]
    if F != fft_len or F % TILE or F < TILE:
        raise ValueError(f"fft_len {fft_len} incompatible with TILE {TILE}")
    KM = K * m
    crg = cross_g.re.reshape(KM, F)
    cig = cross_g.im.reshape(KM, F)
    psd = psd_g.reshape(K * n_st, F)
    ij = jnp.asarray(
        np.tile(np.asarray(pairs, np.int32), (K, 1))
    )  # [KM, 2], ~KB-scale
    d_i = jnp.round(jnp.tile(coarse, K)).astype(jnp.int32)[:, None]
    nseg = n_seg_loo.astype(jnp.float32)[:, None]

    grid = (2, F // TILE)
    kernel = functools.partial(_kernel, fft_len=F, eps=eps,
                               K=K, m=m, n_st=n_st)
    row_spec = pl.BlockSpec((KM, TILE), lambda p, t: (0, t),
                            memory_space=pltpu.VMEM)
    psd_spec = pl.BlockSpec((K * n_st, TILE), lambda p, t: (0, t),
                            memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((KM, W), lambda p, t: (0, 0),
                            memory_space=pltpu.VMEM)
    accre, accim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, psd_spec,
                  const_spec, const_spec, const_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((KM, W), jnp.float32),
            jax.ShapeDtypeStruct((KM, W), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((KM, 128), jnp.float32),
            pltpu.VMEM((KM, 128), jnp.float32),
        ],
        # Mosaic's 16 MB default scoped-VMEM budget OOMs at 12 stations
        # (measured 21.8 MB needed: double-buffered [264, 2048] operand
        # tiles plus ~a dozen live [264, 2048] f32 temporaries in the
        # weight chain). Request by the same live-set arithmetic with
        # headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(16 << 20, _vmem_need_bytes(KM, K * n_st)),
                VMEM_CEILING,
            )
        ),
        interpret=interpret,
    )(crg, cig, psd, ij, d_i, nseg)
    return accre, accim


def loo_zoom_delays_pallas(
    cross_g: C, psd_g, pairs, coarse, n_seg_loo, fft_len: int,
    eps: float = 1e-3, interpret: Optional[bool] = None,
):
    """Per-probe zoom delays ds [K, m] (the `_zoom_corr_delay` output
    for every LOO-weighted group probe)."""
    from tdoa_tpu.ops.peaks import parabolic_peak

    K, m, _ = cross_g.re.shape
    accre, accim = loo_zoom_windows_pallas(
        cross_g, psd_g, pairs, coarse, n_seg_loo, fft_len, eps,
        interpret,
    )
    win = jnp.sqrt(accre * accre + accim * accim)
    pos, _ = parabolic_peak(win)
    return (jnp.tile(coarse, K) + pos - jnp.float32(HALF_WIDTH)).reshape(
        K, m)


def zoom_probe_flop_model(K: int, m: int, n_st: int,
                          fft_len: int) -> dict:
    """Static FLOP count for one probe-kernel invocation (round-5: the
    MFU model must credit every on-device kernel, not only the
    accumulators — the 12-station 19% 'MFU' partly reflected
    uncredited probe work, not idle silicon).

    MXU (exact — the kernel's matmul geometry is static; 1 MAC =
    2 FLOPs): both passes run the LOO selector matmuls
    (2× [K·m, K·m]@[K·m, T] + 2× [K·m, K·n_st]@[K·n_st, T] per tile),
    and pass 1 adds the 4 zoom matmuls [K·m, T]@[T, W]. Summed over
    the F/T tiles:

        mxu = 8·KM·(KM + KN)·F  +  8·KM·W·F

    VPU (approximate, stated coefficient): the magnitude/coherence/
    weight/deramp elementwise chain is ~40 ops per [K·m, F] element
    across the two passes."""
    KM, KN = K * m, K * n_st
    mxu = 8 * KM * (KM + KN) * fft_len + 8 * KM * W * fft_len
    vpu = 40 * KM * fft_len
    return {"mxu_flops": mxu, "vpu_flops": vpu}


def zoom_probe_supported(fft_len: int, max_lag: int, weighting: str,
                         K: int = 0, m: int = 0, n_st: int = 0) -> bool:
    """Static gate for routing `_combine_splits` through the fused
    probe kernel: HT/ML weighting (the kernel's hard-coded formula),
    tile-divisible FFT length, the int32 deramp guard (k·d < 2³¹ —
    same bound as `_zoom_corr_delay`), and — when the probe geometry
    (K groups × m pairs over n_st stations) is given — the scoped-VMEM
    budget: the kernel holds full [K·m, TILE] blocks plus the live
    weight-chain temporaries in VMEM, and past ~100 MB the
    vmem_limit_bytes request silently clamps, which is a Mosaic
    compile failure on chip (e.g. 16-24-station geometries,
    K·m ≥ ~480 rows). Callers that omit the geometry get the
    shape-only gates (chip-validated region is ≤ 12 stations)."""
    if K and m and n_st and _vmem_need_bytes(K * m, K * n_st) > VMEM_CEILING:
        return False
    return (
        weighting in ("ht", "ml")
        # Power of two: the kernel's deramp residue is
        # bitwise_and(k·d, fft_len − 1), which is (k·d) mod fft_len
        # ONLY for 2^n — a 3·TILE length would pass the divisibility
        # gates and silently produce wrong probe delays.
        and fft_len >= TILE
        and (fft_len & (fft_len - 1)) == 0
        and fft_len % TILE == 0
        and fft_len * (max_lag + HALF_WIDTH + 1) < 2**31
    )
