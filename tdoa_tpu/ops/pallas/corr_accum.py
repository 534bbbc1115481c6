"""Fused segment-correlator kernel: FFT + cross-spectra + accumulate.

One Pallas program does, per capture segment, what the XLA path spreads
over many HLOs and HBM round-trips:

    load segment (all stations) → zero-pad → 65536-point FFT per signal
    (two 256×256 DFT matmuls with a twiddle rotation between — all in
    VMEM) → per-pair cross-spectra + per-station PSD → accumulate

The accumulators live in VMEM across the whole grid (constant output
index ⇒ Pallas keeps the block resident; nothing is flushed per step),
so the only HBM traffic in the loop is reading the input segments. The
FFT emits the spectrum in the *digit-permuted* layout [k1, k2] (true
frequency index = 256·k2 + k1) — cross-spectra and PSD accumulate in
that layout consistently, and the caller un-permutes once at finalize
(a single cheap transpose outside the kernel).

Constraints (by construction): fft_len = 65536 = 256², seg_len = 45056
(= 176·256 rows of data + 80 zero rows), station count and pair list
static. Falls back to the XLA path for anything else (ops/corr.py).
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
PAD_ROWS = R - SEG_ROWS  # 80 zero rows
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


def _kernel(xr_ref, xi_ref, mr_ref, mi_ref, sc_ref, wr_ref, wi_ref,
            tr_ref, ti_ref,
            cr_ref, ci_ref, psd_ref,
            sxr, sxi,
            *, n_st: int, pairs: Tuple[Tuple[int, int], ...], mm_dtype,
            segs_per_step: int):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _init():
        cr_ref[...] = jnp.zeros_like(cr_ref)
        ci_ref[...] = jnp.zeros_like(ci_ref)
        psd_ref[...] = jnp.zeros_like(psd_ref)

    f32 = jnp.float32
    wr = wr_ref[:, :].astype(mm_dtype)
    wi = wi_ref[:, :].astype(mm_dtype)

    def cmatmul(ar, ai, br, bi):
        """(ar+jai) @ (br+jbi) with f32 accumulation."""
        ar = ar.astype(mm_dtype)
        ai = ai.astype(mm_dtype)
        rr = jnp.dot(ar, br, preferred_element_type=f32) - jnp.dot(
            ai, bi, preferred_element_type=f32)
        ri = jnp.dot(ar, bi, preferred_element_type=f32) + jnp.dot(
            ai, br, preferred_element_type=f32)
        return rr, ri

    zeros_pad = jnp.zeros((PAD_ROWS, R), jnp.float32)
    # Several segments per grid step amortize Pallas' per-step cost
    # (grid bookkeeping + block fetch setup) over more MXU work.
    for g in range(segs_per_step):
        r0 = g * SEG_ROWS
        # FFT each station's segment; park spectra in scratch [n_st, R, R].
        # DC removal and RMS prescale (per-station scalars, precomputed by
        # cheap reductions) fold into the load — no separate full-signal
        # normalization passes.
        for st in range(n_st):
            x2r = jnp.concatenate(
                [(xr_ref[st, r0 : r0 + SEG_ROWS, :] - mr_ref[0, st])
                 * sc_ref[0, st], zeros_pad],
                axis=0,
            )  # [R, R]
            x2i = jnp.concatenate(
                [(xi_ref[st, r0 : r0 + SEG_ROWS, :] - mi_ref[0, st])
                 * sc_ref[0, st], zeros_pad],
                axis=0,
            )
            # Stage 1: DFT over rows — W @ x.
            a_r, a_i = cmatmul(
                wr, wi, x2r.astype(mm_dtype), x2i.astype(mm_dtype)
            )
            # Twiddle rotation (f32 elementwise).
            t_r = a_r * tr_ref[:, :] - a_i * ti_ref[:, :]
            t_i = a_r * ti_ref[:, :] + a_i * tr_ref[:, :]
            # Stage 2: DFT over columns — x @ W.
            b_r, b_i = cmatmul(t_r, t_i, wr, wi)
            sxr[st] = b_r
            sxi[st] = b_i
            psd_ref[st] += b_r * b_r + b_i * b_i

        for m, (i, j) in enumerate(pairs):
            # X_j · conj(X_i)
            jr, ji = sxr[j], sxi[j]
            ir, ii = sxr[i], sxi[i]
            cr_ref[m] += jr * ir + ji * ii
            ci_ref[m] += ji * ir - jr * ii


@functools.partial(
    jax.jit,
    static_argnames=(
        "pairs", "precision", "interpret", "segs_per_step", "remove_dc",
        "prescale", "vma",
    ),
)
def accumulate_cross_spectra_pallas(
    x: C,  # [n_st, N] planar; N is truncated to a multiple of SEG_LEN
    pairs: Tuple[Tuple[int, int], ...],
    precision: str = "f32",
    interpret: Optional[bool] = None,
    segs_per_step: int = 1,  # 1 measured best on v5e (4: 5956 vs 6465 Ms/s)
    remove_dc: bool = False,
    prescale: bool = False,
    vma: Optional[frozenset] = None,
):
    """Fused accumulation. Returns (cross C[m, FFT_LEN], psd [n_st,
    FFT_LEN], energy [n_st]) in TRUE frequency order, matching
    ops.corr._accumulate_cross_spectra with seg_len=SEG_LEN,
    fft_len=FFT_LEN. ``remove_dc``/``prescale`` fold per-station mean
    subtraction and 1/RMS scaling into the kernel's loads (the scalars
    themselves are cheap read-only reductions) — no extra full-signal
    normalization passes over HBM. ``vma`` declares the outputs' varying
    mesh axes when called inside shard_map (jax check_vma typing).
    """
    if interpret is None:
        interpret = default_interpret_mode()
    n_st, n = x.re.shape
    n_seg = n // SEG_LEN
    while segs_per_step > 1 and n_seg % segs_per_step:
        segs_per_step -= 1
    n_steps = n_seg // segs_per_step
    use = n_seg * SEG_LEN
    m = len(pairs)
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    power = jnp.mean(
        x.re[:, :use] ** 2 + x.im[:, :use] ** 2, axis=-1
    )  # [n_st]
    if remove_dc:
        mean_r = jnp.mean(x.re[:, :use], axis=-1)
        mean_i = jnp.mean(x.im[:, :use], axis=-1)
    else:
        mean_r = jnp.zeros((n_st,), jnp.float32)
        mean_i = jnp.zeros((n_st,), jnp.float32)
    # Power of the demeaned signal (exact: E|x−m|² = E|x|² − |m|²).
    power_dm = jnp.maximum(power - mean_r**2 - mean_i**2, 1e-30)
    if prescale:
        scale = 1.0 / jnp.sqrt(power_dm)
        energy = jnp.full((n_st,), float(use), jnp.float32)
    else:
        scale = jnp.ones((n_st,), jnp.float32)
        energy = power_dm * use
    mean_r, mean_i, scale = (a[None, :] for a in (mean_r, mean_i, scale))

    # [n_st, n_seg*SEG_ROWS, R] — rows of 256 lanes, XLA-side reshape.
    x3r = x.re[:, :use].reshape(n_st, n_seg * SEG_ROWS, R)
    x3i = x.im[:, :use].reshape(n_st, n_seg * SEG_ROWS, R)

    wr, wi, tr, ti = (jnp.asarray(a) for a in _mats())

    step_rows = segs_per_step * SEG_ROWS
    cr, ci, psd = pl.pallas_call(
        functools.partial(
            _kernel, n_st=n_st, pairs=pairs, mm_dtype=mm_dtype,
            segs_per_step=segs_per_step,
        ),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((n_st, step_rows, R), lambda s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_st, step_rows, R), lambda s: (0, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # station means re
            pl.BlockSpec(memory_space=pltpu.VMEM),  # station means im
            pl.BlockSpec(memory_space=pltpu.VMEM),  # station scales
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W re
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W im
            pl.BlockSpec(memory_space=pltpu.VMEM),  # twiddle re
            pl.BlockSpec(memory_space=pltpu.VMEM),  # twiddle im
        ],
        out_specs=(
            pl.BlockSpec((m, R, R), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, R, R), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_st, R, R), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, R, R), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((m, R, R), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((n_st, R, R), jnp.float32, vma=vma),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_st, R, R), jnp.float32),
            pltpu.VMEM((n_st, R, R), jnp.float32),
        ],
        interpret=interpret,
    )(x3r, x3i, mean_r, mean_i, scale, wr, wi, tr, ti)

    # Un-permute once: true index = 256·k2 + k1 ⇒ transpose (k1,k2).
    def unperm(a):
        return jnp.swapaxes(a, -1, -2).reshape(*a.shape[:-2], FFT_LEN)

    cross = C(unperm(cr), unperm(ci))
    psd_t = unperm(psd)
    return cross, psd_t, energy
