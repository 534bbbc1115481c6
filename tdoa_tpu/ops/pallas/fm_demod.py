"""Fused FM discriminator + decimating FIR as one Pallas TPU kernel.

Why a hand kernel: the demod chain reads IQ at the full capture rate
(2 Msps × 2 floats) but writes audio at rate/D — the intermediate
instantaneous-frequency array is pure HBM waste if materialized. This
kernel keeps the full-rate intermediate in VMEM only: each grid step DMAs
one input tile (with halo), runs the quadrature discriminator (pairwise
conjugate product → polynomial atan2, the vectorization of
rtl_fm.c:427-434's polar_discriminant), and applies the decimating FIR
**as two MXU matmuls** — writing only the decimated audio tile.

The matmul trick (everything stays 128-lane aligned, which Mosaic
requires): view the discriminator output as rows of 128 samples,
``d2d[r, q] = d[128r + q]``. With decimation D (D | 128) each row owns
J = 128/D outputs, and a K-tap FIR (K ≤ 128) touches at most rows r and
r+1:

    y[J·r + j] = Σ_q d2d[r, q]·A[q, j] + Σ_q d2d[r+1, q]·B[q, j]
    A[q, j] = h[q − D·j]        (0 ≤ q − D·j < K)
    B[q, j] = h[q + 128 − D·j]  (0 ≤ q + 128 − D·j < K)

A and B are static (128, J) matrices, so the whole FIR+decimate is
``d2d[:T] @ A + roll(d2d, −1 row)[:T] @ B`` — two systolic-array passes
per tile, no unaligned slicing, no lane gathers.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tdoa_tpu.dsp.filters import lowpass_taps
from tdoa_tpu.ops.cplx import C
from tdoa_tpu.utils.platform import default_interpret_mode

_LANES = 128


def _atan2(y: jax.Array, x: jax.Array) -> jax.Array:
    """Polynomial atan2 for Pallas TPU (no atan2 lowering exists).

    Octant reduction + odd minimax polynomial on [0, 1]; max error
    ~2e-6 rad — far below the discriminator's noise floor. The VPU-
    friendly cousin of rtl_fm.c:436-457's fast_atan2.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, 1e-30)
    s = a * a
    r = a * (
        0.99997726
        + s * (-0.33262347
               + s * (0.19354346
                      + s * (-0.11643287
                             + s * (0.05265332 + s * -0.01172120))))
    )
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _tap_matrices(taps: np.ndarray, decim: int) -> tuple:
    """The static (128, 128/decim) FIR-decimation matrices A and B."""
    k_taps = len(taps)
    j_out = _LANES // decim
    a = np.zeros((_LANES, j_out), np.float32)
    b = np.zeros((_LANES, j_out), np.float32)
    for j in range(j_out):
        for q in range(_LANES):
            k = q - decim * j
            if 0 <= k < k_taps:
                a[q, j] = taps[k]
            k2 = q + _LANES - decim * j
            if 0 <= k2 < k_taps:
                b[q, j] = taps[k2]
    return a, b


_HALO_ROWS = 8  # sublane-aligned; only 2 rows are actually consumed


def _kernel(a_ref, b_ref, xr_ref, xi_ref, hr_ref, hi_ref, out_ref,
            *, tile_rows: int, inv_dev: float):
    # Auto-blocked inputs (the target runtime faults on manual
    # make_async_copy DMA, so overlap comes from a precomputed halo
    # array instead): main block rows + the next 8 rows.
    win = tile_rows + _HALO_ROWS
    xr = jnp.concatenate([xr_ref[:, :], hr_ref[0]], axis=0)  # [win, 128]
    xi = jnp.concatenate([xi_ref[:, :], hi_ref[0]], axis=0)

    # One-sample look-back on the 2-D layout, with no unaligned slicing:
    # prev[r, q] = x[r, q−1] for q > 0 (lane roll), and x[r−1, 127] for
    # q = 0 (lane roll of the row roll).
    def prev_of(x2d):
        rl = pltpu.roll(x2d, shift=1, axis=1)
        rlr = pltpu.roll(rl, shift=1, axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
        return jnp.where(col == 0, rlr, rl)

    pr, pi = prev_of(xr), prev_of(xi)
    # Quadrature discriminator: angle(x[g]·conj(x[g−1])).
    p_re = xr * pr + xi * pi
    p_im = xi * pr - xr * pi
    disc = _atan2(p_im, p_re) * jnp.float32(inv_dev)  # [win, 128]
    # Window row 0 exists only as look-back; drop it (roll keeps slices
    # starting at row 0, which Mosaic requires).
    dwin = pltpu.roll(disc, shift=win - 1, axis=0)  # dwin[r] = disc[r+1]

    t0 = dwin[:tile_rows, :]
    t1 = pltpu.roll(dwin, shift=win - 1, axis=0)[:tile_rows, :]  # row r+1
    y = jnp.dot(t0, a_ref[:, :], preferred_element_type=jnp.float32) + jnp.dot(
        t1, b_ref[:, :], preferred_element_type=jnp.float32
    )
    out_ref[:, :] = y


@functools.partial(
    jax.jit,
    # sample_rate/deviation_hz parameterize host-built tap matrices and
    # must be Python floats (they'd crash as tracers).
    static_argnames=(
        "sample_rate", "deviation_hz", "decim", "num_taps", "tile_rows",
        "interpret",
    ),
)
def fm_demod_decimate_pallas(
    x: C,  # [n] planar IQ at the capture rate
    sample_rate: float = 2e6,
    deviation_hz: float = 25e3,
    decim: int = 16,
    num_taps: int = 128,
    tile_rows: int = 256,  # input rows of 128 samples per grid step
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Demodulate+decimate one signal. Returns audio [n // decim] f32.

    The audio is scaled so ±deviation maps to ±1 (phase increments ×
    fs/(2π·deviation)). DC (receiver LO offset) is removed afterwards by
    the caller if needed. Constraints: decim | 128, num_taps ≤ 128.
    Inputs of any length work: the last partial tile is zero-padded and
    the output is trimmed to exactly ``n // decim``.
    """
    if interpret is None:
        interpret = default_interpret_mode()
    if _LANES % decim != 0:
        raise ValueError("decim must divide 128")
    if num_taps > _LANES:
        raise ValueError("num_taps must be <= 128")
    n = x.re.shape[-1]
    tile_in = tile_rows * _LANES
    n_tiles = max(-(-n // tile_in), 1)  # ceil: never drop a partial tile
    n_in = n_tiles * tile_in
    j_out = _LANES // decim

    taps = lowpass_taps(0.45 * sample_rate / decim, sample_rate, num_taps - 1)
    taps = np.concatenate([taps, np.zeros(num_taps - len(taps), np.float32)])
    a_mat, b_mat = _tap_matrices(taps, decim)

    # Lay the signal out as rows of 128: one zero row in front (the first
    # sample's look-back) and enough zero rows behind that every tile's
    # 8-row halo exists.
    total_rows = n_tiles * tile_rows + _HALO_ROWS

    def pad(arr):
        arr = arr[:n_in]
        # Zero-fill from the actual length (shorter than n_in for a
        # partial final tile), not from n_in.
        right = total_rows * _LANES - int(arr.shape[-1]) - _LANES
        return jnp.pad(arr, (_LANES, right)).reshape(total_rows, _LANES)

    xr, xi = pad(x.re), pad(x.im)
    # Per-tile halo: the 8 rows following each tile's block (gathered by
    # XLA outside the kernel — ~3% duplicate input traffic instead of
    # manual overlapping DMA, which this runtime faults on).
    halo_idx = (np.arange(1, n_tiles + 1)[:, None] * tile_rows
                + np.arange(_HALO_ROWS)[None, :])
    hr = xr[jnp.asarray(halo_idx)]
    hi = xi[jnp.asarray(halo_idx)]
    inv_dev = sample_rate / (2.0 * np.pi * deviation_hz)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_rows=tile_rows, inv_dev=inv_dev),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B
            pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # x re block
            pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # x im block
            pl.BlockSpec((1, _HALO_ROWS, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # re halo
            pl.BlockSpec((1, _HALO_ROWS, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # im halo
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, j_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile_rows, j_out), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(a_mat), jnp.asarray(b_mat), xr, xi, hr, hi)
    return out.reshape(-1)[: n // decim]
