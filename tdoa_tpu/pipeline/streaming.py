"""Streaming correlation and multi-target tracking.

Two capabilities on top of the batch pipeline:

1. **Incremental cross-spectrum accumulation** (``CorrAccumulator``): the
   segmented correlator's accumulator exposed as explicit functional
   state. Feed capture chunks as they arrive (stream ingest, or segments
   of a capture too long to hold), checkpoint the state between chunks
   (it is O(fft_len), capture-length independent — the natural resume
   point the reference lacks entirely, SURVEY.md §5 "Checkpoint/resume:
   none"), and finalize to delays at any time. Finalizing does not
   consume the state — estimates can be emitted continuously while
   integration keeps deepening (the reference's documented-but-unbuilt
   coherent-integration plan, snr_analysis.go:83-88).

2. **Multi-target tracking** (``TargetTracker``): per-window fixes from
   continuous processing, smoothed by an alpha-beta filter in the local
   ENU frame — the "streaming multi-target" configuration of
   BASELINE.json. Position/velocity state per target; batched solves ride
   the vmapped LM solver.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tdoa_tpu.geo import network_origin, enu_to_lla, lla_to_enu
from tdoa_tpu.ops.corr import (
    CorrResult,
    _accumulate_cross_spectra,
    _finish_correlation,
    _split_half_sigma,
    _weight_factor,
    next_pow2,
)
from tdoa_tpu.ops.cplx import C
from tdoa_tpu.solve.multilateration import solve_tdoa_enu, station_pairs
from tdoa_tpu.utils.constants import SPEED_OF_LIGHT


class AccState(NamedTuple):
    """Checkpointable accumulator: everything needed to resume or
    finalize a long-running correlation."""

    cross_re: jax.Array  # [m, F]
    cross_im: jax.Array  # [m, F]
    psd: jax.Array  # [n_st, F]
    energy: jax.Array  # [n_st]
    # Scalar count of integrated *segments* (samples = n_seg·seg_len).
    # Counting segments keeps int32 honest out to ~10^14 samples; a raw
    # sample counter would wrap after ~18 minutes at 2 Msps.
    n_seg: jax.Array
    # Split-slot cross-spectra for the empirical error bar: update
    # calls alternate into slot A (the other "half" is total − A).
    # Contiguous halves need the total duration up front — unknowable
    # in streaming — so the halves interleave by chunk instead: a
    # jackknife over time that sees realization noise and impairment
    # residue, though not slow drift (which contiguous halves would).
    cross_re_a: jax.Array  # [m, F]
    cross_im_a: jax.Array  # [m, F]
    n_seg_a: jax.Array  # scalar int32
    n_chunks: jax.Array  # scalar int32 (update-call parity selector)


def acc_init(n_st: int, n_pairs: int, fft_len: int) -> AccState:
    return AccState(
        cross_re=jnp.zeros((n_pairs, fft_len), jnp.float32),
        cross_im=jnp.zeros((n_pairs, fft_len), jnp.float32),
        psd=jnp.zeros((n_st, fft_len), jnp.float32),
        energy=jnp.zeros((n_st,), jnp.float32),
        n_seg=jnp.zeros((), jnp.int32),
        cross_re_a=jnp.zeros((n_pairs, fft_len), jnp.float32),
        cross_im_a=jnp.zeros((n_pairs, fft_len), jnp.float32),
        n_seg_a=jnp.zeros((), jnp.int32),
        n_chunks=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("seg_len", "fft_len", "pairs_static", "precision"),
)
def acc_update(
    state: AccState,
    chunk: C,  # [n_st, L] planar; L a multiple of seg_len
    pair_idx: jax.Array,
    seg_len: int,
    fft_len: int,
    pairs_static: Optional[Tuple[Tuple[int, int], ...]] = None,
    precision: str = "bf16",
) -> AccState:
    """Integrate one capture chunk into the accumulator. The chunk
    length must be a multiple of ``seg_len`` (checked at trace time) —
    a ragged tail would otherwise be dropped while still being counted.

    Pass ``pairs_static`` (the pair list as a static tuple) to route the
    chunk through the fused Pallas kernel on TPU when the accumulator
    geometry matches it (fft_len 65536, seg_len 45056; pair lists past
    one invocation's VMEM budget pair-tile, fused_max_pairs) — the
    streaming path then integrates at the batch pipeline's kernel
    speed. ``precision`` sets the kernel's matmul operand width:
    "bf16" (default, ~2.5× faster; bf16 chunks flow straight through,
    f32 chunks are truncated) or "f32" to keep f32 operands.
    """
    if chunk.re.shape[-1] % seg_len:
        raise ValueError(
            f"chunk length {chunk.re.shape[-1]} is not a multiple of "
            f"seg_len {seg_len}; pad or split the chunk"
        )
    from tdoa_tpu.ops.pallas.corr_accum import (
        FFT_LEN as _P_FFT,
        SEG_LEN as _P_SEG,
        accumulate_cross_spectra_pallas,
        fused_capacity_ok,
    )
    from tdoa_tpu.utils.platform import on_tpu

    if (pairs_static is not None and on_tpu() and fft_len == _P_FFT
            and seg_len == _P_SEG and chunk.re.shape[-1] >= _P_SEG
            # Same VMEM-capacity gate as the batch pipeline's
            # _fused_eligible — the two must never diverge. Pair lists
            # beyond one invocation's budget pair-tile inside the
            # kernel wrapper.
            and fused_capacity_ok(chunk.re.shape[0], len(pairs_static),
                                  remove_dc=False)):
        cross, psd, energy = accumulate_cross_spectra_pallas(
            chunk, pairs_static, precision=precision
        )
    else:
        chunk = C(chunk.re.astype(jnp.float32),
                  chunk.im.astype(jnp.float32))
        cross, psd, energy = _accumulate_cross_spectra(
            chunk, pair_idx, seg_len, fft_len
        )
    sel = (state.n_chunks % 2 == 0).astype(jnp.float32)
    segs = chunk.re.shape[-1] // seg_len
    return AccState(
        cross_re=state.cross_re + cross.re,
        cross_im=state.cross_im + cross.im,
        psd=state.psd + psd,
        energy=state.energy + energy,
        n_seg=state.n_seg + segs,
        cross_re_a=state.cross_re_a + sel * cross.re,
        cross_im_a=state.cross_im_a + sel * cross.im,
        n_seg_a=state.n_seg_a + (state.n_chunks % 2 == 0) * segs,
        n_chunks=state.n_chunks + 1,
    )


def acc_save(path: str, state: AccState) -> None:
    """Checkpoint the accumulator to a ``.npz`` file — the durable
    resume point the reference has no equivalent of (SURVEY.md §5:
    "Checkpoint/resume: none"). The state is O(fft_len) regardless of
    how much capture has been integrated."""
    np.savez(
        path,
        cross_re=np.asarray(state.cross_re),
        cross_im=np.asarray(state.cross_im),
        psd=np.asarray(state.psd),
        energy=np.asarray(state.energy),
        n_seg=np.asarray(state.n_seg),
        cross_re_a=np.asarray(state.cross_re_a),
        cross_im_a=np.asarray(state.cross_im_a),
        n_seg_a=np.asarray(state.n_seg_a),
        n_chunks=np.asarray(state.n_chunks),
    )


def acc_load(path: str) -> AccState:
    """Resume an accumulator from ``acc_save`` output. Checkpoints
    written before the split-slot fields load with an empty slot A —
    finalize then reports the model σ only (no empirical floor) until
    fresh updates populate both slots."""
    with np.load(path) as z:
        have_split = "cross_re_a" in z.files
        return AccState(
            cross_re=jnp.asarray(z["cross_re"]),
            cross_im=jnp.asarray(z["cross_im"]),
            psd=jnp.asarray(z["psd"]),
            energy=jnp.asarray(z["energy"]),
            n_seg=jnp.asarray(z["n_seg"]),
            cross_re_a=jnp.asarray(z["cross_re_a"]) if have_split
            else jnp.zeros_like(jnp.asarray(z["cross_re"])),
            cross_im_a=jnp.asarray(z["cross_im_a"]) if have_split
            else jnp.zeros_like(jnp.asarray(z["cross_im"])),
            n_seg_a=jnp.asarray(z["n_seg_a"]) if have_split
            else jnp.zeros((), jnp.int32),
            n_chunks=jnp.asarray(z["n_chunks"]) if have_split
            else jnp.zeros((), jnp.int32),
        )


@functools.partial(
    jax.jit, static_argnames=("max_lag", "weighting", "fft_len")
)
def acc_finalize(
    state: AccState,
    pair_idx: jax.Array,
    max_lag: int,
    weighting: str = "ht",
    eps: float = 1e-3,
    fft_len: Optional[int] = None,
) -> CorrResult:
    """Current delay estimates from the accumulated spectra (state is
    untouched — keep integrating afterwards).

    ``delay_std`` carries the split-slot empirical floor once BOTH
    interleaved slots hold data (≥2 update calls): the two slots'
    zoom-DFT delays are probed with the full accumulation's debiased
    weights and half their disagreement is folded in, exactly like the
    batch path's split σ (ops/corr.py _combine_splits). With one
    slot empty (single update, or a pre-split checkpoint) the model σ
    + coarse-jitter term stands alone."""
    if fft_len is None:
        fft_len = state.cross_re.shape[-1]
    cross = C(state.cross_re, state.cross_im)
    res = _finish_correlation(
        cross,
        state.psd,
        state.energy,
        pair_idx,
        max_lag,
        weighting,
        eps,
        fft_len,
        "phase",
        n_seg=state.n_seg,
    )
    if weighting == "none":
        return res
    n_seg_b = state.n_seg - state.n_seg_a
    valid = jnp.logical_and(state.n_seg_a > 0, n_seg_b > 0)
    wfac = _weight_factor(
        cross, state.psd, pair_idx, weighting, eps, state.n_seg
    )
    ca = C(state.cross_re_a, state.cross_im_a)
    cb = C(state.cross_re - state.cross_re_a,
           state.cross_im - state.cross_im_a)
    sigma_emp = _split_half_sigma(
        ca, cb, wfac, jnp.round(res.delay), fft_len, max_lag
    )
    return res._replace(
        delay_std=jnp.maximum(
            res.delay_std, jnp.where(valid, sigma_emp, 0.0)
        )
    )


@dataclasses.dataclass
class Track:
    """Alpha-beta smoothed target track in the network's ENU frame."""

    pos_enu: np.ndarray  # [3]
    vel_enu: np.ndarray  # [3] m/s
    last_t: float
    n_updates: int = 1
    quality: float = 0.0
    # Innovation-gate state: EMA of accepted horizontal innovation
    # magnitudes, consecutive coasted (rejected) windows, and the
    # lifetime rejection count.
    innov_ema_m: float = 0.0
    coasts: int = 0
    n_rejected: int = 0

    def lla(self, origin_lla: np.ndarray) -> np.ndarray:
        return enu_to_lla(self.pos_enu, origin_lla)


class TargetTracker:
    """Continuous multi-target tracking from per-window TDOA sets.

    Each call to ``update`` takes one processing window's TDOAs per
    target (seconds, pair-ordered), solves all targets in one vmapped
    device call, and folds the fixes into alpha-beta tracks.
    """

    def __init__(
        self,
        station_lla: np.ndarray,
        alpha: float = 0.5,
        beta: float = 0.1,
        solve_z: bool = False,
        innovation_gate: bool = True,
        gate_floor_m: float = 500.0,
        gate_k: float = 8.0,
        max_coasts: int = 3,
    ):
        self.station_lla = np.asarray(station_lla, dtype=np.float64)
        self.origin = network_origin(self.station_lla)
        self.enu = jnp.asarray(
            lla_to_enu(self.station_lla, self.origin), jnp.float32
        )
        self.pairs = jnp.asarray(station_pairs(len(station_lla)))
        self.alpha = alpha
        self.beta = beta
        self.solve_z = solve_z
        # Innovation gate: an established track rejects a measurement
        # landing far outside its own innovation history — one
        # corrupted window (co-channel burst, bad association) must not
        # yank the track. Rejected windows coast on the motion model;
        # after ``max_coasts`` consecutive rejections the measurement
        # is accepted again (the target genuinely moved — re-acquire).
        # ``innovation_gate=False`` or ``max_coasts <= 0`` disables the
        # gate entirely (plain alpha-beta on every window).
        self.innovation_gate = innovation_gate
        self.gate_floor_m = gate_floor_m
        self.gate_k = gate_k
        self.max_coasts = max_coasts
        self.tracks: Dict[str, Track] = {}

        self._solve_batch = jax.jit(
            jax.vmap(
                lambda rd, w: solve_tdoa_enu(
                    self.enu, self.pairs, rd, weights=w, solve_z=solve_z
                )
            )
        )

    def update(
        self,
        t: float,
        tdoas_s: Dict[str, np.ndarray],  # target id -> [m] seconds
        qualities: Optional[Dict[str, float]] = None,
        fdoa_hz: Optional[Dict[str, np.ndarray]] = None,  # per-pair Doppler
        carrier_hz: Optional[float] = None,
        velocity_enu: Optional[Dict[str, np.ndarray]] = None,
        weights: Optional[Dict[str, np.ndarray]] = None,  # per-pair
    ) -> Dict[str, Track]:
        """``fdoa_hz`` (CAF differential Dopplers, ops/caf.py sign
        convention) upgrades the track's velocity from differentiated
        positions to an instantaneous FDOA least-squares measurement
        (solve/fdoa.py) — one window is enough to know the velocity.
        ``velocity_enu`` passes an already-solved velocity measurement
        directly (e.g. the processor's weighted per-emitter solve) and
        takes precedence over re-solving from ``fdoa_hz``.
        ``weights`` carries the processor's final per-pair solve
        weights (``TDOAResult.solve_weights``) — without them the
        tracker's own re-solve would let pairs the processor gated or
        excluded (outlier stations) vote again."""
        if not tdoas_s:
            return self.tracks
        ids = list(tdoas_s.keys())
        rd = jnp.asarray(
            np.stack([np.asarray(tdoas_s[i]) * SPEED_OF_LIGHT for i in ids]),
            jnp.float32,
        )
        ones = np.ones(int(self.pairs.shape[0]))
        w_rows = jnp.asarray(
            np.stack([
                ones if weights is None or weights.get(i) is None
                else np.asarray(weights[i], np.float64)
                for i in ids
            ]),
            jnp.float32,
        )
        pos, rms = self._solve_batch(rd, w_rows)
        pos = np.asarray(pos, np.float64)
        st_enu = np.asarray(self.enu, np.float64)
        pairs_np = np.asarray(self.pairs)
        for k, tid in enumerate(ids):
            q = float(qualities.get(tid, 0.0)) if qualities else 0.0
            meas = pos[k]
            v_meas = None
            if velocity_enu is not None and tid in velocity_enu:
                v_meas = np.asarray(velocity_enu[tid], np.float64)
            elif fdoa_hz is not None and tid in fdoa_hz and carrier_hz:
                from tdoa_tpu.solve.fdoa import solve_velocity_enu

                v_meas = solve_velocity_enu(
                    st_enu, pairs_np, meas, fdoa_hz[tid], carrier_hz,
                    solve_z=self.solve_z,
                ).vel_enu
            tr = self.tracks.get(tid)
            if tr is None:
                self.tracks[tid] = Track(
                    pos_enu=meas,
                    vel_enu=v_meas if v_meas is not None else np.zeros(3),
                    last_t=t,
                    quality=q,
                )
                continue
            dt = max(t - tr.last_t, 1e-6)
            pred = tr.pos_enu + tr.vel_enu * dt
            resid = meas - pred
            innov = float(np.linalg.norm(resid[:2]))
            if (self.innovation_gate and self.max_coasts > 0
                    and tr.n_updates >= 3
                    and tr.coasts < self.max_coasts
                    and innov > max(self.gate_floor_m,
                                    self.gate_k * tr.innov_ema_m)):
                # A measurement this far outside the track's own
                # innovation history is a corrupted window, not motion:
                # coast on the model and count the miss. max_coasts
                # consecutive rejections mean the target genuinely
                # relocated — the gate then stands down and the next
                # measurement re-acquires.
                tr.pos_enu = pred
                tr.last_t = t
                tr.coasts += 1
                tr.n_rejected += 1
                continue
            if 0 < self.max_coasts <= tr.coasts:
                # Re-acquisition: the target persistently measures
                # elsewhere, so the old state is stale — snap to the
                # measurement instead of alpha-blending toward it over
                # many windows, and restart the track's life: n_updates
                # goes back to 1 (counted since acquisition), which
                # stands the gate down for the next two windows and
                # re-seeds the innovation EMA from them. Without the
                # restart, a moving target re-acquires into a zeroed
                # EMA whose gate then rejects every genuine window — an
                # endless reject/snap limp cycle.
                tr.pos_enu = meas
                tr.vel_enu = (
                    v_meas if v_meas is not None else np.zeros(3)
                )
                tr.innov_ema_m = 0.0
                tr.n_updates = 0
            else:
                tr.pos_enu = pred + self.alpha * resid
                if v_meas is not None:
                    # Direct velocity measurement: blend instead of the
                    # beta/dt differentiation (which only corrects
                    # velocity via position residuals, windows late).
                    tr.vel_enu = (
                        (1.0 - self.alpha) * tr.vel_enu
                        + self.alpha * v_meas
                    )
                else:
                    tr.vel_enu = tr.vel_enu + (self.beta / dt) * resid
                tr.innov_ema_m = (
                    innov if tr.n_updates < 2
                    else 0.7 * tr.innov_ema_m + 0.3 * innov
                )
            tr.coasts = 0
            tr.last_t = t
            tr.n_updates += 1
            tr.quality = q
        return self.tracks
