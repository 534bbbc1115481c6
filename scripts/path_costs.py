"""On-hardware cost of the non-headline device paths.

The headline bench (bench.py) times the IQ correlation program; every
other device path had correctness checks on chip but no recorded cost
(round-1 verdict). This measures, on the REAL chip, steady-state
median-of-5 latency for:

 1. FM-mode correlation (process_blocks mode="fm": Pallas demod +
    decimated audio correlation) on a full 100 s-equivalent block set;
 2. the CAF delay-Doppler surface (ops/caf.py) at the solve-velocity
    configuration (caf_max_samples input, 64 Doppler bins);
 3. the LO-compensation probe (coarse full-window REF correlation +
    ±2048-lag CAF probe — what --lo-compensation adds per capture);
 4. one streaming-window accumulator update + finalize
    (pipeline/streaming.py) at the stream_processor's default window.

Prints a markdown table for BENCHLOG.md. Run on TPU; ~10 min cold.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

from tdoa_tpu.ops.cplx import C

FS = 2e6


def sync(x):
    # block_until_ready is a no-op through the axon tunnel; a scalar
    # device->host transfer synchronizes.
    float(jnp.ravel(x)[0])


def timed(fn, n=5):
    fn()  # compile + first run
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def make_blocks(n_st, length, seed=0):
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def mk(k):
        kr, ki = jax.random.split(k)
        return C(
            jax.random.normal(kr, (n_st, length), jnp.float32),
            jax.random.normal(ki, (n_st, length), jnp.float32),
        )

    out = [mk(k) for k in jax.random.split(key, 3)]
    for b in out:
        sync(b.re)
    return out


def main() -> None:
    from tdoa_tpu.ops.caf import caf_pairs
    from tdoa_tpu.ops.corr import correlate_pairs
    from tdoa_tpu.pipeline.processor import process_blocks
    from tdoa_tpu.pipeline.streaming import (
        acc_finalize,
        acc_init,
        acc_update,
    )
    from tdoa_tpu.ops.pallas.corr_accum import SEG_LEN

    dev = jax.devices()[0]
    print(f"device: {dev}\n")
    pair_idx = jnp.asarray(np.array([[0, 1], [0, 2], [1, 2]], np.int32))
    ref_geo = jnp.zeros(3, jnp.float32)
    rows = []

    # ---- 1. FM-mode correlation, full 100 s-equivalent blocks --------
    block_len = (int(100 * FS / 3) // SEG_LEN) * SEG_LEN
    ref1, tgt, ref2 = make_blocks(3, block_len)

    def run_fm():
        out = process_blocks(
            ref1, tgt, ref2, pair_idx, ref_geo,
            max_lag=20000, weighting="ht", mode="fm", fm_decim=8,
        )
        sync(out[0])

    t_fm = timed(run_fm)
    rows.append(("FM-mode correlation (100 s capture, decim 8)",
                 t_fm, f"{3 * 3 * block_len / t_fm / 1e9:.2f} Gsamples/s"))

    # ---- 2. CAF at the solve-velocity configuration ------------------
    lim = 1 << 21  # caf_max_samples default
    xc = C(tgt.re[:, :lim], tgt.im[:, :lim])

    def run_caf():
        r = caf_pairs(xc, pair_idx, sample_rate=FS, max_lag=2048,
                      seg_len=1 << 13, n_doppler=64)
        sync(r.surface)

    t_caf = timed(run_caf)
    rows.append(("CAF surface (2^21 samples, 64 Doppler bins, ±2048 lags)",
                 t_caf, "per capture with --solve-velocity"))

    # ---- 3. LO-compensation probe ------------------------------------
    def run_lo():
        coarse = correlate_pairs(
            C(ref1.re[:, : 1 << 20], ref1.im[:, : 1 << 20]),
            pair_idx, max_lag=20000, weighting="ht")
        sync(coarse.delay)
        probe = caf_pairs(xc, pair_idx, sample_rate=FS, max_lag=2048,
                          seg_len=1 << 13, n_doppler=64)
        sync(probe.doppler_hz)

    t_lo = timed(run_lo)
    rows.append(("LO-compensation probe (coarse align + CAF)",
                 t_lo, "added once per capture by --lo-compensation"))

    # ---- 4. streaming window update ----------------------------------
    from tdoa_tpu.ops.corr import resolve_seg

    win_raw = int(10 * FS / 3)  # 10 s window
    seg_r, fft_len = resolve_seg(win_raw, 20000, None, None)
    win_len = (win_raw // seg_r) * seg_r  # acc_update needs a multiple
    w1, w2, w3 = make_blocks(3, win_len, seed=1)
    state = acc_init(3, 3, fft_len)

    def run_stream():
        nonlocal state
        state = acc_update(state, C(w1.re, w1.im), pair_idx, seg_r, fft_len)
        out = acc_finalize(state, pair_idx, 20000, "ht")
        sync(out.delay)

    t_st = timed(run_stream)
    rows.append((f"streaming window update+finalize ({win_len/FS:.1f} s "
                 "window)", t_st, "per stream_processor window"))

    # ---- 5. audio-pattern matched filter ------------------------------
    # Per-station template match at the full TGT-block scale (~33 s of
    # the 100 s capture): the N-scaling alternative to pairwise
    # correlation when the broadcast audio is known.
    from tdoa_tpu.pipeline.audio_match import (
        match_template_audio,
        match_template_rf,
    )

    tpl = C(ref2.re[0], ref2.im[0])  # same-length template, same stats

    def run_am_audio():
        m = match_template_audio(tgt, tpl, sample_rate=FS, decim=8,
                                 max_lag=20000)
        sync(m.toa_samples)

    t_am = timed(run_am_audio)
    rows.append(("audio-match, audio domain (3 stations, 33 s TGT block)",
                 t_am, "per capture with cli.audio_match"))

    def run_am_rf():
        m = match_template_rf(tgt, tpl, sample_rate=FS, max_lag=20000,
                              lo_span_hz=200.0, n_doppler=64)
        sync(m.toa_samples)

    t_rf = timed(run_am_rf)
    rows.append(("audio-match, rf domain (±200 Hz LO search, 64 bins)",
                 t_rf, "per capture with --match-mode rf"))

    print("| path | steady s | note |")
    print("|---|---|---|")
    for name, t, note in rows:
        print(f"| {name} | {t:.3f} | {note} |")


if __name__ == "__main__":
    main()
