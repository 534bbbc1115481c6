"""Per-stage decomposition of the headline bench's steady-state latency.

The headline program (bench.py) is, per [REF|TGT|REF] block:
``correlate_pairs_fused`` = K=4 split Pallas accumulation → summed
finish (HT weight + MXU iFFT + phase-slope refine) → leave-one-out
zoom-DFT σ probes — then the clock correction across blocks. This
script times nested sub-programs on the real chip so every millisecond
of the steady state is attributable:

  dispatch   one tiny jit call + scalar sync (the tunnel's floor)
  accum_k1   3 blocks × ONE full-block kernel invocation (no split)
  accum_k4   3 blocks × 4 slice invocations (the real split layout)
  finish_k1  accum_k1 + the finish stage (weight/iFFT/refine/quality)
  full       the real process_blocks program (bench.py's run())
  queued5    5 full calls queued, one sync — amortizes per-call tunnel
             overhead; /5 ≈ true device time per call

Stage attribution (medians):
  legacy split overhead = accum_k4 − accum_k1   (what round 2 paid)
  grouped split overhead= accum_grouped − accum_k1   (what ships now)
  finish cost           = finish_k1 − accum_k1
  split-σ finalize cost = full − finish_k1 − (accum_grouped − accum_k1)
  tunnel per call       ≈ full − queued5/5

Writes one JSON line; run on the real chip (background, first jit is
slow). BENCH_SECONDS scales the capture (default 100 — the driver's).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tdoa_tpu.ops.cplx import C


def main() -> None:
    seconds = float(os.environ.get("BENCH_SECONDS", "100"))
    max_lag = int(os.environ.get("BENCH_MAX_LAG", "20000"))
    reps = int(os.environ.get("PROFILE_REPS", "5"))
    fs = 2e6
    # PROFILE_NST > 3 decomposes the large-network cost (the 12-station
    # ~90 ms round-4 target): same stages, all-C(n,2) pairs.
    n_st = int(os.environ.get("PROFILE_NST", "3"))

    from tdoa_tpu.ops.corr import (
        _finish_correlation,
        _split_bounds,
        split_k,
    )
    from tdoa_tpu.ops.pallas.corr_accum import (
        FFT_LEN,
        SEG_LEN,
        accumulate_cross_spectra_pallas,
    )

    block_len = max(int(seconds * fs / 3) // SEG_LEN, 1) * SEG_LEN
    total_samples = 3 * block_len * n_st
    pairs = tuple(
        (i, j) for i in range(n_st) for j in range(i + 1, n_st)
    )
    pair_arr = jnp.asarray(np.array(pairs, np.int32))

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_block(k):
        kr, ki = jax.random.split(k)
        return C(
            jax.random.normal(kr, (n_st, block_len), jnp.float32).astype(
                jnp.bfloat16),
            jax.random.normal(ki, (n_st, block_len), jnp.float32).astype(
                jnp.bfloat16),
        )

    blocks = [make_block(k) for k in jax.random.split(key, 3)]
    for b in blocks:
        float(b.re[0, 0].astype(jnp.float32))  # tunnel-safe sync

    def consume(*arrays):
        """Tiny scalar forcing every array's computation (anti-DCE)."""
        s = jnp.float32(0)
        for a in arrays:
            s = s + jnp.sum(a.astype(jnp.float32) * 1e-9)
        return s

    # --- sub-programs --------------------------------------------------
    @jax.jit
    def dispatch_probe(x):
        return x + 1.0

    @jax.jit
    def accum_k1(b0, b1, b2):
        outs = []
        for blk in (b0, b1, b2):
            cross, psd, energy = accumulate_cross_spectra_pallas(
                blk, pairs, precision="bf16", remove_dc=True, prescale=True,
            )
            outs.append(consume(cross.re, cross.im, psd, energy))
        return outs[0] + outs[1] + outs[2]

    n_seg_total = block_len // SEG_LEN
    K = split_k(n_seg_total)
    bounds = _split_bounds(n_seg_total, K, SEG_LEN)

    @jax.jit
    def accum_k4(b0, b1, b2):
        """Legacy split layout: K separate kernel invocations/block."""
        s = jnp.float32(0)
        for blk in (b0, b1, b2):
            for k in range(K):
                cross, psd, energy = accumulate_cross_spectra_pallas(
                    C(blk.re[:, bounds[k]:bounds[k + 1]],
                      blk.im[:, bounds[k]:bounds[k + 1]]),
                    pairs, precision="bf16", remove_dc=True, prescale=False,
                )
                s = s + consume(cross.re, cross.im, psd, energy)
        return s

    @jax.jit
    def accum_grouped(b0, b1, b2):
        """Shipped split layout: ONE invocation/block with K grouped
        accumulator banks (n_splits=K)."""
        s = jnp.float32(0)
        for blk in (b0, b1, b2):
            cross, psd, energy = accumulate_cross_spectra_pallas(
                blk, pairs, precision="bf16", remove_dc=True,
                prescale=False, n_splits=K,
            )
            s = s + consume(cross.re, cross.im, psd, energy)
        return s

    @jax.jit
    def finish_k1(b0, b1, b2):
        s = jnp.float32(0)
        for blk in (b0, b1, b2):
            cross, psd, energy = accumulate_cross_spectra_pallas(
                blk, pairs, precision="bf16", remove_dc=True, prescale=True,
            )
            res = _finish_correlation(
                cross, psd, energy, pair_arr, max_lag, "ht", 1e-3,
                FFT_LEN, "phase", n_seg=n_seg_total,
            )
            s = s + consume(res.delay, res.delay_std, res.quality,
                            res.peak_value, res.corr)
        return s

    @jax.jit
    def finish_k4(b0, b1, b2):
        """The REAL large-network layout: K single-bank accumulations
        per block summed into the full-capture finish (what
        correlate_pairs_fused runs when the pair list exceeds the
        grouped window cap), WITHOUT the split-σ probes. full −
        finish_k4 isolates the LOO-weight + zoom-DFT finalize."""
        s = jnp.float32(0)
        for blk in (b0, b1, b2):
            accs = [
                accumulate_cross_spectra_pallas(
                    C(blk.re[:, bounds[k]:bounds[k + 1]],
                      blk.im[:, bounds[k]:bounds[k + 1]]),
                    pairs, precision="bf16", remove_dc=True, prescale=False,
                )
                for k in range(K)
            ]
            cross = C(sum(a[0].re for a in accs), sum(a[0].im for a in accs))
            psd = sum(a[1] for a in accs)
            energy = sum(a[2] for a in accs)
            res = _finish_correlation(
                cross, psd, energy, pair_arr, max_lag, "ht", 1e-3,
                FFT_LEN, "phase", n_seg=n_seg_total,
            )
            s = s + consume(res.delay, res.delay_std, res.quality,
                            res.peak_value, res.corr)
        return s

    @jax.jit
    def accum_k4r(b0, b1, b2):
        """The raw+batched-finalize CANDIDATE layout: K raw single-bank
        invocations + ONE batched finalize (_finalize_banks) per block.
        Measured 6.3 ms SLOWER than the per-slice finalize that ships
        (accum_k4r − accum_k4 = the regression; BENCHLOG round 4) —
        kept as the A/B variant that guards against re-introducing
        it."""
        from tdoa_tpu.ops.pallas.corr_accum import _finalize_banks

        s = jnp.float32(0)
        seg_g = np.asarray(
            [(bounds[k + 1] - bounds[k]) // SEG_LEN for k in range(K)],
            np.float32,
        )
        for blk in (b0, b1, b2):
            raws = [
                accumulate_cross_spectra_pallas(
                    C(blk.re[:, bounds[k]:bounds[k + 1]],
                      blk.im[:, bounds[k]:bounds[k + 1]]),
                    pairs, precision="bf16", remove_dc=True,
                    prescale=False, finalize=False,
                )
                for k in range(K)
            ]
            stacked = [jnp.stack([r[i] for r in raws])
                       for i in range(len(raws[0]))]
            cross_g, psd_g, energy_g = _finalize_banks(
                stacked[0], stacked[1], stacked[2], stacked[3],
                stacked[4], np.asarray(pairs, np.int32), seg_g,
                True, False,
            )
            s = s + consume(cross_g.re, cross_g.im, psd_g, energy_g)
        return s

    from tdoa_tpu.pipeline.processor import process_blocks

    ref_geo = jnp.zeros(len(pairs), jnp.float32)

    def full_once():
        out = process_blocks(
            *blocks, pair_arr, ref_geo,
            max_lag=max_lag, seg_len=1 << 16, weighting="ht",
            accumulator="pallas", pairs_static=pairs,
        )
        return out

    def timeit(run, sync, n=reps):
        run_out = run()
        sync(run_out)  # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.time()
            sync(run())
            ts.append(time.time() - t0)
        ts.sort()
        # Queued ×5: launch 5 dispatches, sync once — per-call device
        # time with the tunnel round-trip amortized. Median of 3
        # batches. Single-shot medians are tunnel-noise-limited (a
        # congested run measured the trivial-jit "floor" at 164 ms
        # while the full program held a tight 130 ms), so the queued
        # number is the one the attribution uses.
        qs = []
        for _ in range(3):
            t0 = time.time()
            outs = [run() for _ in range(5)]
            sync(outs[-1])
            qs.append((time.time() - t0) / 5)
        qs.sort()
        return {"min": round(ts[0], 4), "med": round(ts[len(ts) // 2], 4),
                "max": round(ts[-1], 4), "queued": round(qs[1], 4)}

    sync_scalar = lambda o: float(o)
    tiny = jnp.zeros((8,), jnp.float32)

    t_dispatch = timeit(lambda: dispatch_probe(tiny),
                        lambda o: float(o[0]), n=max(reps, 9))
    t_accum1 = timeit(lambda: accum_k1(*blocks), sync_scalar)
    t_accum4 = timeit(lambda: accum_k4(*blocks), sync_scalar)
    t_grouped = timeit(lambda: accum_grouped(*blocks), sync_scalar)
    t_finish1 = timeit(lambda: finish_k1(*blocks), sync_scalar)
    t_finish4 = timeit(lambda: finish_k4(*blocks), sync_scalar)
    t_accum4r = timeit(lambda: accum_k4r(*blocks), sync_scalar)
    t_full = timeit(lambda: full_once(), lambda o: float(o[0][0]))

    # A/B the split-σ probe kernel against the XLA probe path WITHIN
    # this run (cross-run tunnel drift is ±5 ms — bigger than the
    # effect). Trace-time flag + cache clear; measured LAST so the
    # clear doesn't invalidate the other variants' executables.
    import tdoa_tpu.ops.corr as corr_mod

    corr_mod._FORCE_PROBE_XLA = True
    jax.clear_caches()
    t_full_xla = timeit(lambda: full_once(), lambda o: float(o[0][0]))
    corr_mod._FORCE_PROBE_XLA = False

    med = lambda d: d["med"]
    q = lambda d: d["queued"]
    print(json.dumps({
        "stations": n_st,
        "pairs": len(pairs),
        "total_samples": total_samples,
        "reps": reps,
        "device": str(jax.devices()[0]),
        "dispatch_s": t_dispatch,
        "accum_k1_s": t_accum1,
        "accum_k4_s": t_accum4,
        "accum_grouped_s": t_grouped,
        "finish_k1_s": t_finish1,
        "finish_k4_s": t_finish4,
        "accum_k4r_s": t_accum4r,
        "full_s": t_full,
        "full_xla_probe_s": t_full_xla,
        "queued5_per_call_s": q(t_full),
        "attribution": {
            "tunnel_floor_s": med(t_dispatch),
            "kernel_accum_s": round(med(t_accum1) - med(t_dispatch), 4),
            "split_accum_overhead_s": round(
                med(t_accum4) - med(t_accum1), 4),
            "grouped_split_overhead_s": round(
                med(t_grouped) - med(t_accum1), 4),
            "finish_stage_s": round(med(t_finish1) - med(t_accum1), 4),
            # The shipped program pays the GROUPED split layout, so the
            # finalize share subtracts that (not the legacy K-invocation
            # overhead, which only accum_k4_s keeps on record).
            "split_sigma_finalize_s": round(
                med(t_full) - med(t_finish1)
                - (med(t_grouped) - med(t_accum1)), 4),
            "per_call_amortized_s": q(t_full),
        },
        # Queued (tunnel-amortized) attribution — the authoritative
        # decomposition when the tunnel is noisy. Stage deltas between
        # nested programs, each measured queued ×5.
        "attribution_queued": {
            "dispatch_s": q(t_dispatch),
            "accum_k1_s": round(q(t_accum1) - q(t_dispatch), 4),
            "accum_k4_s": round(q(t_accum4) - q(t_dispatch), 4),
            "accum_grouped_s": round(q(t_grouped) - q(t_dispatch), 4),
            "finish_over_k1_s": round(q(t_finish1) - q(t_accum1), 4),
            "finish_over_k4_s": round(q(t_finish4) - q(t_accum4), 4),
            "split_sigma_over_finish_k4_s": round(
                q(t_full) - q(t_finish4), 4),
            "raw_batched_finalize_saves_s": round(
                q(t_accum4) - q(t_accum4r), 4),
            "probe_kernel_saves_s": round(
                q(t_full_xla) - q(t_full), 4),
        },
        "headline_equiv_gsps": {
            "full": round(total_samples / med(t_full) / 1e9, 2),
            "no_split_sigma": round(
                total_samples / med(t_finish1) / 1e9, 2),
            "queued5": round(total_samples / q(t_full) / 1e9, 2),
        },
    }))


if __name__ == "__main__":
    main()
