"""Station-count scaling sweep through the real headline program —
writes the checked-in artifact behind docs/performance.md's scaling
table (round-3 advisor finding: the table had no committed JSON).

One process, shared tunnel warmup: for each station count, build
device-resident [REF|TGT|REF] blocks and measure the steady (median of
5, single-shot) and sustained (5 queued, one sync) latency of
``process_blocks`` — the same program bench.py times — plus the
dispatch floor and the static-FLOP-model MFU numbers.

Env:
  SWEEP_STATIONS  comma list (default "3,5,8,12")
  SWEEP_SECONDS   capture seconds (default 30 — matching the round-3
                  sweep rows; the 3-station headline row in
                  docs/performance.md comes from the 100 s bench run
                  and is footnoted as such)
  SWEEP_OUT       output path (default STATIONS_rNN.json not guessed —
                  "-" prints only)

Prints one JSON line per station count (and writes them to SWEEP_OUT).
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
    counts = [int(s) for s in
              os.environ.get("SWEEP_STATIONS", "3,5,8,12").split(",")]
    seconds = float(os.environ.get("SWEEP_SECONDS", "30"))
    out_path = os.environ.get("SWEEP_OUT", "-")
    fs = 2e6

    from tdoa_tpu.ops.corr import split_k
    from tdoa_tpu.ops.pallas.corr_accum import (
        SEG_LEN,
        fused_flop_model,
    )
    from tdoa_tpu.pipeline.processor import process_blocks

    jax.devices()
    float(jax.jit(lambda v: v + 1.0)(jnp.zeros((8,), jnp.float32))[0])

    # Dispatch floor (same probe as bench.py).
    @jax.jit
    def _noop(v):
        return v + 1.0

    tiny = jnp.zeros((8,), jnp.float32)
    float(_noop(tiny)[0])
    disp = []
    for _ in range(7):
        t0 = time.time()
        float(_noop(tiny)[0])
        disp.append(time.time() - t0)
    disp.sort()
    # Min, not median: congestion only ADDS latency, and the
    # single-shot device time below is a subtraction of two noisy
    # measurements — a tail-biased floor under-estimates device time
    # into garbage MFU (one run measured a 33.7 ms median floor
    # against a 35.8 ms 3-station program: 2 ms "device time", MFU
    # 2.3). Same one-sided rationale as bench.py round 5.
    dispatch_s = disp[0]

    lines = []
    for n_st in counts:
        block_len = int(seconds * fs / 3)
        block_len = max(block_len // SEG_LEN, 1) * SEG_LEN
        n_seg = block_len // SEG_LEN
        pairs = tuple(
            (i, j) for i in range(n_st) for j in range(i + 1, n_st)
        )
        pair_idx = jnp.asarray(np.array(pairs, np.int32))
        ref_geo = jnp.zeros(len(pairs), jnp.float32)
        key = jax.random.PRNGKey(n_st)

        def mk(k):
            kr, ki = jax.random.split(k)
            return C(
                jax.random.normal(kr, (n_st, block_len),
                                  jnp.float32).astype(jnp.bfloat16),
                jax.random.normal(ki, (n_st, block_len),
                                  jnp.float32).astype(jnp.bfloat16),
            )

        ref1, tgt, ref2 = (mk(k) for k in jax.random.split(key, 3))
        jax.block_until_ready((ref1.re, tgt.re, ref2.re))
        float(jnp.float32(ref1.re[0, 0]))

        def run_nosync():
            return process_blocks(
                ref1, tgt, ref2, pair_idx, ref_geo,
                max_lag=20000, weighting="ht",
                accumulator="pallas", pairs_static=pairs,
            )

        def run():
            out = run_nosync()
            float(out[0][0])

        run()  # compile + first run
        times = []
        for _ in range(5):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        times.sort()
        steady = times[len(times) // 2]

        sustained = []
        for _ in range(3):
            t0 = time.time()
            outs = [run_nosync() for _ in range(5)]
            float(outs[-1][0][0])
            sustained.append((time.time() - t0) / 5)
        sustained.sort()
        sustained_s = sustained[len(sustained) // 2]

        total = 3 * block_len * n_st
        # min-of-reps, same robustness rationale as bench.py round 5:
        # congestion only adds latency.
        device_s = max(times[0] - dispatch_s, 1e-9)
        K_split = max(split_k(n_seg), 1)
        fm = fused_flop_model(n_st, len(pairs), n_seg, remove_dc=True,
                              n_splits=K_split)
        # Credit the zoom-probe kernel (round-5: MFU covers every
        # on-device kernel — the 12-station "19% MFU" was partly probe
        # work the accumulation-only model refused to count).
        from tdoa_tpu.ops.pallas.zoom_probe import zoom_probe_flop_model

        zf = (zoom_probe_flop_model(K_split, len(pairs), n_st, 65536)
              if K_split > 1 else {"mxu_flops": 0, "vpu_flops": 0})
        flops = 3 * (fm["mxu_flops"] + fm["vpu_flops"]
                     + zf["mxu_flops"] + zf["vpu_flops"])
        line = {
            "stations": n_st,
            "pairs": len(pairs),
            "capture_seconds": seconds,
            "total_samples": total,
            "steady_latency_s": round(steady, 4),
            "steady_min_med_max_s": [round(t, 4) for t in
                                     (times[0], steady, times[-1])],
            "sustained_latency_s": round(sustained_s, 4),
            "dispatch_baseline_s": round(dispatch_s, 4),
            "device_latency_s": round(device_s, 4),
            "device_pair_gsamples_per_s": round(
                len(pairs) * total / device_s / 1e9, 1),
            "fft_chunks": fm["fft_chunks"],
        }
        if device_s > 0.2 * times[0]:
            line["device_tflops"] = round(flops / device_s / 1e12, 1)
            line["mfu_vs_bf16_peak"] = round(
                flops / device_s / 197e12, 3)
        else:
            # Same attribution guard as bench.py: when the floor eats
            # ≥80% of the fastest rep, the subtraction is tunnel noise
            # and a derived MFU would be garbage.
            line["mfu_skipped"] = (
                "dispatch floor too close to program latency - "
                "single-shot device time not attributable"
            )
        print(json.dumps(line), flush=True)
        lines.append(line)

    if out_path != "-":
        with open(out_path, "w") as f:
            for line in lines:
                f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
