"""Per-stage decomposition of the large-network (8/12-station) device
cost — the round-3 verdict's 'pair axis on the MXU' investigation.

The station sweep (docs/performance.md) plateaus at ~350 G
pair-samples/s for ≥8 stations. Two candidate explanations:

1. VPU-bound cross-spectrum accumulation (the verdict's hypothesis —
   would need an MXU Gram-matrix formulation to fix), or
2. pair-tiling redundancy: at 12 stations the K=4 grouped split layout
   caps each invocation at GROUPED_PAIR_WINDOW_CAP=28 pairs, so 66
   pairs run as 3 chunks and every chunk re-runs ALL per-station FFTs
   — 3x the MXU work of a single pass.

This script measures both directly on the chip, per station count:

  g4          grouped n_splits=4, current router behavior
              (12 stations: pair-tiled x3)
  k4          4 single-bank invocations over contiguous time slices
              (each has the ~128-pair single-bank budget: no tiling,
              no redundant FFT; costs 3 extra pipeline fills)
  k1          one single-bank invocation, no split (lower bound)
  k1_1pair    one single-bank invocation with ONE pair — isolates the
              per-station FFT+PSD cost; the per-pair VPU cost is
              (k1 - k1_1pair) / (n_pairs - 1)

If (k1 - k1_1pair) is small relative to k1, the VPU cross-spectra are
NOT the bottleneck and the Gram-matrix kernel has no headroom to win —
the fix is routing (k4 vs g4). Writes one JSON line per station count.

Run on the real chip in the background; first jit is slow (tunnel
warmup). PROFILE_SECONDS scales the block (default 30, matching the
sweep's rows); PROFILE_STATIONS is a comma list (default "8,12").
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


def med_time(fn, reps=5):
    fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts


def main() -> None:
    seconds = float(os.environ.get("PROFILE_SECONDS", "30"))
    station_counts = [
        int(s) for s in os.environ.get("PROFILE_STATIONS", "8,12").split(",")
    ]
    fs = 2e6

    from tdoa_tpu.ops.corr import _split_bounds, split_k
    from tdoa_tpu.ops.pallas.corr_accum import (
        SEG_LEN,
        accumulate_cross_spectra_pallas,
        fused_max_pairs,
    )

    jax.devices()
    # Tunnel warmup on a trivial program so the first measured compile
    # is a compile, not the plugin attach.
    float(jax.jit(lambda v: v + 1.0)(jnp.zeros((8,), jnp.float32))[0])

    for n_st in station_counts:
        block_len = int(seconds * fs / 3)
        block_len = max(block_len // SEG_LEN, 1) * SEG_LEN
        n_seg = block_len // SEG_LEN
        K = split_k(n_seg)
        pairs = tuple(
            (i, j) for i in range(n_st) for j in range(i + 1, n_st)
        )
        key = jax.random.PRNGKey(n_st)
        kr, ki = jax.random.split(key)
        x = C(
            jax.random.normal(kr, (n_st, block_len), jnp.float32).astype(
                jnp.bfloat16),
            jax.random.normal(ki, (n_st, block_len), jnp.float32).astype(
                jnp.bfloat16),
        )
        jax.block_until_ready((x.re, x.im))
        float(jnp.float32(x.re[0, 0]))  # tunnel-safe sync

        bounds = _split_bounds(n_seg, K, SEG_LEN)
        cap_g = fused_max_pairs(n_st, remove_dc=True, precision="bf16",
                                n_splits=K)
        chunks_g = -(-len(pairs) // max(cap_g, 1))

        def run_g4():
            out = accumulate_cross_spectra_pallas(
                x, pairs, precision="bf16", remove_dc=True,
                prescale=False, n_splits=K,
            )
            float(out[0].re[0, 0, 0])

        def run_k4():
            outs = [
                accumulate_cross_spectra_pallas(
                    C(x.re[:, bounds[k]:bounds[k + 1]],
                      x.im[:, bounds[k]:bounds[k + 1]]),
                    pairs, precision="bf16", remove_dc=True,
                    prescale=False,
                )
                for k in range(K)
            ]
            float(outs[-1][0].re[0, 0])

        def run_k1():
            out = accumulate_cross_spectra_pallas(
                x, pairs, precision="bf16", remove_dc=True,
                prescale=False,
            )
            float(out[0].re[0, 0])

        one = (pairs[0],)

        def run_k1_1pair():
            out = accumulate_cross_spectra_pallas(
                x, one, precision="bf16", remove_dc=True, prescale=False,
            )
            float(out[0].re[0, 0])

        res = {}
        for name, fn in (("g4", run_g4), ("k4", run_k4), ("k1", run_k1),
                         ("k1_1pair", run_k1_1pair)):
            try:
                med, ts = med_time(fn)
            except Exception as e:  # tunnel hiccups: keep the rest
                res[name] = {"error": str(e)[:200]}
                print(json.dumps({"variant": name, "stations": n_st,
                                  "error": str(e)[:200]}), flush=True)
                continue
            res[name] = {"median_s": round(med, 4),
                         "runs_s": [round(t, 4) for t in ts]}
            print(json.dumps({"variant": name, "stations": n_st,
                              "median_s": res[name]["median_s"]}),
                  flush=True)
        if any("error" in v for v in res.values()):
            print(json.dumps({"stations": n_st, "partial": res}),
                  flush=True)
            continue

        per_pair_ms = ((res["k1"]["median_s"] - res["k1_1pair"]["median_s"])
                       / max(len(pairs) - 1, 1) * 1e3)
        print(json.dumps({
            "stations": n_st,
            "pairs": len(pairs),
            "block_samples": block_len,
            "n_seg": n_seg,
            "K": K,
            "grouped_pair_cap": cap_g,
            "grouped_chunks": chunks_g,
            "timings": res,
            "derived": {
                "pair_tile_redundancy_s": round(
                    res["g4"]["median_s"] - res["k4"]["median_s"], 4),
                "split_overhead_s": round(
                    res["k4"]["median_s"] - res["k1"]["median_s"], 4),
                "vpu_pair_share_s": round(
                    res["k1"]["median_s"] - res["k1_1pair"]["median_s"], 4),
                "per_pair_ms": round(per_pair_ms, 4),
                "fft_psd_floor_s": res["k1_1pair"]["median_s"],
            },
        }), flush=True)


if __name__ == "__main__":
    main()
