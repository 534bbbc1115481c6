"""Within-run A/B: multi-segment accumulation steps at large station
counts (round-5, verdict item 2).

The 12-station per-slice split layout runs K=4 single-bank kernel
invocations per block; ~12 ms of its 98.5 ms device time is the
VMEM-bandwidth-bound per-pair accumulator read-modify-write (round-4
queued attribution). The round-5 kernel restructure combines each
step's per-segment contributions in registers (one RMW per accumulator
per STEP), and zero-pads the odd per-slice segment counts that blocked
segs_per_step > 1. This script measures the WHOLE headline program
(process_blocks) with TDOA_TPU_SEGS_PER_STEP=1 vs 2 vs 3 in ONE
process — the only comparison the tunnel's ±5 ms drift permits
(memory: within-run queued×5 deltas only) — plus a repeat of the
baseline to bound the drift itself.

Env: AB_NST (default 12), AB_SECONDS (default 30), AB_CONFIGS
(default "1,2,3,1r" — 1r = baseline repeat).

Prints one JSON line; writes SEGSTEP_AB.json when AB_OUT is set.
"""

from __future__ import annotations

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
    n_st = int(os.environ.get("AB_NST", "12"))
    seconds = float(os.environ.get("AB_SECONDS", "30"))
    configs = os.environ.get("AB_CONFIGS", "1,2,3,1r").split(",")
    fs = 2e6

    from tdoa_tpu.ops.pallas.corr_accum import SEG_LEN
    from tdoa_tpu.pipeline.processor import process_blocks

    jax.devices()
    float(jax.jit(lambda v: v + 1.0)(jnp.zeros((8,), jnp.float32))[0])

    block_len = max(int(seconds * fs / 3) // SEG_LEN, 1) * SEG_LEN
    pairs = tuple(
        (i, j) for i in range(n_st) for j in range(i + 1, n_st)
    )
    pair_idx = jnp.asarray(np.array(pairs, np.int32))
    ref_geo = jnp.zeros(len(pairs), jnp.float32)
    total_samples = 3 * block_len * n_st

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_block(k):
        kr, ki = jax.random.split(k)
        return C(
            jax.random.normal(kr, (n_st, block_len), jnp.float32)
            .astype(jnp.bfloat16),
            jax.random.normal(ki, (n_st, block_len), jnp.float32)
            .astype(jnp.bfloat16),
        )

    ref1, tgt, ref2 = (make_block(k) for k in jax.random.split(key, 3))
    for b in (ref1, tgt, ref2):
        float(b.re[0, 0].astype(jnp.float32))

    # Dispatch floor, for the artifact's tunnel-state context.
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

    def run_nosync():
        return process_blocks(
            ref1, tgt, ref2, pair_idx, ref_geo,
            max_lag=20000, weighting="ht",
            accumulator="pallas", pairs_static=pairs,
        )

    def run():
        out = run_nosync()
        float(out[0][0])
        return out

    def measure():
        run()  # compile + warm
        singles = []
        for _ in range(5):
            t0 = time.time()
            run()
            singles.append(time.time() - t0)
        singles.sort()
        qs = []
        for _ in range(3):
            t0 = time.time()
            outs = [run_nosync() for _ in range(5)]
            float(outs[-1][0][0])
            qs.append((time.time() - t0) / 5)
        qs.sort()
        return {
            "single_min_med_s": [round(singles[0], 4),
                                 round(singles[2], 4)],
            "queued5_med_s": round(qs[1], 4),
            "queued5_all_s": [round(q, 4) for q in qs],
        }

    results = {}
    check = None
    for cfg in configs:
        segs = cfg.rstrip("r")
        os.environ["TDOA_TPU_SEGS_PER_STEP"] = segs
        jax.clear_caches()
        results[f"segs{cfg}"] = measure()
        # Numerics guard: identical delays across configs (the zero-pad
        # + register-combine restructure must be measurement-invariant).
        out = run()
        d = np.asarray(out[0], np.float64)
        if check is None:
            check = d
            results[f"segs{cfg}"]["max_delay_delta"] = 0.0
        else:
            results[f"segs{cfg}"]["max_delay_delta"] = float(
                np.max(np.abs(d - check)))
    base = results.get("segs1", {}).get("queued5_med_s")
    payload = {
        "n_st": n_st,
        "pairs": len(pairs),
        "capture_seconds": seconds,
        "total_samples": total_samples,
        "dispatch_floor_s": round(disp[3], 4),
        "configs": results,
        "queued_delta_vs_segs1_ms": {
            k: round((v["queued5_med_s"] - base) * 1e3, 2)
            for k, v in results.items() if base
        },
        "device": str(jax.devices()[0]),
    }
    line = json.dumps(payload)
    print(line)
    out_path = os.environ.get("AB_OUT", "")
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
