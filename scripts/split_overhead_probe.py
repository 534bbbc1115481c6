"""What IS the K-split accumulation overhead at 12 stations?

attribution_queued (scripts/headline_profile.py, 30 s, 12 st) puts the
K=4 per-slice layout at +20.7 ms over one full-block invocation
(66.5 vs 45.8 ms device). Candidates:

  a. per-invocation finalize (un-permute transpose + DC algebra on
     [66, 65536]) — same total bytes, but 12 small XLA regions instead
     of 3, losing fusion;
  b. Pallas pipeline fill/drain + launch serialization per invocation;
  c. the DC spectral-sum accumulators' extra VPU work (scales with
     invocation count only via fills).

Probes (each queued ×5, median of 3 batches, minus the queued
dispatch floor):

  k1_dc / k1_nodc      1 invocation/block, remove_dc on/off
  k4_dc / k4_nodc      4 invocations/block, remove_dc on/off
  k4_dc_1pair          4 invocations/block, ONE pair (fills without
                       the 66-pair finalize/writeback)

(k4_dc − k4_nodc) − (k1_dc − k1_nodc) ≈ the finalize-DC share of the
overhead; k4_dc_1pair − k1-equivalent isolates fills.
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
    seconds = float(os.environ.get("BENCH_SECONDS", "30"))
    n_st = int(os.environ.get("PROFILE_NST", "12"))
    fs = 2e6

    from tdoa_tpu.ops.corr import _split_bounds, split_k
    from tdoa_tpu.ops.pallas.corr_accum import (
        SEG_LEN,
        accumulate_cross_spectra_pallas,
    )

    block_len = max(int(seconds * fs / 3) // SEG_LEN, 1) * SEG_LEN
    pairs = tuple((i, j) for i in range(n_st) for j in range(i + 1, n_st))
    n_seg_total = block_len // SEG_LEN
    K = split_k(n_seg_total)
    bounds = _split_bounds(n_seg_total, K, SEG_LEN)

    jax.devices()
    float(jax.jit(lambda v: v + 1.0)(jnp.zeros((8,), jnp.float32))[0])

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
        float(b.re[0, 0].astype(jnp.float32))

    def consume(*arrays):
        s = jnp.float32(0)
        for a in arrays:
            s = s + jnp.sum(a.astype(jnp.float32) * 1e-9)
        return s

    def make_k(n_inv, remove_dc, use_pairs):
        if n_inv == 1:
            bds = [0, n_seg_total * SEG_LEN]
        else:
            bds = bounds

        @jax.jit
        def run(b0, b1, b2):
            s = jnp.float32(0)
            for blk in (b0, b1, b2):
                for k in range(len(bds) - 1):
                    cross, psd, energy = accumulate_cross_spectra_pallas(
                        C(blk.re[:, bds[k]:bds[k + 1]],
                          blk.im[:, bds[k]:bds[k + 1]]),
                        use_pairs, precision="bf16",
                        remove_dc=remove_dc, prescale=False,
                    )
                    s = s + consume(cross.re, cross.im, psd, energy)
            return s

        return run

    @jax.jit
    def dispatch_probe(x):
        return x + 1.0

    tiny = jnp.zeros((8,), jnp.float32)
    one = (pairs[0],)

    variants = {
        "dispatch": (lambda: dispatch_probe(tiny), lambda o: float(o[0])),
    }
    for name, (n_inv, dc, ps) in {
        "k1_dc": (1, True, pairs),
        "k1_nodc": (1, False, pairs),
        "k4_dc": (K, True, pairs),
        "k4_nodc": (K, False, pairs),
        "k4_dc_1pair": (K, True, one),
        "k1_dc_1pair": (1, True, one),
    }.items():
        fn = make_k(n_inv, dc, ps)
        variants[name] = (lambda fn=fn: fn(*blocks), lambda o: float(o))

    out = {}
    for name, (run, sync) in variants.items():
        sync(run())  # compile + warm
        qs = []
        for _ in range(3):
            t0 = time.time()
            outs = [run() for _ in range(5)]
            sync(outs[-1])
            qs.append((time.time() - t0) / 5)
        qs.sort()
        out[name] = round(qs[1], 4)
        print(json.dumps({name: out[name]}), flush=True)

    d = out["dispatch"]
    print(json.dumps({
        "stations": n_st,
        "block_seconds": seconds,
        "device_ms": {k: round((v - d) * 1e3, 1) for k, v in out.items()
                      if k != "dispatch"},
        "derived_ms": {
            "split_overhead_dc": round(
                (out["k4_dc"] - out["k1_dc"]) * 1e3, 1),
            "split_overhead_nodc": round(
                (out["k4_nodc"] - out["k1_nodc"]) * 1e3, 1),
            "split_overhead_1pair": round(
                (out["k4_dc_1pair"] - out["k1_dc_1pair"]) * 1e3, 1),
            "dc_finalize_share": round(
                ((out["k4_dc"] - out["k4_nodc"])
                 - (out["k1_dc"] - out["k1_nodc"])) * 1e3, 1),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
