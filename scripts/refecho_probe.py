"""Invisible-echo detector probe: dual-REF lobe-shape consistency
(round-5 verdict item 3, committed either way).

The residual multipath fix-coverage tail is the INVISIBLE-echo class:
scenes whose TGT lobe statistics (centroid offset, drift, secondary
fraction) all sit inside clean-scene ranges, so no detector fires and
no σ model can inflate for them. Untried lever: the dual-REF capture
structure. Both REF blocks traverse the same physical channel ~1/3
capture apart, so a static station-local reflector shapes BOTH REF
lobes the same way, while noise jitter is independent between them —
`dsp.multipath.ref_lobe_echo_consistency` keeps only the
consistent-sign part of the two signed centroid offsets.

Three randomized populations (same network/target generator as the
Monte Carlo soak):

  clean      no echo on either channel → false-positive measurement
  invisible  echo on BOTH channels, drawn from the weak end
             (amplitude 0.12-0.3, delay 4-25 samples), POST-FILTERED
             to scenes where the TGT detectors stay quiet (offset <
             1.0, drift < 1.0) — the class the detector must catch
  visible    the standard multipath-regime echo (0.3-0.6, 15-60),
             sanity lane

Verdict: with θ = max(clean statistic) + margin, report the detection
rate on the invisible population at zero clean false positives.

Usage: python scripts/refecho_probe.py [--trials 30] [--seed 81000]
       [--out REFECHO_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np

from monte_carlo import REF_TX, random_network, random_target  # noqa: E402


def run_probe_trial(seed: int, population: str) -> dict:
    import jax.numpy as jnp

    from tdoa_tpu.dsp.multipath import (
        lobe_centroid_drift,
        lobe_centroid_offset,
        ref_lobe_echo_consistency,
    )
    from tdoa_tpu.ops.cplx import C
    from tdoa_tpu.pipeline.processor import process_blocks
    from tdoa_tpu.sim import NoiseProfile, SimScene, simulate_scene
    from tdoa_tpu.solve.multilateration import station_pairs

    rng = np.random.default_rng(seed)
    n_st = 3
    lla = random_network(rng, n_st)
    tgt = random_target(rng, lla)
    names = tuple(f"st{k}" for k in range(n_st))

    kw: dict = {"clock_offsets_s": rng.uniform(-50e-6, 50e-6, n_st)}
    if population == "clean":
        kw["tgt_profile"] = NoiseProfile(
            signal_amplitude=1.0, noise_amplitude=0.05)
    else:
        if population == "invisible":
            amp = rng.uniform(0.12, 0.30)
            dly = rng.uniform(4.0, 25.0)
        else:  # visible
            amp = rng.uniform(0.30, 0.60)
            dly = rng.uniform(15.0, 60.0)
        kw["tgt_profile"] = NoiseProfile(
            signal_amplitude=1.0, noise_amplitude=0.05,
            multipath_amplitude=amp, multipath_delay_samples=dly,
        )
        # Station-local reflectors: the REF channel traverses them too
        # (the probe's physical premise — recorded in the artifact).
        kw["ref_profile"] = NoiseProfile(
            signal_amplitude=1.0, noise_amplitude=0.02,
            multipath_amplitude=amp, multipath_delay_samples=dly,
        )

    sc = SimScene(
        station_names=names, station_lla=lla, ref_tx_lla=REF_TX,
        tgt_tx_lla=tgt, block_len=1 << 17, seed=seed, **kw,
    )
    caps, _ = simulate_scene(sc)
    blocks = [caps[n] for n in names]

    def planar(b):
        x = jnp.stack(b)
        return C(jnp.real(x).astype(jnp.float32),
                 jnp.imag(x).astype(jnp.float32))

    r1 = planar([b[0] for b in blocks])
    tb = planar([b[1] for b in blocks])
    r2 = planar([b[2] for b in blocks])
    pairs = station_pairs(n_st)
    out = process_blocks(
        r1, tb, r2, jnp.asarray(pairs),
        jnp.zeros(len(pairs), jnp.float32), max_lag=768, weighting="ht",
    )
    win_c = np.asarray(out[9], np.float64)  # [2, 3, m, W] re/im
    cx = win_c[0] + 1j * win_c[1]
    w_tgt = np.abs(cx[1])
    off = lobe_centroid_offset(w_tgt)
    drift = lobe_centroid_drift(w_tgt)
    s_ref = ref_lobe_echo_consistency(np.abs(cx[0]), np.abs(cx[2]))
    return {
        "seed": seed,
        "population": population,
        "echo_amp": kw.get("ref_profile").multipath_amplitude
        if "ref_profile" in kw else 0.0,
        "echo_delay": kw.get("ref_profile").multipath_delay_samples
        if "ref_profile" in kw else 0.0,
        "tgt_offset_max": float(off.max()) if off.size else 0.0,
        "tgt_drift_max": float(drift.max()) if drift.size else 0.0,
        "ref_consistency_max": float(s_ref.max()) if s_ref.size else 0.0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=30)
    ap.add_argument("--clean-trials", type=int, default=None,
                    help="clean-population size (default --trials); a "
                         "larger clean base pins the false-positive "
                         "rate before wiring the detector")
    ap.add_argument("--seed", type=int, default=81000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = []
    for pop in ("clean", "invisible", "visible"):
        n_pop = (args.clean_trials if pop == "clean"
                 and args.clean_trials else args.trials)
        for t in range(n_pop):
            seed = (args.seed + 100 * t + zlib.crc32(pop.encode()) % 97)
            r = run_probe_trial(seed, pop)
            rows.append(r)
            print(f"  {pop} seed {seed}: tgt_off {r['tgt_offset_max']:.2f} "
                  f"tgt_drift {r['tgt_drift_max']:.2f} "
                  f"ref_cons {r['ref_consistency_max']:.2f}", flush=True)

    clean = [r for r in rows if r["population"] == "clean"]
    vis = [r for r in rows if r["population"] == "visible"]
    # The invisible CLASS: echo planted but TGT detectors quiet.
    inv_all = [r for r in rows if r["population"] == "invisible"]
    inv = [r for r in inv_all
           if r["tgt_offset_max"] < 1.0 and r["tgt_drift_max"] < 1.0]

    clean_max = max(r["ref_consistency_max"] for r in clean)
    theta = max(2.0 * clean_max, clean_max + 0.1)
    det = [r for r in inv if r["ref_consistency_max"] > theta]
    det_vis = [r for r in vis if r["ref_consistency_max"] > theta]
    verdict = {
        "threshold": round(theta, 3),
        "clean_false_positives": sum(
            1 for r in clean if r["ref_consistency_max"] > theta),
        "clean_max_statistic": round(clean_max, 3),
        "n_invisible_class": len(inv),
        "n_invisible_detected": len(det),
        "invisible_detection_rate": (
            round(len(det) / len(inv), 3) if inv else None),
        "n_visible_detected": len(det_vis),
        "visible_detection_rate": (
            round(len(det_vis) / len(vis), 3) if vis else None),
        "premise": (
            "REF channel traverses the same station-local reflectors "
            "as TGT (sim plants the same echo profile on both); an "
            "emitter-side-only reflector would NOT mark the REF lobes "
            "and stays invisible to this detector"
        ),
    }
    out = {"seed_base": args.seed, "trials_per_pop": args.trials,
           "verdict": verdict, "rows": rows}
    print(json.dumps(verdict, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
