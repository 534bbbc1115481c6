"""Differential harness: this repo's processor vs the reference binary.

Runs identical simulated captures through BOTH processors — the rebuilt
pipeline (``tdoa_tpu.cli.processor``) and the reference's checked-in Go
ELF (``/root/reference/processor``, built from processor.go) — and
records both outputs plus the simulation ground truth to a committed
artifact (``DIFFERENTIAL.json``). The north-star criterion
(BASELINE.md) is "TDOAs within ±0.5 sample of the reference", which
presumes the reference produces usable TDOAs; this harness measures
both processors against the *planted truth* and documents exactly
where the reference cannot.

Eight scenes (four base + the round-5 positive-lag widening):

1. ``equidistant`` — the transmitter at the stations' circumcenter, so
   every true TDOA is 0. The reference's correlator reports delay 0
   for every pair here (correct!) — and its solver still refuses the
   fix: the checked-in binary rejects zero range differences ("no
   valid range difference measurements remain").
2. ``offset-geometry`` — the transmitter at KEVO (true TDOAs up to
   ~50 µs), perfect clocks. The reference's lag search is nominally
   clamped to ``[0, 1)`` for equal-length inputs (``maxLag =
   signalLen - templateLen``, processor.go:668-675, floored to 1),
   but its preprocessing cascades shorten signals asymmetrically
   (station powers differ → weak/standard filter paths with different
   moving-average windows), opening a SMALL positive-only window:
   observed, it recovers one pair dead-on when the truth happens to be
   positive and inside that accidental window, and produces garbage
   positives for the others (negative TDOAs are unrepresentable,
   processor.go:686).
3. ``clock-offsets`` — same geometry plus realistic ±10 ms collector
   start offsets; the rebuilt dual-REF clock correction removes them.
   The checked-in ELF (NEWER than processor.go — see below) does run
   a REF-based sync, but it subtracts the WHOLE raw REF delay — clock
   offset PLUS the REF transmitter's geometric TDOA (a constant
   0/3/20-sample bias on this network) — where ours removes only the
   clock term using the known REF position (processor.go:853-858 in
   the SOURCE uses raw TGT delays with no correction at all).
4. ``positive-lags`` — constructed (round 4) so every pair's TDOA is
   positive in the ELF's convention and 14-37 samples small: the one
   geometry class where its positive-only lag search measures ALL
   pairs, which it does at correlation 0.999 with delays dead-on the
   planted truth. This scene carries the per-pair delay parity score
   (``pair_comparison``): the reference's correlator is genuinely
   accurate here — and its solver still refuses the fix.

Note: the checked-in ELF is NEWER than the checked-in processor.go —
it prints range-difference validation ("FILTERING OUT: ... exceeds
expected maximum", "Validating range differences against baseline
distances", a 20400 m pass-1 limit) that appears nowhere in the
source. Behaviorally probed across five scene classes (see the
artifact's ``rejection_analysis``): pass-1 accepts everything probed,
and a SECOND, silent in-solver filter then rejects every reachable
measurement set — range differences are quantized to 149.9 m (integer
delays at 2 MS/s × c), zero is rejected as a failed-correlation
sentinel, and every probed nonzero |rd| from 149.9 m to 5.5 km is
rejected too, so the acceptance interval is empty and no physically
realizable scene produces a fix from this binary. Parity is therefore
scored on the per-pair DELAYS the ELF itself trusts (correlation ≥
0.5), where ours agree within integer quantization (±0.5 sample). The
rebuild's fix error is 0.4-1.4 m in every scene, clock offsets
included.

Usage: python scripts/diff_vs_reference.py [--block-len N] [--out PATH]
       [--reference PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tdoa_tpu.geo import enu_to_lla, lla_to_enu, network_origin
from tdoa_tpu.sim.scene import SimScene, write_scene_captures
from tdoa_tpu.solve.multilateration import station_pairs

STATION_NAMES = ("kx0u", "n3pay", "kf0mtl")
STATION_LLA = np.array(
    [
        [41.18660274289527, -95.96064116595667, 355.69],
        [41.24669616513154, -96.08366304481238, 329.0],
        [41.32916620016985, -96.03513381562004, 373.18],
    ]
)
REF_TX_LLA = np.array([41.25703803095629, -95.95512763589404, 349.07])
KEVO_LLA = np.array([41.30888549464701, -96.02619229605524, 356.0])
REF_FREQ = "162400000"
TGT_FREQ = "101900000"


def circumcenter_lla() -> np.ndarray:
    """The point equidistant from all three stations (ENU, z at mean
    station height) — where every true TDOA is exactly zero."""
    origin = network_origin(STATION_LLA)
    enu = lla_to_enu(STATION_LLA, origin)
    p = enu[:, :2]
    # Perpendicular bisector intersection: solve 2 linear equations
    # |x - p0|^2 = |x - p1|^2 = |x - p2|^2.
    a = 2.0 * np.array([p[1] - p[0], p[2] - p[0]])
    b = np.array(
        [p[1] @ p[1] - p[0] @ p[0], p[2] @ p[2] - p[0] @ p[0]]
    )
    xy = np.linalg.solve(a, b)
    cc = np.array([xy[0], xy[1], float(enu[:, 2].mean())])
    return enu_to_lla(cc, origin)


def write_csv(path: str) -> None:
    rows = ["Name,Latitude,Longitude,Elevation"]
    rows.append("KEVO,{},{},{}".format(*KEVO_LLA))
    rows.append(REF_FREQ + ",{},{},{}".format(*REF_TX_LLA))
    for name, lla in zip(STATION_NAMES, STATION_LLA):
        rows.append(f"{name},{lla[0]},{lla[1]},{lla[2]}")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def run_ours(csv: str, dats, extra=()) -> dict:
    cmd = [
        sys.executable, "-m", "tdoa_tpu.cli.processor", REF_FREQ, TGT_FREQ,
        csv, *dats, "--json", *extra,
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=1200)
    if r.returncode != 0:
        return {"error": r.stderr[-1000:], "returncode": r.returncode}
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_reference(binary: str, csv: str, dats) -> dict:
    cmd = [binary, REF_FREQ, TGT_FREQ, csv, *dats]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    out = r.stdout
    res: dict = {"returncode": r.returncode}
    tgt = re.findall(
        r"TGT (\S+) - (\S+): delay=(-?\d+) samples \(([-\d.]+) .s\), "
        r"correlation=([-\d.eE]+)", out)
    res["tgt_pairs"] = [
        {"a": a, "b": b, "delay_samples": int(d), "tdoa_us": float(us),
         "correlation": float(c)}
        for a, b, d, us, c in tgt
    ]
    ref = re.findall(
        r"REF (\S+) - (\S+): delay=(-?\d+) samples", out)
    res["ref_pairs"] = [
        {"a": a, "b": b, "delay_samples": int(d)} for a, b, d in ref
    ]
    # The ELF's own downstream trace: REF-sync'd time differences, the
    # pass-1 range-difference validation verdicts, and the in-solver
    # outcome — the evidence base for the rejection analysis.
    res["validation_trace"] = [
        l.strip() for l in out.splitlines()
        if any(k in l for k in (
            "Time differences", "Range differences", "Validating",
            "VALID", "FILTERING", "Using ", "remain", "insufficient",
            "unreliable", "triangle",
        ))
    ][-12:]
    m_lat = re.search(r"Latitude:\s+([-\d.]+)", out)
    m_lon = re.search(r"Longitude:\s+([-\d.]+)", out)
    if m_lat and m_lon:
        res["fix"] = {"lat": float(m_lat.group(1)),
                      "lon": float(m_lon.group(1))}
    else:
        res["fix"] = None
        tail = (out + "\n" + r.stderr).strip().splitlines()[-5:]
        res["failure_tail"] = tail
    return res


def truth_for_pairs(truth, pairs_names) -> list:
    """True TGT TDOAs (samples, tau_b - tau_a) for named station pairs."""
    idx = {n: k for k, n in enumerate(STATION_NAMES)}
    tau = truth.station_delays_samples[:, 1]
    return [float(tau[idx[b]] - tau[idx[a]]) for a, b in pairs_names]


def fix_error_m(fix, tgt_lla) -> float:
    if not fix:
        return float("nan")
    p = np.array([fix["lat"], fix["lon"], tgt_lla[2]])
    return float(np.linalg.norm(lla_to_enu(p, tgt_lla)[:2]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-len", type=int, default=1 << 19,
                    help="samples per block (default 2^19 ≈ 0.26 s)")
    ap.add_argument("--out", default=os.path.join(REPO, "DIFFERENTIAL.json"))
    ap.add_argument("--reference", default="/root/reference/processor")
    args = ap.parse_args()

    if not os.path.exists(args.reference):
        print(f"reference binary not found: {args.reference}", file=sys.stderr)
        sys.exit(2)

    cc = circumcenter_lla()
    scenes = {
        "equidistant": dict(tgt_tx_lla=cc, clock_offsets_s=None),
        "offset-geometry": dict(tgt_tx_lla=KEVO_LLA, clock_offsets_s=None),
        "clock-offsets": dict(
            tgt_tx_lla=KEVO_LLA,
            clock_offsets_s=np.array([4.1e-3, -7.3e-3, 9.9e-3]),
        ),
        # Constructed so every pair's TDOA is POSITIVE in the
        # reference's alphabetical (a, b) = τ_b − τ_a convention
        # (τ_kf0mtl < τ_kx0u < τ_n3pay, spreads 14-37 samples): the one
        # geometry class where the ELF's positive-only lag search can
        # measure ALL pairs — and does, at correlation 0.999 (see
        # pair_comparison). Its solver still rejects the perfect set
        # (rejection_analysis below).
        "positive-lags": dict(
            tgt_tx_lla=np.array([41.31260751, -95.90109979, 356.0]),
            clock_offsets_s=None,
        ),
        # Round-5 widening (verdict item 5): three more scenes in the
        # same all-positive construction so the parity claim rests on
        # ≥ 15 trusted reference pairs spanning near-zero through the
        # largest lags the ELF's accidental window has been seen to
        # measure (40 at corr 0.997, offset-geometry). Positions solved
        # numerically for planted lag triples (τ_kf0mtl < τ_kx0u <
        # τ_n3pay):
        #   near-zero-lags: 2.5 / 6.5 / 4.0 samples (4.8 km out)
        #   mid-lags:       8 / 24 / 16                (9.0 km)
        #   upper-lags:     12 / 33 / 21               (12.7 km)
        #   large-lags:     30 / 48 / 18               (21.0 km) — 48
        #     probes PAST the known-good 40; if the ELF's window ends
        #     sooner, its per-pair trust verdicts record exactly where.
        "near-zero-lags": dict(
            tgt_tx_lla=np.array([41.26742413, -95.97212587, 354.42]),
            clock_offsets_s=None,
        ),
        "mid-lags": dict(
            tgt_tx_lla=np.array([41.28613958, -95.92755225, 358.99]),
            clock_offsets_s=None,
        ),
        "upper-lags": dict(
            tgt_tx_lla=np.array([41.30382844, -95.88936316, 365.35]),
            clock_offsets_s=None,
        ),
        "large-lags": dict(
            tgt_tx_lla=np.array([41.36296580, -95.82079800, 387.32]),
            clock_offsets_s=None,
        ),
    }

    report = {
        "reference_binary": args.reference,
        "block_len": args.block_len,
        "note": (
            "TDOA sign convention: ours reports tau_j - tau_i per pair "
            "(i<j in file order); truth listed in the same convention. "
            "Reference errors are scored under BOTH sign conventions "
            "and the better one kept. The checked-in reference ELF is "
            "newer than the checked-in processor.go: it adds range-"
            "difference validation the source lacks, and rejected the "
            "fix in every scene (see failure_tail per scene)."
        ),
        # Round-4 rejection analysis: WHY the checked-in ELF produces
        # no fix on any scene, established behaviorally (the binary is
        # newer than the checked-in processor.go — the predicate below
        # appears nowhere in the source, so the source cannot answer).
        "rejection_analysis": {
            "observed_pipeline": [
                "raw REF + TGT pair correlations (positive-only lag "
                "window; negative-truth pairs read garbage at "
                "correlation ~0.002)",
                "REF-based collector sync: subtracts the WHOLE raw "
                "REF delay per pair — clock offset PLUS the REF "
                "transmitter's geometric TDOA (constant 0/3/20 "
                "samples here), a bias our dual-REF correction "
                "removes with the known REF position",
                "pass-1 validation: |range difference| <= 20400 m "
                "('Maximum expected delay: 56.7 us for 17 km "
                "baseline' x1.2) -- every probed scene PASSED 3 of 3",
                "in-solver validation (silent, no per-measurement "
                "output): rejected EVERY probed measurement set with "
                "'no valid range difference measurements remain'",
            ],
            "probes": {
                "equidistant": "rds (0, 0, 0) m -> rejected (zero "
                               "treated as failed-correlation "
                               "sentinel)",
                "near-circumcenter": "rds (149.9, -149.9, -2848) m, "
                                     "all three TGT correlations "
                                     "0.999 -> rejected",
                "positive-lags": "rds (3447.6, 5096.5, -899.4) m, all "
                                 "three TGT correlations 0.999, "
                                 "delays dead-on truth -> rejected",
                "KEVO": "rds (5396, 5546, 750) m -> rejected",
            },
            "conclusion": (
                "the in-solver acceptance interval is empty on the "
                "reachable measurement lattice: raw delays are "
                "integer samples at 2 MS/s, so range differences are "
                "quantized to 149.9 m multiples; 0 is rejected as a "
                "sentinel and every probed |rd| >= 149.9 m is "
                "rejected, so NO physically-realizable scene can "
                "produce a fix from this binary. Consistent with (but "
                "not proof of) a units bug comparing meters against "
                "the 56.7 us max-delay figure. 'Reference parity' on "
                "fixes is therefore unmeasurable against the ELF; "
                "parity is scored on its per-pair DELAYS instead "
                "(pair_comparison per scene), where its correlator is "
                "demonstrably accurate on positive-lag pairs."
            ),
        },
        "scenes": {},
    }

    for name, sc_kw in scenes.items():
        with tempfile.TemporaryDirectory() as d:
            sc = SimScene(
                station_names=STATION_NAMES,
                station_lla=STATION_LLA,
                ref_tx_lla=REF_TX_LLA,
                tgt_tx_lla=np.asarray(sc_kw["tgt_tx_lla"]),
                block_len=args.block_len,
                clock_offsets_s=sc_kw["clock_offsets_s"],
                seed=42,
            )
            files, truth = write_scene_captures(sc, d)
            csv = os.path.join(d, "lat-lon-table.csv")
            write_csv(csv)
            file_order = sorted(files)  # deterministic CLI order
            dats = [files[n] for n in file_order]

            extra = []
            if sc_kw["clock_offsets_s"] is not None:
                # Raw pair lags = geometry + clock DIFFERENCE; the
                # worst pair spans the full offset range, not the max
                # magnitude.
                offs = np.asarray(sc_kw["clock_offsets_s"])
                bound = int((offs.max() - offs.min()) * 2e6)
                extra = ["--max-lag", str(bound + 2048)]
            ours = run_ours(csv, dats, extra)
            ref = run_reference(args.reference, csv, dats)

            tgt_lla = np.asarray(sc_kw["tgt_tx_lla"], float)
            # Ours: samples = us * fs/1e6 = us * 2 at 2 Msps, per the
            # CLI's own named pair order.
            ours_tdoa = (
                [us * 2.0 for us in ours["tdoa_us"]]
                if "tdoa_us" in ours else None
            )
            want = (
                truth_for_pairs(truth, ours["pairs"])
                if "pairs" in ours else None
            )
            ref_pairs_names = [(p["a"], p["b"]) for p in ref["tgt_pairs"]]
            ref_want = truth_for_pairs(truth, ref_pairs_names)
            ref_delays = [p["delay_samples"] for p in ref["tgt_pairs"]]
            # The reference's lag sign convention is its own; score it
            # under BOTH conventions and keep the better (favorable to
            # the reference).
            ref_err = (
                min(
                    max(abs(d - s * w)
                        for d, w in zip(ref_delays, ref_want))
                    for s in (1.0, -1.0)
                )
                if ref_delays else None
            )
            # Per-pair RAW-delay parity table: both correlators' raw
            # TGT delays in the same (a, b) = τ_b − τ_a convention
            # (verified on the KEVO and positive-lags scenes: the
            # ELF's one/three high-confidence pairs match the signed
            # truth under it). Raw (not clock-corrected) because the
            # two processors' clock corrections differ — the ELF's
            # newer REF sync subtracts the WHOLE REF delay including
            # the REF transmitter's geometric TDOA (observed constant
            # 0/3/20-sample REF delays entering its time differences),
            # while ours removes only the clock term. Raw delays are
            # the last stage where the two measure the same quantity.
            sp_idx = station_pairs(len(STATION_NAMES))
            meas = np.asarray(truth.measured_tgt_delay, float)
            raw_truth = {}
            for (i, j), m_d in zip(np.asarray(sp_idx), meas):
                a_n, b_n = STATION_NAMES[int(i)], STATION_NAMES[int(j)]
                raw_truth[(a_n, b_n)] = float(m_d)
                raw_truth[(b_n, a_n)] = -float(m_d)
            ours_raw = {}
            if "pairs" in ours:
                for (a_n, b_n), d_s in zip(ours["pairs"],
                                           ours["raw_delay_samples"]):
                    ours_raw[(a_n, b_n)] = float(d_s)
                    ours_raw[(b_n, a_n)] = -float(d_s)
            pair_cmp = []
            for p in ref["tgt_pairs"]:
                key = (p["a"], p["b"])
                t_raw = raw_truth.get(key)
                o_raw = ours_raw.get(key)
                trusted = p["correlation"] >= 0.5
                pair_cmp.append({
                    "a": p["a"], "b": p["b"],
                    "ref_delay_samples": p["delay_samples"],
                    "ref_correlation": p["correlation"],
                    "ref_trusted": trusted,
                    "truth_raw_samples": (
                        round(t_raw, 3) if t_raw is not None else None),
                    "ours_raw_samples": (
                        round(o_raw, 3) if o_raw is not None else None),
                    "ref_err_samples": (
                        round(abs(p["delay_samples"] - t_raw), 3)
                        if t_raw is not None else None),
                    "ours_err_samples": (
                        round(abs(o_raw - t_raw), 3)
                        if o_raw is not None and t_raw is not None
                        else None),
                    "ours_minus_ref_samples": (
                        round(o_raw - p["delay_samples"], 3)
                        if o_raw is not None else None),
                })
            trusted_deltas = [
                abs(c["ours_minus_ref_samples"]) for c in pair_cmp
                if c["ref_trusted"]
                and c["ours_minus_ref_samples"] is not None
            ]
            scene_rep = {
                "truth_tdoa_samples": (
                    [round(w, 3) for w in want] if want else None),
                "truth_fix_lla": [round(float(v), 6) for v in tgt_lla],
                "pair_comparison": pair_cmp,
                "n_ref_trusted_pairs": len(trusted_deltas),
                "max_ours_minus_ref_trusted_samples": (
                    round(max(trusted_deltas), 3)
                    if trusted_deltas else None),
                "ours": {
                    "tdoa_samples": (
                        [round(t, 3) for t in ours_tdoa]
                        if ours_tdoa is not None else None
                    ),
                    "max_tdoa_error_samples": (
                        round(max(abs(o - w) for o, w in
                                  zip(ours_tdoa, want)), 3)
                        if ours_tdoa is not None else None
                    ),
                    "fix": ours.get("fix"),
                    "fix_error_m": round(
                        fix_error_m(ours.get("fix"), tgt_lla), 1),
                },
                "reference": {
                    "tdoa_samples": ref_delays,
                    "max_tdoa_error_samples": (
                        round(ref_err, 3) if ref_err is not None else None
                    ),
                    "fix": ref.get("fix"),
                    "fix_error_m": round(
                        fix_error_m(ref.get("fix"), tgt_lla), 1),
                    "failure_tail": ref.get("failure_tail"),
                    "validation_trace": ref.get("validation_trace"),
                },
            }
            report["scenes"][name] = scene_rep
            print(f"[{name}] truth TDOAs {scene_rep['truth_tdoa_samples']}")
            print(f"  ours: TDOAs {scene_rep['ours']['tdoa_samples']} "
                  f"(max err {scene_rep['ours']['max_tdoa_error_samples']} "
                  f"samples), fix err {scene_rep['ours']['fix_error_m']} m")
            print(f"  ref:  TDOAs {scene_rep['reference']['tdoa_samples']} "
                  f"(max err "
                  f"{scene_rep['reference']['max_tdoa_error_samples']} "
                  f"samples), fix err "
                  f"{scene_rep['reference']['fix_error_m']} m")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
