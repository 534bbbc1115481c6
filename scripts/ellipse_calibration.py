"""Error-ellipse calibration study: is the reported 1σ honest?

Every fix carries a covariance propagated from the per-pair
phase-slope σ (solve/multilateration.py). This script measures whether
that covariance is *statistically calibrated*: over randomized Monte
Carlo scenes (scripts/monte_carlo.py's trial machinery), the
normalized position error maha = sqrt(eᵀ C⁻¹ e) should follow a
chi(2-dof) distribution — 39.3% of trials within 1σ, 86.5% within 2σ,
98.9% within 3σ. Over-coverage means the ellipse is conservative
(honest but loose); under-coverage means false confidence — the one
failure mode this framework forbids.

Regimes with a modeled error budget (clean, noisy, wild-clocks) are
gated: the script exits nonzero if their pooled 3σ coverage drops
below 90%. The multipath regime is reported but not gated — specular
echoes inside the correlation peak BIAS the TDOA (estimator physics,
BENCHLOG), and a bias is precisely what a noise covariance cannot
cover; the processor flags those scenes through the consistency gate
instead.

Usage: python scripts/ellipse_calibration.py [--trials N] [--seed S]
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np

import monte_carlo as mc  # noqa: E402  (same directory)

CHI2_COVERAGE = {1.0: 0.393, 2.0: 0.865, 3.0: 0.989}
GATED = ("clean", "noisy", "wild-clocks")
REPORTED = GATED + ("multipath",)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=25,
                    help="trials per regime")
    ap.add_argument("--seed", type=int, default=5000)
    args = ap.parse_args()

    pooled: dict = {}
    n_ghost = 0
    for regime in REPORTED:
        ms = []
        for t in range(args.trials):
            r = mc.run_trial(
                regime,
                args.seed + 100 * t + zlib.crc32(regime.encode()) % 97,
            )
            if r["ambiguous"]:
                # Ghost-flagged: bimodal error, covered by the warning
                # (and the candidate list), not by the ellipse.
                n_ghost += 1
                continue
            if r["maha"] is not None:
                ms.append(r["maha"])
        ms = np.asarray(ms)
        pooled[regime] = ms
        cov = {k: float((ms <= k).mean()) for k in CHI2_COVERAGE}
        print(
            f"{regime:12s} n={len(ms):3d}  "
            + "  ".join(
                f"{k:.0f}σ {cov[k]*100:5.1f}% (chi2 {v*100:.1f}%)"
                for k, v in CHI2_COVERAGE.items()
            )
            + f"  maha p50/p95 {np.percentile(ms, 50):.2f}/"
            f"{np.percentile(ms, 95):.2f}",
            flush=True,
        )

    gated = np.concatenate([pooled[r] for r in GATED])
    c3 = float((gated <= 3.0).mean())
    print(f"\npooled modeled-noise regimes ({', '.join(GATED)}): "
          f"n={len(gated)}, 3σ coverage {c3*100:.1f}% "
          f"(gate: >= 90%); {n_ghost} ghost-flagged trials excluded")
    sys.exit(0 if c3 >= 0.90 else 1)


if __name__ == "__main__":
    main()
