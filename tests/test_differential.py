"""Differential check against the reference's checked-in processor
binary (scripts/diff_vs_reference.py at reduced scale).

Skipped when the reference binary is absent (the repo is standalone);
in the build environment it proves, reproducibly, that the rebuild
recovers planted TDOAs to sub-sample accuracy on scenes where the
reference binary produces no usable fix at all (see DIFFERENTIAL.json,
the committed full-size artifact)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BINARY = os.environ.get("REF_PROCESSOR", "/root/reference/processor")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(REF_BINARY),
    reason="reference processor binary not available",
)
def test_differential_vs_reference_binary(tmp_path):
    out = str(tmp_path / "diff.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "diff_vs_reference.py"),
         "--block-len", str(1 << 17), "--out", out,
         "--reference", REF_BINARY],
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(out))
    scenes = rep["scenes"]
    assert set(scenes) == {"equidistant", "offset-geometry",
                           "clock-offsets", "positive-lags",
                           "near-zero-lags", "mid-lags", "upper-lags",
                           "large-lags"}
    # Round-5 widened parity base: ≥ 15 ELF-trusted pairs across the
    # scene set (the all-positive-lag constructions each contribute 3).
    assert sum(sc["n_ref_trusted_pairs"] for sc in scenes.values()) >= 15
    for name, sc in scenes.items():
        ours = sc["ours"]
        # The rebuild recovers every planted TDOA to sub-sample
        # accuracy and fixes within tens of meters in every scene.
        assert ours["max_tdoa_error_samples"] is not None, (name, ours)
        assert ours["max_tdoa_error_samples"] < 0.5, (name, ours)
        assert ours["fix_error_m"] < 50.0, (name, ours)
    # The reference binary's documented failure modes, reproduced:
    # where the truth includes a negative TDOA its positive-only lag
    # search cannot be sub-sample-accurate...
    ref_off = scenes["offset-geometry"]["reference"]
    assert (ref_off["max_tdoa_error_samples"] is None
            or ref_off["max_tdoa_error_samples"] > 0.5)
    # ...and in no scene did it produce a USABLE fix: its in-solver
    # validation rejects every reachable measurement set (see
    # DIFFERENTIAL.json rejection_analysis — the acceptance interval
    # is empty on the 149.9 m-quantized lattice); when garbage delays
    # pass the pass-1 gates the fix lands kilometers off.
    for name, sc in scenes.items():
        ref = sc["reference"]
        assert ref["fix"] is None or ref["fix_error_m"] > 1000.0, (
            name, ref)
    # Per-pair DELAY parity on the scene constructed so the ELF's
    # positive-only correlator measures every pair at high confidence:
    # the north-star "±0.5 sample of the reference" scored against the
    # delays the reference actually trusts (correlation ≥ 0.5).
    pos = scenes["positive-lags"]
    assert pos["n_ref_trusted_pairs"] == 3, pos["pair_comparison"]
    assert pos["max_ours_minus_ref_trusted_samples"] <= 0.5, (
        pos["pair_comparison"])
    # Every ELF-trusted pair, in any scene, must agree with ours to
    # ±0.5 sample — integer quantization (its correlator) plus our
    # sub-sample estimate.
    for name, sc in scenes.items():
        for c in sc["pair_comparison"]:
            if c["ref_trusted"] and c["ours_minus_ref_samples"] is not None:
                assert abs(c["ours_minus_ref_samples"]) <= 0.5 + 1e-9, (
                    name, c)
