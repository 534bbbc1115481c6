"""Quality/validation/calibration tests (reader.go / analyzer.go /
gain_calibrator.go capabilities)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tdoa_tpu.calib import (
    CalibrationConfig,
    SimCaptureBackend,
    calibrate,
    calibrate_frequency,
)
from tdoa_tpu.io.datfile import iq_to_bytes, save_dat
from tdoa_tpu.quality import (
    analyze_block_bytes,
    analyze_capture,
    assess_tdoa_suitability,
    generate_recommendations,
    validate_dat_structure,
)
from tdoa_tpu.quality.analyzer import SignalAnalysis, fast_csv_line


def _tone_bytes(n=1 << 14, amp=0.5, noise=0.001, dc=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.exp(2j * np.pi * 0.11 * t) + noise * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    )
    x = x + dc
    return np.asarray(iq_to_bytes(jnp.asarray(x.astype(np.complex64))))


def test_good_signal_stats():
    s = analyze_block_bytes(_tone_bytes())
    assert s.snr_db > 30
    assert not s.is_clipping and not s.is_dead and not s.is_overloaded
    assert abs(s.dc_offset_i) < 1 and abs(s.dc_offset_q) < 1
    assert abs(s.iq_imbalance_db) < 0.5
    assert s.power == pytest.approx(0.25, rel=0.1)  # amp² = 0.25


def test_clipping_detected():
    s = analyze_block_bytes(_tone_bytes(amp=1.4))
    assert s.is_clipping
    assert s.min_byte == 0 and s.max_byte == 255


def test_dead_receiver_detected():
    raw = np.full(4096, 127, np.uint8)
    raw[1::2] = 128
    s = analyze_block_bytes(raw)
    assert s.is_dead
    assert s.power < 1e-3


def test_dc_offset_detected():
    s = analyze_block_bytes(_tone_bytes(amp=0.3, dc=0.1 + 0.1j))
    assert s.dc_offset_i > 5  # 0.1 * 127.5 = 12.75 bytes


def test_weak_signal_flagged_noisy():
    s = analyze_block_bytes(_tone_bytes(amp=0.002, noise=0.02))
    assert s.snr_db < 15


def test_suitability_and_recommendations():
    good = SignalAnalysis(
        ref=analyze_block_bytes(_tone_bytes(seed=1)),
        tgt=analyze_block_bytes(_tone_bytes(seed=2)),
    )
    ok, problems = assess_tdoa_suitability(good)
    assert ok and not problems

    bad = SignalAnalysis(
        ref=analyze_block_bytes(_tone_bytes(amp=1.5, seed=3)),  # clipping
        tgt=analyze_block_bytes(_tone_bytes(amp=0.002, noise=0.05, seed=4)),
    )
    ok, problems = assess_tdoa_suitability(bad)
    assert not ok
    recs = generate_recommendations(bad)
    assert any("Reduce gain" in r for r in recs)
    assert any("Increase gain" in r for r in recs)


def test_fast_csv_contract():
    a = SignalAnalysis(
        ref=analyze_block_bytes(_tone_bytes(seed=5)),
        tgt=analyze_block_bytes(_tone_bytes(seed=6)),
    )
    lines = fast_csv_line(a).splitlines()
    assert lines[0].startswith("REF,") and lines[1].startswith("TGT,")
    assert len(lines[0].split(",")) == 5  # name,snr,power,clip,ovl


def test_analyze_capture_file(tmp_path):
    n = 1 << 12
    t = np.arange(n)
    blk = lambda a: jnp.asarray(
        (a * np.exp(2j * np.pi * 0.07 * t)).astype(np.complex64)
    )
    path = str(tmp_path / "kx0u-1.dat")
    save_dat(path, blk(0.5), blk(0.3), blk(0.5))
    a = analyze_capture(path, nfft=1024)
    assert a.ref.power > a.tgt.power
    assert a.ref.snr_db > 20


def test_validate_dat_structure(tmp_path):
    n = 1 << 12
    rng = np.random.default_rng(0)
    mk = lambda a: jnp.asarray(
        (
            a * np.exp(2j * np.pi * 0.07 * np.arange(n))
            + 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        ).astype(np.complex64)
    )
    path = str(tmp_path / "n3pay-9.dat")
    save_dat(path, mk(0.4), mk(0.2), mk(0.4))
    rep = validate_dat_structure(path, expected_duration_s=3 * n / 2e6)
    assert rep.ok, rep.problems
    assert rep.three_block_pattern_ok
    assert rep.samples_per_block == n
    assert rep.ref_power_consistent

    # Corrupt: second REF block much weaker → retune-glitch heuristic.
    path2 = str(tmp_path / "n3pay-10.dat")
    save_dat(path2, mk(0.8), mk(0.2), mk(0.05))
    rep2 = validate_dat_structure(path2)
    assert not rep2.ref_power_consistent
    assert any("power-inconsistent" in p for p in rep2.problems)


def test_truncated_file_flagged(tmp_path):
    path = str(tmp_path / "kf0mtl-3.dat")
    with open(path, "wb") as f:
        f.write(bytes(1000))  # not divisible into 3 even-sample blocks
    rep = validate_dat_structure(path)
    assert not rep.three_block_pattern_ok


def test_gain_calibration_converges():
    backend = SimCaptureBackend()
    res = calibrate_frequency(backend, 162_400_000.0)
    assert res.converged, res.history
    assert 18.0 <= res.snr_db <= 40.0
    assert res.iterations <= 8
    assert 5.0 <= res.gain_db <= 45.0


def test_gain_calibration_avoids_overload():
    # Hot signal: high gains clip; search must settle below overload.
    backend = SimCaptureBackend(signal_dbfs_at_40=0.0, overload_gain_db=30.0)
    res = calibrate_frequency(backend, 101_900_000.0)
    assert res.gain_db < 30.0


def test_calibrate_both_frequencies():
    backend = SimCaptureBackend()
    ref, tgt = calibrate(backend, 162_400_000.0, 101_900_000.0)
    assert ref.freq_hz != tgt.freq_hz
    assert ref.converged and tgt.converged


def test_compare_signals_narrative(tmp_path):
    """REF-vs-TGT comparison section (analyzer.go:398-448): balance
    advice, issue counts, and the joint verdict."""
    from tdoa_tpu.quality import analyze_capture, compare_signals

    rng = np.random.default_rng(3)
    n = 1 << 16
    t = np.arange(n) / 2e6
    def block(amp, noise):
        iq = amp * np.exp(2j * np.pi * 50e3 * t)
        iq = iq + noise * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
        raw = np.empty(2 * n, np.uint8)
        raw[0::2] = np.clip(iq.real * 127.5 + 127.5, 0, 255).astype(np.uint8)
        raw[1::2] = np.clip(iq.imag * 127.5 + 127.5, 0, 255).astype(np.uint8)
        return raw
    # Strong clean REF, weak TGT: expect "reference significantly
    # stronger" advice and a non-EXCELLENT verdict.
    strong = block(0.6, 0.005)
    weak = block(0.01, 0.02)
    path = tmp_path / "kx0u-1.dat"
    path.write_bytes(strong.tobytes() + weak.tobytes() + strong.tobytes())
    a = analyze_capture(str(path))
    lines = "\n".join(compare_signals(a))
    assert "reference significantly stronger" in lines
    assert "verdict:" in lines
    assert "EXCELLENT" not in lines

    # Balanced strong signals: EXCELLENT.
    path2 = tmp_path / "kx0u-2.dat"
    path2.write_bytes(strong.tobytes() * 3)
    a2 = analyze_capture(str(path2))
    lines2 = "\n".join(compare_signals(a2))
    assert "reasonably balanced" in lines2
    assert "EXCELLENT" in lines2
