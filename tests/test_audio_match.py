"""Audio-pattern-matching: the reference's documented innovation
(docs/audio-pattern-matching.md), validated end to end — WAV codec,
FFT resampling, FM modulation/demodulation round-trip, matched-filter
TOA in both domains, and the full recording→template→fix pipeline the
doc prescribes as its own validation ladder (audio-pattern-matching.md:
155-170)."""

import json
import wave

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdoa_tpu.dsp.filters import resample_fft
from tdoa_tpu.dsp.fm import fm_demodulate, fm_modulate
from tdoa_tpu.io.wav import read_wav, write_wav
from tdoa_tpu.ops.cplx import C, from_complex, to_complex
from tdoa_tpu.pipeline.audio_match import (
    match_captures,
    match_template_audio,
    match_template_rf,
    template_iq,
)
from tdoa_tpu.sim.delay import fractional_delay
from tdoa_tpu.sim.source import bandlimited_noise

FS = 2_000_000.0
BLOCK = 1 << 17


# ---------------------------------------------------------------- wav io


def test_wav_roundtrip_pcm16(tmp_path):
    rng = np.random.default_rng(0)
    audio = np.clip(rng.standard_normal(4410) * 0.3, -1, 1).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, 44100, audio)
    fs, back = read_wav(path)
    assert fs == 44100.0
    # Quantization (±0.5 LSB) plus the 32767-encode/32768-decode scale
    # convention bound the round-trip error at 2 LSB.
    np.testing.assert_allclose(back, audio, atol=2.0 / 32768)


def test_wav_stereo_averages_to_mono(tmp_path):
    path = str(tmp_path / "st.wav")
    left = np.full(100, 0.5, np.float32)
    right = np.full(100, -0.25, np.float32)
    inter = np.empty(200, np.float32)
    inter[0::2], inter[1::2] = left, right
    pcm = np.round(inter * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    _, mono = read_wav(path)
    np.testing.assert_allclose(mono, 0.125, atol=1e-3)
    assert mono.shape == (100,)


def test_wav_8bit_and_24bit(tmp_path):
    # 8-bit unsigned
    p8 = str(tmp_path / "b8.wav")
    vals = np.array([128, 255, 0, 192], np.uint8)
    with wave.open(p8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(vals.tobytes())
    _, a8 = read_wav(p8)
    np.testing.assert_allclose(a8, [0.0, 127 / 128, -1.0, 0.5], atol=1e-6)
    # 24-bit signed little-endian
    p24 = str(tmp_path / "b24.wav")
    x = np.array([1 << 22, -(1 << 22), 0], np.int64)
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in x
    )
    with wave.open(p24, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(raw)
    _, a24 = read_wav(p24)
    np.testing.assert_allclose(a24, [0.5, -0.5, 0.0], atol=1e-6)


# ------------------------------------------------------------- resample


def test_resample_fft_tone_up_and_down():
    n_in = 4410
    t = np.arange(n_in) / 44100.0
    x = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
    for n_out, fs_out in ((48000 * n_in // 44100, 48000.0), (2205, 22050.0)):
        y = np.asarray(resample_fft(jnp.asarray(x), n_out))
        t_out = np.arange(n_out) * (n_in / n_out) / 44100.0
        want = np.sin(2 * np.pi * 997.0 * t_out)
        # Fourier resampling is exact for bandlimited signals up to
        # edge effects of the finite window.
        err = np.abs(y - want)[50:-50]
        assert err.max() < 5e-3


def test_resample_fft_identity():
    x = np.random.default_rng(1).standard_normal(1000).astype(np.float32)
    y = np.asarray(resample_fft(jnp.asarray(x), 1000))
    np.testing.assert_allclose(y, x, atol=1e-6)


# ------------------------------------------------------- fm mod ↔ demod


def test_fm_modulate_demodulate_roundtrip():
    key = jax.random.PRNGKey(2)
    n = 1 << 15
    audio = bandlimited_noise(key, n, 10e3, FS)
    iq = fm_modulate(audio, FS, deviation_hz=50e3)
    # Unit amplitude everywhere
    np.testing.assert_allclose(np.asarray(iq.abs2()), 1.0, atol=1e-5)
    back = fm_demodulate(iq, FS, decim=1, deviation_hz=50e3)
    a, b = np.asarray(audio)[100:-100], np.asarray(back)[100:-100]
    corr = np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b))
    assert corr > 0.999


# ------------------------------------------------------ matched filter


def _delayed_stations(tpl: C, delays, noise=0.02, lo_hz=None, seed=3):
    rng = np.random.default_rng(seed)
    z = to_complex(tpl)
    chans = []
    for k, d in enumerate(delays):
        rx = fractional_delay(z, jnp.float32(d))
        if lo_hz is not None:
            t = jnp.arange(z.shape[-1]) / FS
            rx = rx * jnp.exp(2j * jnp.pi * lo_hz[k] * t)
        rx = np.asarray(rx) + noise * (
            rng.standard_normal(z.shape[-1])
            + 1j * rng.standard_normal(z.shape[-1])
        )
        chans.append(rx.astype(np.complex64))
    return from_complex(jnp.asarray(np.stack(chans)))


def test_match_template_audio_known_delays():
    key = jax.random.PRNGKey(4)
    audio = bandlimited_noise(key, BLOCK, 15e3, FS)
    tpl = fm_modulate(audio, FS, deviation_hz=50e3)
    delays = [0.0, 36.5, -20.25]
    tgt = _delayed_stations(tpl, delays)
    m = match_template_audio(tgt, tpl, sample_rate=FS, decim=8, max_lag=512)
    toa = np.asarray(m.toa_samples)
    np.testing.assert_allclose(toa, delays, atol=2.0)
    # TOA differences (the TDOAs) are tighter: common biases cancel.
    np.testing.assert_allclose(
        toa[1] - toa[0], delays[1] - delays[0], atol=1.0
    )
    assert np.asarray(m.quality).min() > 5.0


def test_match_template_audio_survives_lo_offsets():
    """LO offsets that would wreck a coherent RF matched filter are
    invisible in the audio domain (they demodulate to DC)."""
    key = jax.random.PRNGKey(5)
    audio = bandlimited_noise(key, BLOCK, 15e3, FS)
    tpl = fm_modulate(audio, FS, deviation_hz=50e3)
    delays = [5.0, -12.5, 30.0]
    tgt = _delayed_stations(tpl, delays, lo_hz=np.array([80.0, -150.0, 40.0]))
    m = match_template_audio(tgt, tpl, sample_rate=FS, decim=8, max_lag=512)
    np.testing.assert_allclose(np.asarray(m.toa_samples), delays, atol=2.0)


def test_match_template_rf_recovers_delay_and_lo():
    key = jax.random.PRNGKey(6)
    audio = bandlimited_noise(key, BLOCK, 15e3, FS)
    tpl = fm_modulate(audio, FS, deviation_hz=50e3)
    delays = [3.25, -41.0, 17.5]
    lo = np.array([12.0, -85.0, 150.0])
    tgt = _delayed_stations(tpl, delays, lo_hz=lo)
    m = match_template_rf(
        tgt, tpl, sample_rate=FS, max_lag=512, lo_span_hz=200.0,
        n_doppler=64,
    )
    np.testing.assert_allclose(np.asarray(m.toa_samples), delays, atol=0.5)
    np.testing.assert_allclose(np.asarray(m.lo_offset_hz), lo, atol=3.0)
    assert np.asarray(m.quality).min() > 5.0


def test_template_iq_pads_and_reports_coverage():
    audio = np.ones(1000, np.float32) * 0.1
    tpl, covered = template_iq(audio, 44100.0, 1 << 16, FS, 25e3)
    n_res = int(round(1000 * FS / 44100.0))
    assert tpl.re.shape == (1 << 16,)
    assert abs(covered - n_res / (1 << 16)) < 1e-9
    # Zero-padded tail
    tail = np.asarray(tpl.abs2())[n_res + 1:]
    assert tail.max() < 1e-9


# ------------------------------------------------------------ full path


def _fix_error_m(fix, tgt_lla):
    from tdoa_tpu.geo import lla_to_enu

    est = np.array([fix.lat, fix.lon, tgt_lla[2]])
    return np.linalg.norm(lla_to_enu(est, tgt_lla)[:2])


def _scene(omaha, **kw):
    from tdoa_tpu.sim import SimScene

    return SimScene(
        station_names=omaha["names"],
        station_lla=omaha["station_lla"],
        ref_tx_lla=omaha["ref_tx_lla"],
        tgt_tx_lla=omaha["tgt_tx_lla"],
        ref_freq=omaha["ref_freq"],
        tgt_freq=omaha["tgt_freq"],
        block_len=BLOCK,
        **kw,
    )


def _known_audio_scene(omaha, seed=7, **kw):
    """Scene whose TGT emitter broadcasts a KNOWN 44.1 kHz recording."""
    key = jax.random.PRNGKey(seed)
    n44 = int(round(BLOCK * 44100.0 / FS))
    audio44 = np.asarray(bandlimited_noise(key, n44, 10e3, 44100.0))
    audio44 = 0.8 * audio44 / np.abs(audio44).max()
    n_res = int(round(n44 * FS / 44100.0))
    audio_fs = np.asarray(resample_fft(jnp.asarray(audio44), n_res))
    scene = _scene(
        omaha,
        tgt_audio=audio_fs,
        tgt_deviation_hz=50e3,
        **kw,
    )
    return scene, audio44


@pytest.mark.slow
def test_audio_match_e2e(omaha_stations, station_csv, tmp_path):
    """The doc's full loop: known recording → synthetic captures with
    clock offsets → template match → clock-corrected TDOAs → fix,
    cross-validated against the pairwise pipeline."""
    from tdoa_tpu.pipeline import TDOAProcessor
    from tdoa_tpu.sim import simulate_scene

    scene, audio44 = _known_audio_scene(
        omaha_stations,
        clock_offsets_s=np.array([12e-6, -31e-6, 48e-6]),
    )
    captures, truth = simulate_scene(scene)
    wav_path = str(tmp_path / "recording.wav")
    write_wav(wav_path, 44100, audio44)
    fs_w, audio_back = read_wav(wav_path)

    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=None, max_lag=1024,
    )
    res = match_captures(
        proc, {n: captures[n] for n in scene.station_names},
        audio_back, fs_w, mode="audio", deviation_hz=50e3,
    )
    np.testing.assert_allclose(
        res.corrected_tdoa_samples, truth.tgt_tdoa_samples, atol=4.0
    )
    assert _fix_error_m(res.fix, scene.tgt_tx_lla) < 4000.0
    # Cross-validation: template and pairwise agree
    np.testing.assert_allclose(
        res.corrected_tdoa_samples,
        res.pairwise.corrected_tdoa_samples,
        atol=4.0,
    )
    assert res.covered_fraction > 0.99


@pytest.mark.slow
def test_audio_match_cli_json(omaha_stations, station_csv, tmp_path):
    from tdoa_tpu.cli.audio_match import main
    from tdoa_tpu.sim import write_scene_captures

    scene, audio44 = _known_audio_scene(omaha_stations, seed=9)
    paths, truth = write_scene_captures(scene, str(tmp_path))
    wav_path = str(tmp_path / "rec.wav")
    write_wav(wav_path, 44100, audio44)

    import io
    import contextlib

    buf = io.StringIO()
    argv = [
        str(scene.ref_freq), str(scene.tgt_freq), station_csv, wav_path,
        *sorted(paths.values()),
        "--seg-len", str(BLOCK), "--max-lag", "1024", "--json",
        "--deviation", "50000",
    ]
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert set(out["stations"]) == set(scene.station_names)
    got = np.array(out["tdoa_us"])
    want = truth.tgt_tdoa_samples / FS * 1e6
    # The CLI's station order comes from the loaded filenames, so pair
    # directions can flip vs the scene's order — compare magnitudes
    # (the fix assertion below pins the actual geometry).
    assert np.abs(np.sort(np.abs(got)) - np.sort(np.abs(want))).max() < 3.0
    assert out["fix"]["lat"] == pytest.approx(scene.tgt_tx_lla[0], abs=0.05)
    assert out["covered_fraction"] > 0.99


@pytest.mark.slow
def test_audio_match_auto_escalates_under_fm_threshold_noise(
    omaha_stations, station_csv
):
    """mode="auto" under FM-threshold channel noise: the audio-domain
    match collapses (click noise replaces the program — its peak sits
    ~15 samples off here), the validation rungs catch it, and auto
    escalates to the LINEAR rf-domain matched filter, whose result it
    keeps. The escalation is named in a warning."""
    from tdoa_tpu.pipeline import TDOAProcessor
    from tdoa_tpu.sim import NoiseProfile, simulate_scene

    scene, audio44 = _known_audio_scene(
        omaha_stations,
        seed=7,
        tgt_profile=NoiseProfile(
            signal_amplitude=1.0, noise_amplitude=0.6
        ),
        clock_offsets_s=np.array([12e-6, -31e-6, 48e-6]),
    )
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=None, max_lag=1024,
    )
    caps = {n: captures[n] for n in scene.station_names}

    res_audio = match_captures(
        proc, caps, audio44, 44100.0, mode="audio", deviation_hz=50e3
    )
    res_auto = match_captures(
        proc, caps, audio44, 44100.0, mode="auto", deviation_hz=50e3
    )

    by = {n: k for k, n in enumerate(scene.station_names)}
    tau = truth.station_delays_samples[:, 1]

    def err(res):
        order = [by[n] for n in res.station_names]
        want = np.array(
            [tau[order[j]] - tau[order[i]] for i, j in res.pair_idx]
        )
        return np.abs(
            np.asarray(res.corrected_tdoa_samples) - want
        ).max()

    assert err(res_audio) > 4.0  # the audio domain really collapsed
    assert res_auto.mode_used == "rf"
    assert any("escalated" in w for w in res_auto.warnings)
    assert err(res_auto) < 4.0
    assert res_auto.lo_offset_hz is not None  # rf by-product rode along


@pytest.mark.slow
def test_audio_match_auto_stays_audio_on_healthy_scene(
    omaha_stations, station_csv
):
    """mode="auto" on a healthy capture: no escalation — the result IS
    the audio-domain result (no rf pass, no escalation warning). Noise
    must be LOW here: the fixture geometry's far station (kx0u) rides
    the 1/r amplitude law, so even moderate channel noise pushes it
    under the FM threshold and escalation correctly fires (measured:
    noise 0.1 already collapses kx0u's audio match to ~445 samples
    off at PSR 3.2 — the escalation test covers that side)."""
    from tdoa_tpu.pipeline import TDOAProcessor
    from tdoa_tpu.sim import NoiseProfile, simulate_scene

    scene, audio44 = _known_audio_scene(
        omaha_stations,
        seed=7,
        tgt_profile=NoiseProfile(
            signal_amplitude=1.0, noise_amplitude=0.05
        ),
        clock_offsets_s=np.array([12e-6, -31e-6, 48e-6]),
    )
    captures, truth = simulate_scene(scene)
    proc = TDOAProcessor.from_csv(
        scene.ref_freq, scene.tgt_freq, station_csv,
        seg_len=None, max_lag=1024,
    )
    caps = {n: captures[n] for n in scene.station_names}
    res = match_captures(
        proc, caps, audio44, 44100.0, mode="auto", deviation_hz=50e3
    )
    assert res.mode_used == "audio"
    assert not any("escalated" in w for w in res.warnings)
    assert res.lo_offset_hz is None
    by = {n: k for k, n in enumerate(scene.station_names)}
    order = [by[n] for n in res.station_names]
    tau = truth.station_delays_samples[:, 1]
    want = np.array(
        [tau[order[j]] - tau[order[i]] for i, j in res.pair_idx]
    )
    assert np.abs(
        np.asarray(res.corrected_tdoa_samples) - want
    ).max() < 4.0


def test_match_captures_rejects_unknown_mode(omaha_stations, station_csv):
    from tdoa_tpu.pipeline import TDOAProcessor

    proc = TDOAProcessor.from_csv(
        162.4e6, 101.9e6, station_csv, seg_len=None, max_lag=1024
    )
    with pytest.raises(ValueError, match="mode must be"):
        match_captures(proc, {}, np.zeros(10), 44100.0, mode="banana")


# ------------------------------------------- cross-validation gates


def _fake_fix(lat, lon, semi_major):
    from tdoa_tpu.solve.multilateration import FixResult

    return FixResult(
        lat=lat, lon=lon, elev=300.0, enu=np.zeros(3),
        rms_residual_m=1.0, origin_lla=np.array([lat, lon, 300.0]),
        ellipse=(semi_major, semi_major / 2, 0.0),
    )


def _fake_pairwise(tdoa_samples, std_samples, fix):
    class PW:
        corrected_tdoa_samples = np.asarray(tdoa_samples, np.float64)
        tdoa_std_s = np.asarray(std_samples, np.float64) / FS
    PW.fix = fix
    return PW


def test_cross_validation_flags_seed_21908_numbers():
    """Regression: the Monte Carlo silent failure (seed 21908) — a
    12-sample template error at ~3.6σ of the combined error bar and a
    2 km fix separation — must raise BOTH cross-validation warnings
    (the old 6σ-of-template-σ gate let it through silently)."""
    from tdoa_tpu.pipeline.audio_match import cross_validation_warnings

    names = ("st0", "st1", "st2")
    pairs = np.array([[0, 1], [0, 2], [1, 2]])
    # The trial's actual numbers: template vs pairwise disagreement
    # [3.84, 13.44, 9.59] samples, template pair sigma from toa_std
    # [1.908, 0.657, 3.197] -> [2.02, 3.72, 3.26].
    corrected = np.array([-12.029, 52.831, 64.859])
    pw_tdoa = np.array([-15.869, 39.392, 55.266])
    sigma = np.array([2.02, 3.72, 3.26])
    fix_t = _fake_fix(41.28, -95.98, 300.0)  # ~2 km north of pairwise
    fix_p = _fake_fix(41.262, -95.98, 120.0)
    pw = _fake_pairwise(pw_tdoa, np.full(3, 0.05), fix_p)

    warns = cross_validation_warnings(
        corrected, sigma, pw, fix_t, names, pairs, FS
    )
    assert len(warns) == 2
    assert "disagree" in warns[0]
    assert "fix" in warns[1] and "apart" in warns[1]


def test_cross_validation_quiet_on_agreement():
    """Sub-sample disagreement and nearby fixes stay below both floors
    (3 samples / 50 m) even with tiny reported sigmas."""
    from tdoa_tpu.pipeline.audio_match import cross_validation_warnings

    names = ("st0", "st1", "st2")
    pairs = np.array([[0, 1], [0, 2], [1, 2]])
    corrected = np.array([-15.5, 39.8, 55.4])
    pw_tdoa = np.array([-15.9, 39.4, 55.3])
    sigma = np.full(3, 0.05)  # rf-mode 1/PSR proxy: optimistic
    fix_t = _fake_fix(41.2621, -95.98, 80.0)
    fix_p = _fake_fix(41.2620, -95.98, 80.0)  # ~11 m apart
    pw = _fake_pairwise(pw_tdoa, np.full(3, 0.05), fix_p)

    warns = cross_validation_warnings(
        corrected, sigma, pw, fix_t, names, pairs, FS
    )
    assert warns == []
