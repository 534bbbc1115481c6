"""DSP tests: FIR design, FM demod round-trip, SNR percentile semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdoa_tpu.dsp import (
    bandpass_taps,
    fir_decimate,
    fir_filter,
    fm_demodulate,
    fm_discriminate,
    lowpass_taps,
    remove_dc,
    spectral_snr,
)
from tdoa_tpu.ops.cplx import C, from_complex
from tdoa_tpu.sim import fm_source, bandlimited_noise

FS = 2e6


def test_lowpass_response():
    taps = lowpass_taps(100e3, FS, 129)
    h = np.abs(np.fft.rfft(taps, 4096))
    f = np.fft.rfftfreq(4096, 1 / FS)
    assert h[0] == pytest.approx(1.0, abs=1e-6)  # unity DC gain
    assert h[f < 50e3].min() > 0.95  # passband flat
    assert h[f > 200e3].max() < 0.01  # stopband > 40 dB down


def test_bandpass_rejects_dc():
    taps = bandpass_taps(10e3, 100e3, FS, 257)
    h = np.abs(np.fft.rfft(taps, 4096))
    f = np.fft.rfftfreq(4096, 1 / FS)
    assert h[0] < 1e-3
    band = (f > 30e3) & (f < 80e3)
    assert h[band].min() > 0.9


def test_fir_filter_removes_out_of_band_tone():
    t = np.arange(1 << 14) / FS
    sig = np.sin(2 * np.pi * 20e3 * t) + np.sin(2 * np.pi * 400e3 * t)
    y = np.asarray(fir_filter(jnp.asarray(sig, jnp.float32), lowpass_taps(100e3, FS)))
    spec = np.abs(np.fft.rfft(y[1000:-1000]))
    f = np.fft.rfftfreq(len(y) - 2000, 1 / FS)
    p_in = spec[np.argmin(np.abs(f - 20e3))]
    p_out = spec[np.argmin(np.abs(f - 400e3))]
    assert p_out < p_in * 1e-2


def test_fir_decimate_length_and_alias():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1 << 14), jnp.float32)
    y = fir_decimate(x, 16, FS)
    assert y.shape[-1] == (1 << 14) // 16


def test_discriminator_recovers_tone():
    """FM of a pure tone → discriminator output is that tone."""
    n = 1 << 14
    t = np.arange(n) / FS
    audio = np.sin(2 * np.pi * 1e3 * t).astype(np.float32)
    dev = 25e3
    phase = 2 * np.pi * dev / FS * np.cumsum(audio)
    iq = np.exp(1j * phase).astype(np.complex64)
    d = np.asarray(fm_discriminate(from_complex(jnp.asarray(iq)), FS))
    # d ≈ dev * audio (instantaneous frequency)
    corr = np.corrcoef(d[10:], dev * audio[10:])[0, 1]
    assert corr > 0.999
    assert np.abs(d[10:]).max() == pytest.approx(dev, rel=0.05)


def test_fm_demodulate_roundtrip():
    """fm_source → fm_demodulate recovers the modulating audio."""
    key = jax.random.PRNGKey(0)
    n = 1 << 16
    audio = np.asarray(bandlimited_noise(key, n, 5e3, FS))
    phase = 2 * np.pi * 25e3 / FS * np.cumsum(audio)
    iq = np.exp(1j * phase).astype(np.complex64)
    out = np.asarray(
        fm_demodulate(from_complex(jnp.asarray(iq)), FS, decim=16, deviation_hz=25e3)
    )
    want = audio.reshape(-1, 16).mean(-1)  # crude reference decimation
    # Align lengths, skip FIR edge transients.
    m = min(len(out), len(want))
    corr = np.corrcoef(out[50 : m - 50], want[50 : m - 50])[0, 1]
    assert corr > 0.98


def test_demod_kills_carrier_offset():
    """A receiver LO offset must become a DC shift the demod removes —
    the property that makes audio-domain correlation robust."""
    key = jax.random.PRNGKey(1)
    n = 1 << 16
    audio = np.asarray(bandlimited_noise(key, n, 5e3, FS))
    phase = 2 * np.pi * 25e3 / FS * np.cumsum(audio)
    t = np.arange(n) / FS
    iq0 = np.exp(1j * phase).astype(np.complex64)
    iq1 = (np.exp(1j * (phase + 2 * np.pi * 3e3 * t))).astype(np.complex64)  # +3 kHz LO
    a0 = np.asarray(fm_demodulate(from_complex(jnp.asarray(iq0)), FS, decim=16))
    a1 = np.asarray(fm_demodulate(from_complex(jnp.asarray(iq1)), FS, decim=16))
    corr = np.corrcoef(a0[50:-50], a1[50:-50])[0, 1]
    assert corr > 0.999


def test_spectral_snr_orders_correctly():
    """Higher noise ⇒ lower reported SNR; clean tone ⇒ high SNR."""
    n = 1 << 15
    t = np.arange(n) / FS
    tone = np.exp(2j * np.pi * 100e3 * t).astype(np.complex64)
    rng = np.random.default_rng(2)

    def snr_of(noise_amp):
        noise = noise_amp * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        ).astype(np.complex64)
        s, _, _ = spectral_snr(from_complex(jnp.asarray(tone + noise)), nfft=4096)
        return float(s)

    clean, mid, dirty = snr_of(0.001), snr_of(0.1), snr_of(1.0)
    assert clean > mid > dirty
    assert clean > 40.0


def test_remove_dc_planar():
    x = C(jnp.ones((4, 64)) * 3.0, jnp.ones((4, 64)) * -2.0)
    y = remove_dc(x)
    assert float(jnp.abs(y.re).max()) < 1e-6
    assert float(jnp.abs(y.im).max()) < 1e-6


def test_am_demodulate_recovers_envelope():
    """AM source → am_demodulate recovers the modulating audio
    (rtl_fm.c:546-561 envelope capability)."""
    from tdoa_tpu.dsp import am_demodulate

    key = jax.random.PRNGKey(2)
    n = 1 << 16
    audio = np.asarray(bandlimited_noise(key, n, 5e3, FS))
    audio = audio / (np.abs(audio).max() + 1e-9)
    t = np.arange(n) / FS
    carrier = np.exp(2j * np.pi * 10e3 * t)  # small residual LO offset
    iq = ((1.0 + 0.5 * audio) * 0.5 * carrier).astype(np.complex64)
    out = np.asarray(am_demodulate(from_complex(jnp.asarray(iq)), FS, decim=16))
    want = audio.reshape(-1, 16).mean(-1)
    m = min(len(out), len(want))
    corr = np.corrcoef(out[50 : m - 50], want[50 : m - 50])[0, 1]
    assert corr > 0.98


def test_ssb_demodulate_selects_sideband():
    """A tone above the carrier appears in USB audio and is rejected by
    LSB, and vice versa (rtl_fm.c:563-587 phasing-method capability)."""
    from tdoa_tpu.dsp import ssb_demodulate

    n = 1 << 16
    t = np.arange(n) / FS
    f_tone = 5e3
    upper = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
    lower = np.exp(-2j * np.pi * f_tone * t).astype(np.complex64)

    def tone_power(sig, sideband):
        out = np.asarray(
            ssb_demodulate(from_complex(jnp.asarray(sig)), FS,
                           sideband=sideband, decim=16)
        )[64:-64]
        spec = np.abs(np.fft.rfft(out)) ** 2
        f = np.fft.rfftfreq(len(out), 16 / FS)
        return spec[np.argmin(np.abs(f - f_tone))]

    assert tone_power(upper, "usb") > 100 * tone_power(upper, "lsb")
    assert tone_power(lower, "lsb") > 100 * tone_power(lower, "usb")

    # Rejection must hold for low voice frequencies too: the Hilbert FIR
    # length scales with the post-decimation rate (a fixed-length
    # transformer leaks near-DC content from the wrong sideband).
    f_tone = 300.0
    low = np.exp(2j * np.pi * f_tone * t).astype(np.complex64)
    assert tone_power(low, "usb") > 100 * tone_power(low, "lsb")

    with pytest.raises(ValueError):
        ssb_demodulate(from_complex(jnp.zeros(64, jnp.complex64)), FS,
                       sideband="dsb")
