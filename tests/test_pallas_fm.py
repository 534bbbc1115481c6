"""Pallas fused FM demod kernel vs the pure-JAX reference chain
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdoa_tpu.dsp.filters import lowpass_taps, remove_dc
from tdoa_tpu.dsp.fm import fm_discriminate
from tdoa_tpu.ops.cplx import from_complex
from tdoa_tpu.ops.pallas import fm_demod_decimate_pallas
from tdoa_tpu.sim import bandlimited_noise

FS = 2e6


def _fm_iq(n, seed=0, lo_offset_hz=0.0):
    audio = np.asarray(bandlimited_noise(jax.random.PRNGKey(seed), n, 5e3, FS))
    phase = 2 * np.pi * 25e3 / FS * np.cumsum(audio)
    t = np.arange(n) / FS
    iq = np.exp(1j * (phase + 2 * np.pi * lo_offset_hz * t)).astype(np.complex64)
    return iq, audio


def _reference_chain(iq, decim=16, num_taps=128):
    """Same math, straightforward numpy: discriminator then valid FIR."""
    x = from_complex(jnp.asarray(iq))
    d = np.asarray(fm_discriminate(x, FS)) / 25e3  # normalized to deviation
    d = np.concatenate([[0.0], d[1:]])  # d[0] = 0 as the kernel's padding gives
    taps = lowpass_taps(0.45 * FS / decim, FS, num_taps - 1)
    taps = np.concatenate([taps, np.zeros(num_taps - len(taps), np.float32)])
    n_out = len(iq) // decim
    pad = np.concatenate([d, np.zeros(num_taps)])
    y = np.zeros(n_out, np.float32)
    for k in range(num_taps):
        y += taps[k] * pad[k : k + n_out * decim : decim]
    return y


def test_kernel_matches_reference_chain():
    iq, _ = _fm_iq(1 << 15)
    got = np.asarray(
        fm_demod_decimate_pallas(from_complex(jnp.asarray(iq)), tile_rows=32)
    )
    want = _reference_chain(iq)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_kernel_recovers_audio():
    iq, audio = _fm_iq(1 << 16, seed=3)
    got = np.asarray(
        fm_demod_decimate_pallas(from_complex(jnp.asarray(iq)), tile_rows=64)
    )
    want = audio.reshape(-1, 16).mean(-1)
    m = min(len(got), len(want))
    got, want = got[:m], want[:m]
    # The causal FIR delays the audio by (num_taps-1)/2 input samples —
    # a *fractional* number of output samples (≈3.97); align by FFT
    # fractional shift before correlating.
    def frac_shift(a, s):
        f = np.fft.rfftfreq(len(a))
        return np.fft.irfft(np.fft.rfft(a) * np.exp(-2j * np.pi * f * s), len(a))

    best = max(
        np.corrcoef(got[50:-50], frac_shift(want, s)[50:-50])[0, 1]
        for s in np.arange(-5.0, -2.0, 0.125)
    )
    assert best > 0.99


def test_kernel_lo_offset_becomes_dc():
    iq0, _ = _fm_iq(1 << 15, seed=4)
    iq1, _ = _fm_iq(1 << 15, seed=4, lo_offset_hz=3e3)
    a0 = np.asarray(fm_demod_decimate_pallas(from_complex(jnp.asarray(iq0))))
    a1 = np.asarray(fm_demod_decimate_pallas(from_complex(jnp.asarray(iq1))))
    # LO offset = constant instantaneous-frequency bias = DC in the audio.
    np.testing.assert_allclose(
        a1[20:-20] - np.mean(a1[20:-20]),
        a0[20:-20] - np.mean(a0[20:-20]),
        atol=5e-3,
    )
    assert np.mean(a1) - np.mean(a0) > 0.05  # the DC shift itself


def test_short_and_ragged_inputs():
    """Inputs shorter than one tile, and non-tile-multiple lengths, must
    work: last partial tile is zero-padded, output is exactly n//decim."""
    from tdoa_tpu.ops.pallas.fm_demod import fm_demod_decimate_pallas
    from tdoa_tpu.ops.cplx import from_complex

    fs = 2e6
    for n in (10_000, 65_535, 32 * 1024 + 7):
        t = np.arange(n) / fs
        audio = np.sin(2 * np.pi * 1e3 * t)
        phase = 2 * np.pi * 25e3 / fs * np.cumsum(audio)
        iq = np.exp(1j * phase).astype(np.complex64)
        out = np.asarray(
            fm_demod_decimate_pallas(from_complex(jnp.asarray(iq)), fs,
                                     deviation_hz=25e3)
        )
        assert out.shape == (n // 16,)
        want = audio.reshape(-1, 16)[: n // 16].mean(-1) if n % 16 == 0 \
            else audio[: n // 16 * 16].reshape(-1, 16).mean(-1)
        corr = np.corrcoef(out[20:-20], want[20:-20])[0, 1]
        assert corr > 0.95
