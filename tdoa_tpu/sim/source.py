"""Transmitted-signal models: FM stations, tones, bandlimited noise.

The reference transmits pure carrier tones (generatePerfectSignal,
simulator.go:67-82). A tone has no envelope structure, so envelope
cross-correlation of tones is delay-blind — the rebuild's sources carry
real modulation (FM-of-noise audio, as an actual NOAA/broadcast signal
does) so the correlator is genuinely exercised.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bandlimited_noise(
    key: jax.Array, n: int, bandwidth_hz: float, sample_rate: float
) -> jax.Array:
    """Real white noise brick-wall filtered to ±bandwidth, unit RMS."""
    x = jax.random.normal(key, (n,), jnp.float32)
    spec = jnp.fft.rfft(x)
    f = jnp.fft.rfftfreq(n, d=1.0 / sample_rate)
    spec = jnp.where(f <= bandwidth_hz, spec, 0.0)
    y = jnp.fft.irfft(spec, n=n)
    return y / (jnp.std(y) + 1e-12)


def fm_source(
    key: jax.Array,
    n: int,
    sample_rate: float,
    audio_bandwidth_hz: float = 5_000.0,
    deviation_hz: float = 25_000.0,
) -> jax.Array:
    """FM-modulated complex envelope: audio-bandlimited noise frequency-
    modulated at the given deviation (NBFM defaults ≈ NOAA weather radio,
    the reference's REF signal at 162.4 MHz). Unit amplitude."""
    audio = bandlimited_noise(key, n, audio_bandwidth_hz, sample_rate)
    phase = 2.0 * jnp.pi * deviation_hz / sample_rate * jnp.cumsum(audio)
    return jnp.exp(1j * phase).astype(jnp.complex64)


def tone_source(n: int, freq_hz: float, sample_rate: float) -> jax.Array:
    """Pure complex tone (the reference simulator's model, for parity)."""
    t = jnp.arange(n) / sample_rate
    return jnp.exp(2j * jnp.pi * freq_hz * t).astype(jnp.complex64)
