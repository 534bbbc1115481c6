"""Physically-true propagation delays for simulation.

The reference's simulators encode TDOA only as a carrier-phase offset
(simulator.go:111-117, weak_signal_simulator.go:162-169) — the envelope is
never actually shifted, so its correlator is exercised only through an
aliased carrier tone. Here a delay shifts the *complex envelope* by the
exact fractional number of samples (frequency-domain phase ramp) **and**
rotates the carrier phase (``exp(-j2πf_c τ)``), which is what a real
down-converted capture of a delayed RF signal looks like.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fractional_delay(x: jax.Array, delay_samples: jax.Array) -> jax.Array:
    """Circularly delay a complex signal by a (possibly fractional) number
    of samples via an FFT phase ramp. Positive delay shifts the signal
    later. Exact for bandlimited signals; circular wrap is negligible when
    |delay| ≪ len(x)."""
    n = x.shape[-1]
    f = jnp.fft.fftfreq(n)  # cycles/sample
    ramp = jnp.exp(-2j * jnp.pi * f * delay_samples)
    return jnp.fft.ifft(jnp.fft.fft(x, axis=-1) * ramp.astype(jnp.complex64), axis=-1)


def apply_channel(
    x: jax.Array,
    delay_samples: jax.Array,
    carrier_freq_hz: float,
    sample_rate: float,
    amplitude: jax.Array = 1.0,
) -> jax.Array:
    """Delay + carrier rotation + path amplitude: the point-source channel.

    ``x`` is the transmitted complex envelope; the received envelope is
    ``amplitude · x(t − τ) · exp(−j2π f_c τ)`` with ``τ`` in samples.
    """
    tau_s = delay_samples / sample_rate
    phase = jnp.exp(-2j * jnp.pi * carrier_freq_hz * tau_s).astype(jnp.complex64)
    return amplitude * phase * fractional_delay(x, delay_samples)


def apply_channel_moving(
    x: jax.Array,
    delay_mid_samples: jax.Array,
    delay_rate: jax.Array,  # dτ/dt, dimensionless (samples per sample)
    carrier_freq_hz: float,
    sample_rate: float,
    amplitude: jax.Array = 1.0,
) -> jax.Array:
    """Point-source channel with a linearly drifting delay (moving
    emitter or receiver): τ(t) = τ_mid + α·(t − t_mid).

    The carrier term exp(−j2π f_c τ(t)) is applied exactly — its linear
    part IS the Doppler shift ν = −f_c·α that the CAF measures. The
    envelope is delayed at the block-midpoint value only: the neglected
    envelope drift is α·L/2 samples over a block (≈0.04 samples for
    150 m/s over 2^18 samples at 2 Msps) — far below the envelope
    correlation resolution, while the carrier Doppler it produces is
    exactly what matters.
    """
    n = x.shape[-1]
    base = apply_channel(
        x, delay_mid_samples, carrier_freq_hz, sample_rate, amplitude
    )
    t_rel = (jnp.arange(n) - (n - 1) / 2.0) / sample_rate  # seconds from mid
    doppler = jnp.exp(
        -2j * jnp.pi * carrier_freq_hz * delay_rate * t_rel
    ).astype(jnp.complex64)
    return base * doppler
