"""Multi-station capture simulation with ground truth.

Capability parity with simulator.go (ideal 3-station captures) and
weak_signal_simulator.go (impairment model: Gaussian noise, impulses,
phase drift, DC offset — weak_signal_simulator.go:46-53, 89-126), with two
physics fixes the rebuild needs to be self-validating:

- delays are true fractional *sample* shifts of the modulated envelope
  (sim/delay.py), not carrier-phase-only offsets;
- per-station clock offsets and drifts are modeled, so the dual-frequency
  [REF|TGT|REF] clock-cancellation path can be exercised end-to-end.

Every simulated capture ships with a ``SimTruth`` carrying the exact
geometric TDOAs and clock terms, pair-ordered like
``solve.station_pairs`` — the test suite asserts the full pipeline
recovers them.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdoa_tpu.geo import enu_to_ecef, lla_to_ecef
from tdoa_tpu.io.datfile import save_dat
from tdoa_tpu.sim.delay import apply_channel, apply_channel_moving
from tdoa_tpu.sim.source import fm_source
from tdoa_tpu.solve.multilateration import station_pairs
from tdoa_tpu.utils.constants import DEFAULT_SAMPLE_RATE, SPEED_OF_LIGHT


@dataclasses.dataclass(frozen=True)
class NoiseProfile:
    """Receiver-side impairment menu (weak_signal_simulator.go:46-53)."""

    signal_amplitude: float = 0.5  # envelope amplitude at the nearest station
    noise_amplitude: float = 0.005  # AWGN std per I/Q component
    impulse_rate: float = 0.0  # fraction of samples hit by impulses
    impulse_amplitude: float = 0.0  # impulse magnitude (absolute)
    phase_drift_rad_s: float = 0.0  # slow LO phase rotation
    dc_offset: float = 0.0  # additive DC on both I and Q
    # Specular multipath: one delayed, attenuated echo of the direct
    # path per station (excess delay jittered ±20% per station). Beyond
    # the reference's menu — urban reflections are the dominant real-
    # world TDOA error source and the correlator must prefer the first
    # arrival.
    multipath_amplitude: float = 0.0  # echo amplitude relative to direct
    multipath_delay_samples: float = 0.0  # nominal excess delay


IDEAL_PROFILE = NoiseProfile()
# Mirrors the reference's weak-REF profile: ~80% of full-scale is noise,
# 0.1% impulse samples at 5×, 0.05 rad/s drift, small DC
# (weak_signal_simulator.go:180-195).
WEAK_REF_PROFILE = NoiseProfile(
    signal_amplitude=0.2,
    noise_amplitude=0.28,  # 0.8 envelope split across I/Q components
    impulse_rate=0.001,
    impulse_amplitude=1.0,
    phase_drift_rad_s=0.05,
    dc_offset=0.05,
)
STRONG_TGT_PROFILE = NoiseProfile(signal_amplitude=0.6, noise_amplitude=0.02)


@dataclasses.dataclass
class SimScene:
    """A static scene: receivers, two transmitters, clocks, impairments."""

    station_names: Tuple[str, ...]
    station_lla: np.ndarray  # [n, 3]
    ref_tx_lla: np.ndarray  # [3] reference transmitter (known position)
    tgt_tx_lla: np.ndarray  # [3] target transmitter (to be located)
    ref_freq: float = 162_400_000.0
    tgt_freq: float = 101_900_000.0
    sample_rate: float = DEFAULT_SAMPLE_RATE
    block_len: int = 1 << 18  # samples per [REF|TGT|REF] block
    clock_offsets_s: Optional[np.ndarray] = None  # [n] at capture start
    clock_drifts_ppm: Optional[np.ndarray] = None  # [n] fractional rate error
    ref_profile: NoiseProfile = IDEAL_PROFILE
    tgt_profile: NoiseProfile = IDEAL_PROFILE
    # Optional co-channel interferer on the TARGET frequency: a second,
    # independent emitter whose signal lands in the same TGT block
    # (another real-world failure mode absent from the reference's
    # impairment menu). Amplitude is relative to the target's at each
    # station's nearest-approach normalization.
    interferer_lla: Optional[np.ndarray] = None  # [3]
    interferer_amplitude: float = 0.0
    # Target emitter velocity in the emitter's local ENU frame, m/s.
    # Moves the TGT-block delays linearly (sim/delay.py
    # apply_channel_moving): per-station Doppler = what the CAF
    # measures, geometry evaluated at the TGT block's midpoint.
    tgt_velocity_enu: Optional[np.ndarray] = None  # [3]
    # Known target audio program (float, at ``sample_rate``): the TGT
    # block transmits fm_modulate(tgt_audio) instead of an FM-of-noise
    # realization. This is the audio-pattern-matching validation rung
    # (audio-pattern-matching.md:155-159: "Generate synthetic FM
    # signals from known audio") — the same recording can then be
    # handed to pipeline/audio_match.py as the template. Shorter audio
    # zero-pads (dead air); longer truncates.
    tgt_audio: Optional[np.ndarray] = None
    tgt_deviation_hz: float = 25_000.0
    # Model the LO-offset aspect of clock drift: a crystal off by
    # d ppm also offsets the LO by d·1e-6·f_c (~160 Hz/ppm at VHF),
    # which smears coherent integration — a much harsher impairment
    # than the stepwise delay-offset aspect alone. Off by default:
    # the delay-offset model is what the REF-based drift measurement
    # is validated against; turn this on to exercise CAF/short-segment
    # robustness against realistic TCXO offsets.
    drift_doppler: bool = False
    # Per-station receive-gain calibration error: [n] linear amplitude
    # multipliers applied to EVERYTHING a station hears (REF and TGT
    # alike — a front-end gain error is channel-agnostic). The
    # real-world impairment the reference's gain_calibrator exists
    # for. NOTE: the power ranking is REF-gain-calibrated
    # (solve.rank_candidates_by_power removes per-station gain using
    # the REF block and the known REF geometry), so a channel-
    # agnostic gain error CANCELS there by design — this field mainly
    # exercises that cancellation. None = perfectly calibrated.
    station_gain: Optional[np.ndarray] = None  # [n] linear
    # Per-station CROSS-FREQUENCY response error: [n] linear amplitude
    # multipliers applied to the TGT channel ONLY. The REF-based gain
    # calibration measures the front end at the REF frequency
    # (162.4 MHz) and assumes the response transfers to the TGT
    # frequency (101.9 MHz); antenna/filter response differences
    # between the two bands DO NOT cancel and corrupt the 1/r
    # received-power evidence the ghost posterior's power lane
    # consumes (a ±6 dB spread makes that lane uninformative — the
    # ghost-fdoa Monte Carlo regime). None = flat response.
    station_gain_tgt: Optional[np.ndarray] = None  # [n] linear
    seed: int = 0


@dataclasses.dataclass
class SimTruth:
    pair_idx: np.ndarray  # [m, 2]
    tgt_tdoa_samples: np.ndarray  # [m] geometric TDOA (what a perfect fix needs)
    ref_tdoa_samples: np.ndarray  # [m] geometric TDOA of the reference tx
    clock_offset_samples: np.ndarray  # [n, 3] effective offset per block
    measured_ref_delay: np.ndarray  # [m, 2] expected REF-block correlation delays
    measured_tgt_delay: np.ndarray  # [m] expected TGT-block correlation delay
    station_delays_samples: np.ndarray  # [n, 2] (ref, tgt) geometric delays
    # [m] expected per-pair differential Doppler of the TGT block
    # (ops/caf.py sign convention); zeros for a static scene.
    tgt_fdoa_hz: Optional[np.ndarray] = None
    # [n] per-station delay rates dτ/dt (dimensionless) of the TGT block
    tgt_delay_rate: Optional[np.ndarray] = None


def _tgt_motion(scene: SimScene):
    """(tgt position at the TGT block midpoint [ecef], v_ecef m/s).

    The TGT block spans [L, 2L); its midpoint is 1.5·L samples into the
    capture. Truth geometry is evaluated there so a moving emitter's
    TDOAs match what the correlator (which averages the block) sees.
    """
    p0 = lla_to_ecef(scene.tgt_tx_lla)
    if scene.tgt_velocity_enu is None:
        return p0, np.zeros(3)
    v = np.asarray(scene.tgt_velocity_enu, np.float64)
    v_ecef = enu_to_ecef(v, scene.tgt_tx_lla) - enu_to_ecef(
        np.zeros(3), scene.tgt_tx_lla
    )
    t_mid = 1.5 * scene.block_len / scene.sample_rate
    return p0 + v_ecef * t_mid, v_ecef


def _geometric_delays_samples(scene: SimScene) -> Tuple[np.ndarray, np.ndarray]:
    st = lla_to_ecef(scene.station_lla)
    d_ref = np.linalg.norm(st - lla_to_ecef(scene.ref_tx_lla), axis=-1)
    p_tgt, _ = _tgt_motion(scene)
    d_tgt = np.linalg.norm(st - p_tgt, axis=-1)
    fs = scene.sample_rate
    return d_ref / SPEED_OF_LIGHT * fs, d_tgt / SPEED_OF_LIGHT * fs


def compute_truth(scene: SimScene) -> SimTruth:
    n = len(scene.station_names)
    tau_ref, tau_tgt = _geometric_delays_samples(scene)
    pairs = station_pairs(n)
    fs = scene.sample_rate
    offs = np.zeros(n) if scene.clock_offsets_s is None else np.asarray(scene.clock_offsets_s)
    drifts = np.zeros(n) if scene.clock_drifts_ppm is None else np.asarray(scene.clock_drifts_ppm)
    # Effective clock offset at each block's midpoint, in samples.
    block_mid_t = (np.arange(3) + 0.5) * scene.block_len / fs
    clock = (offs[:, None] + 1e-6 * drifts[:, None] * block_mid_t[None, :]) * fs  # [n, 3]

    i, j = pairs[:, 0], pairs[:, 1]
    ref_tdoa = tau_ref[j] - tau_ref[i]
    tgt_tdoa = tau_tgt[j] - tau_tgt[i]
    meas_ref = np.stack(
        [
            ref_tdoa + (clock[j, 0] - clock[i, 0]),
            ref_tdoa + (clock[j, 2] - clock[i, 2]),
        ],
        axis=-1,
    )
    meas_tgt = tgt_tdoa + (clock[j, 1] - clock[i, 1])
    # Per-station TGT-block delay rates: emitter motion (range rate/c)
    # PLUS receiver clock drift (a drifting clock IS a delay rate — it
    # shifts the LO and the sampling alike). Pairwise Doppler follows
    # (station j up-shifted positive, ops/caf.py convention).
    p_tgt, v_ecef = _tgt_motion(scene)
    st_ecef = lla_to_ecef(scene.station_lla)
    u = st_ecef - p_tgt[None, :]
    u = u / np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-9)
    rdot = -u @ v_ecef  # d|station - p|/dt, per station
    delay_rate = rdot / SPEED_OF_LIGHT  # dimensionless
    if scene.drift_doppler:
        delay_rate = delay_rate + 1e-6 * drifts
    fdoa = -scene.tgt_freq * (delay_rate[j] - delay_rate[i])
    return SimTruth(
        pair_idx=pairs,
        tgt_tdoa_samples=tgt_tdoa,
        ref_tdoa_samples=ref_tdoa,
        clock_offset_samples=clock,
        measured_ref_delay=meas_ref,
        measured_tgt_delay=meas_tgt,
        station_delays_samples=np.stack([tau_ref, tau_tgt], axis=-1),
        tgt_fdoa_hz=fdoa,
        tgt_delay_rate=delay_rate,
    )


def _receive_block(
    key: jax.Array,
    src: jax.Array,
    delays: jax.Array,  # [n] samples (geometry + clock)
    amps: jax.Array,  # [n]
    carrier: float,
    profile: NoiseProfile,
    sample_rate: float,
    multipath_excess: Optional[jax.Array] = None,  # [n] samples, scene-static
    delay_rates: Optional[jax.Array] = None,  # [n] dτ/dt (moving emitter)
) -> jax.Array:
    """Simulate one block at every station: channel + impairments. [n, L]."""
    n_st = delays.shape[0]
    length = src.shape[0]
    if delay_rates is not None:
        chan = lambda d, r, a: apply_channel_moving(
            src, d, r, carrier, sample_rate, a
        )
        rx = jax.vmap(chan)(delays, delay_rates, amps)
    else:
        chan = lambda d, r, a: apply_channel(src, d, carrier, sample_rate, a)
        rx = jax.vmap(chan)(delays, jnp.zeros_like(delays), amps)

    k_noise_i, k_noise_q, k_imp, k_impphase, k_phase0 = jax.random.split(key, 5)

    if (profile.multipath_amplitude > 0.0 and multipath_excess is not None):
        # The excess delay is drawn ONCE per scene (simulate_scene): a
        # static reflector gives the same echo geometry in every block —
        # re-drawing per block would inject fake apparent clock drift.
        # A static reflector's echo of a moving emitter carries (to
        # first order) the same Doppler as the direct path — the moving
        # leg is emitter->reflector. Same delay rates, extra delay.
        zero_r = jnp.zeros_like(delays) if delay_rates is None else delay_rates
        echo = jax.vmap(chan)(
            delays + multipath_excess, zero_r,
            amps * profile.multipath_amplitude,
        )
        rx = rx + echo
    noise = profile.noise_amplitude * (
        jax.random.normal(k_noise_i, (n_st, length))
        + 1j * jax.random.normal(k_noise_q, (n_st, length))
    )
    rx = rx + noise.astype(jnp.complex64)

    if profile.impulse_rate > 0:
        hits = jax.random.bernoulli(k_imp, profile.impulse_rate, (n_st, length))
        phases = jax.random.uniform(k_impphase, (n_st, length), maxval=2 * np.pi)
        rx = rx + jnp.where(
            hits, profile.impulse_amplitude * jnp.exp(1j * phases), 0.0
        ).astype(jnp.complex64)

    if profile.phase_drift_rad_s != 0.0:
        t = jnp.arange(length) / sample_rate
        phi0 = jax.random.uniform(k_phase0, (n_st, 1), maxval=2 * np.pi)
        rx = rx * jnp.exp(1j * (profile.phase_drift_rad_s * t[None, :] + phi0)).astype(
            jnp.complex64
        )

    if profile.dc_offset != 0.0:
        rx = rx + (profile.dc_offset + 1j * profile.dc_offset)

    return rx


def simulate_scene(scene: SimScene) -> Tuple[Dict[str, Tuple[jax.Array, ...]], SimTruth]:
    """Run the scene. Returns ({station: (ref1, tgt, ref2)}, truth).

    Each block is an independent FM-of-noise realization from the proper
    transmitter, received at all stations with geometric + clock delays,
    path-loss amplitudes, and the block's impairment profile.
    """
    truth = compute_truth(scene)
    tau_ref, tau_tgt = truth.station_delays_samples[:, 0], truth.station_delays_samples[:, 1]
    n = len(scene.station_names)
    fs = scene.sample_rate

    # 1/r path-loss amplitudes from the truth's own delays (d = τ·c/fs):
    # one source of geometry for both timing and amplitude.
    d_ref = np.asarray(tau_ref) * (SPEED_OF_LIGHT / fs)
    d_tgt = np.asarray(tau_tgt) * (SPEED_OF_LIGHT / fs)
    amp_ref = scene.ref_profile.signal_amplitude * (d_ref.min() / d_ref)
    amp_tgt = scene.tgt_profile.signal_amplitude * (d_tgt.min() / d_tgt)
    if scene.station_gain is not None:
        g = np.asarray(scene.station_gain, np.float64)
        amp_ref = amp_ref * g
        amp_tgt = amp_tgt * g
    if scene.station_gain_tgt is not None:
        amp_tgt = amp_tgt * np.asarray(scene.station_gain_tgt,
                                       np.float64)

    key = jax.random.PRNGKey(scene.seed)
    keys = jax.random.split(key, 8)
    blocks = []
    specs = [
        (0, scene.ref_freq, tau_ref, amp_ref, scene.ref_profile),
        (1, scene.tgt_freq, tau_tgt, amp_tgt, scene.tgt_profile),
        (2, scene.ref_freq, tau_ref, amp_ref, scene.ref_profile),
    ]
    for b, (bi, carrier, tau, amp, profile) in enumerate(specs):
        if bi == 1 and scene.tgt_audio is not None:
            from tdoa_tpu.dsp.fm import fm_modulate
            from tdoa_tpu.ops.cplx import to_complex

            a = np.zeros(scene.block_len, np.float32)
            m = min(len(scene.tgt_audio), scene.block_len)
            a[:m] = np.asarray(scene.tgt_audio[:m], np.float32)
            src = to_complex(
                fm_modulate(jnp.asarray(a), fs, scene.tgt_deviation_hz)
            )
        else:
            src = fm_source(keys[b], scene.block_len, fs)
        delays = jnp.asarray(
            tau + np.asarray(truth.clock_offset_samples[:, bi]), jnp.float32
        )
        # Delay rates: clock drift applies to every block; emitter
        # motion additionally to the TGT block. None when all zero so
        # static scenes keep the cheaper static channel.
        drifts_ppm = (
            np.zeros(n) if scene.clock_drifts_ppm is None
            else np.asarray(scene.clock_drifts_ppm)
        )
        rates = 1e-6 * drifts_ppm if scene.drift_doppler else np.zeros(n)
        if bi == 1 and truth.tgt_delay_rate is not None:
            rates = np.asarray(truth.tgt_delay_rate)  # incl. drift if on
        moving = bool(np.abs(rates).max() > 0)
        mp_excess = None
        if (profile.multipath_amplitude > 0.0
                and profile.multipath_delay_samples > 0.0):
            mp_excess = profile.multipath_delay_samples * jax.random.uniform(
                keys[7], (n,), minval=0.8, maxval=1.2
            )
        rx = _receive_block(
            keys[3 + b % 3], src, delays, jnp.asarray(amp, jnp.float32),
            carrier, profile, fs, multipath_excess=mp_excess,
            delay_rates=(
                jnp.asarray(rates, jnp.float32) if moving else None
            ),
        )
        if (bi == 1 and scene.interferer_lla is not None
                and scene.interferer_amplitude > 0.0):
            # Independent co-channel emitter: own waveform, own geometry,
            # same station clocks; adds clean (the block's noise/
            # impairments were already applied once by _receive_block).
            st = lla_to_ecef(scene.station_lla)
            d_int = np.linalg.norm(
                st - lla_to_ecef(np.asarray(scene.interferer_lla)), axis=-1
            )
            tau_int = d_int / SPEED_OF_LIGHT * fs
            # Amplitude is defined relative to the TARGET's at each
            # station (a controllable interference-to-signal ratio);
            # propagation *timing* still uses the interferer's own
            # geometry.
            amp_int = scene.interferer_amplitude * np.asarray(amp_tgt)
            int_src = fm_source(keys[6], scene.block_len, fs)
            int_delays = jnp.asarray(
                tau_int + np.asarray(truth.clock_offset_samples[:, bi]),
                jnp.float32,
            )
            rx = rx + jax.vmap(
                lambda d, a: apply_channel(int_src, d, carrier, fs, a)
            )(int_delays, jnp.asarray(amp_int, jnp.float32))
        blocks.append(rx)

    captures = {
        name: (blocks[0][k], blocks[1][k], blocks[2][k])
        for k, name in enumerate(scene.station_names)
    }
    return captures, truth


def write_scene_captures(
    scene: SimScene, out_dir: str, prefix: str = "sim-", epoch: int = 1_700_000_000
) -> Tuple[Dict[str, str], SimTruth]:
    """Simulate and write byte-contract ``.dat`` files
    (``{prefix}{station}-{epoch}.dat``, simulator.go:163-178 convention)."""
    captures, truth = simulate_scene(scene)
    paths = {}
    for name, (r1, t, r2) in captures.items():
        path = f"{out_dir}/{prefix}{name}-{epoch}.dat"
        save_dat(path, r1, t, r2)
        paths[name] = path
    return paths, truth
