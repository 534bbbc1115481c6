from tdoa_tpu.sim.delay import fractional_delay, apply_channel
from tdoa_tpu.sim.source import fm_source, tone_source, bandlimited_noise
from tdoa_tpu.sim.scene import (
    SimScene,
    NoiseProfile,
    simulate_scene,
    write_scene_captures,
    IDEAL_PROFILE,
    WEAK_REF_PROFILE,
    STRONG_TGT_PROFILE,
)

__all__ = [
    "fractional_delay",
    "apply_channel",
    "fm_source",
    "tone_source",
    "bandlimited_noise",
    "SimScene",
    "NoiseProfile",
    "simulate_scene",
    "write_scene_captures",
    "IDEAL_PROFILE",
    "WEAK_REF_PROFILE",
    "STRONG_TGT_PROFILE",
]
