from tdoa_tpu.utils.constants import (
    SPEED_OF_LIGHT,
    DEFAULT_SAMPLE_RATE,
    DEFAULT_MAX_LAG,
)
from tdoa_tpu.utils.platform import on_tpu, default_interpret_mode

__all__ = [
    "SPEED_OF_LIGHT",
    "DEFAULT_SAMPLE_RATE",
    "DEFAULT_MAX_LAG",
    "on_tpu",
    "default_interpret_mode",
]
