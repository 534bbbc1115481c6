from tdoa_tpu.calib.gain import (
    CalibrationConfig,
    CalibrationResult,
    CaptureBackend,
    SimCaptureBackend,
    calibrate_frequency,
    calibrate,
)

__all__ = [
    "CalibrationConfig",
    "CalibrationResult",
    "CaptureBackend",
    "SimCaptureBackend",
    "calibrate_frequency",
    "calibrate",
]
