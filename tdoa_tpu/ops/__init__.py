from tdoa_tpu.ops.corr import (
    CorrResult,
    correlate_pairs,
    correlation_lags,
)
from tdoa_tpu.ops.peaks import parabolic_peak, peak_quality

__all__ = [
    "CorrResult",
    "correlate_pairs",
    "correlation_lags",
    "parabolic_peak",
    "peak_quality",
]
