from tdoa_tpu.ops.cplx import C, from_complex, to_complex
from tdoa_tpu.ops.corr import (
    CorrResult,
    correlate_pairs,
    correlate_pairs_planar,
    correlation_lags,
)
from tdoa_tpu.ops.peaks import parabolic_peak, peak_quality
from tdoa_tpu.ops import fft

__all__ = [
    "C",
    "from_complex",
    "to_complex",
    "CorrResult",
    "correlate_pairs",
    "correlate_pairs_planar",
    "correlation_lags",
    "parabolic_peak",
    "peak_quality",
    "fft",
]
