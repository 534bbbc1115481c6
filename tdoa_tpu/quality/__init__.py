from tdoa_tpu.quality.analyzer import (
    BlockStats,
    SignalAnalysis,
    analyze_block_bytes,
    analyze_capture,
    assess_tdoa_suitability,
    compare_signals,
    generate_recommendations,
)
from tdoa_tpu.quality.reader import StructuralReport, validate_dat_structure

__all__ = [
    "BlockStats",
    "SignalAnalysis",
    "analyze_block_bytes",
    "analyze_capture",
    "assess_tdoa_suitability",
    "compare_signals",
    "generate_recommendations",
    "StructuralReport",
    "validate_dat_structure",
]
