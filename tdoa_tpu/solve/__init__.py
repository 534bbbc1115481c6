from tdoa_tpu.solve.ghost import (
    GhostVerdict,
    ghost_posterior,
)
from tdoa_tpu.solve.multilateration import (
    solve_tdoa_enu,
    solve_tdoa_enu_multistart,
    solve_fix,
    station_pairs,
    rank_candidates_by_power,
    refit_to_candidate,
    FixResult,
)

__all__ = [
    "GhostVerdict",
    "ghost_posterior",
    "solve_tdoa_enu",
    "solve_tdoa_enu_multistart",
    "solve_fix",
    "station_pairs",
    "rank_candidates_by_power",
    "refit_to_candidate",
    "FixResult",
]
