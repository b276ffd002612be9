from gpscore.fit.objectives import make_objective, OBJECTIVE_RULES
from gpscore.fit.train import (
    FitResult,
    auto_recover_mode,
    fit_gd,
    fit_gd_recovering,
    fit_optax,
    objective_family,
)
from gpscore.fit.schedules import Schedule, SCHEDULES, get_schedule

__all__ = [
    "make_objective",
    "OBJECTIVE_RULES",
    "fit_gd",
    "fit_gd_recovering",
    "auto_recover_mode",
    "objective_family",
    "fit_optax",
    "FitResult",
    "Schedule",
    "SCHEDULES",
    "get_schedule",
]
