from gpscore.fit.objectives import make_objective, OBJECTIVE_RULES
from gpscore.fit.train import fit_gd, fit_optax, FitResult
from gpscore.fit.schedules import Schedule, SCHEDULES, get_schedule

__all__ = [
    "make_objective",
    "OBJECTIVE_RULES",
    "fit_gd",
    "fit_optax",
    "FitResult",
    "Schedule",
    "SCHEDULES",
    "get_schedule",
]
