from gpscore.scoring.rules import (
    crps_gaussian,
    logs_gaussian,
    dss,
    energy_score,
    energy_score_core,
    energy_score_precision,
    dss_precision,
    interval_score,
    crps_kfold,
)

__all__ = [
    "crps_gaussian",
    "logs_gaussian",
    "dss",
    "energy_score",
    "energy_score_core",
    "energy_score_precision",
    "dss_precision",
    "interval_score",
    "crps_kfold",
]
