from gpscore.metrics.evaluation import (
    mse,
    smse,
    msll,
    coverage95,
    evaluate_predictive,
    EvalMetrics,
)

__all__ = ["mse", "smse", "msll", "coverage95", "evaluate_predictive", "EvalMetrics"]
