from gpscore.models.exact import (
    Gaussian,
    PrecisionGaussian,
    exact_predictive,
    loo_exact,
    kfold_exact,
    kfold_exact_precision,
    nlml_exact,
)
from gpscore.models.fitc import (
    FITCTerms,
    fitc_terms,
    fitc_predictive,
    loo_fitc,
    kfold_fitc,
    kfold_fitc_precision,
    nlml_fitc,
)

__all__ = [
    "Gaussian",
    "PrecisionGaussian",
    "exact_predictive",
    "loo_exact",
    "kfold_exact",
    "kfold_exact_precision",
    "nlml_exact",
    "FITCTerms",
    "fitc_terms",
    "fitc_predictive",
    "loo_fitc",
    "kfold_fitc",
    "kfold_fitc_precision",
    "nlml_fitc",
]
