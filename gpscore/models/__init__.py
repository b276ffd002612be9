from gpscore.models.exact import (
    exact_predictive,
    loo_exact,
    kfold_exact,
    nlml_exact,
)
from gpscore.models.fitc import (
    FITCTerms,
    fitc_terms,
    fitc_predictive,
    loo_fitc,
    kfold_fitc,
    nlml_fitc,
)

__all__ = [
    "exact_predictive",
    "loo_exact",
    "kfold_exact",
    "nlml_exact",
    "FITCTerms",
    "fitc_terms",
    "fitc_predictive",
    "loo_fitc",
    "kfold_fitc",
    "nlml_fitc",
]
