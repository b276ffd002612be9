from gpscore.utils.params import GPParams, init_unit_params, init_rand_params
from gpscore.utils.precision import MM_PRECISION, matmul, default_dtype

__all__ = [
    "GPParams",
    "init_unit_params",
    "init_rand_params",
    "MM_PRECISION",
    "matmul",
    "default_dtype",
]
