from gpscore.utils.params import GPParams, init_unit_params, init_rand_params
from gpscore.utils.precision import MM_PRECISION, matmul, default_dtype
from gpscore.utils.checkpoint import save_pytree, load_pytree, save_metrics, load_metrics
from gpscore.utils.profiling import timed, trace

__all__ = [
    "GPParams",
    "init_unit_params",
    "init_rand_params",
    "MM_PRECISION",
    "matmul",
    "default_dtype",
    "save_pytree",
    "load_pytree",
    "save_metrics",
    "load_metrics",
    "timed",
    "trace",
]
