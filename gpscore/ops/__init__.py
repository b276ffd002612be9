from gpscore.ops.kernels import rbf_gram, ard_gram, gram, kernel_diag
from gpscore.ops.block_cholesky import blocked_cholesky
from gpscore.ops.linalg import (
    chol_factor,
    chol_solve,
    safe_cholesky,
    spd_inverse,
    inv_diag_from_chol,
    half_logdet,
    symmetric_sqrt,
    tri_solve,
)

__all__ = [
    "blocked_cholesky",
    "rbf_gram",
    "ard_gram",
    "gram",
    "kernel_diag",
    "chol_factor",
    "chol_solve",
    "safe_cholesky",
    "spd_inverse",
    "inv_diag_from_chol",
    "half_logdet",
    "symmetric_sqrt",
    "tri_solve",
]
