from gpscore.parallel.mesh import make_mesh, batch_sharding, replicated
from gpscore.parallel.sharded_gram import sharded_gram
from gpscore.parallel.sharded_cholesky import (
    sharded_cholesky,
    sharded_half_logdet,
    sharded_nlml,
    sharded_tri_solve_lower,
)
from gpscore.parallel.sharded_fold_stream import (
    make_sharded_streamed_fold_es,
    make_sharded_streamed_fold_stats,
    make_sharded_streamed_kfold_fit_step,
)
from gpscore.parallel.sharded_kfold import (
    make_sharded_fused_kfold_fit_step,
    make_sharded_kfold_blocks,
    make_sharded_kfold_fit_step,
)
from gpscore.parallel.sharded_loo import (
    make_sharded_fused_loo_fit_step,
    make_sharded_fused_nlml_fit_step,
    make_sharded_loo_fit_step,
    make_sharded_loo_solve_diag,
    sharded_loo_fit_step,
    sharded_loo_moments,
    sharded_loo_value_and_grad,
)
from gpscore.parallel.sweeps import restart_sweep, sharded_restart_sweep

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "sharded_gram",
    "sharded_cholesky",
    "sharded_half_logdet",
    "sharded_nlml",
    "sharded_tri_solve_lower",
    "make_sharded_fused_kfold_fit_step",
    "make_sharded_kfold_blocks",
    "make_sharded_kfold_fit_step",
    "make_sharded_streamed_fold_es",
    "make_sharded_streamed_fold_stats",
    "make_sharded_streamed_kfold_fit_step",
    "make_sharded_fused_loo_fit_step",
    "make_sharded_fused_nlml_fit_step",
    "make_sharded_loo_fit_step",
    "make_sharded_loo_solve_diag",
    "sharded_loo_fit_step",
    "sharded_loo_moments",
    "sharded_loo_value_and_grad",
    "restart_sweep",
    "sharded_restart_sweep",
]
