from ad_mpc_tpu.learned.gp import GPParams, fit_gp, predict_mean, predict_var
from ad_mpc_tpu.learned.ensemble import (
    GPEnsemble,
    quad_residual_fn,
    select_cluster,
)
from ad_mpc_tpu.learned.rdrv import fit_rdrv
from ad_mpc_tpu.learned.dataset import ResidualDataset

__all__ = [
    "GPParams",
    "fit_gp",
    "predict_mean",
    "predict_var",
    "GPEnsemble",
    "select_cluster",
    "quad_residual_fn",
    "fit_rdrv",
    "ResidualDataset",
]
