from ffvd_tpu.ops.kernels import (
    KernelParams,
    se_gram,
    se_cross,
    se_diag,
    linear_gram,
    linear_cross,
    linear_diag,
    gram,
    cross,
    diag,
)
from ffvd_tpu.ops.densities import (
    logdensity_norm_diag,
    logdensity_norm_diag_nonvec,
    logdensity_norm,
)
from ffvd_tpu.ops.chol import psd_cholesky, tri_solve, chol_logdet, chol_solve

__all__ = [
    "KernelParams", "se_gram", "se_cross", "se_diag",
    "linear_gram", "linear_cross", "linear_diag", "gram", "cross", "diag",
    "logdensity_norm_diag", "logdensity_norm_diag_nonvec", "logdensity_norm",
    "psd_cholesky", "tri_solve", "chol_logdet", "chol_solve",
]
