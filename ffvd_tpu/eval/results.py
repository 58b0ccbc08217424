"""Results checkpoint writer, interop-compatible with the reference.

Writes the exact key schema of the reference's end-of-run npz
(base_model.py:512-517) so downstream analysis written against the TF
implementation keeps working on our outputs.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ffvd_tpu.model.params import GPSSMParams


def save_results_npz(path, *, params: GPSSMParams, fit_y, predict_y,
                     predict_y_var, y_test, y_train, y_train_std: float,
                     case: str, ll_seq: Sequence[float] = (0.0,),
                     running_time_seq: Sequence[float] = (0.0,),
                     pg_num: Optional[int] = None,
                     mc_posterior_samples=()):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    p = params
    # Deep transitions (model/deep.py): hidden layers have no reference key
    # schema — saved under an ffvd_tpu-only prefix.
    hidden_kw = {}
    for i, layer in enumerate(p.hidden):
        hidden_kw[f"hidden{i}_U_val"] = np.asarray(layer.u)
        hidden_kw[f"hidden{i}_Z_val"] = np.asarray(layer.z)
        hidden_kw[f"hidden{i}_k_lengthscales"] = np.asarray(
            layer.kernel.log_lengthscales)
        hidden_kw[f"hidden{i}_k_log_variances"] = np.asarray(
            layer.kernel.log_variance)
    np.savez_compressed(
        path,
        **hidden_kw,
        y_train_vfe=np.asarray(fit_y).reshape(-1),
        y_test_vfe=np.asarray(predict_y).reshape(-1),
        v_test_vfe_var=np.asarray(predict_y_var).reshape(-1),
        Y_test_data=np.asarray(y_test),
        Y_train_data=np.asarray(y_train),
        Y_train_std=y_train_std,
        CC_val=np.asarray(p.c),
        DD_val=np.asarray(p.d),
        log_R_cholesky=np.asarray(p.log_rchol),
        log_QQ=np.asarray(p.log_q),
        Z_val=np.asarray(p.z),
        U_val=np.asarray(p.u),
        X_val=np.asarray(p.x[1:]),
        k_lengthscales=np.asarray(p.kernel.log_lengthscales),
        k_log_variances=np.asarray(p.kernel.log_variance),
        case=case,
        ll_seq=np.asarray(ll_seq),
        running_time_seq=np.asarray(running_time_seq),
        PG_num=pg_num if pg_num is not None else 0,
        mc_posterior_samples=np.asarray(mc_posterior_samples, dtype=object)
        if len(mc_posterior_samples) else np.zeros(0),
    )
    return path
