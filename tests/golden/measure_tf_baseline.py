"""Measure the TF reference's training wall-clock on this machine.

Times the reference's actual per-iteration protocol for ballbeam C4
(sghmc_step = 21 session.runs, here no-ops since the C4 SGHMC var list is
empty + train_hypers = 1 Adam step; models.py:146-168) and writes
tests/golden/baseline_timing.json used by bench.py's vs_baseline field.

Run:  python tests/golden/measure_tf_baseline.py
"""

import json
import time
from pathlib import Path

import numpy as np

import generate_golden as gg  # reuses the reference-import harness
import tensorflow as tf

OUT = Path(__file__).parent / "baseline_timing.json"


def measure(dataset="ballbeam", warmup=5, iters=50):
    import sys
    sys.modules.pop("vfegpssm", None)
    from ffvd_tpu.data import create_dataset, list_warmstarts
    from vfegpssm.dgp_model import DGPSSM  # noqa: F401 (import check)

    # Build exactly like generate_golden (C4 collapsed).
    rec_model = gg.build_and_record  # not used; we need the model itself
    # Re-implement the build minimally to keep the session open.
    tf.compat.v1.reset_default_graph()
    ds = create_dataset(dataset)
    ws_path = list_warmstarts(dataset)[3]
    ws = dict(np.load(ws_path, allow_pickle=True))
    from vfegpssm.kernels_multi_output import SquaredExponential
    from vfegpssm.likelihoods import Gaussian

    x_dim = ws["qx1_mu_ini"].shape[0]
    din = ws["Z_val"].shape[1]
    m = ws["Z_val"].shape[0]
    control = tf.convert_to_tensor(ds.control, dtype=tf.float64)
    kerns = [[SquaredExponential(din, ARD=True, variance=ws["kernel_variance"][k],
                                 lengthscales=ws["kernel_lengthscales"][k],
                                 kernel_optimization=True)
              for k in range(x_dim)]]
    lik = Gaussian(ds.y_train.shape[1], x_dim,
                   CC=tf.convert_to_tensor(ws["C_val"].T, dtype=tf.float64),
                   DD=tf.convert_to_tensor(ws["d_val"], dtype=tf.float64),
                   RR_chol=tf.convert_to_tensor(ws["R_chol_val"], dtype=tf.float64),
                   likelihood_traning=True)
    model = DGPSSM(
        ds.y_train, [x_dim], m, kerns, lik,
        minibatch_size=ds.y_train.shape[0], window_size=64,
        prior_type="normal", full_cov=False, QQ_chol=ws["Q_sqrt_ini"],
        ZZ=tf.convert_to_tensor(ws["Z_val"], dtype=tf.float64),
        variance=ws["kernel_variance"], lengthscales=ws["kernel_lengthscales"],
        control_inputs=control, kernel_type="SquaredExponential",
        kernel_train_flag=True, U_ini=ws["Umu_ini"].T,
        X_0_ini=ws["qx1_mu_ini"],
        X_train_ini=np.mean(ws["x_samples_training"], axis=1),
        X_PG=False, PG_particles=100, hyperparameter_sampling=False,
        kernel_optimization=True, U_optimization=False, U_collapse=True,
        Z_optimization=True, case_val=4)

    for _ in range(warmup):
        model.sghmc_step()
        model.train_hypers()
    t0 = time.time()
    for _ in range(iters):
        model.sghmc_step()
        model.train_hypers()
    dt = time.time() - t0
    model.session.close()
    return dt / iters


def main():
    sec_per_iter = measure()
    rec = {
        "dataset": "ballbeam", "case": "C4",
        "tf_sec_per_iteration": sec_per_iter,
        "tf_iters_per_sec": 1.0 / sec_per_iter,
        "tf_time_2000_cli_iters_sec": sec_per_iter * 4000,
        "note": ("reference protocol per outer iteration: sghmc_step "
                 "(21 session.runs; empty var list in C4) + train_hypers "
                 "(1 Adam step); CLI --iterations 2000 means 4000 outer "
                 "iterations (models.py:142)"),
        "hardware": "container CPU (same host as JAX benchmarks)",
    }
    OUT.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
