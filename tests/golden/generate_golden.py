"""Generate golden parity fixtures by executing the REFERENCE implementation.

This script imports the upstream TF code at $FFVD_REFERENCE_DIR (read-only)
and records, for each (dataset, collapse-mode):

- every nll term at the warm-start initialization (deterministic),
- gradients of the nll w.r.t. each parameter block,
- the cached-Cholesky whitened conditional mean/var at fixed query points,
- the collapsed q(U) posterior mean and covariance factor.

The fixtures (tests/golden/*.npz) are what tests/test_golden_parity.py checks
the JAX rebuild against in fp64.  tensorflow_probability is absent in this
image; a minimal stub provides the two distributions the reference's
particle-Gibbs graph constructor needs (Normal, Categorical).

Run:  python tests/golden/generate_golden.py
"""

import os
import sys
import types
from pathlib import Path

import numpy as np

REF = Path(os.environ.get("FFVD_REFERENCE_DIR", "/root/reference"))
OUT = Path(__file__).parent

import tensorflow as tf  # noqa: E402

tf.compat.v1.disable_eager_execution()


def _install_tfp_stub():
    tfp = types.ModuleType("tensorflow_probability")

    class Normal:
        def __init__(self, loc, scale):
            self.loc = tf.convert_to_tensor(loc, dtype=tf.float64)
            self.scale = scale

        def sample(self, n=None):
            shape = tf.shape(self.loc) if n is None else \
                tf.concat([[n], tf.shape(self.loc)], axis=0)
            return self.loc + self.scale * tf.random.normal(shape, dtype=tf.float64)

    class Categorical:
        def __init__(self, logits):
            self.logits = logits

        def sample(self, n=None):
            k = 1 if n is None else n
            draws = tf.random.categorical(self.logits[None, :], k)[0]
            return draws[0] if n is None else draws

    class Uniform:
        def __init__(self, low, high):
            self.low, self.high = low, high

        def sample(self, shape):
            return tf.random.uniform(shape, self.low, self.high, dtype=tf.float64)

    dists = types.ModuleType("tensorflow_probability.distributions")
    dists.Normal = Normal
    dists.Categorical = Categorical
    dists.Uniform = Uniform
    tfp.distributions = dists
    sys.modules["tensorflow_probability"] = tfp


_install_tfp_stub()

# The reference's quadrature.py does `from collections import Iterable`,
# removed in py3.10 (SURVEY.md §2.7) — alias it for the import to succeed.
import collections, collections.abc  # noqa: E402,E401
if not hasattr(collections, "Iterable"):
    collections.Iterable = collections.abc.Iterable

sys.path.insert(0, str(REF))

from vfegpssm.dgp_model import DGPSSM                      # noqa: E402
from vfegpssm.kernels_multi_output import SquaredExponential  # noqa: E402
from vfegpssm.likelihoods import Gaussian                  # noqa: E402
from vfegpssm import conditionals_multi_output as cmo      # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from ffvd_tpu.data import create_dataset, list_warmstarts   # noqa: E402


def build_and_record(dataset: str, file_id: int, u_collapse: bool,
                     hyperparameter_sampling: bool = False) -> dict:
    tf.compat.v1.reset_default_graph()
    ds = create_dataset(dataset)
    ws_path = list_warmstarts(dataset)[file_id]
    ws = dict(np.load(ws_path, allow_pickle=True))

    y_train = ds.y_train
    control = tf.convert_to_tensor(ds.control, dtype=tf.float64)
    x_dim = ws["qx1_mu_ini"].shape[0]
    din = ws["Z_val"].shape[1]
    m = ws["Z_val"].shape[0]

    kerns = [[SquaredExponential(
        din, ARD=True, variance=ws["kernel_variance"][k],
        lengthscales=ws["kernel_lengthscales"][k],
        kernel_optimization=True) for k in range(x_dim)]]

    if hyperparameter_sampling:
        # The upstream hs path is broken for every provided-value combination
        # (warm starts included, i.e. every FFVD_Main run): provided
        # CC/DD/RR_chol are used AS-IS (likelihoods.py:14-15,50-51) and
        # provided QQ_chol makes log_Q a plain tensor (dgp_model.py:176-178),
        # but generate_update_step then tf.assign's into them
        # (base_model.py:177-178) — plain tensors have no .assign.  The ONLY
        # working configuration is all-default likelihood/noise parameters
        # (CC=ones, DD=zeros, Rchols=0.1, log_Q=log 0.1), so the fixture uses
        # those; the parity test mirrors them (hyperparameter_sampling flag
        # in the fixture).
        cc = dd = rr = None
    else:
        cc = tf.convert_to_tensor(ws["C_val"].T, dtype=tf.float64)
        dd = tf.convert_to_tensor(ws["d_val"], dtype=tf.float64)
        rr = tf.convert_to_tensor(ws["R_chol_val"], dtype=tf.float64)
    lik = Gaussian(y_train.shape[1], x_dim, CC=cc, DD=dd, RR_chol=rr,
                   hyperparameter_sampling=hyperparameter_sampling,
                   likelihood_traning=True)

    x_train_ini = np.mean(ws["x_samples_training"], axis=1)

    model = DGPSSM(
        y_train, [x_dim], m, kerns, lik,
        minibatch_size=y_train.shape[0], window_size=64,
        prior_type="normal", full_cov=False,
        QQ_chol=None if hyperparameter_sampling else ws["Q_sqrt_ini"],
        ZZ=tf.convert_to_tensor(ws["Z_val"], dtype=tf.float64),
        variance=ws["kernel_variance"], lengthscales=ws["kernel_lengthscales"],
        control_inputs=control, kernel_type="SquaredExponential",
        kernel_train_flag=True, U_ini=ws["Umu_ini"].T,
        X_0_ini=ws["qx1_mu_ini"], X_train_ini=x_train_ini,
        X_PG=False, PG_particles=100,
        hyperparameter_sampling=hyperparameter_sampling,
        kernel_optimization=True, U_optimization=not u_collapse,
        U_collapse=u_collapse, Z_optimization=True,
        case_val=4 if u_collapse else 1)

    feed = {model.batch_placeholder: [0, model.X_N], model.adam_lr: 0.003}
    sess = model.session

    rec = {"dataset": dataset, "file_id": file_id, "ws_path": ws_path,
           "u_collapse": u_collapse,
           "hyperparameter_sampling": hyperparameter_sampling,
           "n_sghmc_vars": len(model.vars)}

    names = ["nll", "nll_log_likelihood", "nll_part_prior", "x_t_prior_Q",
             "nll_reg_trace_inverse_Q_B"]
    if u_collapse:
        names += ["later_term1", "later_term2"]
    for nm in names:
        rec[nm] = sess.run(getattr(model, nm), feed_dict=feed)

    layer = model.layers[-1]
    grads_of = {
        "x": layer.X, "u": layer.U, "z": layer.Z,
        "log_q": model.log_Q, "c": lik.CC, "d": lik.DD,
        "log_rchol": lik.log_Rchols,
        "log_variance_0": kerns[0][0].logvariance,
        "log_lengthscales_0": kerns[0][0].loglengthscales,
    }
    if u_collapse:
        grads_of.pop("u")  # U does not appear in the collapsed graph
    targets = list(grads_of.items())
    gs = tf.gradients(model.nll, [v for _, v in targets])
    for (nm, _), g in zip(targets, gs):
        rec[f"grad_{nm}"] = (np.zeros(0) if g is None
                             else sess.run(g, feed_dict=feed))

    # Deterministic conditional at fixed query points (rollout math parity).
    lm_inv_seq = cmo.kernel_pre_cal(layer.Z, layer.kernel)
    rng = np.random.RandomState(0)
    xq = rng.randn(7, din)
    xq_t = tf.convert_to_tensor(xq, dtype=tf.float64)
    f_mu, f_var = cmo.conditional_after_kernel_precalculation(
        lm_inv_seq, xq_t, layer.Z, layer.kernel, layer.U, white=True,
        full_cov=False, q_sqrt=None, return_Lm=False)
    rec["query_x"] = xq
    rec["cond_mu"] = sess.run(f_mu, feed_dict=feed)
    rec["cond_var"] = sess.run(f_var, feed_dict=feed)
    rec["lm_inverse"] = np.stack(sess.run(lm_inv_seq, feed_dict=feed))

    if u_collapse:
        xc = tf.concat((layer.X[:model.X_N - 1], control[:model.X_N - 1]),
                       axis=1)
        u_val, u_var_chol = cmo.collapse_u_mean_after_kernel_precalculation(
            lm_inv_seq, xc, layer.X, layer.Z, layer.kernel, model.Q)
        rec["u_post_mean"] = sess.run(u_val, feed_dict=feed)[0]
        rec["u_post_chol"] = sess.run(u_var_chol, feed_dict=feed)
    sess.close()
    return rec


def main():
    jobs = [("ballbeam", 3, True, False), ("ballbeam", 3, False, False),
            ("drive", 3, True, False), ("gas_furnace", 3, True, False),
            ("actuator", 3, False, False), ("dryer", 3, True, False),
            ("flutter", 3, False, False),
            # hyperparameter_sampling=True (dgp_model.py:241-243): pushes
            # log_Q, C, d, log_Rchol into the SGHMC set WITHOUT changing the
            # objective — the fixture pins both facts.
            ("ballbeam", 3, False, True)]
    for dataset, fid, collapse, hs in jobs:
        tag = ("c4" if collapse else "c1") + ("hs" if hs else "")
        rec = build_and_record(dataset, fid, collapse, hs)
        out = OUT / f"golden_{dataset}_{tag}.npz"
        np.savez_compressed(out, **rec)
        print(f"wrote {out}: nll={rec['nll']:.10f}")


if __name__ == "__main__":
    main()
