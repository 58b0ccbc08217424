"""Golden fixture for standalone reference FUNCTIONS (no model graph):

- ``logdensity_norm`` (likelihoods.py:114-127): full-Cholesky Normal log
  density — the reference ships it but never wires it into a working P>1
  ELBO (dgp_model.py:250 indexes Rchols[0], a Cholesky row, into the diag
  density); the rebuild makes it a live emission path, so parity is pinned
  at the function level.
- ``Bernoulli.variational_expectations`` / ``predict_mean_and_var`` /
  ``predict_density`` (likelihoods.py:134-186): probit-Bernoulli with
  20-point Gauss-Hermite quadrature.

Writes tests/golden/func_ref_golden.npz (named OUTSIDE the golden_*.npz glob
that conftest feeds to the model-level parity tests), consumed by
tests/test_multidim_emission.py.

Run:  python tests/golden/generate_func_golden.py
"""

from pathlib import Path

import numpy as np

import generate_golden  # noqa: F401  (installs tfp stub + reference path)
import tensorflow as tf

from vfegpssm.likelihoods import Bernoulli, logdensity_norm  # noqa: E402

OUT = Path(__file__).parent / "func_ref_golden.npz"


def main():
    rng = np.random.RandomState(42)
    rec = {}

    # --- full-Cholesky Normal log density (P=3, N=11) ---
    n, p = 11, 3
    y = rng.randn(n, p)
    ymean = rng.randn(n, p)
    rchol = np.tril(rng.randn(p, p))
    rchol[np.diag_indices(p)] = np.exp(0.3 * rng.randn(p))  # positive diag
    rec["ldn_y"], rec["ldn_ymean"], rec["ldn_rchol"] = y, ymean, rchol
    with tf.compat.v1.Session() as sess:
        rec["ldn_out"] = sess.run(logdensity_norm(
            tf.constant(y), tf.constant(ymean), tf.constant(rchol)))

    # --- probit-Bernoulli (GH-20) ---
    fmu = rng.randn(9, 2)
    fvar = np.exp(rng.randn(9, 2))
    yb = (rng.rand(9, 2) < 0.5).astype(np.float64)
    rec["bern_fmu"], rec["bern_fvar"], rec["bern_y"] = fmu, fvar, yb
    lik = Bernoulli()
    with tf.compat.v1.Session() as sess:
        rec["bern_ve"] = sess.run(lik.variational_expectations(
            tf.constant(fmu), tf.constant(fvar), tf.constant(yb)))
        pm, pv = lik.predict_mean_and_var(tf.constant(fmu), tf.constant(fvar))
        rec["bern_pmean"], rec["bern_pvar"] = sess.run([pm, pv])
        rec["bern_pdens"] = sess.run(lik.predict_density(
            tf.constant(fmu), tf.constant(fvar), tf.constant(yb)))

    np.savez_compressed(OUT, **rec)
    print(f"wrote {OUT}: ldn_out[0]={rec['ldn_out'][0]:.12f} "
          f"bern_ve[0,0]={rec['bern_ve'][0, 0]:.12f}")


if __name__ == "__main__":
    main()
