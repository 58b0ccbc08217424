"""Parameter pytree for the GPSSM and its warm-start initialization.

The reference scatters parameters across tf.Variables in ``DGPSSM``/``Layer``/
``Gaussian`` (dgp_model.py:56-69,177-185; likelihoods.py:14-61).  Here they
live in one flat, jit-friendly dataclass pytree.  Shapes (ballbeam defaults):

    x          (N+1, D) = (501, 4)   latent trajectory incl. x₀
    u          (M, D)   = (100, 4)   whitened inducing outputs
    z          (M, Din) = (100, 5)   inducing inputs, Din = D + control dim
    kernel     log-variance (D,), log-lengthscales (D, Din)
    log_q      (D,)                  process-noise log-variance
    c          (D, P)                emission matrix
    d          (P,)                  emission offset
    log_rchol  (P, P)                emission noise log-Cholesky
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ffvd_tpu.ops.kernels import KernelParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPSSMParams:
    x: jnp.ndarray
    u: jnp.ndarray
    z: jnp.ndarray
    kernel: KernelParams
    log_q: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray
    log_rchol: jnp.ndarray

    @property
    def q(self) -> jnp.ndarray:
        return jnp.exp(self.log_q)

    @property
    def rchol_diag(self) -> jnp.ndarray:
        """Emission noise std-devs (diagonal of exp-parameterized Cholesky).

        The reference's 1-D path stores a (1,1) log-Cholesky and indexes
        ``Rchols[0]`` (dgp_model.py:250); this is its P-dim generalization.
        """
        return jnp.exp(jnp.diagonal(self.log_rchol))

    @property
    def n_transitions(self) -> int:
        return self.x.shape[0] - 1

    @property
    def x_dim(self) -> int:
        return self.x.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SSMData:
    """Observed data: y (N, P) and control inputs (N_total, U); U may be 0.

    ``mask`` (N,), optional: 1.0 for real transitions, 0.0 for padding.  Used
    when several datasets of different lengths are padded to a common N and
    trained vmapped in one jit (BASELINE.md config 5); the ELBO then sums and
    normalizes over real steps only.
    """

    y: jnp.ndarray
    control: jnp.ndarray
    mask: Optional[jnp.ndarray] = None


def init_params_from_warmstart(ws: dict, dtype=jnp.float64) -> GPSSMParams:
    """Build params from a Factnonlin warm-start dict (see
    ffvd_tpu.data.warmstart.load_warmstart; key semantics follow
    FFVD_Main.py:212-256):

      x₀ = qx1_mu_ini, x₁..N = mean over the sample axis of
      x_samples_training; U = Umu_iniᵀ; log_q = 2·log Q_sqrt_ini;
      C = C_valᵀ; log R = log R_chol_val.
    """
    x0 = np.asarray(ws["qx1_mu_ini"])
    x_train = np.mean(np.asarray(ws["x_samples_training"]), axis=1)  # (N, D)
    x = np.concatenate([x0[None, :], x_train], axis=0)
    u = np.asarray(ws["Umu_ini"]).T
    z = np.asarray(ws["Z_val"])
    log_var = np.log(np.asarray(ws["kernel_variance"]))
    log_ls = np.log(np.asarray(ws["kernel_lengthscales"]))
    log_q = 2.0 * np.log(np.asarray(ws["Q_sqrt_ini"]))
    c = np.asarray(ws["C_val"]).T
    d = np.asarray(ws["d_val"])
    log_rchol = np.log(np.asarray(ws["R_chol_val"]))

    as_j = lambda a: jnp.asarray(a, dtype=dtype)
    return GPSSMParams(
        x=as_j(x), u=as_j(u), z=as_j(z),
        kernel=KernelParams(log_variance=as_j(log_var),
                            log_lengthscales=as_j(log_ls)),
        log_q=as_j(log_q), c=as_j(c), d=as_j(d), log_rchol=as_j(log_rchol),
    )


def init_params_random(key: jax.Array, n: int, x_dim: int, m: int,
                       control_dim: int, p: int = 1,
                       dtype=jnp.float64) -> GPSSMParams:
    """Cold-start initialization (the reference has no working cold start —
    warm-start npz is mandatory there; this fills the gap for new datasets)."""
    din = x_dim + control_dim
    keys = jax.random.split(key, 4)
    return GPSSMParams(
        x=0.1 * jax.random.normal(keys[0], (n + 1, x_dim), dtype=dtype),
        u=jnp.zeros((m, x_dim), dtype=dtype),
        z=jax.random.normal(keys[1], (m, din), dtype=dtype),
        kernel=KernelParams(
            log_variance=jnp.full((x_dim,), jnp.log(0.1), dtype=dtype),
            log_lengthscales=jnp.zeros((x_dim, din), dtype=dtype)),
        log_q=jnp.full((x_dim,), jnp.log(0.1), dtype=dtype),
        c=jnp.ones((x_dim, p), dtype=dtype),
        d=jnp.zeros((p,), dtype=dtype),
        log_rchol=jnp.full((p, p), 0.5 * jnp.log(0.1), dtype=dtype),
    )
