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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ffvd_tpu.ops.kernels import KernelParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HiddenLayerParams:
    """One hidden layer of a deep GP-SSM transition (model/deep.py).

    The reference parses ``--n_layers`` and builds per-layer ``Layer``
    objects (dgp_model.py:187-199), but its deep path is dead code:
    ``propagate`` (dgp_model.py:362-379) has no call site and the ELBO only
    reads ``self.layers[-1]``.  This is the live per-layer inducing set of
    the functional rebuild.  Shapes: u (M, D) whitened inducing outputs,
    z (M, D + U) inducing inputs (every layer re-ingests the control), and
    per-output-dim kernel hyperparameters like the head layer's.
    """

    u: jnp.ndarray
    z: jnp.ndarray
    kernel: KernelParams


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
    # Hidden layers of the deep transition, outermost first; () = the
    # single-layer GPSSM (every reference-parity configuration).  The head
    # GP (x/u/z/kernel above) is always the LAST layer.
    hidden: Tuple[HiddenLayerParams, ...] = ()

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
    def rchol(self) -> jnp.ndarray:
        """Full lower-triangular emission-noise Cholesky L, R = L·Lᵀ.

        Parameterization: diagonal stored in log (exponentiated here),
        strictly-lower triangle stored raw, upper triangle ignored.  For
        P=1 this reduces to exp(log_rchol), the reference's 1-D path
        (likelihoods.py:45-55).  The reference's multi-D branch builds the
        same lower-tri-plus-exp-diag matrix (likelihoods.py:56-61) but its
        ELBO never uses it correctly (dgp_model.py:250 indexes Rchols[0] —
        a Cholesky ROW — into the diagonal density); here full-R is a live,
        trainable emission model (elbo.py, emission_noise="full").
        """
        lower = jnp.tril(self.log_rchol, -1)
        return lower + jnp.diag(jnp.exp(jnp.diagonal(self.log_rchol)))

    @property
    def r_var_diag(self) -> jnp.ndarray:
        """Per-dimension marginal emission variances diag(R) = diag(L·Lᵀ).

        Equals rchol_diag² when the strictly-lower triangle is zero (every
        P=1 configuration), so diag-mode consumers can use it unchanged.
        """
        l = self.rchol
        return jnp.sum(l * l, axis=1)

    @property
    def p_dim(self) -> int:
        return self.c.shape[1]

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
    # log_rchol parameterization (see GPSSMParams.rchol): diagonal in log,
    # strictly-lower raw.  Taking elementwise log of a triangular Cholesky
    # would put -inf in the off-diagonals for P>1 warm starts.
    r_chol = np.atleast_2d(np.asarray(ws["R_chol_val"]))
    log_rchol = np.tril(r_chol, -1) + np.diag(np.log(np.diagonal(r_chol)))

    as_j = lambda a: jnp.asarray(a, dtype=dtype)
    return GPSSMParams(
        x=as_j(x), u=as_j(u), z=as_j(z),
        kernel=KernelParams(log_variance=as_j(log_var),
                            log_lengthscales=as_j(log_ls)),
        log_q=as_j(log_q), c=as_j(c), d=as_j(d), log_rchol=as_j(log_rchol),
    )


def adapt_warmstart_xdim(params: GPSSMParams, x_dim: int,
                         control_dim: int = 1, seed: int = 0) -> GPSSMParams:
    """Adapt a warm start (always D=4 in Factnonlin_ini) to another latent
    dimension (BASELINE config 4: x_dims ∈ {2,4,6}).

    Shrink: keep the leading x_dim latent dims everywhere (and the matching
    Z / lengthscale columns).  Grow: append fresh dims — zero latent states
    and inducing outputs, near-zero emission rows, mean kernel
    hyperparameters, Z columns sampled like the existing ones.  The
    reference has no such mechanism (its --x_dims flag is unusable,
    FFVD_Main.py:367).
    """
    import dataclasses
    d0 = params.x.shape[1]
    if x_dim == d0:
        return params
    if params.hidden:
        # Both branches rebuild GPSSMParams field-by-field; silently
        # returning hidden=() would drop trained deep layers (api.py would
        # then re-graft fresh ones).  Adapt BEFORE attaching hidden layers
        # (api.py orders it that way).
        raise ValueError("adapt the latent dimension before attaching deep "
                         "hidden layers (their u/z/kernel shapes are tied "
                         "to x_dim)")
    rng = np.random.RandomState(seed)
    dt = params.x.dtype
    if x_dim < d0:
        keep = np.arange(x_dim)
        cols = np.concatenate([keep, np.arange(d0, d0 + control_dim)])
        return GPSSMParams(
            x=params.x[:, keep],
            u=params.u[:, keep],
            z=params.z[:, cols],
            kernel=KernelParams(
                log_variance=params.kernel.log_variance[keep],
                log_lengthscales=params.kernel.log_lengthscales[
                    np.ix_(keep, cols)]),
            log_q=params.log_q[keep],
            c=params.c[keep, :],
            d=params.d,
            log_rchol=params.log_rchol)
    extra = x_dim - d0
    m = params.z.shape[0]
    n1 = params.x.shape[0]
    # new GP-input layout: [old latent dims | new latent dims | control]
    z_new_cols = jnp.asarray(rng.randn(m, extra), dt)
    z = jnp.concatenate([params.z[:, :d0], z_new_cols, params.z[:, d0:]],
                        axis=1)
    ls = params.kernel.log_lengthscales
    ls_mean = jnp.mean(ls, axis=(0, 1))
    ls_old = jnp.concatenate(
        [ls[:, :d0], jnp.full((d0, extra), ls_mean, dt), ls[:, d0:]], axis=1)
    ls_new = jnp.full((extra, x_dim + control_dim), ls_mean, dt)
    return GPSSMParams(
        x=jnp.concatenate([params.x, jnp.zeros((n1, extra), dt)], axis=1),
        u=jnp.concatenate([params.u, jnp.zeros((m, extra), dt)], axis=1),
        z=z,
        kernel=KernelParams(
            log_variance=jnp.concatenate(
                [params.kernel.log_variance,
                 jnp.full((extra,), jnp.mean(params.kernel.log_variance),
                          dt)]),
            log_lengthscales=jnp.concatenate([ls_old, ls_new], axis=0)),
        log_q=jnp.concatenate(
            [params.log_q, jnp.full((extra,), jnp.log(0.1), dt)]),
        c=jnp.concatenate(
            [params.c, 1e-3 * jnp.asarray(rng.randn(extra, params.c.shape[1]),
                                          dt)], axis=0),
        d=params.d,
        log_rchol=params.log_rchol)


def init_hidden_layers(key: jax.Array, n_hidden: int, head: GPSSMParams,
                       var_scale: float = 1.0) -> Tuple[HiddenLayerParams, ...]:
    """Initialize ``n_hidden`` deep-transition layers from a trained/warm
    head layer (see model/deep.py).

    Near-identity start: u = 0 makes every hidden layer's whitened
    conditional mean zero, so with the identity skip the deep transition
    equals the shallow one at initialization (plus the layer's predictive
    variance as inter-layer noise).  Inducing inputs copy the head's Z with
    a small jitter (they live in the same latent+control space); kernel
    hyperparameters copy the head's, with the signal variance multiplied by
    ``var_scale`` (σ²_hidden = var_scale·σ²_head).  var_scale < 1 shrinks
    the injected inter-layer noise at the start of training — the knob for
    the short/noisy-dataset regression study (PARITY §2b-deep: actuator).
    The reference has no deep initialization at all (its warm-start files
    are single-layer).
    """
    layers = []
    log_scale = jnp.log(jnp.asarray(var_scale,
                                    head.kernel.log_variance.dtype))
    for _ in range(n_hidden):
        key, kz = jax.random.split(key)
        z = head.z + 0.01 * jax.random.normal(kz, head.z.shape, head.z.dtype)
        layers.append(HiddenLayerParams(
            u=jnp.zeros_like(head.u),
            z=z,
            kernel=KernelParams(
                log_variance=head.kernel.log_variance + log_scale,
                log_lengthscales=head.kernel.log_lengthscales)))
    return tuple(layers)


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
        # diag in log (std √0.1), strictly-lower raw zeros (see .rchol)
        log_rchol=jnp.eye(p, dtype=dtype) * (0.5 * jnp.log(0.1)),
    )
