"""Golden-value parity against the TF reference implementation.

Fixtures in tests/golden/*.npz were produced by generate_golden.py executing
the actual upstream code (dgp_model.py ELBO assembly, conditionals, collapse).
Every nll term, every parameter-block gradient, the cached-Cholesky
conditional and the collapsed q(U) posterior must match in fp64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.data import create_dataset, list_warmstarts
from ffvd_tpu.model.conditionals import (collapsed_u_posterior, kernel_precal,
                                         whitened_conditional)
from ffvd_tpu.model.elbo import elbo_terms, negative_elbo
from ffvd_tpu.model.params import SSMData, init_params_from_warmstart

# fp64 parity: the reference uses LU (tf.linalg.solve/logdet) where we use
# Cholesky for the same PD systems, so agreement is to roundoff-accumulation
# (~1e-8 relative), not bitwise.
RTOL = 5e-7
ATOL = 1e-9

_jit_elbo_terms = jax.jit(elbo_terms,
                          static_argnames=("kernel_type", "prior_type",
                                           "u_collapse", "jitter"))
_jit_grad = jax.jit(jax.grad(negative_elbo),
                    static_argnames=("kernel_type", "prior_type",
                                     "u_collapse", "jitter"))

TERMS = ["nll", "nll_log_likelihood", "nll_part_prior", "x_t_prior_Q",
         "nll_reg_trace_inverse_Q_B", "later_term1", "later_term2"]


def setup_case(golden):
    name = str(golden["dataset"])
    ds = create_dataset(name)
    ws_path = list_warmstarts(name)[int(golden["file_id"])]
    ws = dict(np.load(ws_path, allow_pickle=True))
    params = init_params_from_warmstart(ws)
    if bool(golden.get("hyperparameter_sampling", False)):
        # hs fixtures use the reference's default likelihood/noise values —
        # the only configuration where its hs path builds at all (provided
        # CC/DD/RR_chol/QQ_chol are plain tensors there and
        # generate_update_step's tf.assign crashes; see generate_golden.py).
        import dataclasses
        d, p = params.x.shape[1], params.c.shape[1]
        params = dataclasses.replace(
            params,
            log_q=jnp.full((d,), jnp.log(0.1)),
            c=jnp.ones((d, p)),
            d=jnp.zeros((p,)),
            log_rchol=jnp.full((p, p), jnp.log(0.1)))
    data = SSMData(y=jnp.asarray(ds.y_train), control=jnp.asarray(ds.control))
    collapse = bool(golden["u_collapse"])
    return params, data, collapse


def test_elbo_terms_match(golden):
    params, data, collapse = setup_case(golden)
    terms = _jit_elbo_terms(params, data, u_collapse=collapse)
    for name in TERMS:
        if name not in golden or (name.startswith("later") and not collapse):
            continue
        ours = float(terms[name])
        ref = float(golden[name])
        np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL,
                                   err_msg=f"term {name}")


def test_gradients_match(golden):
    params, data, collapse = setup_case(golden)
    grads = _jit_grad(params, data, u_collapse=collapse)
    pairs = {
        "grad_x": grads.x, "grad_z": grads.z, "grad_log_q": grads.log_q,
        "grad_c": grads.c, "grad_d": grads.d,
        "grad_log_rchol": grads.log_rchol,
        "grad_log_variance_0": grads.kernel.log_variance[0],
        "grad_log_lengthscales_0": grads.kernel.log_lengthscales[0],
    }
    if not collapse:
        pairs["grad_u"] = grads.u
    for name, ours in pairs.items():
        ref = golden[name]
        if ref.size == 0:  # TF returned None gradient (disconnected)
            continue
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-7,
                                   atol=1e-9, err_msg=name)


@pytest.mark.slow
def test_cached_conditional_matches(golden):
    params, data, collapse = setup_case(golden)
    pre = kernel_precal("SquaredExponential", params.kernel, params.z)
    # The reference caches Lm^{-T}; ours caches Lm^{-1}.
    np.testing.assert_allclose(
        np.asarray(pre.lm_inv), np.transpose(golden["lm_inverse"], (0, 2, 1)),
        rtol=1e-8, atol=1e-8)
    xq = jnp.asarray(golden["query_x"])
    mu, var = whitened_conditional("SquaredExponential", params.kernel, pre,
                                   params.z, params.u, xq)
    np.testing.assert_allclose(np.asarray(mu), golden["cond_mu"],
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), golden["cond_var"],
                               rtol=1e-8, atol=1e-10)


def test_collapsed_u_posterior_matches(golden):
    params, data, collapse = setup_case(golden)
    if not collapse:
        pytest.skip("collapse fixtures only")
    pre = kernel_precal("SquaredExponential", params.kernel, params.z)
    n = params.n_transitions
    xc = jnp.concatenate([params.x[:n], data.control[:n]], axis=1)
    u_mean, q_sqrt = collapsed_u_posterior(
        "SquaredExponential", params.kernel, pre, params.z, params.x, xc,
        params.q)
    np.testing.assert_allclose(np.asarray(u_mean), golden["u_post_mean"],
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(q_sqrt), golden["u_post_chol"],
                               rtol=1e-7, atol=1e-9)


@pytest.mark.slow
def test_fp32_elbo_consistent_with_fp64():
    """Precision regression guard: the fp32 (TPU production) objective must
    track the fp64 (parity) objective to ~1e-4 relative at the warm start."""
    ds = create_dataset("ballbeam")
    ws = dict(np.load(list_warmstarts("ballbeam")[3], allow_pickle=True))
    p64 = init_params_from_warmstart(ws, dtype=jnp.float64)
    p32 = init_params_from_warmstart(ws, dtype=jnp.float32)
    d64 = SSMData(y=jnp.asarray(ds.y_train, jnp.float64),
                  control=jnp.asarray(ds.control, jnp.float64))
    d32 = SSMData(y=jnp.asarray(ds.y_train, jnp.float32),
                  control=jnp.asarray(ds.control, jnp.float32))
    for collapse in (True, False):
        t64 = elbo_terms(p64, d64, u_collapse=collapse)
        t32 = elbo_terms(p32, d32, u_collapse=collapse)
        for k in t64:
            np.testing.assert_allclose(float(t32[k]), float(t64[k]),
                                       rtol=2e-4, atol=1e-5, err_msg=k)
