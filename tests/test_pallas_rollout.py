"""Pallas fused-rollout kernel vs the lax.scan oracle (interpret mode on CPU).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.model.conditionals import kernel_precal
from ffvd_tpu.ops.pallas_rollout import pallas_rollout
from tests.test_model_props import small_model

# heavy compile/e2e module: excluded from the `-m quick` tier
pytestmark = pytest.mark.slow

rng = np.random.RandomState(11)


def scan_rollout_zero_noise(kparams, z, lm_inv, u_val, q_sqrt, q, x0,
                            controls):
    """fp32 lax.scan rollout with noise off — the oracle."""
    from ffvd_tpu.model.conditionals import Precal, whitened_conditional
    pre = Precal(lm=jnp.zeros_like(lm_inv), lm_inv=lm_inv)

    def step(x_t, ctrl):
        xc = jnp.concatenate([x_t, ctrl])[None, :]
        mu, var = whitened_conditional("SquaredExponential", kparams, pre,
                                       z, u_val, xc, q_sqrt=q_sqrt)
        var_tot = var[0] + q
        x_next = x_t + mu[0]
        return x_next, (x_next, var_tot)

    _, (xs, vs) = jax.lax.scan(step, x0, controls)
    return xs, vs


@pytest.mark.parametrize("with_qsqrt", [False, True])
def test_pallas_rollout_matches_scan_zero_noise(with_qsqrt):
    params, data = small_model(n=12, m=8, d=2)
    f32 = jnp.float32
    kp = jax.tree.map(lambda a: a.astype(f32), params.kernel)
    z = params.z.astype(f32)
    pre = kernel_precal("SquaredExponential", kp, z, 1e-5)
    u_val = params.u.astype(f32)
    q = params.q.astype(f32)
    x0 = params.x[-1].astype(f32)
    controls = data.control[:7].astype(f32)
    if with_qsqrt:
        ls = np.stack([np.triu(rng.rand(8, 8) * 0.2 + 0.05 * np.eye(8))
                       for _ in range(2)]).astype(np.float32)
        q_sqrt = jnp.asarray(ls)
    else:
        q_sqrt = None

    xs_p, vs_p = pallas_rollout(kp, z, pre.lm_inv, u_val, q_sqrt, q, x0,
                                controls, seed=0, num_samples=3,
                                zero_noise=True, interpret=True)
    xs_s, vs_s = scan_rollout_zero_noise(kp, z, pre.lm_inv, u_val, q_sqrt,
                                         q, x0, controls)
    for s in range(3):
        np.testing.assert_allclose(np.asarray(xs_p[s]), np.asarray(xs_s),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(vs_p[s]), np.asarray(vs_s),
                                   rtol=2e-4, atol=2e-5)


def test_bits_to_normal_is_standard_normal():
    """Box-Muller transform on genuine uniform bits → N(0,1).  (The Mosaic
    interpreter stubs the on-chip PRNG with zeros, so the real-noise rollout
    statistics are validated on hardware — see scripts in tests/golden; here
    the transform itself is checked on CPU with numpy-generated bits.)"""
    from ffvd_tpu.ops.pallas_rollout import bits_to_normal
    n = 200_000
    b1 = jnp.asarray(rng.randint(0, 2**32, size=n, dtype=np.uint64)
                     .astype(np.uint32))
    b2 = jnp.asarray(rng.randint(0, 2**32, size=n, dtype=np.uint64)
                     .astype(np.uint32))
    z = np.asarray(bits_to_normal(b1, b2))
    assert abs(z.mean()) < 0.01
    np.testing.assert_allclose(z.std(), 1.0, rtol=0.01)
    # tail sanity: P(|z|>2) ≈ 4.55%
    np.testing.assert_allclose(np.mean(np.abs(z) > 2), 0.0455, rtol=0.1)
