"""Unit tests for ops: kernels, densities, cholesky, quadrature.

Closed-form / naive-numpy cross-checks (SURVEY.md §4 rebuild test plan #1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import norm

from ffvd_tpu.ops import (KernelParams, se_gram, se_cross, se_diag,
                          linear_gram, linear_cross, linear_diag,
                          logdensity_norm, logdensity_norm_diag,
                          logdensity_norm_diag_nonvec,
                          psd_cholesky, chol_solve, chol_logdet)
from ffvd_tpu.ops.densities import LOG_2PI_HALF
from ffvd_tpu.ops.quadrature import hermgauss, mvhermgauss, ndiagquad

rng = np.random.RandomState(42)


def naive_se(x, z, var, ls):
    out = np.zeros((x.shape[0], z.shape[0]))
    for i in range(x.shape[0]):
        for j in range(z.shape[0]):
            r2 = np.sum(((x[i] - z[j]) / ls) ** 2)
            out[i, j] = var * np.exp(-0.5 * r2)
    return out


@pytest.fixture
def kp():
    d, din = 3, 5
    return KernelParams(
        log_variance=jnp.asarray(np.log(rng.rand(d) + 0.1)),
        log_lengthscales=jnp.asarray(np.log(rng.rand(d, din) + 0.5)))


def test_se_cross_matches_naive(kp):
    x = rng.randn(7, 5)
    z = rng.randn(4, 5)
    k = se_cross(kp, jnp.asarray(x), jnp.asarray(z))
    for d in range(3):
        expected = naive_se(x, z, np.exp(kp.log_variance[d]),
                            np.exp(kp.log_lengthscales[d]))
        np.testing.assert_allclose(np.asarray(k[d]), expected, rtol=1e-10)


def test_se_gram_symmetric_unit_diag(kp):
    x = rng.randn(6, 5)
    k = se_gram(kp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(k), np.asarray(k).transpose(0, 2, 1),
                               atol=1e-12)
    for d in range(3):
        np.testing.assert_allclose(np.diagonal(k[d]),
                                   np.exp(kp.log_variance[d]), rtol=1e-9)
    kd = se_diag(kp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(kd),
                               np.exp(kp.log_variance)[:, None]
                               * np.ones((3, 6)), rtol=1e-12)


def test_linear_kernel(kp):
    x = rng.randn(6, 5)
    z = rng.randn(3, 5)
    k = linear_cross(kp, jnp.asarray(x), jnp.asarray(z))
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(k[d]), np.exp(kp.log_variance[d]) * x @ z.T, rtol=1e-10)
    kd = linear_diag(kp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(kd[1]),
                               np.exp(kp.log_variance[1]) * np.sum(x**2, 1),
                               rtol=1e-10)
    kg = linear_gram(kp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(kg[0]),
                               np.exp(kp.log_variance[0]) * x @ x.T, rtol=1e-10)


def test_densities_vs_scipy():
    y = rng.randn(8, 3)
    mu = rng.randn(8, 3)
    sig = rng.rand(3) + 0.3
    ours = logdensity_norm_diag(jnp.asarray(y), jnp.asarray(mu),
                                jnp.asarray(sig))
    # reference-style density omits the 2π constant per dim
    expected = norm.logpdf(y, mu, sig).sum(axis=1) + 3 * LOG_2PI_HALF
    np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-9)

    ours_nv = logdensity_norm_diag_nonvec(jnp.asarray(y), jnp.asarray(mu),
                                          jnp.asarray(sig))
    np.testing.assert_allclose(np.asarray(ours_nv).sum(axis=1),
                               np.asarray(ours), rtol=1e-9)


def test_density_full_chol_vs_diag():
    y = rng.randn(5, 2)
    mu = rng.randn(5, 2)
    sig = rng.rand(2) + 0.3
    full = logdensity_norm(jnp.asarray(y), jnp.asarray(mu),
                           jnp.asarray(np.diag(sig)))
    diag = logdensity_norm_diag(jnp.asarray(y), jnp.asarray(mu),
                                jnp.asarray(sig))
    np.testing.assert_allclose(np.asarray(full), np.asarray(diag), rtol=1e-9)


def test_psd_cholesky_retry():
    a = rng.randn(4, 4)
    psd = a @ a.T + 4 * np.eye(4)
    # batch: one healthy, one slightly indefinite (needs the retry jitter)
    sick = psd - (np.linalg.eigvalsh(psd)[0] + 1e-6) * np.eye(4)
    batch = jnp.asarray(np.stack([psd, sick]))
    chol = psd_cholesky(batch, retry_jitter=1e-2)
    assert bool(jnp.isfinite(chol).all())
    np.testing.assert_allclose(np.asarray(chol[0] @ chol[0].T), psd,
                               rtol=1e-9, atol=1e-9)


def test_chol_solve_logdet():
    a = rng.randn(6, 6)
    psd = a @ a.T + 6 * np.eye(6)
    b = rng.randn(6, 2)
    chol = psd_cholesky(jnp.asarray(psd)[None])[0]
    x = chol_solve(chol, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(psd, b),
                               rtol=1e-8)
    np.testing.assert_allclose(float(chol_logdet(chol)),
                               np.linalg.slogdet(psd)[1], rtol=1e-10)


def test_gauss_hermite_moments():
    mu, var = 0.7, 1.3
    e_x = ndiagquad(lambda f: f, 30, jnp.asarray([[mu]]), jnp.asarray([[var]]))
    e_x2 = ndiagquad(lambda f: f * f, 30, jnp.asarray([[mu]]),
                     jnp.asarray([[var]]))
    np.testing.assert_allclose(float(e_x[0, 0]), mu, rtol=1e-10)
    np.testing.assert_allclose(float(e_x2[0, 0]), var + mu**2, rtol=1e-10)


def test_mvhermgauss_shapes():
    x, w = mvhermgauss(5, 3)
    assert x.shape == (125, 3) and w.shape == (125,)
    xs, ws = hermgauss(7)
    assert xs.shape == (7,) and abs(ws.sum() - np.sqrt(np.pi)) < 1e-10


@pytest.mark.slow
def test_chol_and_inv_matches_builtin_grads():
    from ffvd_tpu.ops.chol import chol_and_inv
    a = rng.randn(3, 7, 7)
    psd = jnp.asarray(np.einsum('bij,bkj->bik', a, a) + 7 * np.eye(7))
    w1 = jnp.asarray(rng.randn(3, 7, 7))
    w2 = jnp.asarray(rng.randn(3, 7, 7))

    def f_custom(m):
        l, linv = chol_and_inv(m)
        return jnp.sum(jnp.sin(l) * w1) + jnp.sum(jnp.cos(linv) * w2)

    def f_builtin(m):
        l = jnp.linalg.cholesky(m)
        linv = jax.scipy.linalg.solve_triangular(
            l, jnp.broadcast_to(jnp.eye(7, dtype=m.dtype), l.shape),
            lower=True)
        return jnp.sum(jnp.sin(l) * w1) + jnp.sum(jnp.cos(linv) * w2)

    np.testing.assert_allclose(float(f_custom(psd)), float(f_builtin(psd)),
                               rtol=1e-12)
    g1 = jax.grad(f_custom)(psd)
    g2 = jax.grad(f_builtin)(psd)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8,
                               atol=1e-10)


@pytest.mark.slow
def test_chol_and_inv_retry_path():
    from ffvd_tpu.ops.chol import chol_and_inv
    a = rng.randn(5, 5)
    psd = a @ a.T + 5 * np.eye(5)
    sick = psd - (np.linalg.eigvalsh(psd)[0] + 1e-9) * np.eye(5)
    l, linv = chol_and_inv(jnp.asarray(sick)[None], 1e-2)
    assert bool(jnp.isfinite(l).all()) and bool(jnp.isfinite(linv).all())
    g = jax.grad(lambda m: jnp.sum(chol_and_inv(m, 1e-2)[1]))(
        jnp.asarray(sick)[None])
    assert bool(jnp.isfinite(g).all())


def test_ndiag_mc_converges_to_quadrature():
    from ffvd_tpu.ops.quadrature import ndiag_mc
    mu = jnp.asarray([[0.4]])
    var = jnp.asarray([[0.9]])
    exact = ndiagquad(lambda f: f * f, 40, mu, var)
    mc = ndiag_mc(lambda f: f * f, 20000, mu, var, jax.random.key(0))
    np.testing.assert_allclose(float(mc[0, 0]), float(exact[0, 0]), rtol=0.05)


def test_mvnquad_matches_diag_case():
    from ffvd_tpu.ops.quadrature import mvnquad
    means = jnp.asarray(rng.randn(4, 2))
    d = jnp.asarray(rng.rand(4, 2) + 0.3)
    covs = jax.vmap(jnp.diag)(d)
    out = mvnquad(lambda x: jnp.sum(x * x, axis=-1), means, covs, 12, 2)
    expected = jnp.sum(d + means * means, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-8)


def _collect_prims(jaxpr, out):
    """Recursively collect primitive names, NOT descending into cond
    branches (so retry work hidden behind a real branch isn't counted)."""
    for eqn in jaxpr.eqns:
        out.append(eqn.primitive.name)
        if eqn.primitive.name == "cond":
            continue
        for v in eqn.params.values():
            for sub in jax.tree_util.tree_leaves(
                    v, is_leaf=lambda x: hasattr(x, "jaxpr")):
                if hasattr(sub, "jaxpr"):
                    _collect_prims(sub.jaxpr, out)
    return out


def test_psd_cholesky_vmap_keeps_retry_branch():
    """Under vmap the retry must stay behind a REAL cond (one cholesky on
    the hot path), not linearize into select with all three factorizations
    (the multi-dataset trainer vmaps the whole step)."""
    from ffvd_tpu.ops.chol import psd_cholesky
    mats = jnp.stack([jnp.eye(4) * (i + 1.0) for i in range(3)])
    jaxpr = jax.make_jaxpr(jax.vmap(lambda m: psd_cholesky(m)))(mats)
    prims = _collect_prims(jaxpr.jaxpr, [])
    assert prims.count("cholesky") == 1, prims
    assert "cond" in prims, prims


def test_psd_cholesky_vmap_still_repairs():
    """The vmap-collapsed retry still fixes a nearly-PSD matrix anywhere in
    the batch."""
    from ffvd_tpu.ops.chol import psd_cholesky
    a = rng.randn(4, 4)
    psd = a @ a.T + 5 * np.eye(4)
    sick = psd - (np.linalg.eigvalsh(psd)[0] + 1e-9) * np.eye(4)
    mats = jnp.stack([jnp.eye(4), jnp.asarray(sick), 2 * jnp.eye(4)])
    out = jax.jit(jax.vmap(lambda m: psd_cholesky(m, 1e-2)))(mats)
    assert bool(jnp.all(jnp.isfinite(out)))
    # healthy entries are untouched by the batch-mate's repair
    np.testing.assert_allclose(np.asarray(out[0]), np.eye(4), atol=1e-12)


def test_chol_and_inv_vmap_grads():
    from ffvd_tpu.ops.chol import chol_and_inv
    mats = jnp.stack([jnp.eye(4) * (i + 1.0) for i in range(3)])
    l, li = jax.jit(jax.vmap(lambda m: chol_and_inv(m)))(mats)
    np.testing.assert_allclose(np.asarray(l @ li),
                               np.broadcast_to(np.eye(4), (3, 4, 4)),
                               atol=1e-12)
    g = jax.grad(lambda m: jnp.sum(jax.vmap(
        lambda x: chol_and_inv(x)[1])(m)))(mats)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.slow
def test_blocked_tri_inv_exact():
    """Blocked triangular inverse (MXU path for M>=256) is exact — same
    block elimination LAPACK trtri uses, not an iterative scheme."""
    from jax.scipy.linalg import solve_triangular
    from ffvd_tpu.ops.chol import blocked_tri_inv
    for m in (64, 128, 320, 512):
        a = rng.randn(2, m, m)
        l = jnp.asarray(np.linalg.cholesky(
            a @ a.transpose(0, 2, 1) + m * np.eye(m)))
        direct = solve_triangular(
            l, jnp.broadcast_to(jnp.eye(m), l.shape), lower=True)
        np.testing.assert_allclose(np.asarray(blocked_tri_inv(l)),
                                   np.asarray(direct), rtol=1e-12,
                                   atol=1e-14)


@pytest.mark.slow
def test_chol_and_inv_m512_grads():
    """The dispatch threshold path (blocked inverse) keeps the matmul-only
    backward correct at M=512-shaped inputs (spot-check vs direct solve on
    a smaller blocked size to keep test time sane)."""
    from ffvd_tpu.ops.chol import chol_and_inv
    m = 256
    a = rng.randn(1, m, m)
    spd = jnp.asarray(a @ a.transpose(0, 2, 1) + m * np.eye(m))
    l, li = chol_and_inv(spd)
    np.testing.assert_allclose(np.asarray(l @ li),
                               np.broadcast_to(np.eye(m), (1, m, m)),
                               atol=1e-12)
    g = jax.grad(lambda x: jnp.sum(chol_and_inv(x)[1]))(spd)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_ndiagquad_tuple_matches_single_latent():
    """Din=1 tuple input must agree with the array input form
    (quadrature.py:159-166: both reduce to the same 1-D grid)."""
    mu = jnp.asarray(rng.randn(6, 1))
    var = jnp.asarray(rng.rand(6, 1) + 0.2)
    y = jnp.asarray(rng.randn(6, 1))
    arr = ndiagquad(lambda f, Y: jnp.sin(f) + Y, 25, mu, var, Y=y)
    tup = ndiagquad(lambda f, Y: jnp.sin(f) + Y, 25, (mu,), (var,), Y=y)
    assert tup.shape == mu.shape
    np.testing.assert_allclose(np.asarray(tup), np.asarray(arr), rtol=1e-12)


def test_ndiagquad_tuple_two_latents_separable():
    """E[f(F)g(G)] over independent latents = E[f(F)]·E[g(G)]
    (the reference's heteroskedastic-likelihood form, quadrature.py:135-148)."""
    n = 5
    fmu = jnp.asarray(rng.randn(n, 1))
    fvar = jnp.asarray(rng.rand(n, 1) + 0.1)
    gmu = jnp.asarray(rng.randn(n, 1))
    gvar = jnp.asarray(rng.rand(n, 1) + 0.1)
    joint = ndiagquad(lambda f, g: f * f * jnp.exp(g), 20,
                      (fmu, gmu), (fvar, gvar))
    ef2 = ndiagquad(lambda f: f * f, 20, fmu, fvar)
    eeg = ndiagquad(jnp.exp, 20, gmu, gvar)
    np.testing.assert_allclose(np.asarray(joint), np.asarray(ef2 * eeg),
                               rtol=1e-8)
    # logspace: log E[exp(F+G)] = (fmu+fvar/2) + (gmu+gvar/2) in closed form
    lse = ndiagquad(lambda f, g: f + g, 30, (fmu, gmu), (fvar, gvar),
                    logspace=True)
    np.testing.assert_allclose(
        np.asarray(lse),
        np.asarray(fmu + fvar / 2 + gmu + gvar / 2), rtol=1e-8)


def test_ndiagquad_tuple_list_of_funcs_and_shapes():
    mu = jnp.asarray(rng.randn(4))          # (N,) flat form
    var = jnp.asarray(rng.rand(4) + 0.3)
    outs = ndiagquad([lambda f, g: f, lambda f, g: g], 15,
                     [mu, mu * 2], [var, var * 4])
    assert outs[0].shape == mu.shape
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(mu), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(mu * 2),
                               rtol=1e-9)
