"""The double-single collapsed-bound segment (model/ds_collapse.py).

Validates the production fix for the measured fp32 gradient bias of the
collapsed GP bound (docs/DESIGN.md §12): ``ds_collapsed_terms`` must

1. match the fp64 native segment (conditionals.kernel_precal +
   collapsed_bound_terms) far beyond fp32 accuracy on the FFVD regime,
2. produce gradients with err/signal well below the fp32 path's at
   ill-conditioned points (the bias regime),
3. degrade gracefully — finite values AND finite gradients — at
   unrefinable points (cond(Kmm) beyond the fp32 Cholesky's reach, the
   escaping-chain regime captured in catapult_state_*.npz), where the
   seed-quality guard in ds64.chol_and_inv must fall back to the fp32
   seed instead of letting the correction loop diverge,
4. plug into the ELBO via ``collapse_precision="ds64"`` with unchanged
   term semantics (masking, gram_scale, windowed == full at full window).

Shapes are kept small (M=12, N=48) and everything here runs EAGERLY:
jit-compiling the unrolled ds graph is pathologically slow on the XLA CPU
backend (>5 min for one value_and_grad at ANY shape — the graph is ~10
plain ops per dd op and CPU fusion search chokes on it), while eager
dispatch completes in seconds and the primitive cache makes repeat points
cheap.  The jitted production path is exercised where it belongs — on the
TPU backend, by tests/golden/fp32_stall_study.py's ds64 arm (which also
records the compile time and throughput; PARITY.md §2f).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.model import conditionals as cond
from ffvd_tpu.model.ds_collapse import ds_collapsed_terms
from ffvd_tpu.ops import ds64 as ds
from ffvd_tpu.ops.kernels import KernelParams

# heavy compile/e2e module: excluded from the `-m quick` tier
pytestmark = pytest.mark.slow

D, M, N, DIN = 2, 12, 48, 3
ARGNUMS = (0, 1, 4)      # kernel hypers, z, log_q — the biased blocks


def _point(seed=0, dup_frac=0.0, ls=0.0, lv=0.3):
    """An FFVD-shaped evaluation point; dup_frac near-duplicates inducing
    points and ls inflates lengthscales to push cond(Kmm) up."""
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((M, DIN))
    k = int(M * dup_frac)
    if k:
        z[M - k:] = z[:k] + 1e-5 * rng.standard_normal((k, DIN))
    x = np.cumsum(0.1 * rng.standard_normal((N + 1, D)), 0)
    xc = np.concatenate([x[:-1], rng.standard_normal((N, DIN - D))], 1)
    kp = KernelParams(log_variance=jnp.full((D,), float(lv)),
                      log_lengthscales=jnp.full((D, DIN), float(ls)))
    return (kp, jnp.asarray(z), jnp.asarray(x), jnp.asarray(xc),
            jnp.full((D,), -3.0))


def _seg(impl, kernel_type, masked, gram_scale):
    """The segment as a scalar function of (kp, z, x, xc, logq[, mask])."""
    if impl == "ds":
        def f(kp, z, x, xc, logq, mask=None):
            t1, t2, tr = ds_collapsed_terms(
                kernel_type, kp, z, x, xc, logq,
                mask=mask, gram_scale=gram_scale)
            return t1 + t2 + tr
    else:
        dtype = jnp.float64 if impl == "f64" else jnp.float32

        def f(kp, z, x, xc, logq, mask=None):
            kp = KernelParams(kp.log_variance.astype(dtype),
                              kp.log_lengthscales.astype(dtype))
            z, x, xc, logq = (t.astype(dtype) for t in (z, x, xc, logq))
            pre = cond.kernel_precal(kernel_type, kp, z)
            t1, t2, tr = cond.collapsed_bound_terms(
                kernel_type, kp, pre, z, x, xc, jnp.exp(logq),
                mask=None if mask is None else mask.astype(dtype),
                gram_scale=gram_scale)
            return t1 + t2 + tr
    if not masked:
        return lambda kp, z, x, xc, logq: f(kp, z, x, xc, logq)
    return f


@functools.lru_cache(maxsize=None)
def _vg(impl, kernel_type="SquaredExponential", masked=False,
        gram_scale=1.0):
    """Cached EAGER value-and-grad (see module docstring on why not jit)."""
    return jax.value_and_grad(
        _seg(impl, kernel_type, masked, gram_scale), argnums=ARGNUMS)


def _grad_err(g, g64):
    num = sum(float(jnp.sum((jnp.asarray(a, jnp.float64) - b) ** 2))
              for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g64)))
    den = sum(float(jnp.sum(b ** 2)) for b in jax.tree.leaves(g64))
    return (num / den) ** 0.5


@functools.lru_cache(maxsize=None)
def _fwd(impl, kernel_type):
    """Forward-only, eager."""
    return _seg(impl, kernel_type, False, 1.0)


class TestAccuracy:
    @pytest.mark.parametrize("kernel_type", ["SquaredExponential", "LinearK"])
    def test_forward_matches_fp64(self, kernel_type):
        args = _point(1)
        v64 = _fwd("f64", kernel_type)(*args)
        vds = _fwd("ds", kernel_type)(*args)
        # float32 output cast floors the agreement at ~|v|·2⁻²⁴
        assert abs(float(vds) - float(v64)) <= 4e-6 * max(abs(float(v64)), 1.0)

    def test_beats_fp32_when_ill_conditioned(self):
        args = _point(2, dup_frac=0.5, ls=1.5)
        v64, g64 = _vg("f64")(*args)
        v32, g32 = _vg("f32")(*args)
        vds, gds = _vg("ds")(*args)
        v64, v32, vds = float(v64), float(v32), float(vds)
        assert abs(vds - v64) < 0.2 * abs(v32 - v64)
        e32, eds = _grad_err(g32, g64), _grad_err(gds, g64)
        assert np.isfinite(eds)
        assert eds < 0.5 * e32, (eds, e32)

    def test_mask_and_gram_scale(self):
        kp, z, x, xc, logq = _point(4)
        mask = jnp.asarray((np.arange(N) < N - 10).astype(np.float64))
        v64, _ = _vg("f64", masked=True, gram_scale=2.5)(
            kp, z, x, xc, logq, mask)
        vds, _ = _vg("ds", masked=True, gram_scale=2.5)(
            kp, z, x, xc, logq, jnp.asarray(mask, jnp.float32))
        assert abs(float(vds) - float(v64)) <= 4e-6 * max(abs(float(v64)), 1.0)


class TestUnrefinableGuard:
    """cond(Kmm) past the fp32 Cholesky edge: the escaping-chain regime."""

    def _harsh(self):
        # lv=8, ls=6: Kmm ≈ e⁸·𝟙𝟙ᵀ + jitter — numerically rank-one, the
        # shape the escaped sampler states take (catapult_state_*.npz
        # carry log-variances up to +21)
        return _point(5, dup_frac=0.0, ls=6.0, lv=8.0)

    def test_harsh_kernel_matrix_stays_finite(self):
        """The jitter ladder + refinement handle the rank-collapsed Kmm the
        escaped states produce (the ladder's RELATIVE rung caps post-repair
        cond at ~M·1e4, inside the refinable region, so the rho0 fallback
        is a safety net, not the common path)."""
        kp, z, _, _, _ = self._harsh()
        from ffvd_tpu.model.ds_collapse import se_cross
        kmm = se_cross(kp, z, z)
        eye = jnp.eye(M, dtype=jnp.float32)
        kmm = ds.add(kmm, ds.mul_f(ds.const(1e-5), eye))
        l, x = ds.chol_and_inv(kmm)
        lv, xv = np.asarray(ds.to_f64(l)), np.asarray(ds.to_f64(x))
        assert np.isfinite(lv).all() and np.isfinite(xv).all()

    def test_seed_fallback_mechanism(self):
        """Force the rho0 guard (tiny threshold): the output must be
        EXACTLY the fp32 seed — lo components zero — per matrix."""
        kp, z, _, _, _ = _point(8)
        from ffvd_tpu.model.ds_collapse import se_cross
        kmm = se_cross(kp, z, z)
        eye = jnp.eye(M, dtype=jnp.float32)
        kmm = ds.add(kmm, ds.mul_f(ds.const(1e-5), eye))
        l, x = ds.chol_and_inv(kmm, guard_threshold=1e-30)
        assert float(np.abs(np.asarray(l.lo)).max()) == 0.0
        assert float(np.abs(np.asarray(x.lo)).max()) == 0.0
        l0 = np.asarray(jnp.linalg.cholesky(kmm.hi))
        np.testing.assert_array_equal(np.asarray(l.hi), np.tril(l0))

    def test_value_and_grad_finite_and_no_worse_than_fp32(self):
        args = self._harsh()
        v64, g64 = _vg("f64")(*args)
        v32, g32 = _vg("f32")(*args)
        vds, gds = _vg("ds")(*args)
        assert np.isfinite(float(vds))
        assert all(bool(jnp.isfinite(t).all()) for t in jax.tree.leaves(gds))
        # graceful degradation: within a small factor of the fp32 error,
        # never the divergent amplification the unguarded loop produced
        e32, eds = _grad_err(g32, g64), _grad_err(gds, g64)
        assert eds <= 4.0 * max(e32, 1e-7), (eds, e32)

    def test_mixed_batch_isolation(self):
        """One unrefinable matrix in the batch must not poison the others."""
        rng = np.random.default_rng(6)
        q, _ = np.linalg.qr(rng.standard_normal((M, M)))
        mats = []
        for c in (1e3, 3e9, 1e2):
            eig = np.logspace(0, -np.log10(c), M)
            mats.append((q * eig) @ q.T)
        a64 = np.stack(mats)
        a32 = a64.astype(np.float32)
        adS = ds.DS(jnp.asarray(a32),
                    jnp.asarray((a64 - a32).astype(np.float32)))
        l, _ = ds.chol_and_inv(adS)
        lv = np.asarray(ds.to_f64(l))
        for i in (0, 2):
            l64 = np.linalg.cholesky(a64[i])
            rel = np.max(np.abs(lv[i] - l64)) / np.max(np.abs(l64))
            assert rel < 1e-9, (i, rel)
        assert np.isfinite(lv[1]).all()


def _tiny_model():
    from ffvd_tpu.model.params import GPSSMParams, SSMData
    rng = np.random.default_rng(7)
    x = jnp.asarray(np.cumsum(0.1 * rng.standard_normal((N + 1, D)), 0))
    params = GPSSMParams(
        x=x,
        u=jnp.asarray(rng.standard_normal((M, D))),
        z=jnp.asarray(rng.standard_normal((M, DIN))),
        kernel=KernelParams(jnp.zeros((D,)), jnp.zeros((D, DIN))),
        log_q=jnp.full((D,), -2.0),
        c=jnp.asarray(rng.standard_normal((D, 1))),
        d=jnp.zeros((1,)),
        log_rchol=jnp.zeros((1, 1)))
    data = SSMData(y=jnp.asarray(rng.standard_normal((N, 1))),
                   control=jnp.asarray(rng.standard_normal((N, DIN - D))))
    return params, data


@functools.lru_cache(maxsize=None)
def _elbo_results():
    """native terms, ds terms, windowed-ds nll, ds grad — eager, shared."""
    from ffvd_tpu.model.elbo import elbo_terms, windowed_elbo_terms
    params, data = _tiny_model()
    t_native = elbo_terms(params, data, u_collapse=True)
    t_ds = elbo_terms(params, data, u_collapse=True,
                      collapse_precision="ds64")
    tw = windowed_elbo_terms(params, data, jnp.asarray(0), N,
                             collapse_precision="ds64")
    g = jax.grad(lambda pp: elbo_terms(
        pp, data, collapse_precision="ds64")["nll"])(params)
    return jax.tree.map(np.asarray, (t_native, t_ds, tw["nll"], g))


class TestElboWiring:
    def test_elbo_ds64_close_to_native_fp64(self):
        t_native, t_ds, _, _ = _elbo_results()
        for k in ("later_term1", "later_term2",
                  "nll_reg_trace_inverse_Q_B", "nll"):
            a, b = float(t_native[k]), float(t_ds[k])
            assert abs(a - b) <= 4e-6 * max(abs(a), 1.0), (k, a, b)
        # non-collapse terms must be independent of the mode
        for k in ("nll_log_likelihood", "nll_part_prior", "x_t_prior_Q"):
            assert float(t_native[k]) == pytest.approx(float(t_ds[k]),
                                                       rel=1e-12)

    def test_windowed_full_window_equals_elbo_terms(self):
        _, t_ds, tw_nll, _ = _elbo_results()
        assert float(t_ds["nll"]) == pytest.approx(float(tw_nll), abs=1e-10)

    def test_grad_through_elbo_finite(self):
        _, _, _, g = _elbo_results()
        assert all(bool(np.isfinite(t).all()) for t in jax.tree.leaves(g))

    def test_config_flag_validated(self):
        from ffvd_tpu.config import FFVDConfig
        with pytest.raises(ValueError):
            FFVDConfig(dataset="ballbeam", collapse_precision="fp16")
        cfg = FFVDConfig(dataset="ballbeam", collapse_precision="ds64")
        assert cfg.collapse_precision == "ds64"

    # NOTE: the jitted Trainer end-to-end integration of collapse_precision
    # ="ds64" is deliberately NOT exercised here — XLA CPU cannot compile
    # the fused chunk in reasonable time (module docstring).  It runs on
    # the TPU backend via tests/golden/fp32_stall_study.py (FFVD_STALL_DS64
    # =1), whose results are pinned by tests/test_study_artifacts.py.


class TestEvalSideCollapse:
    """ds64 q(U) posterior + refined precal (eval path, PARITY §2f caveat)."""

    def test_u_posterior_matches_fp64(self):
        from ffvd_tpu.model.conditionals import (collapsed_u_posterior,
                                                 kernel_precal)
        from ffvd_tpu.model.ds_collapse import ds_collapsed_u_posterior
        kp, z, x, xc, logq = _point(9)
        pre = kernel_precal("SquaredExponential", kp, z)
        um64, qs64 = collapsed_u_posterior("SquaredExponential", kp, pre, z,
                                           x, xc, jnp.exp(logq))
        um, qs = ds_collapsed_u_posterior("SquaredExponential", kp, z, x, xc,
                                          logq)
        assert um.shape == um64.shape and qs.shape == qs64.shape
        np.testing.assert_allclose(np.asarray(um), np.asarray(um64),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(qs), np.asarray(qs64),
                                   rtol=0, atol=2e-6)

    def test_u_posterior_sharp_q_beats_fp32(self):
        """The motivating regime: Q ~ 1e-6 makes cond(H) ~ ||F||²/Q; the
        fp32 q_sqrt factor degrades while ds64 stays at fp64."""
        from ffvd_tpu.model.conditionals import (collapsed_u_posterior,
                                                 kernel_precal)
        from ffvd_tpu.model.ds_collapse import ds_collapsed_u_posterior
        kp, z, x, xc, _ = _point(10)
        logq = jnp.full((D,), -13.0)          # Q ≈ 2.3e-6
        pre64 = kernel_precal("SquaredExponential", kp, z)
        um64, qs64 = collapsed_u_posterior("SquaredExponential", kp, pre64,
                                           z, x, xc, jnp.exp(logq))
        kp32 = KernelParams(jnp.asarray(kp.log_variance, jnp.float32),
                            jnp.asarray(kp.log_lengthscales, jnp.float32))
        f32 = lambda t: jnp.asarray(t, jnp.float32)
        pre32 = kernel_precal("SquaredExponential", kp32, f32(z))
        um32, qs32 = collapsed_u_posterior("SquaredExponential", kp32, pre32,
                                           f32(z), f32(x), f32(xc),
                                           jnp.exp(f32(logq)))
        um, qs = ds_collapsed_u_posterior("SquaredExponential", kp, z, x, xc,
                                          logq)
        err32 = np.abs(np.asarray(qs32, np.float64) - np.asarray(qs64)).max()
        errds = np.abs(np.asarray(qs, np.float64) - np.asarray(qs64)).max()
        assert errds < 0.1 * err32, (errds, err32)
        merr32 = np.abs(np.asarray(um32, np.float64) - np.asarray(um64)).max()
        merrds = np.abs(np.asarray(um, np.float64) - np.asarray(um64)).max()
        assert merrds < 0.5 * merr32, (merrds, merr32)

    def test_ds_precal_matches_fp64(self):
        from ffvd_tpu.model.conditionals import kernel_precal
        from ffvd_tpu.model.ds_collapse import ds_precal
        kp, z, _, _, _ = _point(11)
        p64 = kernel_precal("SquaredExponential", kp, z)
        p = ds_precal("SquaredExponential", kp, z)
        np.testing.assert_allclose(np.asarray(p.lm), np.asarray(p64.lm),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(p.lm_inv),
                                   np.asarray(p64.lm_inv),
                                   rtol=0, atol=1e-5)
