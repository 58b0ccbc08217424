"""Double-single (ops/ds64.py) accuracy vs float64 ground truth.

The library promises ~49 mantissa bits (2**-49 ~ 1.8e-15 relative).  Every
test promotes random float32 inputs to float64 (EXACT), computes the truth
in float64, and checks the ds result (hi + lo, evaluated in float64) against
it.  Tolerances leave headroom for a few ulps of accumulated dd rounding.

The same algorithms must hold on TPU (IEEE round-to-nearest fp32 on the
VPU); tests/golden/bench_ds64.py re-checks a sample on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.ops import ds64 as ds

# heavy compile/e2e module: excluded from the `-m quick` tier
pytestmark = pytest.mark.slow

def rand(shape, scale=1.0, offset=0.0):
    # deterministic per call signature, independent of test order (xdist)
    seed = abs(hash((tuple(np.ravel(shape)), float(scale),
                     float(offset)))) % (2 ** 32)
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale + offset).astype(np.float32)


def rel_err(got_ds, truth64):
    got = np.asarray(ds.to_f64(got_ds), np.float64)
    t = np.asarray(truth64, np.float64)
    denom = np.maximum(np.abs(t), 1e-30)
    return np.max(np.abs(got - t) / denom)


def lift64(x):
    return np.asarray(x, np.float64)


class TestCoreOps:
    def test_two_sum_exact(self):
        a = rand((1000,), scale=1e6)
        b = rand((1000,), scale=1e-3)
        s, e = ds._two_sum(jnp.asarray(a), jnp.asarray(b))
        got = lift64(s) + lift64(e)
        np.testing.assert_array_equal(got, lift64(a) + lift64(b))

    def test_two_prod_exact(self):
        a = rand((1000,), scale=37.0)
        b = rand((1000,), scale=0.013)
        p, e = ds._two_prod(jnp.asarray(a), jnp.asarray(b))
        got = lift64(p) + lift64(e)
        np.testing.assert_array_equal(got, lift64(a) * lift64(b))

    @pytest.mark.parametrize("op,npop", [
        (ds.add, np.add), (ds.sub, np.subtract), (ds.mul, np.multiply),
        (ds.div, np.divide)])
    def test_binary(self, op, npop):
        a, b = rand((4096,), 3.0), rand((4096,), 2.0, offset=5.0)
        got = op(ds.lift(a), ds.lift(b))
        assert rel_err(got, npop(lift64(a), lift64(b))) < 1e-13

    def test_cancellation(self):
        # the fp32 killer: nearby values whose difference is tiny
        a = rand((1000,), 1.0, offset=100.0)
        b = (a.astype(np.float64)
             + np.random.default_rng(7).uniform(-1e-5, 1e-5, a.shape))
        b_ds = ds.add(ds.lift(a), ds.lift((b - lift64(a)).astype(np.float32)))
        diff = ds.sub(b_ds, ds.lift(a))
        truth = lift64(ds.to_f64(b_ds)) - lift64(a)
        assert rel_err(diff, truth) < 1e-12

    def test_sqrt(self):
        a = np.abs(rand((4096,), 10.0)) + 0.1
        assert rel_err(ds.sqrt(ds.lift(a)), np.sqrt(lift64(a))) < 1e-13

    def test_reciprocal(self):
        a = rand((4096,), 2.0, offset=7.0)
        assert rel_err(ds.reciprocal(ds.lift(a)), 1.0 / lift64(a)) < 1e-13

    def test_exp(self):
        # the working range of the collapsed bound: log-hypers in [-30, 30],
        # scaled squared distances in [-90, 0].  Full double-single relative
        # accuracy holds while the LO word stays normal (results > ~2**-100);
        # below that the lo component itself denormalizes — inherent to the
        # representation and irrelevant at gram scale, so the deep tail is
        # held to an absolute bound instead.
        a = np.concatenate([rand((2048,), 8.0), rand((2048,), 25.0),
                            np.float32([-87.0, -30.0, 0.0, 30.0, 87.0])])
        a = np.clip(a, -86.0, 86.0).astype(np.float32)
        got = np.asarray(ds.to_f64(ds.exp(ds.lift(a))))
        truth = np.exp(lift64(a))
        main = a > -50.0
        rel = np.abs(got - truth) / np.maximum(np.abs(truth), 1e-30)
        assert np.max(rel[main]) < 5e-13
        assert np.max(np.abs(got - truth)[~main]) < 1e-30

    def test_exp_underflow_flushes_to_zero(self):
        a = np.float32([-100.0, -500.0, -1e6])
        got = ds.exp(ds.lift(a))
        np.testing.assert_array_equal(np.asarray(got.hi), 0.0)
        np.testing.assert_array_equal(np.asarray(got.lo), 0.0)

    def test_log(self):
        a = np.abs(rand((4096,), 5.0)) + 1e-3
        got = np.asarray(ds.to_f64(ds.log(ds.lift(a))))
        truth = np.log(lift64(a))
        # absolute floor matters near log(1) = 0 where rel error is undefined
        assert np.max(np.abs(got - truth)
                      / np.maximum(np.abs(truth), 1e-2)) < 5e-13

    def test_ds_value_roundtrip(self):
        # a ds constant carries more bits than float32
        c = ds.const(np.pi)
        assert abs(float(ds.to_f64(c)) - np.pi) < 2e-14
        assert abs(float(np.float32(np.pi)) - np.pi) > 1e-9


class TestReductions:
    @pytest.mark.parametrize("n", [1, 2, 7, 64, 500, 1000])
    def test_dsum(self, n):
        x = rand((3, n), 1.0, offset=0.3)
        got = ds.dsum(ds.lift(x), axis=-1)
        assert rel_err(got, lift64(x).sum(-1)) < 1e-13

    def test_dsum_axis(self):
        x = rand((5, 17, 3))
        got = ds.dsum(ds.lift(x), axis=1)
        assert rel_err(got, lift64(x).sum(1)) < 1e-12

    def test_dsum_cancelling(self):
        # alternating large terms that cancel: fp32 loses everything,
        # dd keeps ~49 bits
        base = rand((512,), 1e4)
        x = np.stack([base, -base + rand((512,), 1e-4)], -1).reshape(-1)
        x = x.astype(np.float32)
        got = float(ds.to_f64(ds.dsum(ds.lift(x), axis=-1)))
        truth = float(lift64(x).sum())
        assert abs(got - truth) < 1e-9 * max(1.0, abs(truth))
        # fp32 reference is far worse
        fp32 = float(np.sum(x, dtype=np.float32))
        assert abs(fp32 - truth) > abs(got - truth)

    @pytest.mark.parametrize("impl", ["vpu", "mxu"])
    @pytest.mark.parametrize("shape", [((2, 5, 7), (2, 7, 3)),
                                       ((4, 100, 37), (4, 37, 50)),
                                       ((3, 129, 129), (3, 129, 8))])
    def test_matmul(self, shape, impl):
        from ffvd_tpu.ops import ds64_mxu
        mm = ds.matmul_vpu if impl == "vpu" else ds64_mxu.matmul
        sa, sb = shape
        a, b = rand(sa, 1.3), rand(sb, 0.8)
        got = np.asarray(ds.to_f64(mm(ds.lift(a), ds.lift(b))))
        truth = lift64(a) @ lift64(b)
        # floor the denominator at 1e-3 of the matrix scale: entries that
        # cancel to ~0 legitimately carry the sum's absolute dd error
        scale = np.abs(truth).max()
        assert np.max(np.abs(got - truth)
                      / np.maximum(np.abs(truth), 1e-3 * scale)) < 1e-11

    def test_mxu_matmul_dd_inputs_and_scales(self):
        # full double-single inputs (lo carries bits 25..52) and operands
        # spanning 36 decades: the digit scheme's row/column power-of-two
        # prescaling must keep full accuracy
        from ffvd_tpu.ops import ds64_mxu
        rng = np.random.default_rng(21)
        a64 = rng.standard_normal((2, 50, 60))
        b64 = rng.standard_normal((2, 60, 40))

        def to_ds(x):
            hi = x.astype(np.float32)
            lo = (x - lift64(hi)).astype(np.float32)
            return ds.DS(jnp.asarray(hi), jnp.asarray(lo))

        got = np.asarray(ds.to_f64(ds64_mxu.matmul(to_ds(a64), to_ds(b64))))
        truth = a64 @ b64
        scale = np.abs(truth).max()
        assert np.max(np.abs(got - truth)
                      / np.maximum(np.abs(truth), 1e-3 * scale)) < 1e-11

        a = (rng.standard_normal((1, 32, 32)) * 1e18).astype(np.float32)
        b = (rng.standard_normal((1, 32, 32)) * 1e-18).astype(np.float32)
        got = np.asarray(ds.to_f64(ds64_mxu.matmul(ds.lift(a), ds.lift(b))))
        truth = lift64(a) @ lift64(b)
        scale = np.abs(truth).max()
        assert np.max(np.abs(got - truth)
                      / np.maximum(np.abs(truth), 1e-3 * scale)) < 1e-11

        # all-zero rows exercise the _exp_of zero mapping
        z = ds.lift(np.zeros((1, 8, 8), np.float32))
        out = ds64_mxu.matmul(z, z)
        np.testing.assert_array_equal(np.asarray(out.hi), 0.0)

    def test_mxu_grad_matches_vpu(self):
        # both backends must expose the same effective gradient: the
        # value-level derivative evaluated in fp32 (DESIGN.md section 13)
        from ffvd_tpu.ops import ds64_mxu
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.standard_normal((2, 20, 30)), jnp.float32)
        b = ds.lift(rng.standard_normal((2, 30, 10)).astype(np.float32))

        def loss(mm, ahi):
            out = mm(ds.DS(ahi, jnp.zeros_like(ahi)), b)
            return jnp.sum(ds.to_f32(out) ** 2)

        g_mxu = jax.grad(lambda x: loss(ds64_mxu.matmul, x))(a)
        g_vpu = jax.grad(lambda x: loss(ds.matmul_vpu, x))(a)
        rel = jnp.max(jnp.abs(g_mxu - g_vpu)) / jnp.max(jnp.abs(g_vpu))
        assert float(rel) < 1e-5

    def test_matvec(self):
        a, v = rand((4, 20, 30)), rand((4, 30))
        got = ds.matvec(ds.lift(a), ds.lift(v))
        truth = np.einsum("dmk,dk->dm", lift64(a), lift64(v))
        assert rel_err(got, truth) < 1e-11


class TestCholAndInv:
    def _spd(self, d, m, cond_scale=1.0):
        x = rand((d, m, 3 * m), cond_scale)
        a = np.einsum("dmk,dnk->dmn", lift64(x), lift64(x)) / (3 * m)
        a = a + 1e-5 * np.eye(m)
        return a.astype(np.float32)

    @pytest.mark.parametrize("m", [4, 37, 100])
    def test_chol_matches_fp64(self, m):
        a32 = self._spd(3, m)
        l_ds, linv_ds = ds.chol_and_inv(ds.lift(a32))
        gl = np.asarray(ds.to_f64(l_ds))
        gx = np.asarray(ds.to_f64(linv_ds))
        scale = np.abs(lift64(a32)).max()
        # the defining residuals, at double-single accuracy
        res_chol = np.abs(lift64(a32) - gl @ gl.swapaxes(-1, -2)).max()
        res_inv = np.abs(gx @ gl - np.eye(m)).max()
        assert res_chol < 1e-12 * scale
        assert res_inv < 1e-12
        # and elementwise agreement with fp64 at matrix scale
        truth_l = np.linalg.cholesky(lift64(a32))
        assert np.abs(gl - truth_l).max() < 1e-12 * np.sqrt(scale)

    def test_logdet_accuracy(self):
        a32 = self._spd(2, 64)
        l_ds, _ = ds.chol_and_inv(ds.lift(a32))
        ld = 2.0 * np.asarray(
            ds.to_f64(ds.dsum(ds.log(ds.diagonal(l_ds)), axis=-1)))
        _, truth = np.linalg.slogdet(lift64(a32))
        np.testing.assert_allclose(ld, truth, rtol=1e-12)

    def test_ill_conditioned_beats_fp32(self):
        # condition number ~1e7: fp32 chol loses ~half its digits.  This is
        # the edge the SECOND refinement round exists for (production
        # default is refine=1 after the round-4 revalidation): one round
        # lands ~1e-9, two rounds the dd floor.
        m = 48
        q, _ = np.linalg.qr(np.random.default_rng(11).standard_normal((m, m)))
        ev = np.logspace(-7, 0, m)
        a = (q * ev) @ q.T
        a = 0.5 * (a + a.T)
        a32 = a.astype(np.float32)[None]
        l32 = np.linalg.cholesky(a32.astype(np.float32)).astype(np.float64)
        res_32 = np.abs(lift64(a32) - l32 @ l32.swapaxes(-1, -2)).max()
        # one round: ~1e-9 at this edge (merely beats fp32); two rounds:
        # dd floor, orders of magnitude beyond fp32
        for refine, tol, vs32 in ((1, 3e-8, 1.0), (2, 5e-12, 1e-3)):
            l_ds, _ = ds.chol_and_inv(ds.lift(a32), refine=refine)
            gl = np.asarray(ds.to_f64(l_ds))
            res_ds = np.abs(lift64(a32) - gl @ gl.swapaxes(-1, -2)).max()
            assert res_ds < tol, (refine, res_ds)
            assert res_ds < vs32 * res_32, (refine, res_ds, res_32)

    def test_retry_repairs_nonpsd_hi(self):
        # a matrix whose fp32 rounding is slightly indefinite
        m = 16
        a = self._spd(1, m).astype(np.float64)
        a = a - (np.linalg.eigvalsh(a[0]).min() + 1e-9) * np.eye(m)
        a32 = a.astype(np.float32)
        l_ds, linv_ds = ds.chol_and_inv(ds.lift(a32))
        assert np.all(np.isfinite(np.asarray(l_ds.hi)))
        assert np.all(np.isfinite(np.asarray(linv_ds.hi)))


class TestJitAndDtypeDiscipline:
    def test_jittable(self):
        a = rand((4, 16, 16))
        f = jax.jit(lambda x: ds.matmul(ds.lift(x), ds.lift(x)))
        out = f(jnp.asarray(a))
        truth = lift64(a) @ lift64(a)
        assert rel_err(out, truth) < 1e-11

    def test_stays_float32_under_x64(self):
        # the suite runs with jax_enable_x64=True; ds64 must not promote
        assert jax.config.jax_enable_x64
        a = ds.lift(rand((8,)))
        for v in [ds.add(a, a), ds.mul(a, a), ds.exp(a),
                  ds.log(ds.add(ds.mul(a, a), ds.const(1.0)))]:
            assert v.hi.dtype == jnp.float32
            assert v.lo.dtype == jnp.float32
