"""Double-single (two-float32) arithmetic for fp64-less TPUs.

TPU hardware has no float64 (enabling x64 emulation crashes the runtime —
TODO.md round-3 negative result), but the collapsed GP bound's gradient is
measurably BIASED in fp32 near its optimum: extended training (3x the
benchmark protocol) drifts to a looser posterior-variance floor, and
fp64-islanding single ops does not fix it — only the whole
gram -> precal -> collapsed-terms segment in high precision does
(docs/DESIGN.md section 12, tests/golden/fp32_bias_probe.py /
fp32_mixed_control.py).  This module supplies that high precision ON the
TPU: every value is an unevaluated pair hi + lo of float32 with
|lo| <= ulp(hi)/2, giving ~49 mantissa bits (fp64 has 52) at VPU speed.

The algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP 4.2.2, and the QD library of Hida/Li/Bailey) specialized to
binary32 and written as branch-free JAX expressions:

- ``two_sum`` needs only IEEE round-to-nearest adds (no magnitude order);
- ``two_prod`` uses the Veltkamp split (factor 2**12 + 1 for binary32)
  instead of FMA, which XLA does not expose as a primitive;
- transcendentals (exp, log) use range reduction + Horner with
  double-single coefficient TABLES (a plain float32 ``1/k!`` would cap
  accuracy at 2**-24), and one Newton step off the fp32 seed for log;
- reductions are pairwise (tree) sums of compensated terms, so the error
  stays O(log n) in ulps rather than O(n);
- ``matmul`` has two backends: ``matmul_vpu`` (elementwise ``two_prod`` +
  tree reduction, chunked over the contraction axis) and the Ozaki
  digit-splitting scheme of ``ops/ds64_mxu.py`` — a NAIVE MXU matmul
  rounds its fp32 accumulator every step (exactly the bias being removed),
  but splitting operands into bf16 integer digits makes the accumulation
  error-free and puts the MACs back on the matrix unit (see the ds64_mxu
  docstring).
- ``chol_and_inv`` seeds with the fp32 Cholesky/triangular-inverse and
  applies one double-single residual correction to the factor
  (dL = L0 Phi(L0^-1 E L0^-T), E = A - L0 L0^T — the Cholesky differential
  of Murray 2016 used as an iterative-refinement step) plus Newton steps
  for the inverse: each step squares the relative error, so fp32's 2**-20
  reaches the 2**-45 regime in two steps of pure (double-single) matmuls —
  no sequential column sweeps anywhere.

Everything is dtype-disciplined float32 internally and safe to call under
``jax_enable_x64`` (the test suite's default).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SPLIT = 4097.0          # Veltkamp constant for binary32: 2**12 + 1


class DS(NamedTuple):
    """An unevaluated float32 sum hi + lo with |lo| <= ulp(hi)/2."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return self.hi.shape

    @property
    def dtype(self):
        return self.hi.dtype


def lift(x) -> DS:
    """Exact promotion of a float32 array (lo = 0)."""
    x = jnp.asarray(x, jnp.float32)
    return DS(x, jnp.zeros_like(x))


def const(value: float, dtype=jnp.float32) -> DS:
    """A double-single constant: hi = round(value), lo = round(value - hi),
    both computed in float64 on host so the pair carries ~49 bits of the
    true value."""
    hi = np.float32(value)
    lo = np.float32(np.float64(value) - np.float64(hi))
    return DS(jnp.asarray(hi, dtype), jnp.asarray(lo, dtype))


def to_f32(x: DS) -> jnp.ndarray:
    return x.hi + x.lo


def to_f64(x: DS) -> jnp.ndarray:
    """Exact value as float64 (for tests / host-side use; needs x64)."""
    return jnp.asarray(x.hi, jnp.float64) + jnp.asarray(x.lo, jnp.float64)


def dsmap(fn, *xs: DS) -> DS:
    """Apply an EXACT structural op (transpose, reshape, slice, pad, tril,
    diagonal, broadcast, where with shared predicate...) to both components."""
    return DS(fn(*[x.hi for x in xs]), fn(*[x.lo for x in xs]))


# ---------------------------------------------------------------------------
# Error-free transformations
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    """s + e == a + b exactly, s = fl(a + b).  6 flops, no branch."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """two_sum assuming |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Veltkamp split: a == hi + lo with hi, lo 12-bit-mantissa exact."""
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    """p + e == a * b exactly, p = fl(a * b) (Dekker, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# Elementwise double-single arithmetic
# ---------------------------------------------------------------------------

def add(a: DS, b: DS) -> DS:
    """IEEE-style accurate dd add (QD's ieee_add, ~20 flops)."""
    s1, s2 = _two_sum(a.hi, b.hi)
    t1, t2 = _two_sum(a.lo, b.lo)
    s2 = s2 + t1
    s1, s2 = _quick_two_sum(s1, s2)
    s2 = s2 + t2
    return DS(*_quick_two_sum(s1, s2))


def neg(a: DS) -> DS:
    return DS(-a.hi, -a.lo)


def sub(a: DS, b: DS) -> DS:
    return add(a, neg(b))


def mul(a: DS, b: DS) -> DS:
    p1, p2 = _two_prod(a.hi, b.hi)
    p2 = p2 + (a.hi * b.lo + a.lo * b.hi)
    return DS(*_quick_two_sum(p1, p2))


def mul_f(a: DS, b) -> DS:
    """DS x plain float32 array (b treated as exact)."""
    p1, p2 = _two_prod(a.hi, b)
    p2 = p2 + a.lo * b
    return DS(*_quick_two_sum(p1, p2))


def mul_pow2(a: DS, s) -> DS:
    """Exact scaling by a power of two (array or scalar)."""
    return DS(a.hi * s, a.lo * s)


def div(a: DS, b: DS) -> DS:
    """Accurate dd division: three quotient corrections (QD accurate_div)."""
    q1 = a.hi / b.hi
    r = sub(a, mul_f(b, q1))
    q2 = r.hi / b.hi
    r = sub(r, mul_f(b, q2))
    q3 = r.hi / b.hi
    s1, s2 = _quick_two_sum(q1, q2)
    return add(DS(s1, s2), DS(q3, jnp.zeros_like(q3)))


def reciprocal(b: DS) -> DS:
    one = lift(jnp.ones_like(b.hi))
    return div(one, b)


def sqrt(a: DS) -> DS:
    """dd sqrt: fp32 seed + one correction e = (a - s^2) / (2 s)."""
    s = jnp.sqrt(a.hi)
    p1, p2 = _two_prod(s, s)
    r = sub(a, DS(p1, p2))
    e = r.hi / (2.0 * s)
    return DS(*_quick_two_sum(s, e))


# --- exp / log -------------------------------------------------------------

_LN2 = 0.6931471805599453094172321214581766


def _pow2_exact(k):
    """Exact float32 2**k for integer-valued k in [-126, 127], built from
    the exponent bit field (jnp.exp2 is an approximation — measured rel
    error ~2e-6 at k = 52 — which would poison the hi component)."""
    ki = k.astype(jnp.int32)
    return jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
# exp Taylor over |r| <= ln2/2 = 0.3466: need 0.3466^n / n! < 2**-52 -> n=15.
# The Horner chain is SPLIT: a partial value V sitting at coefficient slot
# 1/k! is multiplied by r**k before it reaches the result, so evaluating the
# high-order tail (1/16!..1/10!) in plain fp32 contributes error
# ~ few * 2**-24 * (1/10!) * r**10 ~ 2**-58 — far below the double-single
# floor (2**-49); only the last slots (1/9!..1/2!) need dd arithmetic.
# (At the 1/8! slot the same bound is ~2**-51.5 — too close to the floor.)
_EXP_ORDER = 16
_EXP_SPLIT = 9            # highest coefficient 1/k! evaluated in dd
_INV_FACT_F32 = np.float32(
    [1.0 / math.factorial(k) for k in range(_EXP_ORDER, _EXP_SPLIT, -1)])
_INV_FACT = [1.0 / math.factorial(k) for k in range(_EXP_SPLIT, 1, -1)]
# fp32 exp under/overflow bounds (with headroom for the lo component).
_EXP_MIN = -87.0
_EXP_MAX = 88.0


def exp(a: DS) -> DS:
    """Double-single exp via 2**k * P(r), r = a - k ln2, split Horner:
    the high-order Taylor tail in plain fp32 (error contribution ~2**-58,
    see the _EXP_SPLIT note), the low-order slots with a DS coefficient
    table (a plain float32 1/k! there would cap accuracy at 2**-24).
    Values below the fp32 underflow threshold flush to an exact 0; above
    the overflow threshold saturate to +inf in hi.

    Out-of-range arguments are clamped BEFORE the polynomial (the masked
    branch computes on the clamp value, not the raw input): for |a| far
    outside [_EXP_MIN, _EXP_MAX] the fp32 rounding of k*ln2 makes r
    arbitrarily large, the Horner chain overflows to inf, and the final
    where would then pair a zero cotangent with an inf primal in the mul
    VJPs — NaN gradients (the where-of-NaN autodiff trap; same rule as
    chol_and_inv's sanitized refinement input).  Clamping gives the
    saturated regions an exp(clamp)-scale gradient instead — finite, and
    ~0 on the underflow side where it matters."""
    dtype = a.dtype
    under = a.hi < _EXP_MIN
    over = a.hi > _EXP_MAX
    oob = under | over
    a = DS(jnp.clip(a.hi, _EXP_MIN, _EXP_MAX),
           jnp.where(oob, jnp.zeros_like(a.lo), a.lo))
    k = jnp.round(a.hi * jnp.asarray(1.0 / _LN2, dtype))
    ln2 = const(_LN2, dtype)
    r = add(a, mul_f(neg(ln2), k))
    # fp32 tail: 1/16!..1/10! (dropping r.lo here perturbs slots ~1e-8 of
    # the final value by 2**-25 relative — negligible at this depth).
    p32 = jnp.asarray(_INV_FACT_F32[0], dtype)
    for c in _INV_FACT_F32[1:]:
        p32 = jnp.asarray(c, dtype) + p32 * r.hi
    p = DS(p32, jnp.zeros_like(p32))
    for c in _INV_FACT:
        p = add(const(c, dtype), mul(p, r))
    # p = sum_{j>=0} r^j/(j+2)!  ->  exp(r) = 1 + r (1 + r p)
    one = lift(jnp.ones_like(a.hi))
    p = add(one, mul(r, add(one, mul(r, p))))
    # 2**k scaling, exact per component; split k to stay in exponent range.
    k1 = jnp.clip(k, -126.0, 127.0)
    k2 = jnp.clip(k - k1, -126.0, 127.0)
    s = _pow2_exact(k1)
    s2 = _pow2_exact(k2)
    out = DS((p.hi * s) * s2, (p.lo * s) * s2)
    zero = jnp.zeros_like(out.hi)
    out = DS(jnp.where(under, zero, out.hi), jnp.where(under, zero, out.lo))
    inf = jnp.full_like(out.hi, jnp.inf)
    return DS(jnp.where(over, inf, out.hi), jnp.where(over, zero, out.lo))


def log(a: DS) -> DS:
    """Double-single log: fp32 seed y0 = log(hi), then one Newton-style
    correction log(a) = y0 + d - d^2/2 + O(d^3) with
    d = a * exp(-y0) - 1 ~ 2**-24 (so the dropped d^3 term is ~2**-72)."""
    y0 = jnp.log(a.hi)
    w = mul(a, exp(DS(-y0, jnp.zeros_like(y0))))
    d = sub(w, lift(jnp.ones_like(y0)))
    corr = sub(d, mul_pow2(mul(d, d), 0.5))
    return add(DS(y0, jnp.zeros_like(y0)), corr)


# ---------------------------------------------------------------------------
# Reductions and matmul
# ---------------------------------------------------------------------------

def dsum(x: DS, axis: int = -1) -> DS:
    """Pairwise (tree) sum along one axis: log2(n) levels of dd adds."""
    n = x.hi.shape[axis]
    ax = axis % x.hi.ndim
    # move the reduced axis last
    if ax != x.hi.ndim - 1:
        x = dsmap(lambda t: jnp.moveaxis(t, ax, -1), x)
    size = x.hi.shape[-1]
    p = 1 << max(0, (size - 1).bit_length())
    if p != size:
        pad = [(0, 0)] * (x.hi.ndim - 1) + [(0, p - size)]
        x = dsmap(lambda t: jnp.pad(t, pad), x)
    while p > 1:
        half = p // 2
        a = dsmap(lambda t: t[..., :half], x)
        b = dsmap(lambda t: t[..., half:], x)
        x = add(a, b)
        p = half
    del n
    return dsmap(lambda t: t[..., 0], x)


_MM_CHUNK_ELEMS = 1 << 22   # ~4M f32 per product-tensor component

# Default chol_and_inv refinement-round count when callers pass refine=None.
# refine=1: one Newton round on the fp32 Cholesky seed already reaches
# ~3e-11 relative factor residual on healthily conditioned matrices
# (test_chol_and_inv_refine1_beats_fp32_seed) and was revalidated at full
# protocol in round 4 — flutter C5 5-seed median lands in the fp64 bracket
# (escape_validation.json `_ds64r1` arms) and the drive 12k-iter budget
# discriminator matches (fp32_stall_study.json) — at ~1.9x the end-to-end
# throughput of refine=2 (ds64_profile.json r3_refine).  refine=2 remains
# available per call (or FFVD_DS64_REFINE=2) for the ill-conditioned edge
# the second round was built for (cond ~1e7: residual 1e-9 after one
# round, dd-floor after two — tests/test_ds64.py).
_DEFAULT_REFINE = 1


def set_default_refine(n: int) -> None:
    """Set the module-wide chol_and_inv refinement default (refine=None)."""
    global _DEFAULT_REFINE
    if not isinstance(n, int) or n < 0:
        raise ValueError(f"invalid ds64 refine count {n!r}")
    _DEFAULT_REFINE = n


def _resolve_refine(refine) -> int:
    if refine is not None:
        return refine
    import os
    env = os.environ.get("FFVD_DS64_REFINE")
    if env is not None:
        if not env.isdigit():
            raise ValueError(
                f"FFVD_DS64_REFINE={env!r}: expected a non-negative integer")
        return int(env)
    return _DEFAULT_REFINE

# Which matmul implementation ds.matmul routes to: "vpu" (two_prod + tree
# reduction, this module), "mxu" (Ozaki digit splitting on the matrix unit,
# ops/ds64_mxu.py — same ~49-bit accuracy, 3.1x end-to-end on TPU), or
# "auto" (mxu on TPU backends, vpu elsewhere).  Env: FFVD_DS64_MATMUL.
_MATMUL_IMPL = "auto"


def set_matmul_impl(impl: str) -> None:
    """Select the dd-matmul backend: 'auto' | 'vpu' | 'mxu'."""
    global _MATMUL_IMPL
    if impl not in ("auto", "vpu", "mxu"):
        raise ValueError(f"invalid ds64 matmul impl {impl!r}")
    _MATMUL_IMPL = impl


def _resolve_matmul_impl() -> str:
    import os
    impl = _MATMUL_IMPL
    if impl == "auto":
        # The env var fills in the default only; an explicit
        # set_matmul_impl() call always wins over inherited shell state.
        env = os.environ.get("FFVD_DS64_MATMUL")
        if env is not None:
            if env not in ("auto", "vpu", "mxu"):
                raise ValueError(
                    f"FFVD_DS64_MATMUL={env!r}: expected auto|vpu|mxu")
            impl = env
    if impl == "auto":
        return "mxu" if jax.default_backend() == "tpu" else "vpu"
    return impl


def matmul(a: DS, b: DS) -> DS:
    """(..., m, k) @ (..., k, n) in double-single; routes to the VPU
    (two_prod + compensated tree) or MXU (Ozaki digit-split) backend."""
    if _resolve_matmul_impl() == "mxu":
        from ffvd_tpu.ops import ds64_mxu
        return ds64_mxu.matmul(a, b)
    return matmul_vpu(a, b)


def matmul_vpu(a: DS, b: DS) -> DS:
    """(..., m, k) @ (..., k, n) with per-element two_prod and pairwise
    reduction over k, chunked so the (..., m, chunk, n) product tensor stays
    ~16 MB/component.  All-VPU by design — see module docstring."""
    m, k = a.hi.shape[-2], a.hi.shape[-1]
    n = b.hi.shape[-1]
    batch = int(np.prod(a.hi.shape[:-2], dtype=np.int64)) if a.hi.ndim > 2 else 1
    per_slice = max(1, batch * m * n)
    chunk = int(min(k, max(1, _MM_CHUNK_ELEMS // per_slice)))
    acc: Optional[DS] = None
    for c0 in range(0, k, chunk):
        c1 = min(k, c0 + chunk)
        pa = dsmap(lambda t: t[..., :, c0:c1, None], a)    # (..., m, kc, 1)
        pb = dsmap(lambda t: t[..., None, c0:c1, :], b)    # (..., 1, kc, n)
        part = dsum(mul(pa, pb), axis=-2)                  # (..., m, n)
        acc = part if acc is None else add(acc, part)
    return acc


def matvec(a: DS, v: DS) -> DS:
    """(..., m, k) @ (..., k) -> (..., m)."""
    out = matmul(a, dsmap(lambda t: t[..., None], v))
    return dsmap(lambda t: t[..., 0], out)


def transpose(a: DS) -> DS:
    return dsmap(lambda t: t.swapaxes(-1, -2), a)


def _t(x: jnp.ndarray) -> jnp.ndarray:
    """Plain-array matrix transpose (for fp32 probe math in the guard)."""
    return x.swapaxes(-1, -2)


# ---------------------------------------------------------------------------
# Refined Cholesky + triangular inverse
# ---------------------------------------------------------------------------

def _phi(x: DS) -> DS:
    """tril with halved diagonal (the Cholesky differential's Phi).  Both
    the tril mask and the 0.5 diagonal scaling are exact on components."""
    m = x.hi.shape[-1]
    w = jnp.tril(jnp.ones((m, m), x.dtype)) - 0.5 * jnp.eye(m, dtype=x.dtype)
    return DS(x.hi * w, x.lo * w)


def _eye_like(a: DS) -> DS:
    m = a.hi.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(m, dtype=a.dtype), a.hi.shape)
    return DS(eye, jnp.zeros_like(eye))


def _newton_inv_step(x: DS, a: DS) -> DS:
    """One Newton step x <- x + x (I - a x): squares the error |I - a x|."""
    r = sub(_eye_like(a), matmul(a, x))
    return add(x, matmul(x, r))


def chol_and_inv(a: DS, refine: Optional[int] = None,
                 guard_threshold: float = 0.25) -> Tuple[DS, DS]:
    """(L, L^-1) of symmetric PD (..., M, M) in double-single.

    Seed: fp32 Cholesky of hi (one escalated-jitter retry, relative to the
    diagonal scale, mirroring ops/chol.psd_cholesky's ladder) and the fp32
    triangular inverse.  Refinement:

      1. two Newton steps for X ~ L0^-1        (err 2**-20 -> 2**-45+)
      2. ``refine`` rounds of the first-order Cholesky correction
         E = A - L L^T;  L += L Phi(X E X^T), each followed by one Newton
         step of X against the corrected L.  One round squares the factor
         error (2**-24 -> ~2**-45); the second matters for ill-conditioned
         matrices (cond ~1e7 measured: residual 1e-9 after one round,
         dd-floor after two — tests/test_ds64.py).  ``refine=None`` uses
         the module default (see _DEFAULT_REFINE / set_default_refine /
         FFVD_DS64_REFINE; production default 1 after the round-4
         revalidation).

    All steps are dd matmuls — no sequential triangular sweeps.  Any added
    retry jitter is applied to the dd matrix too, so the refinement target
    and the factor agree (the caller adds its base jitter itself).

    Seed-quality guard: the correction loop converges only when the seed's
    first-order correction G0 = X0 (A - L0 L0^T) X0^T is a contraction
    (||G0|| ~ eps_f32 * cond(A)); past that edge (cond within ~2x of
    1/eps_f32) the iteration DIVERGES (measured on captured escaping-chain
    states, catapult_state_*.npz: NaN gradients, forward worse than fp32).
    NOTE ||I - L0 X0|| is NOT a usable metric — the triangular inverse is
    self-consistently accurate against the COMPUTED factor regardless of
    cond(A); the factor error E0 = A - L0 L0^T is what blows up.  Per
    matrix in the batch we measure ||G0||_max in plain fp32 and, where it
    exceeds ``guard_threshold``, run the refinement on a sanitized identity
    stand-in and return the fp32 seed unchanged instead — the mode degrades
    to exactly-fp32 at points fp32 itself can barely factor, rather than
    amplifying them.  Sanitizing the refinement INPUT (not masking its
    output) keeps the unselected branch finite, so gradients through the
    ``where`` never see divergent values (the where-of-NaN autodiff trap).
    For the same reason every probe factorization here is computed under
    stop_gradient: a NaN PRIMAL inside cholesky's VJP yields NaN cotangents
    even when the incoming cotangent is zero."""
    from ffvd_tpu.ops.chol import _tri_inv

    refine = _resolve_refine(refine)

    m = a.hi.shape[-1]
    eye = jnp.eye(m, dtype=a.dtype)

    # Jitter escalation mirroring ops/chol.psd_cholesky's ladder exactly
    # (first the reference's ABSOLUTE 1e-4 fallback, then RELATIVE to the
    # diagonal scale), decided on stop-gradient probes so the failed
    # factorizations never enter the autodiff graph.
    ahi_ng = jax.lax.stop_gradient(a.hi)
    diag_scale = jnp.mean(jnp.diagonal(ahi_ng, axis1=-2, axis2=-1),
                          axis=-1)[..., None, None]
    rel = 1e-4 * jnp.maximum(diag_scale, 1.0)
    probe = jnp.linalg.cholesky(ahi_ng)
    bad = jnp.any(~jnp.isfinite(probe), axis=(-2, -1), keepdims=True)
    jit1 = jnp.where(bad, 1e-4, 0.0) * eye
    # Second probe only when the first failed anywhere in the batch: in the
    # all-healthy hot path (every ds64 nll evaluates this twice) the cond
    # skips a whole batched (D,M,M) factorization; jit1 is zero there so
    # reusing `probe` is exact.
    probe2 = jax.lax.cond(
        jnp.any(bad),
        lambda: jnp.linalg.cholesky(ahi_ng + jit1),
        lambda: probe)
    bad2 = jnp.any(~jnp.isfinite(probe2), axis=(-2, -1), keepdims=True)
    a = DS(a.hi + (jit1 + jnp.where(bad2, rel, 0.0) * eye), a.lo)

    l0 = jnp.linalg.cholesky(a.hi)
    x0 = _tri_inv(l0)

    # Refinability: ||G0||_max per matrix, plain fp32, values only (the
    # guard is a discrete mode choice, not part of the smooth function).
    l0_ng = jax.lax.stop_gradient(l0)
    x0_ng = jax.lax.stop_gradient(x0)
    e0 = jax.lax.stop_gradient(a.hi) - l0_ng @ _t(l0_ng)
    g0 = x0_ng @ e0 @ _t(x0_ng)
    rho0 = jnp.max(jnp.abs(g0), axis=(-2, -1))                # (...,)
    finite = jnp.all(jnp.isfinite(x0_ng), axis=(-2, -1))
    ok = (rho0 < guard_threshold) & finite                    # (...,)
    okm = ok[..., None, None]

    a_safe = DS(jnp.where(okm, a.hi, eye), jnp.where(okm, a.lo, 0.0))
    l1 = lift(jnp.where(okm, l0, eye))
    x = lift(jnp.where(okm, x0, eye))
    x = _newton_inv_step(x, l1)
    x = _newton_inv_step(x, l1)
    for _ in range(refine):
        e = sub(a_safe, matmul(l1, transpose(l1)))
        g = matmul(matmul(x, e), transpose(x))
        dl = matmul(l1, _phi(g))
        l1 = add(l1, dl)
        x = _newton_inv_step(x, l1)
    # Unrefinable matrices: fall back to the fp32 seed (grads flow through
    # the seed's own cholesky/tri_inv, i.e. exactly the fp32 semantics).
    zero = jnp.zeros_like(l0)
    l1 = DS(jnp.where(okm, l1.hi, l0), jnp.where(okm, l1.lo, zero))
    x = DS(jnp.where(okm, x.hi, x0), jnp.where(okm, x.lo, zero))
    # keep both strictly triangular (refinement noise in the zero triangle
    # would otherwise leak into downstream matmuls)
    tril = jnp.tril(jnp.ones((m, m), a.dtype))
    l1 = DS(l1.hi * tril, l1.lo * tril)
    x = DS(x.hi * tril, x.lo * tril)
    return l1, x


def diagonal(a: DS) -> DS:
    return dsmap(lambda t: jnp.diagonal(t, axis1=-2, axis2=-1), a)
