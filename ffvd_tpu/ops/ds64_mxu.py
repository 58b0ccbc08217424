"""Double-single matmul on the MXU via Ozaki-style digit splitting.

``ops/ds64.py``'s matmul is deliberately VPU work: error-free two_prod per
element plus a pairwise compensated reduction, because a plain MXU matmul
rounds its fp32 accumulator on every step — exactly the bias ds64 exists to
remove.  That argument rules out using the MXU *naively*; it does not rule
out the MXU.  This module implements the classical Ozaki splitting scheme
(Ozaki et al. 2012; the int8-tensor-core DGEMM of Ootomo/Ozaki/Yokota 2024
is the same idea on GPUs) specialized to the TPU MXU's bf16 x bf16 -> fp32
datapath:

1. scale each row of A (column of B) by a power of two so |value| < 1
   (exact per double-single component);
2. peel the scaled value into ``_S`` digits of ``_Q`` bits each — every
   digit is an INTEGER of magnitude <= 2**_Q, hence exactly representable
   in bf16 (8 significand bits);
3. multiply digit matrices on the MXU.  Each product entry is a sum of k
   integer products bounded by k * 2**(2*_Q) <= 2**24, so every partial sum
   is an integer below 2**24 and the fp32 accumulation is EXACT — the MXU
   performs error-free long-integer arithmetic;
4. recombine the digit products, scaled by their known powers of two, with
   compensated double-single adds (cheap: O(#pairs * m * n) VPU flops).

Digit pairs (i, j) with i + j > ``_PMAX`` contribute below
2**(-_Q*_PMAX) ~ 2**-56 relative to the row/column scales and are dropped;
with _Q=7, _S=7 the kept digits span 49 bits — the full double-single
width.  Contractions longer than ``_K_EXACT`` = 2**(24-2*_Q) are chunked so
step 3's exactness bound holds.

Gradients: matmul is bilinear, so the VJP is two more matmuls.  A
``custom_vjp`` computes value-level cotangents with the same digit-split
algorithm (the (hi, lo) pair is a redundant encoding of one value;
d value/d hi = d value/d lo = 1, so both components receive the value
cotangent).  This matches the VPU path's effective gradient: autodiff
through error-free transformations is the value-level derivative evaluated
in fp32 (DESIGN.md section 13).

Speed: at FFVD shapes the VPU matmul costs ~40 flops per MAC on the VPU;
here the MACs ride the MXU (28 bf16 matmuls, each ~100x the VPU's flop
rate) and the VPU only touches O(m*k + k*n) digit extraction and
O(28 * m*n) recombination.  Measured end-to-end (drive C4 ds64 train step,
v5e, tests/golden/ds64_mxu_timings.json): 197.5 it/s vs the VPU backend's
63.8 — 3.1x, trajectory agreement 4e-5 after 500 iters — leaving ds64
~3.5x native fp32 instead of ~11x.  Selected by
``FFVD_DS64_MATMUL=auto|vpu|mxu`` (auto = mxu on TPU) through
``ds64.matmul``.  Auto never picks mxu on CPU: besides being pointless
there, XLA:CPU compiles a full ds64-mxu train step pathologically slowly
(>9 min observed vs ~1 min for the vpu path; TPU compiles both in ~30 s).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ffvd_tpu.ops import ds64 as ds
from ffvd_tpu.ops.ds64 import DS

_Q = 7                       # bits per digit
_S = 7                       # digits per operand (7*7 = 49 bits = dd width)
_PMAX = 8                    # keep digit pairs with i + j <= _PMAX
_K_EXACT = 1 << (24 - 2 * _Q)   # 1024: max exact-accumulation contraction


def _exp_of(x: jnp.ndarray) -> jnp.ndarray:
    """Exponent e with |x| < 2**e (e = biased exponent - 126), int32.
    Zeros map to e = -126 (scale 2**126 applied to 0 is still 0)."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32),
                                        jnp.int32)
    return ((bits >> 23) & 0xFF) - 126


def _pow2i(e: jnp.ndarray) -> jnp.ndarray:
    """Exact float32 2**e for int32 e in [-126, 127]."""
    e = jnp.clip(e, -126, 127)
    return jax.lax.bitcast_convert_type((e + 127) << 23, jnp.float32)


def _digits(x: DS, nd: int):
    """Peel ``nd`` digits of _Q bits off a scaled (|value| < 1) DS array.

    Digit i is an integer in [-2**_Q, 2**_Q] (bf16-exact), worth
    digit * 2**(-_Q*i).  The running remainder is kept in double-single so
    digits below the hi/lo boundary (bits 25..49) are exact too.
    """
    outs = []
    u = x
    for i in range(1, nd + 1):
        sc = np.float32(2.0 ** (_Q * i))
        inv = np.float32(2.0 ** (-_Q * i))
        d_int = jnp.round(u.hi * sc)          # power-of-2 scale: exact
        outs.append(d_int.astype(jnp.bfloat16))
        u = ds.add(u, DS(-d_int * inv, jnp.zeros_like(d_int)))
    return outs


def _mm_chunk(a: DS, b: DS) -> DS:
    """Digit-split (B, m, k) @ (B, k, n) for k <= _K_EXACT."""
    m, n = a.hi.shape[-2], b.hi.shape[-1]

    # Row scales of A, column scales of B (powers of two, exact to apply).
    ea = _exp_of(jnp.max(jnp.abs(a.hi), axis=-1, keepdims=True))  # (B,m,1)
    eb = _exp_of(jnp.max(jnp.abs(b.hi), axis=-2, keepdims=True))  # (B,1,n)
    a = ds.mul_pow2(a, _pow2i(-ea))
    b = ds.mul_pow2(b, _pow2i(-eb))

    ad = _digits(a, _S)                        # list of (B, m, k) bf16
    bd = _digits(b, _S)                        # list of (B, k, n) bf16
    # One matmul per A digit against the concatenation of the B digits it
    # pairs with (j <= _PMAX - i): bounded memory at M=512, and the MXU
    # sees 7 medium matmuls instead of 28 tiny ones.
    terms = []                                 # (i + j, value (B, m, n))
    for i in range(1, _S + 1):
        jmax = min(_S, _PMAX - i)
        if jmax < 1:
            continue
        bcat = jnp.concatenate(bd[:jmax], axis=-1)          # (B, k, jmax*n)
        prod = jax.lax.dot_general(
            ad[i - 1], bcat,
            dimension_numbers=(((ad[i - 1].ndim - 1,), (bcat.ndim - 2,)),
                               (tuple(range(ad[i - 1].ndim - 2)),
                                tuple(range(bcat.ndim - 2)))),
            preferred_element_type=jnp.float32)             # exact integers
        for j in range(1, jmax + 1):
            terms.append((i + j, prod[..., (j - 1) * n:j * n]))

    # Compensated recombination, largest scale (smallest i+j) first.
    terms.sort(key=lambda t: t[0])
    acc = None
    for t, v in terms:
        term = DS(v * np.float32(2.0 ** (-_Q * t)), jnp.zeros_like(v))
        acc = term if acc is None else ds.add(acc, term)

    # Undo the row/column scaling (two exact power-of-two multiplies).
    acc = ds.mul_pow2(acc, _pow2i(ea))
    return ds.mul_pow2(acc, _pow2i(eb))


def _mm_impl(a_hi, a_lo, b_hi, b_lo) -> Tuple[jnp.ndarray, jnp.ndarray]:
    a, b = DS(a_hi, a_lo), DS(b_hi, b_lo)
    k = a.hi.shape[-1]
    acc = None
    for c0 in range(0, k, _K_EXACT):
        c1 = min(k, c0 + _K_EXACT)
        part = _mm_chunk(ds.dsmap(lambda t: t[..., :, c0:c1], a),
                         ds.dsmap(lambda t: t[..., c0:c1, :], b))
        acc = part if acc is None else ds.add(acc, part)
    return acc.hi, acc.lo


@jax.custom_vjp
def _mm(a_hi, a_lo, b_hi, b_lo):
    return _mm_impl(a_hi, a_lo, b_hi, b_lo)


def _mm_fwd(a_hi, a_lo, b_hi, b_lo):
    return _mm_impl(a_hi, a_lo, b_hi, b_lo), (a_hi, a_lo, b_hi, b_lo)


def _mm_bwd(res, g):
    a_hi, a_lo, b_hi, b_lo = res
    g_hi, g_lo = g
    # The value-level cotangent is g_hi ALONE.  Two downstream consumer
    # shapes exist and both agree: (a) a value-like consumer (to_f32 =
    # hi + lo) sends the value cotangent to BOTH components, and summing
    # them would double it; (b) another EFT op, whose autodiff gives its
    # lo output algebraically-zero input derivatives, sends g_lo ~ 0 and
    # the value cotangent in g_hi.  Either way g_hi carries the value
    # cotangent exactly once (parity with matmul_vpu checked in
    # tests/test_ds64.py::test_mxu_grad_matches_vpu).
    del g_lo
    gd = DS(g_hi, jnp.zeros_like(g_hi))
    da = DS(*_mm_impl(gd.hi, gd.lo, *_t2(b_hi, b_lo)))       # g @ B^T
    db = DS(*_mm_impl(*_t2(a_hi, a_lo), gd.hi, gd.lo))       # A^T @ g
    da_v, db_v = ds.to_f32(da), ds.to_f32(db)
    # d value / d hi = d value / d lo = 1 (the pair encodes one value).
    return da_v, da_v, db_v, db_v


def _t2(hi, lo):
    return hi.swapaxes(-1, -2), lo.swapaxes(-1, -2)


_mm.defvjp(_mm_fwd, _mm_bwd)


def matmul(a: DS, b: DS) -> DS:
    """(..., m, k) @ (..., k, n) in double-single on the MXU."""
    bshape = jnp.broadcast_shapes(a.hi.shape[:-2], b.hi.shape[:-2])
    a = ds.dsmap(lambda t: jnp.broadcast_to(t, bshape + t.shape[-2:]), a)
    b = ds.dsmap(lambda t: jnp.broadcast_to(t, bshape + t.shape[-2:]), b)
    return DS(*_mm(a.hi, a.lo, b.hi, b.lo))
