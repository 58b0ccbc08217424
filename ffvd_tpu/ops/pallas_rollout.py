"""Pallas TPU kernel: fused free-running GPSSM rollout.

The posterior-predictive rollout (eval/rollout.py, rebuild of
base_model.py:286-310) is a T-step sequential recursion whose per-step work
is tiny: one D-batched SE cross-covariance against Z (M rows), two matvecs
against cached (D, M, M) factors, and a D-dim Gaussian draw.  As a
``lax.scan`` this executes T × a-dozen micro-ops; here the ENTIRE rollout is
one Pallas kernel:

- all caches (scaled inducing inputs, Lm⁻¹, U, q(U) covariance factor) stay
  resident in VMEM for all T steps,
- the time loop is a ``fori_loop`` inside the kernel,
- per-step Gaussian noise comes from the on-chip PRNG
  (``pltpu.prng_random_bits`` + Box-Muller),
- posterior samples are the (embarrassingly parallel) Pallas grid, each with
  its own derived seed and its own output block.

fp32-only (TPU has no fp64); the fp64/CPU path keeps the lax.scan
implementation, which doubles as the reference oracle in tests
(tests/test_pallas_rollout.py compares both with noise disabled, and
moment-matches with noise on).

STATUS — EXPERIMENTAL, not wired into the default eval path.  Measured on a
v5e chip at the benchmark shapes (D=4, M=100, Din=6, T=500, S=10/64):

    pallas (this kernel): ~47 ms        XLA vmapped lax.scan: ~3 ms

The model's tensors are tiny and tile-hostile (last dims 4-6 pad to the
128-wide lane, sublane dims of 4-10 pad to 8), so the hand-written kernel
loses to XLA's fusion by ~16× despite VMEM residency and on-chip RNG.  The
kernel is kept because (a) it validates the on-chip Box-Muller PRNG path
(noise std within 0.5% of target on hardware), and (b) the structure becomes
competitive only at MXU-aligned sizes (M≥512 with S≥128), which future model
families may hit.  The production rollout is eval/rollout.py's scan.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * math.pi


def bits_to_normal(bits1: jnp.ndarray, bits2: jnp.ndarray) -> jnp.ndarray:
    """Box-Muller: two uint32 bit arrays → standard normals (pure jax ops,
    unit-testable outside the kernel)."""
    # uint32 -> uniform: keep the top 24 bits (the shifted value fits in
    # int32, which Mosaic CAN cast to f32 — a direct uint32→f32 cast is
    # unsupported); +1 so log(u1) stays finite.
    shift = jnp.uint32(8)

    def to_f32(bits):
        shifted = jax.lax.shift_right_logical(bits, shift)
        return jax.lax.bitcast_convert_type(shifted, jnp.int32) \
            .astype(jnp.float32)

    u1 = (to_f32(bits1) + 1.0) * (2.0 ** -24)
    u2 = to_f32(bits2) * (2.0 ** -24)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _normals(shape):
    """Standard normals from on-chip PRNG bits via Box-Muller.

    NOTE: the Mosaic TPU *interpreter* stubs prng_random_bits with zeros
    (every draw becomes the constant √(48·ln2)·cos(0) ≈ 5.77) — noise-path
    statistics can only be validated on real hardware; interpret-mode tests
    use zero_noise=True."""
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits_to_normal(bits1, bits2)


def _rollout_kernel(seed_ref, x0_ref, zs_ref, ils_ref, var_ref, lminv_ref,
                    u_ref, q_ref, ctrl_ref, qsqrt_ref, xs_ref, vs_ref,
                    *, t_len: int, zero_noise: bool, has_qsqrt: bool):
    """All S posterior samples' trajectories in one program: the sample axis
    is VECTORIZED inside the kernel (a TPU Pallas grid executes its steps
    sequentially, so gridding over samples would serialize them).

    Shapes (S samples, D latent, M inducing, Din GP-input dims, CU controls):
      x0 (S, D), zs (D, M, Din) pre-scaled Z/ℓ, ils (D, Din) = 1/ℓ,
      var (1, D), lminv (D, M, M), u (M, D), q (1, D), ctrl (T, CU),
      qsqrt (D, M, M); outputs xs, vs (S, T, D).
    """
    pltpu.prng_seed(seed_ref[0])

    s = x0_ref.shape[0]
    d = x0_ref.shape[1]
    zs = zs_ref[:]                   # (D, M, Din)
    ils = ils_ref[:]                 # (D, Din)
    kvar = var_ref[0, :]             # (D,)
    lminv = lminv_ref[:]             # (D, M, M)
    ut = u_ref[:].T                  # (D, M)
    q = q_ref[0, :]                  # (D,)

    def step(t, x):                  # x: (S, D)
        ctrl_t = ctrl_ref[t, :]                              # (CU,)
        xc = jnp.concatenate(
            [x, jnp.tile(ctrl_t[None, :], (s, 1))], axis=1)  # (S, Din)
        xcs = xc[None, :, :] * ils[:, None, :]               # (D, S, Din)
        diff = zs[:, :, None, :] - xcs[:, None, :, :]        # (D, M, S, Din)
        r2 = jnp.sum(diff * diff, axis=-1)                   # (D, M, S)
        e = jnp.exp(-0.5 * r2)                               # (D, M, S)
        # a[d,:,s] = σ²_d·Lm⁻¹_d e_{d,s}: the σ² is pre-folded into lminv
        # outside the kernel (Mosaic can't reshape a (D,) vector to (D,1,1)).
        a = jax.lax.dot_general(
            lminv, e,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (D, M, S)
        mean = jnp.sum(a * ut[:, :, None], axis=1).T         # (S, D)
        var = kvar[None, :] - jnp.sum(a * a, axis=1).T       # (S, D)
        if has_qsqrt:
            w = jax.lax.dot_general(
                qsqrt_ref[:], a,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # Lᵀa (D, M, S)
            var = var + jnp.sum(w * w, axis=1).T
        var_tot = var + q[None, :]
        if zero_noise:
            noise = jnp.zeros((s, d), jnp.float32)
        else:
            noise = _normals((s, d))
        x_next = x + mean + jnp.sqrt(jnp.maximum(var_tot, 0.0)) * noise
        xs_ref[:, t, :] = x_next
        vs_ref[:, t, :] = var_tot
        return x_next

    jax.lax.fori_loop(0, t_len, step, x0_ref[:])


def pallas_rollout(kparams, z: jnp.ndarray, lm_inv: jnp.ndarray,
                   u_val: jnp.ndarray, q_sqrt: Optional[jnp.ndarray],
                   q: jnp.ndarray, x0: jnp.ndarray, controls: jnp.ndarray,
                   seed, num_samples: int,
                   zero_noise: bool = False,
                   interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`num_samples` independent rollouts of length T = controls.shape[0].

    SE kernel, fp32.  Returns (xs (S, T, D), var_tot (S, T, D))."""
    f32 = jnp.float32
    d = x0.shape[0]
    m = z.shape[0]
    t_len = controls.shape[0]
    ils = jnp.exp(-kparams.log_lengthscales).astype(f32)      # (D, Din)
    zs = z[None, :, :].astype(f32) * ils[:, None, :]          # (D, M, Din)
    kvar_vec = jnp.exp(kparams.log_variance).astype(f32)      # (D,)
    kvar = kvar_vec[None, :]
    lm_inv = lm_inv.astype(f32) * kvar_vec[:, None, None]     # σ²-folded
    has_qsqrt = q_sqrt is not None
    qsq = (q_sqrt.astype(f32) if has_qsqrt
           else jnp.zeros((d, m, m), f32))
    controls = controls.astype(f32)
    if controls.shape[1] == 0:
        # Pallas wants a real trailing lane: pad a zero control column and a
        # matching zero 1/ℓ (and Z) column — contributes 0 to distances.
        controls = jnp.zeros((t_len, 1), f32)
        ils = jnp.concatenate([ils, jnp.zeros((d, 1), f32)], axis=1)
        zs = jnp.concatenate([zs, jnp.zeros((d, m, 1), f32)], axis=2)

    kernel = functools.partial(_rollout_kernel, t_len=t_len,
                               zero_noise=zero_noise, has_qsqrt=has_qsqrt)
    if interpret is True:
        # The generic HLO interpreter can't emulate the TPU PRNG primitives;
        # the Mosaic TPU interpreter can (runs on CPU for tests).
        interpret = pltpu.InterpretParams()
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    x0_b = jnp.broadcast_to(x0.astype(f32)[None, :], (num_samples, d))
    xs, vs = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            vmem(),                                           # x0 (S, D)
            vmem(),                                           # zs
            vmem(),                                           # ils
            vmem(),                                           # kvar
            vmem(),                                           # lminv
            vmem(),                                           # u
            vmem(),                                           # q
            vmem(),                                           # ctrl
            vmem(),                                           # qsqrt
        ],
        out_specs=(vmem(), vmem()),
        out_shape=(jax.ShapeDtypeStruct((num_samples, t_len, d), f32),
                   jax.ShapeDtypeStruct((num_samples, t_len, d), f32)),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), x0_b, zs, ils,
      kvar, lm_inv.astype(f32), u_val.astype(f32), q.astype(f32)[None, :],
      controls, qsq)
    return xs, vs
