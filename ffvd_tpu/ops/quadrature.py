"""Gauss-Hermite quadrature for Gaussian expectations.

Rebuild of ``vfegpssm/quadrature.py`` (a GPflow copy) with its two latent bugs
fixed deliberately (SURVEY.md §2.7): no ``collections.Iterable`` import (broken
on py≥3.10) and no forced float32 cast — dtype follows the inputs.
"""

from __future__ import annotations

import itertools
from typing import Callable, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def hermgauss(n: int, dtype=np.float64):
    """Nodes/weights of n-point Gauss-Hermite quadrature (quadrature.py:22-25)."""
    x, w = np.polynomial.hermite.hermgauss(n)
    return x.astype(dtype), w.astype(dtype)


def mvhermgauss(h: int, dim: int, dtype=np.float64):
    """Multivariate GH grid: H^dim points over dim dimensions
    (quadrature.py:28-43)."""
    gh_x, gh_w = hermgauss(h, dtype)
    x = np.array(list(itertools.product(*(gh_x,) * dim)))
    w = np.prod(np.array(list(itertools.product(*(gh_w,) * dim))), axis=1)
    return x, w


def mvnquad(func: Callable, means, covs, h: int, din: int):
    """Multivariate Gaussian expectation by full Gauss-Hermite grid
    (quadrature.py:46-89 semantics).  means (N, Din), covs (N, Din, Din)."""
    xn, wn = mvhermgauss(h, din)
    chols = jnp.linalg.cholesky(covs)                      # (N, Din, Din)
    # X[n, k, :] = mean_n + sqrt(2) L_n x_k
    pts = means[:, None, :] + jnp.sqrt(2.0) * jnp.einsum(
        "nij,kj->nki", chols, jnp.asarray(xn, means.dtype))
    fx = func(pts)                                          # (N, K, ...)
    w = jnp.asarray(wn, means.dtype) * (jnp.pi ** (-0.5 * din))
    return jnp.tensordot(fx, w, axes=[[1], [0]]) if fx.ndim > 2 else fx @ w


def ndiag_mc(funcs: Union[Callable, Sequence[Callable]], s: int, fmu, fvar,
             key, logspace: bool = False, epsilon=None, **ys):
    """Monte-Carlo counterpart of ndiagquad (quadrature.py:198-241):
    S-sample Gaussian expectation over diagonal N(fmu, fvar)."""
    import jax
    single = callable(funcs)
    fns = [funcs] if single else list(funcs)
    fmu = jnp.asarray(fmu)
    fvar = jnp.asarray(fvar)
    if epsilon is None:
        epsilon = jax.random.normal(key, (s,) + fmu.shape, fmu.dtype)
    xn = fmu[None] + jnp.sqrt(jnp.clip(fvar, 0.0))[None] * epsilon
    ys_b = {k: jnp.asarray(v)[None] for k, v in ys.items()}
    results = []
    for fn in fns:
        fx = fn(xn, **ys_b)
        if logspace:
            res = jax.scipy.special.logsumexp(fx, axis=0) - jnp.log(float(s))
        else:
            res = jnp.mean(fx, axis=0)
        results.append(res)
    return results[0] if single else results


def ndiagquad(funcs: Union[Callable, Sequence[Callable]], h: int,
              fmu, fvar, logspace: bool = False, **ys):
    """Expectation of f(F) under diagonal Gaussians N(fmu, fvar) via H-point
    Gauss-Hermite (quadrature.py:92-195 semantics).

    Two input forms, matching the reference:

    - arrays ``fmu``/``fvar`` of matching shape (N, 1) or (N,): single latent;
      each func receives one positional argument with a trailing quadrature
      axis of length H.
    - Din-tuples/lists of such arrays (quadrature.py:159-173): the expectation
      runs over Din *independent* latents on the full H**Din tensor-product
      grid; each func receives Din positional arguments of shape (N, H**Din)
      (elementwise, like the reference's ``f(*Xs, **Ys)``) and the result has
      the shape of ``fmu[0]``.

    ``ys`` are extra broadcastable arguments passed to each func by keyword.
    """
    single = callable(funcs)
    fns = [funcs] if single else list(funcs)
    if isinstance(fmu, (tuple, list)):
        if not isinstance(fvar, (tuple, list)) or len(fvar) != len(fmu):
            raise ValueError("Fmu and Fvar must be tuples of the same length")
        din = len(fmu)
        first = jnp.asarray(fmu[0])
        shape, dtype = first.shape, first.dtype
        mus = [jnp.reshape(jnp.asarray(f, dtype), (-1,)) for f in fmu]
        vrs = [jnp.reshape(jnp.asarray(f, dtype), (-1,)) for f in fvar]
        xn, wn = mvhermgauss(h, din)                    # (H**Din, Din), (H**Din,)
        gh_w = jnp.asarray(wn * np.pi ** (-0.5 * din), dtype)
        # Xs[i][n, k] = mu_i[n] + sqrt(2 var_i[n]) x_k[i]  (quadrature.py:172-173)
        xs = [m[:, None] + jnp.sqrt(2.0 * jnp.clip(v, 0.0))[:, None]
              * jnp.asarray(xn[:, i], dtype)
              for i, (m, v) in enumerate(zip(mus, vrs))]
        ys_b = {k: jnp.reshape(jnp.asarray(v), (-1, 1)) for k, v in ys.items()}
        results = []
        for fn in fns:
            fx = fn(*xs, **ys_b)                        # (N, H**Din)
            if logspace:
                res = jax.scipy.special.logsumexp(fx + jnp.log(gh_w), axis=-1)
            else:
                res = fx @ gh_w
            results.append(jnp.reshape(res, shape))
        return results[0] if single else results
    fmu = jnp.asarray(fmu)
    fvar = jnp.asarray(fvar)
    gh_x, gh_w = hermgauss(h, np.float64)
    gh_x = jnp.asarray(gh_x, dtype=fmu.dtype)
    gh_w = jnp.asarray(gh_w / np.sqrt(np.pi), dtype=fmu.dtype)
    # X[..., k] = fmu + sqrt(2 fvar) x_k
    xn = fmu[..., None] + jnp.sqrt(2.0 * jnp.clip(fvar, 0.0)[..., None]) * gh_x
    ys_b = {k: jnp.asarray(v)[..., None] for k, v in ys.items()}

    results = []
    for fn in fns:
        fx = fn(xn, **ys_b)
        if logspace:
            res = jax.scipy.special.logsumexp(fx + jnp.log(gh_w), axis=-1)
        else:
            res = jnp.sum(fx * gh_w, axis=-1)
        results.append(res)
    return results[0] if single else results
