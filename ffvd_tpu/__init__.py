"""ffvd_tpu — a TPU-native JAX framework for Free-Form Variational inference in
Gaussian-Process State-Space Models (FFVD, ICML 2023).

Re-designed from scratch for TPU (jax / XLA / pallas / pjit):

- All per-latent-dim GP math is batched over the D independent GPs (one
  ``(D, M, M)`` Cholesky instead of D Python-loop factorizations).
- The whole negative free-form ELBO, its gradient, the scale-adapted SG-HMC
  sampler, the Adam hyper-step and the 21-sub-step FFVD training protocol run
  inside a single ``jit``-compiled, ``lax.scan``-fused update.
- Sequential pieces (posterior rollout, particle Gibbs) are ``lax.scan``;
  embarrassingly parallel pieces (chains, posterior samples, datasets) are
  ``vmap`` and shard over a ``jax.sharding.Mesh``.

Reference behavior parity is documented per-function with file:line citations
into the upstream TF implementation (xuhuifan/FFVD).
"""

from ffvd_tpu.config import FFVDConfig, CaseConfig, CASE_TABLE
from ffvd_tpu.model.params import GPSSMParams, init_params_from_warmstart
from ffvd_tpu.model.elbo import negative_elbo, elbo_terms
from ffvd_tpu.inference.trainer import Trainer
from ffvd_tpu.version import __version__

__all__ = [
    "FFVDConfig",
    "CaseConfig",
    "CASE_TABLE",
    "GPSSMParams",
    "init_params_from_warmstart",
    "negative_elbo",
    "elbo_terms",
    "Trainer",
    "__version__",
]
