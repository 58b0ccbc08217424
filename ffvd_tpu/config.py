"""Configuration for the FFVD GPSSM rebuild.

Mirrors the reference's mutable ``Model.ARGS`` bag (models.py:21-41) and the
case table (FFVD_Main.py:273-324) as frozen dataclasses / plain data.  The two
CLI quirks called out in SURVEY.md §2.7 are fixed deliberately:

- ``x_dim`` is a real integer flag (reference's ``--x_dims type=list`` was
  unusable from the CLI, FFVD_Main.py:367).
- ``posterior_sample_spacing`` defaults to 32 and is honored (the reference
  silently overrode the flag to 32 at FFVD_Main.py:331).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

PRIOR_TYPES = ("uniform", "normal", "determinantal", "strauss")
KERNEL_TYPES = ("SquaredExponential", "LinearK")

DATASETS = ("dryer", "drive", "gas_furnace", "actuator", "flutter", "ballbeam")
# Index order of the reference's --file_index flag (FFVD_Main.py:383).
FILE_INDEX_ORDER = DATASETS

# Stock datasets where the seeded deep-transition study measured a win for
# n_layers=2 (PARITY §2b-deep, tests/golden/deep_study.json): flutter RMSE
# 1.8-2.4x below shallow over 3 seeds, drive 1.2x below over 3 seeds.  On
# the remaining stock datasets deep-2 is parity-to-worse (actuator DEGRADES
# 2-5x; gas_furnace/dryer/ballbeam tie within seed spread) — the usage
# guard in api.FFVDModel warns when n_layers > 1 is configured for them.
DEEP_UNDERFIT_DATASETS = ("flutter", "drive")


@dataclasses.dataclass(frozen=True)
class CaseConfig:
    """One row of the reference's case table (FFVD_Main.py:273-324).

    ``kernel_optimization`` / ``u_optimization`` / ``z_optimization`` mean
    "this block is Adam-trainable"; when False (and not collapsed) the block is
    sampled by SG-HMC instead (dgp_model.py:213-243).
    """

    name: str
    kernel_optimization: bool
    u_optimization: bool
    z_optimization: bool
    u_collapse: bool
    x_pg: bool


CASE_TABLE = {
    1: CaseConfig("C1", True, True, True, False, False),
    2: CaseConfig("C2", False, False, True, False, False),
    3: CaseConfig("C3", False, False, False, False, False),
    4: CaseConfig("C4", True, False, True, True, False),
    5: CaseConfig("C5", False, False, True, True, False),
    6: CaseConfig("C6", True, True, True, False, True),
    # C7 is only reachable programmatically in the reference
    # (dgp_model.py:62,181,215-218): X and U sampled, everything else frozen.
    7: CaseConfig("C7", False, False, False, False, False),
}


@dataclasses.dataclass(frozen=True)
class FFVDConfig:
    """Full experiment configuration (reference: argparse FFVD_Main.py:355-379
    merged with ARGS mutations FFVD_Main.py:236-340)."""

    dataset: str = "ballbeam"
    case: int = 4
    num_inducing: int = 100
    x_dim: int = 4
    iterations: int = 2000          # outer loop runs 2 * iterations (models.py:142)
    window_size: int = 64
    num_posterior_samples: int = 10
    posterior_sample_spacing: int = 32
    prior_type: str = "normal"      # CLI default (FFVD_Main.py:378)
    kernel_type: str = "SquaredExponential"
    kernel_train_flag: bool = True
    likelihood_training: bool = True
    hyperparameter_sampling: bool = False
    epsilon: float = 0.01           # SGHMC step size (FFVD_Main.py:343)
    mdecay: float = 0.05            # SGHMC momentum decay (dgp_model.py:161)
    adam_lr: float = 0.003          # base lr; effective lr = 0.003*0.95^(1/1000)
    # CSMC pool size.  100 = the reference's hardcoded CPU-era value
    # (base_model.py:78), kept for parity.  The particle axis is vmapped,
    # so on TPU a 5x budget costs ~13% wall-clock and measurably pays on
    # hard datasets: drive ancestor-trace at P=500 removed the 1-in-8
    # worse-optimum chain outlier (PARITY §2b, drive_C6_ancestorP500_s*)
    # — use 500 for production runs there.
    pg_particles: int = 100
    jitter: float = 1e-5            # Kmm jitter (conditionals_multi_output.py:108)
    # fp32 guards for the sampler (the fp64 reference merely wanders through
    # these regimes; fp32 overflows).  All are far outside the useful
    # region, so healthy chains never touch them.  None disables.
    # 1) sampled log-parameters clipped to ±sghmc_log_clip — a REFLECTING
    #    BARRIER inside the objective's cliff.  Measured on the escaping
    #    flutter×C5 fp32 chain (tests/golden/catapult_state_*.npz +
    #    grad_crosscheck.py): the fp64 objective is a near-flat plateau in
    #    the sampled log-variance up to ≈ +20, then turns catastrophic at
    #    ≈ +21-29; fp64 chains bounce off that cliff on exact gradients,
    #    while fp32 gradients there are conditioning-garbage, so the chain
    #    diffuses across and pins at the clip with a frozen preconditioner.
    #    ±12 (e^±12 = 1.6e5/6e-6, far beyond any useful hyperparameter)
    #    keeps fp32 chains on the recoverable plateau.  Round 2's ±30
    #    default only guarded exp() overflow — too far outside the cliff.
    sghmc_log_clip: Optional[float] = 12.0
    # 1b) LOWER bound for the same clip.  The measured cliff is one-sided
    #    (positive log-variance, +21-29); mirroring the +12 barrier at −12
    #    would forbid Q values extended training legitimately reaches
    #    (ds64 runs settle at Q ~ 1e-6, log_q ≈ −13.8 — PARITY §2f) and
    #    silently move warm starts with Q_sqrt < e^−6.  −30 is round 2's
    #    exp-overflow-only guard: e^−30 ≈ 9e−14 is below any useful
    #    hyperparameter, and e^{+2·30} stays finite in fp32 wherever a
    #    sampled log-parameter appears under exp(±·).  None mirrors the
    #    upper bound (symmetric ±sghmc_log_clip).  No clipping at all when
    #    sghmc_log_clip is None.
    sghmc_log_clip_lower: Optional[float] = -30.0
    # 2) per-element gradient magnitude clipped to sghmc_grad_clip and
    #    non-finite gradients zeroed before the SGHMC update — an inf grad
    #    would make ε²·M⁻¹·∇ = 0·inf = NaN (grad² overflows fp32 first at
    #    |∇| ≈ 2e19).  The RMS preconditioner makes the update scale-free,
    #    so clipping huge gradients barely perturbs the dynamics.
    sghmc_grad_clip: Optional[float] = 1e6
    # 3) trust-region gradient guard: per element, |∇| is clipped to
    #    max(spike_clip·√g2, 1.0) where √g2 is the SG-HMC preconditioner's
    #    own running RMS gradient.  The measured fp32 escape fuel is a
    #    single garbage sub-step gradient (−79.8 amid ±0.02 neighbors,
    #    catapult_flutter_C5_s0.jsonl iter 585) whose momentum impulse
    #    coasts ~1/mdecay sub-steps (+1.4 log-units); a 20× running-RMS
    #    outlier is numerical garbage by construction, and the absolute
    #    floor of 1.0 leaves legitimately large early-burn-in gradients
    #    alone.  None disables.
    sghmc_spike_clip: Optional[float] = 20.0
    # 4) per-sub-step momentum (= parameter move) bound.  A healthy chain
    #    moves |Δθ| ≲ 0.05 per sub-step at the reference's ε=0.01; the fp32
    #    escape (PARITY §2b-deep) is a CATAPULT — one sub-step jumping a
    #    log-hyperparameter by ~25 when an ill-conditioned fp32 Cholesky
    #    yields a garbage gradient against a stale preconditioner.  ±1.0
    #    keeps any single move inside the recoverable region (where accurate
    #    gradients are restoring) while being 20×+ above anything a healthy
    #    chain does, so reference semantics are untouched.  None disables.
    sghmc_p_clip: Optional[float] = 1.0
    # PRNG implementation for training keys: 'threefry2x32' (JAX default,
    # splittable/stable) or 'rbg' (hardware-friendly, ~1.5x faster sampler
    # throughput on TPU for SGHMC-heavy cases).
    prng_impl: str = "threefry2x32"
    # Unroll factor for the 21-sub-step SGHMC scan (trainer._sghmc_phase).
    # >1 lets XLA fuse/pipeline across sub-steps at the cost of a larger
    # program (the scan is inside the outer per-iteration scan, so compile
    # time grows with it).  Trajectories are identical for any value.
    sghmc_unroll: int = 1
    # Particle Gibbs: False = the reference's storage (resampled states per
    # time, no ancestry — trajectories are filtering-marginal patchworks,
    # base_model.py:83-133); True = proper ancestor-traced CSMC whose output
    # is a coherent smoothing-posterior draw.  None (default) resolves to
    # True — ancestor tracing is the production default per the round-4
    # 15-run study (tests/golden/pg_c6_study.json, PARITY §2b): ballbeam
    # 5-seed RMSE median 0.0064, inside the reference's 0.0060-0.0083
    # regime, vs live-CSMC 0.08-0.92 (13-150x worse — the patchwork
    # trajectories inject incoherent dynamics every sweep) — except under
    # pg_compat_noop, where it resolves to False (the PG update is an
    # identity, so the mode choice is moot and the pair would otherwise be
    # rejected as contradictory).  Pass False explicitly for the
    # reference's live-CSMC storage semantics.
    pg_ancestor_trace: Optional[bool] = None
    # Bug-compat: the reference's PG op NEVER updates X — PG_for_X_speedup
    # returns ``tf.ones(1)`` (base_model.py:138) and the
    # ``tf.compat.v1.assign`` at :137 is not a dependency of that fetch, so
    # ``session.run(pg_x_sampling_op)`` executes an input-less constant
    # (verified empirically against the reference graph: X is bit-identical
    # after gp_x_sampling() calls).  Reference C6 is therefore "C1 with X
    # frozen at its warm start".  True reproduces that: pg_fn becomes the
    # identity and X stays at initialization.  False (default) runs the
    # conditional-SMC resampling the reference *intended*.
    pg_compat_noop: bool = False
    # Random-window minibatch training: size of the time window per gradient
    # evaluation (None = full batch, the reference's only exercised mode).
    # The reference carries the plumbing (batch_placeholder base_model.py:16,
    # the batch_size≠Y_N H-scaling conditionals_multi_output.py:246-248) but
    # get_minibatch always returns the full range (base_model.py:188-194);
    # here windows are sampled uniformly per gradient evaluation.
    minibatch_size: Optional[int] = None
    # Bug-compat: reproduce the reference's rollout q_sqrt indexing slip —
    # conditional_after_kernel_precalculation applies latent dim 0's q(U)
    # Cholesky factor to EVERY dim's predictive variance (the (D,M,M) q_sqrt
    # broadcasts against the (1,M,N) tiled projection inside
    # base_conditional_after_kernel_precalculation, then the [:, :, 0] at
    # conditionals_multi_output.py:322 keeps only the dim-0 slice).  False =
    # correct per-dim factor (our default); True = reference behavior, for
    # NLL-parity studies (PARITY.md).
    rollout_qsqrt_dim0: bool = False
    # Emission noise model: "auto" = diagonal R for P=1 observations, full
    # lower-Cholesky R for P>1 (the reference's logdensity_norm path,
    # likelihoods.py:114-127, made live — its own P>1 ELBO is broken,
    # dgp_model.py:250).  "diag"/"full" force one or the other.
    emission_noise: str = "auto"
    # Deep transition: number of GP layers (1 = the reference model).  The
    # reference parses --n_layers (FFVD_Main.py:371) but its deep path is
    # dead code (propagate() has no call site, the ELBO reads only
    # layers[-1]); here n_layers > 1 trains a real doubly-stochastic deep
    # sparse-GP transition (model/deep.py) with n_layers−1 hidden layers.
    n_layers: int = 1
    # Sampler cases (C2/C3/C5) x deep: False (default) trains the hidden
    # layers' u/z/kernel by Adam (MAP point estimates) and applies the
    # case's SGHMC partition only to the HEAD layer.  A sampled hidden
    # log-variance directly scales the injected inter-layer noise —
    # defense-in-depth against the fp32 sampler's escape region (note:
    # flutter C5 escapes even SHALLOW at fp32, so MAP hidden narrows, not
    # closes, that region — PARITY.md §2b-deep).  True restores the
    # per-layer partition (the reference applies its flags per layer,
    # dgp_model.py:213-243 — for its dead deep path).
    deep_sample_hidden: bool = False
    # Hidden-layer initialization: σ²_hidden = scale·σ²_head (see
    # params.init_hidden_layers).  < 1 shrinks the inter-layer noise injected
    # at the start of deep training — matters on short/noisy datasets where
    # the injected noise can push the warm-started head off its basin
    # (actuator study, PARITY §2b-deep).
    deep_hidden_init_scale: float = 1.0
    # Precision of the collapsed GP bound segment (gram → precal →
    # collapsed terms).  "native": the params' own dtype (fp64 matches the
    # reference, base_model.py:18; fp32 is the TPU production mode).
    # "ds64": double-single (two-float32) arithmetic (ops/ds64.py) — fp64
    # quality for the one segment whose fp32 gradient is measurably BIASED
    # near the optimum (docs/DESIGN.md §12; only matters for extended
    # training, ≳3× the reference protocol length).  "hybrid": native fp32
    # for the burn-in, ds64 for the last ``hybrid_tail_iters`` of the run
    # (api.FFVDModel.fit) — the measured bias is a NEAR-OPTIMUM phenomenon
    # (DESIGN §12), so the tail-only schedule pays the ds64 cost where it
    # matters.  Measured scope (PARITY §2d round-4/5 addenda): COLD starts
    # only — there the tail closes ~84% of the native→ds64 learned-Q gap
    # at 1/8 the ds64 iterations (hybrid_coldstart_study.json); for
    # WARM-started runs the whole trajectory sits in the biased region and
    # the tail buys nothing — use native or full ds64.  Eval-side
    # collapse/precal run ds64 in both modes.  Collapsed cases (C4/C5)
    # only; ignored when the case keeps U uncollapsed.
    collapse_precision: str = "native"
    # chol_and_inv refinement rounds for the ds64 segment.  None = the
    # ops/ds64 module default (see ds64._DEFAULT_REFINE — production 1
    # after the round-4 revalidation; 2 for the ill-conditioned edge).
    ds64_refine: Optional[int] = None
    # collapse_precision="hybrid": how many FINAL iterations of each
    # ``FFVDModel.fit`` call run with the ds64 bound (the rest run native).
    hybrid_tail_iters: int = 500
    file_id: int = 3                # warm-start file selector (FFVD_Main.py:363)
    seed: int = 0

    def __post_init__(self):
        if self.prior_type not in PRIOR_TYPES:
            raise ValueError(f"invalid prior_type {self.prior_type!r}")
        if self.kernel_type not in KERNEL_TYPES:
            raise ValueError(f"invalid kernel_type {self.kernel_type!r}")
        if self.case not in CASE_TABLE:
            raise ValueError(f"invalid case {self.case}")
        if self.emission_noise not in ("auto", "diag", "full"):
            raise ValueError(f"invalid emission_noise {self.emission_noise!r}")
        if self.collapse_precision not in ("native", "ds64", "hybrid"):
            raise ValueError(
                f"invalid collapse_precision {self.collapse_precision!r}")
        if self.ds64_refine is not None and self.ds64_refine < 0:
            raise ValueError("ds64_refine must be >= 0 or None")
        if self.hybrid_tail_iters < 0:
            raise ValueError("hybrid_tail_iters must be >= 0")
        if self.minibatch_size is not None and self.minibatch_size < 1:
            raise ValueError("minibatch_size must be >= 1 or None")
        if self.n_layers < 1:
            raise ValueError("n_layers must be >= 1")
        if (self.sghmc_log_clip is not None
                and self.sghmc_log_clip_lower is not None
                and self.sghmc_log_clip_lower >= self.sghmc_log_clip):
            raise ValueError(
                "sghmc_log_clip_lower must be < sghmc_log_clip "
                f"({self.sghmc_log_clip_lower} >= {self.sghmc_log_clip})")
        if self.pg_ancestor_trace is None:
            object.__setattr__(self, "pg_ancestor_trace",
                               not self.pg_compat_noop)
        elif self.pg_compat_noop and self.pg_ancestor_trace:
            raise ValueError(
                "pg_compat_noop and pg_ancestor_trace are mutually exclusive: "
                "compat-noop makes the PG update an identity (the reference's "
                "dead assign), so an ancestor-traced CSMC would silently "
                "never run")

    @property
    def log_clip_bounds(self) -> Optional[tuple]:
        """(lower, upper) bounds for SGHMC-sampled log-parameters, or None
        when clipping is disabled (sghmc_log_clip=None).  The lower bound
        defaults to sghmc_log_clip_lower (asymmetric — see the field docs);
        a None lower mirrors the upper bound."""
        if self.sghmc_log_clip is None:
            return None
        lo = (-self.sghmc_log_clip if self.sghmc_log_clip_lower is None
              else self.sghmc_log_clip_lower)
        return (lo, self.sghmc_log_clip)

    @property
    def case_config(self) -> CaseConfig:
        return CASE_TABLE[self.case]

    @property
    def total_iterations(self) -> int:
        """The reference loop runs 2×iterations actual steps (models.py:142)."""
        return 2 * self.iterations


# ---------------------------------------------------------------------------
# Trainability partition
# ---------------------------------------------------------------------------

ADAM, SGHMC, FROZEN = "adam", "sghmc", "frozen"


@dataclasses.dataclass(frozen=True)
class Partition:
    """Label per parameter block: 'adam' | 'sghmc' | 'frozen'.

    Semantics follow dgp_model.py:213-243 + Layer.__init__ (dgp_model.py:45-94)
    + kernels_multi_output.py:156-161 + likelihoods.py:12-61.
    """

    x: str
    u: str
    z: str
    kernel: str
    log_q: str
    lik: str  # C, d, log_Rchol together


def partition_for(cfg: FFVDConfig) -> Partition:
    cc = cfg.case_config
    if cfg.case == 7:
        return Partition(x=SGHMC, u=SGHMC, z=FROZEN, kernel=FROZEN,
                         log_q=FROZEN, lik=FROZEN)

    x = FROZEN if cc.x_pg else ADAM
    u = FROZEN if cc.u_collapse else (ADAM if cc.u_optimization else SGHMC)
    z = ADAM if cc.z_optimization else SGHMC
    if cc.kernel_optimization:
        kernel = ADAM
    else:
        kernel = SGHMC if cfg.kernel_train_flag else FROZEN
    if cfg.hyperparameter_sampling:
        log_q = SGHMC
        lik = SGHMC
    else:
        log_q = ADAM
        lik = ADAM if cfg.likelihood_training else FROZEN
    return Partition(x=x, u=u, z=z, kernel=kernel, log_q=log_q, lik=lik)
