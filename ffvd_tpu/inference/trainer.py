"""The FFVD training protocol, fused into jit/scan.

The reference's hot loop (models.py:142-197, §3.2 of SURVEY.md) runs, per
outer iteration:

  1. ``sghmc_step``: 1 burn-in + 10×(burn-in + sample) = 21 separate TF1
     session.run graph executions, each a full nll-gradient evaluation
     (base_model.py:915-925);
  2. a snapshot of the SG-HMC variables into a sliding window of 64
     (base_model.py:927-933);
  3. (C6) one particle-Gibbs sweep over the latent trajectory;
  4. ``train_hypers``: one Adam step on the nll with the SG-HMC variables fed
     from a random window sample — Monte-Carlo-EM style
     (base_model.py:944-950).

Here the whole outer iteration is ONE pure function; the 21 SG-HMC sub-steps
are a ``lax.scan`` over a burn/sample flag vector, and whole stretches of
outer iterations are scanned in a single jit so the TF1 21-executions-per-step
overhead disappears entirely.  When the case's SG-HMC variable set is empty
(default C4 — see SURVEY.md §2.2) the sampler phase is statically elided.

Trainability partition and window-feed semantics follow
dgp_model.py:213-243 and base_model.py:944-950.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ffvd_tpu.config import ADAM, SGHMC, FFVDConfig, partition_for
from ffvd_tpu.inference.sghmc import SGHMCState, sghmc_init, sghmc_step
from ffvd_tpu.model.elbo import negative_elbo, windowed_negative_elbo
from ffvd_tpu.model.params import GPSSMParams, HiddenLayerParams, SSMData
from ffvd_tpu.ops.kernels import KernelParams

Pytree = Any


def label_tree(cfg: FFVDConfig) -> GPSSMParams:
    """A GPSSMParams-shaped pytree of 'adam'/'sghmc'/'frozen' string labels.

    Hidden deep-transition layers (cfg.n_layers > 1, model/deep.py) are
    Adam-trained point estimates by default (MAP) — a sampled hidden
    log-variance scales the injected inter-layer noise and destabilizes
    fp32 chains (see FFVDConfig.deep_sample_hidden).  With
    ``deep_sample_hidden=True`` they follow the case's u/z/kernel partition
    like the head (the reference applies its flags per layer,
    dgp_model.py:213-243), except that a collapsed head (C4/C5) still
    leaves hidden U as ADAM: only the head's U has an analytic collapse."""
    part = partition_for(cfg)
    if cfg.deep_sample_hidden:
        hidden_u = ADAM if cfg.case_config.u_collapse else part.u
        hidden_layer = HiddenLayerParams(
            u=hidden_u, z=part.z,
            kernel=KernelParams(log_variance=part.kernel,
                                log_lengthscales=part.kernel))
    else:
        hidden_layer = HiddenLayerParams(
            u=ADAM, z=ADAM,
            kernel=KernelParams(log_variance=ADAM, log_lengthscales=ADAM))
    hidden = tuple(hidden_layer for _ in range(cfg.n_layers - 1))
    return GPSSMParams(
        x=part.x, u=part.u, z=part.z,
        kernel=KernelParams(log_variance=part.kernel,
                            log_lengthscales=part.kernel),
        log_q=part.log_q, c=part.lik, d=part.lik, log_rchol=part.lik,
        hidden=hidden,
    )


def sanitize_grads(grads: Pytree, clip) -> Pytree:
    """Zero non-finite gradient elements and clip magnitudes to ±clip (see
    FFVDConfig.sghmc_grad_clip).  No-op when clip is None."""
    if clip is None:
        return grads
    def fix(g):
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return jnp.clip(g, -clip, clip)
    return jax.tree.map(fix, grads)


def _log_clip_bounds(clip):
    """Normalize a clip spec: None → None, scalar c → (−c, c), or an
    explicit (lower, upper) pair (FFVDConfig.log_clip_bounds)."""
    if clip is None:
        return None
    if isinstance(clip, tuple):
        return clip
    return (-clip, clip)


def clip_log_leaves(tree: Pytree, clip) -> Pytree:
    """Clip log-parameterized leaves (path contains 'log') to the given
    bounds — the fp32 overflow guard for SGHMC-sampled hyperparameters (see
    FFVDConfig.sghmc_log_clip / sghmc_log_clip_lower).  ``clip`` is a
    scalar (symmetric) or (lower, upper).  No-op when clip is None."""
    bounds = _log_clip_bounds(clip)
    if bounds is None:
        return tree
    lo, hi = bounds
    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: (jnp.clip(leaf, lo, hi)
                          if "log" in jax.tree_util.keystr(kp) else leaf),
        tree)


class SubsetOps:
    """Split/merge a fixed label-selected subset of a pytree's leaves.

    The SG-HMC phases (training sub-steps, eval thinning) touch only the
    SGHMC-labeled leaves; gradients and noise for the rest would still be
    materialized by XLA if they fed the scan carry.  Operating on the subset
    keeps the unused backward chains out of the program entirely.
    """

    def __init__(self, labels: Pytree, params: Pytree, target: str = SGHMC):
        self.treedef = jax.tree.structure(params)
        paths = [jax.tree_util.keystr(kp) for kp, _
                 in jax.tree_util.tree_leaves_with_path(params)]
        flat_labels = jax.tree.leaves(labels)
        self.idx = tuple(i for i, l in enumerate(flat_labels) if l == target)
        self.is_log = tuple("log" in paths[i] for i in self.idx)

    def split(self, tree: Pytree) -> list:
        lv = jax.tree.leaves(tree)
        return [lv[i] for i in self.idx]

    def merge(self, sub: list, into: Pytree) -> Pytree:
        lv = list(jax.tree.leaves(into))
        for j, i in enumerate(self.idx):
            lv[i] = sub[j]
        return jax.tree.unflatten(self.treedef, lv)

    def split_state(self, sstate: SGHMCState) -> SGHMCState:
        return SGHMCState(xi=self.split(sstate.xi), g=self.split(sstate.g),
                          g2=self.split(sstate.g2), p=self.split(sstate.p))

    def merge_state(self, sub: SGHMCState, into: SGHMCState) -> SGHMCState:
        return SGHMCState(xi=self.merge(sub.xi, into.xi),
                          g=self.merge(sub.g, into.g),
                          g2=self.merge(sub.g2, into.g2),
                          p=self.merge(sub.p, into.p))

    def clip_log(self, sub: list, clip) -> list:
        """`clip_log_leaves` for a subset list (leaf paths are precomputed)."""
        bounds = _log_clip_bounds(clip)
        if bounds is None:
            return sub
        lo, hi = bounds
        return [jnp.clip(v, lo, hi) if lg else v
                for lg, v in zip(self.is_log, sub)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: GPSSMParams
    sghmc: SGHMCState
    adam: Any
    window: GPSSMParams          # (W, ...) stacked snapshots
    window_count: jnp.ndarray    # filled slots, int32
    step: jnp.ndarray            # outer iteration counter, int32


class Trainer:
    """Builds and runs the jit-fused FFVD training protocol for one config."""

    def __init__(self, cfg: FFVDConfig, data: SSMData,
                 pg_fn: Optional[Callable] = None):
        # Every training/eval path constructs a Trainer before its first
        # compile, so this is the chokepoint for the persistent XLA compile
        # cache (utils/compile_cache.py; FFVD_COMPILE_CACHE=0 to opt out).
        from ffvd_tpu.utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg
        self.data = data
        self.labels = label_tree(cfg)
        flat_labels = jax.tree.leaves(self.labels)
        self.has_sghmc = any(l == SGHMC for l in flat_labels)
        self.has_adam = any(l == ADAM for l in flat_labels)
        self.pg_fn = pg_fn
        if cfg.case_config.x_pg and pg_fn is None:
            raise ValueError("case C6 requires a particle-Gibbs function")
        # Deep transitions (cfg.n_layers > 1): the objective is doubly
        # stochastic — every training gradient draws fresh inter-layer noise
        # (model/deep.py), so a PRNG key is threaded into each nll/grad call.
        # Reporting-only evaluations (and eval-time SGHMC thinning,
        # rollout.py) use the deterministic mean-propagated objective.
        self.stochastic = cfg.n_layers > 1

        # nll(params, data): data stays an explicit argument so stacked
        # datasets can be vmapped through the same step (BASELINE config 5).
        # "hybrid" trains native here — the ds64 tail is a SECOND Trainer
        # built by api.FFVDModel.fit with collapse_precision="ds64"
        # (TrainState is interchangeable: same labels, same tx structure).
        self.train_precision = ("native" if cfg.collapse_precision == "hybrid"
                                else cfg.collapse_precision)
        self.nll_fn = functools.partial(
            negative_elbo,
            kernel_type=cfg.kernel_type, prior_type=cfg.prior_type,
            u_collapse=cfg.case_config.u_collapse, jitter=cfg.jitter,
            emission_noise=cfg.emission_noise,
            collapse_precision=self.train_precision,
            ds64_refine=cfg.ds64_refine)
        self.grad_fn = jax.grad(self.nll_fn)
        self.value_grad_fn = jax.value_and_grad(self.nll_fn)

        # Random-window minibatch objective (cfg.minibatch_size): training
        # phases evaluate gradients on a fresh uniform window per gradient
        # evaluation; evaluation/thinning (rollout.py) stays full-batch like
        # the reference's collect-time feeds.
        self.window_n = cfg.minibatch_size
        if (self.window_n is not None
                and self.window_n >= data.y.shape[0]):
            # A window covering the whole sequence IS full batch — also the
            # reference's effective default (its --minibatch_size 1000
            # exceeds every stock dataset).
            self.window_n = None
        if self.window_n is not None:
            win_nll = functools.partial(
                windowed_negative_elbo,
                window_n=self.window_n,
                kernel_type=cfg.kernel_type, prior_type=cfg.prior_type,
                u_collapse=cfg.case_config.u_collapse, jitter=cfg.jitter,
                emission_noise=cfg.emission_noise,
                collapse_precision=self.train_precision,
                ds64_refine=cfg.ds64_refine)
            self._win_nll = win_nll
            self._win_grad = jax.grad(win_nll)
            self._win_value_grad = jax.value_and_grad(win_nll)

        # Effective Adam lr: 0.003·0.95^(global_step/1000) evaluated at the
        # constant global_step=1 the reference always passes
        # (base_model.py:188-194).
        self.adam_lr = cfg.adam_lr * 0.95 ** (1.0 / 1000.0)
        adam_labels = jax.tree.map(
            lambda l: "adam" if l == ADAM else "freeze", self.labels)
        self.tx = optax.multi_transform(
            {"adam": optax.adam(self.adam_lr), "freeze": optax.set_to_zero()},
            param_labels=adam_labels)
        # Same fp32 guard as the sampler: Adam's second moment squares the
        # gradient, overflowing fp32 at |g| ≈ 2e19 (reachable when window-fed
        # SGHMC hyperparameters are extreme).  Healthy runs never see grads
        # near the 1e6 clip, so reference semantics are untouched.
        if cfg.sghmc_grad_clip is not None:
            self.tx = optax.chain(
                optax.stateless(lambda g, _:
                                sanitize_grads(g, cfg.sghmc_grad_clip)),
                self.tx)

        # NOTE: no donate_argnums on the carried state — donation would
        # invalidate the caller's initial params arrays (init_state embeds
        # them), and with the SGHMC-only window the state is small enough
        # that the copy is immaterial.
        self._run_chunk = jax.jit(self._run_chunk_impl)

    # -- training-time gradient (windowed when minibatching) ----------------

    def _draw_start(self, key: jax.Array, data: SSMData) -> jnp.ndarray:
        if data.mask is None:
            hi = data.y.shape[0] - self.window_n + 1
        else:
            # Padding is a suffix (parallel/multidataset.py): keep the window
            # inside the real prefix so every window row has weight 1.
            real_n = jnp.sum(data.mask).astype(jnp.int32)
            hi = jnp.maximum(real_n - self.window_n + 1, 1)
        return jax.random.randint(key, (), 0, hi)

    def _train_grad(self, params, data, key):
        """Gradient for one training sub-step; fresh window (and fresh deep
        inter-layer noise) per evaluation."""
        if self.window_n is None:
            if self.stochastic:
                return self.grad_fn(params, data, key=key)
            return self.grad_fn(params, data)
        if self.stochastic:
            k_start, k_prop = jax.random.split(key)
            return self._win_grad(params, data,
                                  self._draw_start(k_start, data), key=k_prop)
        return self._win_grad(params, data, self._draw_start(key, data))

    def _train_value_grad(self, params, data, key):
        if self.window_n is None:
            if self.stochastic:
                return self.value_grad_fn(params, data, key=key)
            return self.value_grad_fn(params, data)
        if self.stochastic:
            k_start, k_prop = jax.random.split(key)
            return self._win_value_grad(
                params, data, self._draw_start(k_start, data), key=k_prop)
        return self._win_value_grad(params, data,
                                    self._draw_start(key, data))

    # -- state ------------------------------------------------------------

    def init_state(self, params: GPSSMParams) -> TrainState:
        if len(params.hidden) != self.cfg.n_layers - 1:
            raise ValueError(
                f"params has {len(params.hidden)} hidden layers but "
                f"cfg.n_layers={self.cfg.n_layers} expects "
                f"{self.cfg.n_layers - 1} (see model/deep.py; "
                "init_hidden_layers grafts them onto a shallow start)")
        w = self.cfg.window_size
        # Only SGHMC-labeled leaves are ever read back from the window
        # (the reference windows only self.vars, base_model.py:927-933);
        # other leaves get zero-size placeholders to keep the pytree shape.
        window = jax.tree.map(
            lambda l, a: (jnp.zeros((w,) + a.shape, a.dtype) if l == SGHMC
                          else jnp.zeros((1,), a.dtype)),  # (1,): orbax
            self.labels, params)                           # rejects size-0

        return TrainState(
            params=params,
            sghmc=sghmc_init(params),
            adam=self.tx.init(params),
            window=window,
            window_count=jnp.zeros((), jnp.int32),
            step=jnp.zeros((), jnp.int32),
        )

    # -- one outer iteration ----------------------------------------------

    def _sghmc_phase(self, params, sstate, key, data):
        """21 sub-steps: B, (B,S)×10 (base_model.py:915-925).

        Gradients are taken w.r.t. the SGHMC-labeled leaves ONLY; the
        frozen/Adam leaves are closed over as constants.  Differentiating the
        full tree and discarding the rest would force XLA to build (21×) the
        unused backward chains, noise draws, and preconditioner updates — the
        scan carries the sampler state, so nothing downstream is dead code it
        could eliminate.  In C5 the sampled set is just the kernel hypers;
        the X/Z/likelihood cotangents never enter the program at all.
        """
        x_n = params.x.shape[0]
        flags = jnp.asarray([True] + [True, False] * 10)
        keys = jax.random.split(key, flags.shape[0])
        clip = self.cfg.log_clip_bounds
        gclip = self.cfg.sghmc_grad_clip

        ops = SubsetOps(self.labels, params)
        sub0 = ops.split(params)
        # Hoist the sampler noise out of the sequential sub-step scan: the
        # scan is bottlenecked on the 21-gradient chain, so all 21 noise
        # draws batch-generate in parallel up front — bit-identical to
        # drawing inside (normal(k, shape) is a pure function of the key;
        # windowed/stochastic bodies draw from the first half of a split,
        # reproduced here).
        from ffvd_tpu.inference.sghmc import _tree_normals
        if self.window_n is not None or self.stochastic:
            noise_keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        else:
            noise_keys = keys
        noise_all = jax.vmap(lambda k: _tree_normals(k, sub0))(noise_keys)

        def sub_nll(sub, k_win):
            p = ops.merge(sub, params)
            if self.window_n is None:
                if self.stochastic:
                    return self.nll_fn(p, data, key=k_win)
                return self.nll_fn(p, data)
            if self.stochastic:
                k_start, k_prop = jax.random.split(k_win)
                return self._win_nll(p, data, self._draw_start(k_start, data),
                                     key=k_prop)
            return self._win_nll(p, data, self._draw_start(k_win, data))

        sub_grad = jax.grad(sub_nll)

        def body(carry, inp):
            flag, k, nz = inp
            if self.window_n is not None or self.stochastic:
                _, k_win = jax.random.split(k)  # static branch: keeps the
            else:                               # full-batch PRNG stream of
                k_win = None                    # shallow runs unchanged
            sub, ss = carry
            grads = sanitize_grads(sub_grad(sub, k_win), gclip)
            sub2, ss2 = sghmc_step(
                sub, grads, ss, k, epsilon=self.cfg.epsilon,
                mdecay=self.cfg.mdecay, x_n=x_n, burn_in=flag,
                p_clip=self.cfg.sghmc_p_clip,
                spike_clip=self.cfg.sghmc_spike_clip, noise=nz)
            return (ops.clip_log(sub2, clip), ss2), None

        (sub, ss), _ = jax.lax.scan(
            body, (sub0, ops.split_state(sstate)), (flags, keys, noise_all),
            unroll=self.cfg.sghmc_unroll)
        return ops.merge(sub, params), ops.merge_state(ss, sstate)

    def outer_step(self, state: TrainState, key: jax.Array,
                   data: SSMData = None) -> Tuple[TrainState, jnp.ndarray]:
        data = self.data if data is None else data
        k_sghmc, k_feed, k_pg = jax.random.split(key, 3)
        params, sstate = state.params, state.sghmc

        if self.has_sghmc:
            params, sstate = self._sghmc_phase(params, sstate, k_sghmc, data)
            # Window snapshot (base_model.py:927-933) as a ring buffer
            # over the SGHMC leaves only.
            idx = state.step % self.cfg.window_size
            window = jax.tree.map(
                lambda l, w, p: w.at[idx].set(p) if l == SGHMC else w,
                self.labels, state.window, params)
            count = jnp.minimum(state.window_count + 1,
                                self.cfg.window_size)
        else:
            window, count = state.window, state.window_count

        if self.pg_fn is not None and self.cfg.case_config.x_pg:
            params = self.pg_fn(params, k_pg, data)

        adam_state = state.adam
        if self.has_adam:
            if self.window_n is not None or self.stochastic:
                k_feed, k_win = jax.random.split(k_feed)
            else:                           # static: see _sghmc_phase note
                k_win = None
            if self.has_sghmc:
                i = jax.random.randint(k_feed, (), 0, jnp.maximum(count, 1))
                feed = jax.tree.map(
                    lambda l, w, p: w[i] if l == SGHMC else p,
                    self.labels, window, params)
            else:
                feed = params
            nll_val, grads = self._train_value_grad(feed, data, k_win)
            updates, adam_state = self.tx.update(grads, adam_state, params)
            params = optax.apply_updates(params, updates)
        else:
            nll_val = self.nll_fn(params, data)

        new_state = TrainState(params=params, sghmc=sstate, adam=adam_state,
                               window=window, window_count=count,
                               step=state.step + 1)
        return new_state, nll_val

    # -- fused multi-iteration run ----------------------------------------

    def _run_chunk_impl(self, state: TrainState, keys: jax.Array,
                        data: SSMData):
        # `data` is a jit ARGUMENT, not a closure constant: closure-captured
        # device arrays are embedded into the HLO as literals, which (a)
        # d2h-fetches them during lowering — through the tunneled axon TPU
        # backend the first device-to-host transfer of a process stalls
        # 1-8 min — and (b) bakes the dataset into the program, so the
        # persistent compile cache (utils/compile_cache.py) would miss on
        # every new dataset/warm start.  As an argument, one compiled
        # program serves every same-shape dataset.
        return jax.lax.scan(lambda s, k: self.outer_step(s, k, data),
                            state, keys)

    def run(self, state: TrainState, num_iterations: int, key: jax.Array,
            chunk_size: int = 500, nan_check: bool = True):
        """Run ``num_iterations`` outer iterations (the reference runs
        2×cfg.iterations, models.py:142).  Returns (state, nll_trace).

        ``nan_check``: per-chunk failure detection (the reference would
        silently train on NaNs to completion) — raises with the failing
        iteration index and parameter-block diagnostics."""
        traces = []
        done = 0
        while done < num_iterations:
            n = min(chunk_size, num_iterations - done)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, n)
            state, nlls = self._run_chunk(state, keys, self.data)
            if nan_check and not bool(jnp.all(jnp.isfinite(nlls))):
                bad = int(jnp.argmax(~jnp.isfinite(nlls)))
                diag = {
                    jax.tree_util.keystr(kp): bool(jnp.all(jnp.isfinite(leaf)))
                    for kp, leaf in jax.tree_util.tree_leaves_with_path(
                        state.params)}
                raise FloatingPointError(
                    f"non-finite nll at iteration {done + bad}; "
                    f"finite-by-block: {diag}. For ill-conditioned fp32 "
                    f"runs try fp64 or a larger jitter (cfg.jitter).")
            traces.append(nlls)
            done += n
        return state, jnp.concatenate(traces) if traces else jnp.zeros((0,))
