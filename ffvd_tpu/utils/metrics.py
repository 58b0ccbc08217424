"""Structured training metrics / ELBO-term diagnostics.

Rebuild of the reference's observability surface (SURVEY.md §5): the
per-term bound decomposition of ``print_sample_performance``
(base_model.py:952-989) with the same term names, an iters/sec counter
(the dead ``running_time_seq`` plumbing, models.py:92,183-197), and an
optional JSONL sink instead of gated-off TensorBoard summaries
(models.py:94-131).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

from ffvd_tpu.model.elbo import elbo_terms


def elbo_report(params, data, *, u_collapse: bool, iteration: int = 0,
                **elbo_kw) -> Dict[str, float]:
    """The reference's diagnostic printout as data: every nll term, negated
    into log-likelihood form like print_sample_performance
    (base_model.py:959-966)."""
    terms = elbo_terms(params, data, u_collapse=u_collapse, **elbo_kw)
    out = {"iter": iteration, "marginal_ll": -float(terms["nll"])}
    for k, v in terms.items():
        if k != "nll":
            out[f"ll_{k}"] = -float(v)
    return out


class MetricsLogger:
    """Collects per-chunk scalars; optional JSONL file sink."""

    def __init__(self, path: Optional[str] = None,
                 print_every: Optional[int] = 100):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = self.path.open("a")
        else:
            self._fh = None
        self.print_every = print_every
        self._t0 = time.time()
        self._last_iter = 0
        self.history = []

    def log(self, record: Dict) -> None:
        now = time.time()
        it = record.get("iter", self._last_iter)
        if it > self._last_iter:
            record.setdefault(
                "iters_per_sec",
                (it - self._last_iter) / max(now - self._t0, 1e-9))
            # only advance the rate clock on records that advance iterations,
            # so interleaved metadata/eval records don't inflate the rate
            self._t0, self._last_iter = now, it
        self.history.append(record)
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self.print_every and it % self.print_every == 0:
            parts = " ".join(f"{k}={v:.4f}" if isinstance(v, float)
                             else f"{k}={v}" for k, v in record.items())
            print(f"METRIC {parts}", flush=True)

    def close(self):
        if self._fh:
            self._fh.close()


def split_rhat(trace) -> float:
    """Split-R̂ (Gelman et al. 2013) over a (T, C) multi-chain scalar trace.

    The reference ships no sampler convergence diagnostic at all — chains
    are judged by eyeballing the nll printout (base_model.py:952-989).
    With MultiChainTrainer (parallel/sharding.py) the per-chain nll traces
    come back as (T, C); this turns them into the standard scalar: each
    chain is split in half (2C half-chains of length T//2) and
    R̂ = sqrt((T̂−1)/T̂ + B/(T̂·W)) with B/W the between/within half-chain
    variances.  R̂ ≲ 1.01 ⇒ the halves are indistinguishable (stationary
    and mixed); computed on nll it is a conservative whole-posterior
    summary (any drifting function of the params shows up).

    Accepts jnp or np input; returns a Python float (NaN if T < 4 or the
    within-chain variance is exactly zero with zero between-variance —
    a frozen chain is reported as R̂ = 1.0).
    """
    import numpy as np
    x = np.asarray(trace, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    t = (x.shape[0] // 2) * 2
    if t < 4:
        return float("nan")
    halves = np.concatenate([x[:t // 2], x[t // 2:t]], axis=1)  # (T/2, 2C)
    n = halves.shape[0]
    w = halves.var(axis=0, ddof=1).mean()
    b = n * halves.mean(axis=0).var(ddof=1)
    if w == 0.0:
        return 1.0 if b == 0.0 else float("inf")
    return float(np.sqrt((n - 1) / n + b / (n * w)))


class TensorBoardSink:
    """The reference's fully-written-but-gated-off TensorBoard summaries
    (models.py:94-131, hardcoded ``write_tensorboard=False``), made live.

    Same summary set, same tag scheme: histograms of C / D / log-Rchols /
    log-Q / per-dim X and U columns / per-dim kernel log-lengthscales,
    scalars of per-dim kernel log-variance and the marginal LL.  The
    event-file format is framework-neutral; prefers the lightweight
    tensorboardX writer and falls back to torch.utils.tensorboard (which
    drags in all of PyTorch) only if that is missing.  Constructing the
    sink raises ImportError if neither is available.
    """

    def __init__(self, logdir: str):
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            from torch.utils.tensorboard import SummaryWriter
        self._w = SummaryWriter(log_dir=str(logdir))

    def write(self, params, nll: float, step: int) -> None:
        import numpy as np
        w = self._w
        w.add_scalar("marginal-ll", -float(nll), step)
        w.add_histogram("CC-histogram", np.asarray(params.c), step)
        w.add_histogram("DD-histogram", np.asarray(params.d), step)
        w.add_histogram("log-Rchols-histogram",
                        np.asarray(params.log_rchol), step)
        w.add_histogram("log-Q-histogram", np.asarray(params.log_q), step)
        x = np.asarray(params.x)
        u = np.asarray(params.u)
        lv = np.asarray(params.kernel.log_variance)
        ll = np.asarray(params.kernel.log_lengthscales)
        for d in range(x.shape[1]):
            w.add_histogram(f"x{d}-histogram", x[:, d], step)
            w.add_histogram(f"U{d}-histogram", u[:, d], step)
            w.add_scalar(f"kernel-{d}-log-variance", float(lv[d]), step)
            w.add_histogram(f"kernel-{d}-log-lengthscales-histogram",
                            ll[d], step)

    def close(self):
        self._w.close()
