"""fp32 sampler-robustness guards (the escape region of PARITY §2b-deep).

Measured mechanism (tests/golden/catapult_capture.py + grad_crosscheck.py on
the escaping flutter×C5 fp32 chain): the C5 objective is a near-flat plateau
in the sampled log-variance up to ≈ +20 with a weak (0.005-0.05) restoring
gradient, then a catastrophic cliff at ≈ +21-29.  fp64 chains bounce off the
cliff on exact gradients; fp32 gradients there are conditioning-garbage
(6-40% error on the plateau, sign-flipping at the cliff), so the chain
diffuses across and pins at the old ±30 clip with a frozen preconditioner.

Guards under test (config.py):
 1. sghmc_log_clip = 12.0 — a reflecting barrier INSIDE the cliff;
 2. sghmc_p_clip = 1.0 — bounds any single sub-step move (catapult guard).

A scale-relative fp32 jitter floor was tried and REJECTED by measurement
(it distorted the true plateau gradient 60-320% — worse than fp32 noise);
see the negative-result note in model/conditionals.kernel_precal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# heavy compile/e2e module: excluded from the `-m quick` tier
pytestmark = pytest.mark.slow


def test_guard_defaults():
    from ffvd_tpu.config import FFVDConfig
    cfg = FFVDConfig()
    assert cfg.sghmc_log_clip == 12.0   # inside the measured cliff (~21-29)
    # the cliff is one-sided: the lower bound stays at round 2's
    # exp-overflow guard so legitimate small hypers (Q ~ 1e-6, log_q -13.8)
    # are not forbidden
    assert cfg.sghmc_log_clip_lower == -30.0
    assert cfg.log_clip_bounds == (-30.0, 12.0)
    assert cfg.sghmc_p_clip == 1.0
    assert cfg.sghmc_grad_clip == 1e6


def test_log_clip_asymmetric_bounds():
    """The default bounds must clip the +cliff at 12 but leave the
    extended-training regime (log_q ≈ −13.8, PARITY §2f) untouched; a
    symmetric −12 would silently move it."""
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.inference.trainer import clip_log_leaves

    bounds = FFVDConfig().log_clip_bounds
    tree = {"log_q": jnp.asarray([-13.8, -35.0, 25.0]),
            "u": jnp.asarray([55.0])}
    out = clip_log_leaves(tree, bounds)
    np.testing.assert_allclose(np.asarray(out["log_q"]),
                               [-13.8, -30.0, 12.0])
    np.testing.assert_allclose(np.asarray(out["u"]), [55.0])
    # disabled lower bound mirrors the upper one
    cfg = FFVDConfig(sghmc_log_clip_lower=None)
    assert cfg.log_clip_bounds == (-12.0, 12.0)
    # invalid ordering rejected
    import pytest
    with pytest.raises(ValueError):
        FFVDConfig(sghmc_log_clip=5.0, sghmc_log_clip_lower=6.0)


def test_log_clip_is_reflecting_barrier_in_phase():
    """clip_log_leaves at the new default must bound log-parameterized
    leaves at ±12 while leaving non-log leaves alone."""
    from ffvd_tpu.inference.trainer import clip_log_leaves
    tree = {"kernel_log_variance": jnp.asarray([25.0, -40.0, 3.0]),
            "u": jnp.asarray([55.0])}
    out = clip_log_leaves(tree, 12.0)
    np.testing.assert_allclose(np.asarray(out["kernel_log_variance"]),
                               [12.0, -12.0, 3.0])
    np.testing.assert_allclose(np.asarray(out["u"]), [55.0])


def test_sghmc_p_clip_bounds_catapult():
    """A garbage gradient against a stale (small-g2) preconditioner must not
    move a parameter more than p_clip in one sub-step; with p_clip=None the
    same inputs reproduce the catapult (documents the failure mode)."""
    from ffvd_tpu.inference.sghmc import SGHMCState, sghmc_step

    theta = {"lv": jnp.asarray([3.0], jnp.float32)}
    grads = {"lv": jnp.asarray([-1e6], jnp.float32)}   # sanitize-clipped max
    state = SGHMCState(
        xi={"lv": jnp.asarray([100.0], jnp.float32)},
        g={"lv": jnp.asarray([1e-4], jnp.float32)},
        g2={"lv": jnp.asarray([1e-8], jnp.float32)},   # stale: tuned to tiny
        p={"lv": jnp.asarray([0.0], jnp.float32)})     # past gradients
    kw = dict(epsilon=0.01, mdecay=0.05, x_n=513, burn_in=False)

    free, _ = sghmc_step(theta, grads, state, jax.random.key(0),
                         p_clip=None, **kw)
    clipped, _ = sghmc_step(theta, grads, state, jax.random.key(0),
                            p_clip=1.0, **kw)
    jump_free = float(jnp.abs(free["lv"] - theta["lv"])[0])
    jump_clip = float(jnp.abs(clipped["lv"] - theta["lv"])[0])
    assert jump_free > 100.0, jump_free        # the catapult, reproduced
    assert jump_clip <= 1.0 + 1e-6, jump_clip  # bounded move

    # inactive in the healthy regime: same tiny-gradient step with and
    # without the clip must be bit-identical (reference semantics untouched)
    grads_ok = {"lv": jnp.asarray([0.03], jnp.float32)}
    state_ok = SGHMCState(
        xi={"lv": jnp.asarray([2.0], jnp.float32)},
        g={"lv": jnp.asarray([0.03], jnp.float32)},
        g2={"lv": jnp.asarray([1e-3], jnp.float32)},
        p={"lv": jnp.asarray([0.01], jnp.float32)})
    a, _ = sghmc_step(theta, grads_ok, state_ok, jax.random.key(1),
                      p_clip=None, **kw)
    b, _ = sghmc_step(theta, grads_ok, state_ok, jax.random.key(1),
                      p_clip=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(a["lv"]), np.asarray(b["lv"]))


def test_sghmc_spike_clip_neutralizes_garbage_spike():
    """The measured escape fuel: one −79.8 gradient amid ±0.02 neighbors
    (catapult_flutter_C5_s0.jsonl iter 585) becomes a momentum impulse that
    coasts ~1/mdecay sub-steps.  With the trust-region clip the impulse is
    bounded by the preconditioner's own running RMS; healthy gradients
    (≤ the absolute floor of 1.0) are untouched bit-for-bit."""
    from ffvd_tpu.inference.sghmc import SGHMCState, sghmc_step

    theta = {"lv": jnp.asarray([2.97], jnp.float32)}
    state = SGHMCState(                                # the real iter-585
        xi={"lv": jnp.asarray([50.0], jnp.float32)},   # neighborhood scale
        g={"lv": jnp.asarray([0.02], jnp.float32)},
        g2={"lv": jnp.asarray([0.012], jnp.float32)},
        p={"lv": jnp.asarray([0.003], jnp.float32)})
    kw = dict(epsilon=0.01, mdecay=0.05, x_n=513, burn_in=False, p_clip=1.0)
    spike = {"lv": jnp.asarray([-79.8], jnp.float32)}

    free, sfree = sghmc_step(theta, spike, state, jax.random.key(0),
                             spike_clip=None, **kw)
    guarded, sg = sghmc_step(theta, spike, state, jax.random.key(0),
                             spike_clip=20.0, **kw)
    # unguarded impulse ~ +0.073 → coasts to ~+1.4 over 1/mdecay sub-steps;
    # guarded impulse bounded by 20·√0.012 ≈ 2.19 → ≤ 2e-3 + noise
    assert float(sfree.p["lv"][0]) > 0.05
    assert abs(float(sg.p["lv"][0])) < 0.02

    # healthy gradient (≤ absolute floor): bit-identical with/without guard
    ok = {"lv": jnp.asarray([0.03], jnp.float32)}
    a, _ = sghmc_step(theta, ok, state, jax.random.key(1),
                      spike_clip=None, **kw)
    b, _ = sghmc_step(theta, ok, state, jax.random.key(1),
                      spike_clip=20.0, **kw)
    np.testing.assert_array_equal(np.asarray(a["lv"]), np.asarray(b["lv"]))
