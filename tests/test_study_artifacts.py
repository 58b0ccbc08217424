"""Pin the round-3 NLL-parity closure (PARITY §2a) against the recorded
study artifacts so the claim stays checkable.

The claim: the residual NLL factor between our slip-mode runs and the
reference's population is training precision.  Evidence pinned here, from
`tests/golden/nll_study.json` (our runs) and the reference's own saved
full-run artifacts (`tf_ref_<ds>_results.npz`, produced by executing the
reference; NLL populations from `tf_reference_e2e.json`):

  1. our fp64-trained slip-mode NLL lands INSIDE the reference's seed
     population on both study datasets;
  2. the fp64 run's step-1 rollout variance floor matches the reference's
     within 2× (the fp32 floor is 13-170× looser);
  3. the fp64 run's learned Q converges to the reference's optimum
     (within 10% per dim).

All pure JSON/npz reads — no model execution.
"""

import json
import statistics
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


def _load(name):
    return json.loads((GOLDEN / name).read_text())


@pytest.fixture(scope="module")
def study():
    return _load("nll_study.json")


@pytest.fixture(scope="module")
def ref_e2e():
    return _load("tf_reference_e2e.json")


@pytest.mark.parametrize("ds", ["drive", "flutter"])
def test_fp64_slip_nll_inside_reference_population(study, ref_e2e, ds):
    rec = study[f"{ds}_slip_fp64cpu_s1"]
    ref_nlls = [v["nll_metric"] for k, v in ref_e2e.items()
                if k.startswith(f"{ds}_C4") and "nll_metric" in v]
    assert len(ref_nlls) >= 5, "need the reference seed population"
    assert min(ref_nlls) <= rec["nll"] <= max(ref_nlls), (
        f"{ds}: fp64 slip NLL {rec['nll']:.0f} outside reference "
        f"population [{min(ref_nlls):.0f}, {max(ref_nlls):.0f}]")


@pytest.mark.parametrize("ds", ["drive", "flutter"])
def test_fp64_variance_floor_matches_reference(study, ds):
    rec = study[f"{ds}_slip_fp64cpu_s1"]
    ref = np.load(GOLDEN / f"tf_ref_{ds}_results.npz")
    v0_ref = float(np.ravel(ref["v_test_vfe_var"])[0])
    assert 0.5 < rec["v_first"] / v0_ref < 2.0, (
        f"{ds}: fp64 v̂[0]={rec['v_first']:.2e} vs ref {v0_ref:.2e}")
    # and the fp32 floor really is the outlier the mechanism says it is
    fp32 = np.load(GOLDEN / f"ours_{ds}_slip_seed1_results.npz")
    v0_fp32 = float(np.ravel(fp32["v_test_vfe_var"])[0])
    assert v0_fp32 / v0_ref > 5.0


@pytest.mark.parametrize("ds", ["drive", "flutter"])
def test_fp64_learned_Q_matches_reference_optimum(study, ds):
    rec = study[f"{ds}_slip_fp64cpu_s1"]
    ref = np.load(GOLDEN / f"tf_ref_{ds}_results.npz")
    q_ref = np.exp(np.ravel(ref["log_QQ"]))
    q_ours = np.asarray(rec["Q"])
    assert np.all(np.abs(q_ours / q_ref - 1.0) < 0.10), (
        f"{ds}: Q ours {q_ours} vs ref {q_ref}")


# ---- round-3 ensemble claims (PARITY §2d/§2e) --------------------------

@pytest.fixture(scope="module")
def ensemble():
    return _load("ensemble_study.json")


def test_ensemble_nll_calibrated_everywhere(ensemble, ref_e2e):
    """The §2e claim: 4-chain pooling with the cross-chain spread term puts
    every dataset's 30-step NLL in single digits-to-tens where the per-chain
    protocol estimator (and the reference) sit in the thousands (worst row:
    ballbeam_deep2_ens4 at 18.0, from 3125 without the spread term)."""
    for name, rec in ensemble.items():
        assert rec["nll"] < 20, f"{name}: pooled NLL {rec['nll']}"
        assert rec["nll_no_spread"] > 2 * rec["nll"] + 5, (
            f"{name}: spread term is what fixes calibration")


def test_ensemble_rmse_vs_reference_population(ensemble, ref_e2e):
    """Pooled RMSE beats the reference's median recorded run on
    ballbeam/drive/dryer/actuator; flutter's pooled value stays inside the
    reference's own 6-run population (0.45-1.56 — the fp32 chain residual
    of PARITY §2d keeps it above the median there)."""
    import statistics

    def ref_pop(ds):
        return [v["rmse"] for k, v in ref_e2e.items()
                if k.startswith(ds + "_C4") and "rmse" in v]

    for ds in ("ballbeam", "drive", "dryer", "actuator"):
        pop = ref_pop(ds)
        assert pop, f"no reference runs for {ds}"
        assert ensemble[ds]["rmse"] < statistics.median(pop), (
            f"{ds}: pooled {ensemble[ds]['rmse']} vs ref median "
            f"{statistics.median(pop)}")
    fl = ref_pop("flutter")
    assert min(fl) <= ensemble["flutter"]["rmse"] <= max(fl)


def test_ensemble_actuator_averaging_gain(ensemble):
    """Actuator: 40-rollout pooled draws (seed-pool, 1-chain spread eval,
    jittered ensemble) beat the reference's 0.3533 every time and the
    10-rollout per-chain median in MEDIAN (rollout averaging helps in
    expectation; individual draws stay noisy — §2e fn 2)."""
    med10 = statistics.median(
        c["rmse"] for c in ensemble["actuator"]["per_chain"])
    draws = [ensemble[t]["rmse"] for t in
             ("actuator", "actuator_1chain_n40spread", "actuator_jit4")]
    assert all(d < 0.3533 for d in draws)
    assert statistics.median(draws) < med10


def test_deep_ensemble_composition(ensemble):
    """PARITY §2e deep × ensemble table: deep-2 seeds are genuine chains
    (doubly stochastic training), so pooling composes the deep RMSE gains
    with the spread-term calibration.  Pins the three claims:
    flutter's headline row (RMSE < 0.55 — 2.8x the reference's 1.56 — with
    NEGATIVE pooled NLL), drive's pooled RMSE beating its BEST member
    chain, and the §2b-deep actuator guard (deep-2 stays worse than the
    shallow ensemble there — use shallow)."""
    fl = ensemble["flutter_deep2_ens4"]
    assert fl["rmse"] < 0.55 and fl["rmse"] < ensemble["flutter"]["rmse"]
    assert fl["nll"] < 0.0
    dr = ensemble["drive_deep2_ens4"]
    assert dr["rmse"] < min(c["rmse"] for c in dr["per_chain"])
    assert (ensemble["actuator_deep2_ens4"]["rmse"]
            > 2 * ensemble["actuator_jit4"]["rmse"])


def test_onechain_spread_matches_seed_pooling(ensemble):
    """C4 training is seed-deterministic, so a single chain evaluated with
    num=40 + spread must reproduce the 4-seed pooled numbers within rollout
    noise: calibrated NLL (vs no-spread in the tens-to-thousands) and RMSE
    on the same scale (within 3x — actuator's free-run mean is rollout-
    noise dominated, §2e fn 2)."""
    for ds in ("ballbeam", "drive", "gas_furnace", "dryer", "actuator",
               "flutter"):
        one = ensemble[f"{ds}_1chain_n40spread"]
        pooled = ensemble[ds]
        assert one["nll"] < 13
        assert one["nll_no_spread"] > 2 * one["nll"] + 5
        ratio = one["rmse"] / pooled["rmse"]
        assert 1 / 3 < ratio < 3, (ds, ratio)


@pytest.fixture(scope="module")
def stall():
    return _load("fp32_stall_study.json")


def test_ds64_bound_recovers_fp64_optimum(stall):
    """PARITY §2f: the ds64 (double-single on-TPU) collapsed bound removes
    the fp32 gradient bias end-to-end — the extended-training (12k iter)
    drive run lands its posterior-variance budget in the fp64 bracket
    (fp64cpu 1.49, mixed-fp64-segment 1.21) instead of pure fp32's 2.94,
    with fp64-scale learned Q and an eval NLL an order of magnitude below
    pure fp32's.  (Asserted on training-determined quantities — the
    single-rollout RMSE has real draw-to-draw spread, 0.89-1.63 across the
    two recorded eval paths.)"""
    ds64 = stall["drive_long12k_s1_ds64"]
    fp32 = stall["drive_long12k_s1"]
    fp64 = stall["drive_long12k_s1_fp64cpu"]
    mixed = stall["drive_long12k_s1_mixed"]
    assert mixed["budget_s2C2"] - 0.05 < ds64["budget_s2C2"] \
        < fp64["budget_s2C2"] + 0.15
    assert ds64["budget_s2C2"] < 0.55 * fp32["budget_s2C2"]
    assert max(ds64["Q"]) < 5e-6        # fp32 drifts to 2.7e-5
    assert ds64["nll"] < 0.5 * fp32["nll"]


def test_ds64_flutter_beats_fp32(stall):
    """flutter extended training: pure fp32 drifts to RMSE 5.9 / budget
    2.29; ds64 stays in the polish-region bracket (budget ~0.24-0.36)."""
    ds64 = stall["flutter_long12k_s1_ds64"]
    fp32 = stall["flutter_long12k_s1"]
    assert ds64["rmse"] < 0.5 * fp32["rmse"]
    assert ds64["budget_s2C2"] < 0.25 * fp32["budget_s2C2"]


def test_ds64r1_eval_spread_recorded(stall):
    """The refine=1 12k point's single-draw RMSE 4.38 (which sits outside
    the refine=2 point's 0.89-1.63 two-draw record) is draw-lottery, not a
    worse optimum: six independent rollouts of the SAME retrained chain
    span 1.29-4.38 with the recorded value as the first (bit-reproducible)
    and worst draw — §2f's pin-training-determined-quantities rule stands
    (`ds64r1_eval_spread.py`)."""
    rec = stall["drive_long12k_s1_ds64r1"]
    draws = rec["rmse_draws"]
    assert len(draws) >= 6
    assert abs(draws[0] - rec["rmse"]) < 1e-3     # bit-reproducible retrain
    assert min(draws) < 1.5 < 4.0 < max(draws)    # wide draw spread


def test_ds64_tpu_throughput_recorded(stall):
    """The ds64 cost on the chip stays within ~15x of native fp32 (12k
    iters in <300s incl. compile — extended-training regimes remain
    TPU-viable without any CPU/fp64 dependency)."""
    for ds in ("drive", "flutter"):
        assert stall[f"{ds}_long12k_s1_ds64"]["train_time_sec"] < 300.0


@pytest.fixture(scope="module")
def escape():
    return _load("escape_validation.json")


def test_ds64_closes_flutter_c5_residual(escape):
    """PARITY §2d addendum: the flutter C5 fp32 residual (5-seed median
    RMSE 1.19 vs fp64 anchors 0.672 ours / 0.768 reference) is the fp32
    gradient bias of the collapsed bound — confirmed causally by removing
    it: retraining the same 5 seeds with --collapse_precision ds64 (the
    sampler's 21 hyper-gradient evaluations per iteration get the
    double-single segment) lands the median INSIDE the fp64 anchor
    bracket and every seed at or below the escape-fix ceiling.

    Pinned on the recorded escape_validation.json (full 4000-iteration
    workload per seed on one v5e chip, fp32 parameters)."""
    native = [escape[f"flutter_C5_s{s}"]["rmse"] for s in range(5)]
    ds64 = [escape[f"flutter_C5_s{s}_ds64"]["rmse"] for s in range(5)]
    assert statistics.median(ds64) <= 0.80       # fp64 anchors 0.672/0.768
    assert max(ds64) < 1.0                        # all seeds in the bracket
    assert statistics.median(ds64) < 0.75 * statistics.median(native)
    assert all(not escape[f"flutter_C5_s{s}_ds64"]["clip_saturated"]
               for s in range(5))


@pytest.fixture(scope="module")
def profile():
    return _load("ds64_profile.json")


def test_ds64_time_attribution_recorded(profile):
    """DESIGN §13 attribution: the chol_and_inv refinement loop dominates
    the remaining ds64 step time (~64%: refine 2->0 takes the drive C4
    step from ~220 to ~617 it/s) while the dd transcendentals are noise
    (exp/log swaps move it <5%), and the MXU matmul win reproduces.
    Pinned so the round-4 optimization target stays evidence-backed."""
    p = profile["r3"]
    base = p["baseline"]["it_per_s"]
    assert p["chol_refine0"]["it_per_s"] > 2.0 * base
    assert p["exp_f32"]["it_per_s"] < 1.1 * base
    assert p["log_f32"]["it_per_s"] < 1.1 * base
    assert p["matmul_vpu"]["it_per_s"] < 0.6 * base
    assert all(v["finite"] for k, v in p.items() if isinstance(v, dict))


def test_ds64_refine1_attribution_floor(profile):
    """PARITY §2d round-5 closure: at the SHIPPED refine=1 default the
    remaining ds64 cost decomposes into the dd floor plus exactly one
    Newton round — all_f32 (exp+log fp32 AND refine 0) times the same as
    chol_refine0 alone, so nothing else is left to cut, and the ~13x
    flutter C5 accuracy cost is a measured floor, not a tuning gap."""
    p = profile["r5_refine1"]
    base = p["baseline"]["it_per_s"]
    assert base > 350                       # the refine=1 flip's win
    assert p["chol_refine0"]["it_per_s"] > 1.3 * base
    assert abs(p["all_f32"]["it_per_s"] - p["chol_refine0"]["it_per_s"]) \
        < 0.1 * p["chol_refine0"]["it_per_s"]
    assert p["exp_f32"]["it_per_s"] < 1.1 * base
    assert p["matmul_vpu"]["it_per_s"] < 0.5 * base
    assert all(v["finite"] for v in p.values() if isinstance(v, dict))


def test_ds64_refine1_probe_same_optimum(profile):
    """The refine=1 candidate (round 4): ~1.9x the shipped refine=2
    throughput AND same-optimum convergence over 2000 drive C4 iters
    (end-of-run nll divergence < 0.1; both trajectories finite).  Guards
    the evidence the TODO round-4 item cites."""
    r = profile["r3_refine"]
    assert r["it_per_s"]["refine1"] > 1.5 * r["it_per_s"]["refine2"]
    assert r["finite"]["refine1"] and r["finite"]["refine2"]
    assert r["nll_absdiv_at_end"] < 0.1
    assert abs(r["nll_final"]["refine1"] - r["nll_final"]["refine2"]) < 0.1


def test_ds64_refine1_revalidation(escape):
    """Round-4 productionization (VERDICT r3 item 1): the shipped
    chol_and_inv default flipped to refine=1 after full revalidation —
    the *_ds64r1 arm retrains the same flutter C5 seeds at the new
    default.  Pinned claims: seed statistics match the refine=2 arm
    (median inside the fp64 anchor bracket 0.672/0.768 + seed noise) at
    roughly HALF the refine=2 train time."""
    r1 = [escape[f"flutter_C5_s{s}_ds64r1"]["rmse"] for s in range(5)]
    r2 = [escape[f"flutter_C5_s{s}_ds64"]["rmse"] for s in range(5)]
    assert statistics.median(r1) <= 0.80, r1
    assert max(r1) < 1.0
    t1 = statistics.median(
        escape[f"flutter_C5_s{s}_ds64r1"]["train_time_sec"] for s in range(5))
    t2 = statistics.median(
        escape[f"flutter_C5_s{s}_ds64"]["train_time_sec"] for s in range(5))
    assert t1 < 0.65 * t2, (t1, t2)
    assert all(not escape[f"flutter_C5_s{s}_ds64r1"]["clip_saturated"]
               for s in range(5))


def test_hybrid_tail500_refuted(escape):
    """Round-4 negative result (VERDICT r3 item 3, first arm): a 500-
    iteration ds64 tail after native fp32 burn-in does NOT close the
    flutter C5 residual — the fp32 gradient bias acts well before the
    final 500 iterations.  Median stays at the native-fp32 level, far
    from the ds64 bracket.  Kept pinned so the dose-response conclusion
    (PARITY §2d round-4 addendum) stays evidence-backed."""
    hyb = [escape[f"flutter_C5_s{s}_hybrid"]["rmse"] for s in range(4)]
    assert statistics.median(hyb) > 1.0, hyb


# ---- round-4/5 C6 statistical study (PARITY §2b) -----------------------

@pytest.fixture(scope="module")
def pg_study():
    return _load("pg_c6_study.json")


def test_c6_ancestor_trace_hits_reference_regime(pg_study, ref_e2e):
    """PARITY §2b: ancestor-traced CSMC at the full C6 protocol reaches the
    reference's accuracy regime on ballbeam — 5-seed RMSE median inside
    [min, max] of the reference's recorded C6 runs (which are frozen-X
    runs, the best this model family records there).  This is the evidence
    behind pg_ancestor_trace defaulting to True."""
    ours = sorted(pg_study[f"ballbeam_C6_ancestor_s{s}"]["rmse"]
                  for s in range(5))
    ref = [v["rmse"] for k, v in ref_e2e.items()
           if k.startswith("ballbeam_C6") and "rmse" in v]
    assert len(ref) >= 3
    med = statistics.median(ours)
    assert min(ref) <= med <= max(ref) + 0.005, (med, ref)
    assert max(ours) < 0.015


def test_c6_live_csmc_measurably_worse(pg_study):
    """The live (reference-storage, no-ancestry) CSMC injects filtering-
    marginal patchwork trajectories; at full protocol its ballbeam seeds
    land 13-150x above ancestor trace — why live mode is no longer the
    default (config.pg_ancestor_trace docs)."""
    anc = statistics.median(pg_study[f"ballbeam_C6_ancestor_s{s}"]["rmse"]
                            for s in range(5))
    live = statistics.median(pg_study[f"ballbeam_C6_live_s{s}"]["rmse"]
                             for s in range(5))
    assert live > 10 * anc, (live, anc)


def test_c6_live_p500_does_not_rescue(pg_study):
    """PARITY §2b round-5 sweep: 5x the particle budget improves live
    CSMC's ballbeam median ~2x but leaves it >20x above ancestor trace —
    the patchwork storage, not degeneracy, is the binding constraint, so
    ancestor trace is strictly dominant at any affordable P."""
    p500 = sorted(pg_study[f"ballbeam_C6_liveP500_s{s}"]["rmse"]
                  for s in range(3))
    anc = statistics.median(pg_study[f"ballbeam_C6_ancestor_s{s}"]["rmse"]
                            for s in range(5))
    assert p500[1] > 20 * anc, (p500, anc)


def test_c6_full_dataset_matrix(pg_study):
    """PARITY §2b round-5 coverage: C6 ancestor-trace runs on every
    benchmark dataset.  Pins the two directional claims: flutter's C6
    median beats both C4 anchors (PG helps where gradient-only X
    underfits), and dryer's C6 sits measurably above its C4 anchor
    (trajectory injection costs accuracy on short well-fit data)."""
    fl = sorted(pg_study[f"flutter_C6_ancestor_s{s}"]["rmse"]
                for s in range(3))
    assert fl[1] < 0.947        # ours C4 anchor; ref C4 is 1.56
    dr = sorted(pg_study[f"dryer_C6_ancestor_s{s}"]["rmse"]
                for s in range(3))
    assert dr[0] > 0.15         # clearly above the 0.08-0.10 C4 anchors
    for ds in ("gas_furnace", "actuator"):
        for s in range(3):
            assert pg_study[f"{ds}_C6_ancestor_s{s}"]["rmse"] < 1.0


def test_c6_ancestor_p500_removes_drive_outlier(pg_study):
    """PARITY §2b: P=500 on the ancestor-trace side fixes the drive
    seed-3 worse-optimum chain (1.71 -> 0.55) and keeps every seed under
    0.65, at near-free TPU cost (vmapped particle axis) — the measured
    basis for the --pg_particles 500 production recommendation."""
    p500 = [pg_study[f"drive_C6_ancestorP500_s{s}"]["rmse"]
            for s in range(5)]
    assert max(p500) < 0.65, p500
    assert pg_study["drive_C6_ancestor_s3"]["rmse"] > 1.5   # the outlier
    t100 = statistics.median(
        pg_study[f"drive_C6_ancestor_s{s}"]["train_time_sec"]
        for s in range(1, 5))    # s0 carries first-process compile
    t500 = statistics.median(
        pg_study[f"drive_C6_ancestorP500_s{s}"]["train_time_sec"]
        for s in range(1, 5))
    assert t500 < 1.5 * t100, (t500, t100)
    # and regression-free on the easy dataset (same accuracy regime)
    bb = [pg_study[f"ballbeam_C6_ancestorP500_s{s}"]["rmse"]
          for s in range(3)]
    assert max(bb) < 0.015, bb


def test_c6_mixing_diagnostics_healthy(pg_study):
    """The ancestor-trace sampler is genuinely mixing at benchmark scale:
    the reference particle survives resampling but does not dominate
    (ref_survival well inside (0.5, 1)), and the pool keeps ~half its
    members distinct per step (unique_frac ~ 0.5 >> 1/P = 0.01)."""
    for ds in ("ballbeam", "drive"):
        for s in range(5):
            m = pg_study[f"{ds}_C6_ancestor_s{s}"]["mixing_mean"]
            assert 0.5 < m["ref_survival"] < 0.95, (ds, s, m)
            assert m["unique_frac"] > 0.3, (ds, s, m)
            assert m["accepted"] == 1.0


def test_c2_c3_seed_populations(ref_e2e):
    """PARITY §2b round-5 seed extension: C2's 9-seed population (median
    ~5x the reference's 3-run median — the honest fp32-sampler-noise
    picture) and C3's 6-seed population (median ~10x BETTER than the
    reference's 0.1897)."""
    ours = _load("ours_e2e_tpu_fp32.json")
    c2 = [ours["ballbeam_C2"]["rmse"]] + \
         [ours[f"ballbeam_C2_seed{s}"]["rmse"] for s in range(1, 9)]
    assert len(c2) == 9
    ref_c2 = [v["rmse"] for k, v in ref_e2e.items()
              if k.startswith("ballbeam_C2")]
    assert statistics.median(c2) > statistics.median(ref_c2)   # honest
    assert min(c2) < 1.5 * min(ref_c2)          # best seeds do match
    c3 = [ours["ballbeam_C3"]["rmse"]] + \
         [ours[f"ballbeam_C3_seed{s}"]["rmse"] for s in range(1, 6)]
    assert len(c3) == 6
    assert statistics.median(c3) < 0.1897 / 5   # ref's only C3 run


def test_c2_noise_not_factorization_error():
    """PARITY §2b fn 5 (c): substituting the dd-refined Kmm factorization
    into every C2 gradient evaluation does not tighten the seed spread
    (matched seeds diverge in both directions) — the C2 noise is SGHMC
    chain variation, not fp32 factor error, and ds64 correctly stays out
    of the uncollapsed path."""
    st = _load("c2_precision_study.json")
    nat = [st[f"ballbeam_C2_native_s{s}"]["rmse"] for s in range(20, 25)]
    dsp = [st[f"ballbeam_C2_dsprecal_s{s}"]["rmse"] for s in range(20, 25)]
    assert len(nat) == len(dsp) == 5
    # no improvement: dd-precal's spread is not tighter than native's
    assert max(dsp) - min(dsp) > 0.5 * (max(nat) - min(nat))
    assert statistics.median(dsp) > 0.5 * statistics.median(nat)
    # and it costs ~10x
    t_nat = statistics.median(
        st[f"ballbeam_C2_native_s{s}"]["train_time_sec"]
        for s in range(20, 25))
    t_dsp = statistics.median(
        st[f"ballbeam_C2_dsprecal_s{s}"]["train_time_sec"]
        for s in range(20, 25))
    assert t_dsp > 3 * t_nat


@pytest.fixture(scope="module")
def coldstart():
    return _load("hybrid_coldstart_study.json")


def test_hybrid_coldstart_rationale_validated(coldstart):
    """VERDICT r4 item 7: the hybrid mode's kept-for-cold-starts rationale,
    tested (kink cold start, 5 seeds x {native, ds64, hybrid}).  The
    decision evidence: hybrid's learned Q lands in the ds64 arm's band on
    every seed, DISJOINT from native's band (the 500-iter ds64 tail pulls
    the cold-start optimum into the unbiased regime), and its ds64-ruler
    nll sits between native and ds64.  Hybrid therefore stays — for COLD
    starts; the warm-start refutation (test_hybrid_tail500_refuted)
    stands."""
    def arm(name, field):
        return [coldstart[f"kink_cold_{name}_s{s}"][field] for s in range(5)]

    q_nat, q_ds, q_hyb = (arm(a, "Q") for a in ("native", "ds64", "hybrid"))
    q_nat = [q[0] for q in q_nat]
    q_ds = [q[0] for q in q_ds]
    q_hyb = [q[0] for q in q_hyb]
    assert max(q_hyb) < min(q_nat), (q_hyb, q_nat)   # disjoint bands
    assert max(q_hyb) < 1.25 * max(q_ds)             # inside/near ds64 band
    n_nat = statistics.median(arm("native", "nll_final_ds64_bound"))
    n_ds = statistics.median(arm("ds64", "nll_final_ds64_bound"))
    n_hyb = statistics.median(arm("hybrid", "nll_final_ds64_bound"))
    assert n_ds < n_hyb < n_nat, (n_ds, n_hyb, n_nat)


def test_c6_drive_s3_outlier_is_chain_level(pg_study):
    """PARITY §2b fn 4: the drive ancestor-trace seed-3 RMSE 1.71 is a
    chain-level outlier (worse optimum), not eval noise — the redraw probe
    reproduced the chain bit-exactly (draw 1 == the recorded value) and
    every independent eval draw of that chain stays >1.5; extension seeds
    5-7 are all healthy (<0.75), bounding the outlier rate at 1/8."""
    rd = pg_study["drive_C6_ancestor_s3_redraw"]
    assert abs(rd["rmse_draws_num10"][0] - rd["recorded_outlier"]) < 1e-3
    assert min(rd["rmse_draws_num10"]) > 1.4      # not an unlucky draw
    assert rd["rmse_num40"] > 1.4
    for s in (5, 6, 7):
        assert pg_study[f"drive_C6_ancestor_s{s}"]["rmse"] < 0.75


@pytest.fixture(scope="module")
def tri_inv():
    return _load("tri_inv_timings.json")


@pytest.fixture(scope="module")
def m512():
    return _load("m512_reconcile.json")


def test_m512_reconciliation(m512, tri_inv):
    """PARITY §3 fn 6 / DESIGN §14 round-5: ONE M=512 step-time number.
    The steady cost is ~2.7 ms/iter — every chunk-length-differenced
    estimate across all four param/data setups lands in [2.0, 3.5] ms,
    the repeated-execution six-dataset M=512 reps agree (~15 ms per
    6-model iteration), and the re-measured tri_inv r5 row (two warm
    executions + 3-rep median) no longer shows the 8.90 artifact."""
    r5 = m512["r5"]
    for setup in ("bench_setup", "random_setup", "bench_params_random_data",
                  "random_params_real_data"):
        d = r5[setup]["ms_per_iter_differenced"]
        assert 2.0 < d < 3.5, (setup, d)
        assert r5[setup]["nll_finite_chunk1000"]
    # steady executions of the exact tri_inv program: ~2.7 ms/iter
    steady = r5["exec_series_ms"]["M512_chunk100_after_m100"][1:]
    assert all(250 < ms < 320 for ms in steady), steady
    assert tri_inv["r5"]["train_step_M512_ms"] < 4.0
    # and the retry-branch probe: param content does not move the time
    # even when the first-attempt factorization fails (cond ~2e10)
    assert not r5["bench_setup"]["retry_probe_init"]["kmm_first_chol_finite"]


def test_m512_roofline_inputs_pinned():
    """DESIGN §14's roofline inputs are recorded artifacts (VERDICT r4
    weak #5): FLOPs/bytes per iteration from the TPU-compiled program's
    cost analysis, plus the component attribution."""
    r5 = _load("m512_profile.json")["r5"]
    assert r5["platform"] == "tpu"
    assert 5e7 < r5["flops_per_iter"] < 5e8
    assert 1e6 < r5["bytes_per_iter"] < 5e7
    # collapse terms dominate; every share is a real fraction
    assert r5["no_collapse_terms_share"] > 0.5
    for k in ("no_chol_and_inv", "no_se_gram", "no_emission"):
        assert 0.0 < r5[f"{k}_share"] < 1.0


def test_tri_inv_r4_inprogram_row(tri_inv):
    """Round-4 re-measure (TODO cadence): the r4 row must carry the
    IN-PROGRAM numbers (dispatch-floor-free; ffvd_tpu/utils/timing.py)
    and blocked_tri_inv must remain unpromoted — its in-program M=512
    time is within 20% of the direct solve (the dispatch-level 'win' was
    tunnel overhead)."""
    r4 = tri_inv["r4"]
    assert r4["platform"] == "tpu"
    direct = r4["inprog_direct_ms_M512"]
    blocked = r4["inprog_blocked_ms_M512"]
    assert blocked > 0.8 * direct, (blocked, direct)   # no >20% win
    # the bogus no-op-sync measurement can't recur: a full M=512 train
    # step is physically > 1 ms on this hardware
    assert r4["train_step_M512_ms"] > 1.0
