"""Run OUR full workload end-to-end (train + posterior eval) and record
final RMSE/NLL + wall-clock into tests/golden/ours_e2e_tpu_fp32.json.

Counterpart of run_tf_reference_e2e.py: same workload as the reference CLI
(case table FFVD_Main.py:273-324, training loop models.py:142-197, eval
collect_samples_formal base_model.py:197-522), run through ffvd_tpu.cli.

Usage: python tests/golden/run_ours_e2e.py [dataset] [case] [seed] [tag]
           [compat]

``compat`` (literal string "compat"): run with --rollout_qsqrt_dim0, the
reference's rollout-variance slip reproduced (PARITY NLL study).

Runs on the default platform (TPU when available).  NEVER run two of these
concurrently — the machine has a single tunneled TPU chip.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

OUT = Path(__file__).parent / "ours_e2e_tpu_fp32.json"

DATASET_INDEX = {"dryer": 0, "drive": 1, "gas_furnace": 2, "actuator": 3,
                 "flutter": 4, "ballbeam": 5}


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "ballbeam"
    case = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    tag = sys.argv[4] if len(sys.argv) > 4 else None
    mode = sys.argv[5] if len(sys.argv) > 5 else None
    compat = mode == "compat"

    from ffvd_tpu import cli
    argv = [
        "--file_index", str(DATASET_INDEX[dataset]),
        "--case_val", str(case),
        "--iterations", "2000",
        "--seed", str(seed),
        "--results_dir", str(Path(__file__).parent / "ours_results"),
    ]
    if compat:
        argv.append("--rollout_qsqrt_dim0")
    if mode == "pgnoop":
        argv.append("--pg_compat_noop")
    if mode == "ancestor":
        argv.append("--pg_ancestor_trace")
    if mode and mode.startswith("deep"):
        # deep transition (model/deep.py): modeN = n_layers N
        argv.extend(["--n_layers", mode[4:] or "2"])
    res = cli.main(argv)

    key = dataset if (case == 4 and tag is None) else f"{dataset}_C{case}"
    if tag:
        key += f"_{tag}"
    rec = {"rmse": res["rmse"], "nll": res["nll"],
           "final_elbo": res["final_elbo"],
           "train_time_sec": round(res["train_time"], 2),
           "seed": seed, "case": f"C{case}"}
    if compat:
        rec["rollout_qsqrt_dim0"] = True
    elif mode:
        rec["mode"] = mode
    if mode and mode.startswith("deep"):
        # Config-affecting context, so same-key re-runs under changed
        # defaults stay distinguishable (this runner never passes
        # --deep_sample_hidden, so entries record the config default).
        from ffvd_tpu.config import FFVDConfig
        rec["deep_sample_hidden"] = FFVDConfig().deep_sample_hidden
    all_rec = json.loads(OUT.read_text()) if OUT.exists() else {}
    all_rec[key] = rec
    OUT.write_text(json.dumps(all_rec, indent=2))
    print(json.dumps({key: rec}, indent=2), flush=True)


if __name__ == "__main__":
    main()
