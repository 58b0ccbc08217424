#!/bin/bash
# Provenance record: the flutter-C5 stability controls (run individually on
# 2026-08-17; results discussed in PARITY.md §2b-deep and DESIGN.md §9b).
#
# 1. Shallow fp32 TPU control -> ours_e2e_tpu_fp32.json "flutter_C5"
#    (rmse 1531.75: the C5 escape is NOT deep-specific)
# 2. fp32 TPU with tight log clip (rmse 83.4: bounded but still escaped;
#    results under /tmp at run time, numbers quoted in PARITY.md)
# 3. fp64 CPU control (the reference's precision regime)
# 4. TF reference flutter C5 anchor -> tf_reference_e2e.json "flutter_C5"
cd /root/repo/tests/golden
set -x
python run_ours_e2e.py flutter 5 0
python -m ffvd_tpu.cli --file_index 4 --case_val 5 --iterations 2000 \
    --sghmc_log_clip 10 --results_dir /tmp/flutter_c5_clip10
python -m ffvd_tpu.cli --file_index 4 --case_val 5 --iterations 2000 \
    --platform cpu --results_dir /tmp/flutter_c5_fp64
nice -n 10 python run_tf_reference_e2e.py flutter 2000 5 30
echo OURS_CONTROLS_DONE
