#!/bin/bash
# Ours sampler-case seed spread (TPU; run ONLY when the chip is free).
cd /root/repo/tests/golden
set -x
for seed in 2 3 4; do
  python run_ours_e2e.py ballbeam 6 $seed seed$seed
done
for seed in 2 3; do
  python run_ours_e2e.py ballbeam 5 $seed seed$seed
done
echo OURS_BATCH3_DONE
