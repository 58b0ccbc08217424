#!/bin/bash
cd /root/repo/tests/golden
set -x
python bench_tri_inv.py blocked
for seed in 1 2; do
  python run_ours_e2e.py ballbeam 2 $seed seed$seed
done
python run_ours_e2e.py ballbeam 5 1 seed1
python run_ours_e2e.py ballbeam 6 1 seed1
python run_ours_e2e.py ballbeam 3 1 seed1
echo TPU_BATCH2_DONE
