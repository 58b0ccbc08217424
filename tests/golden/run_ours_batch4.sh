#!/bin/bash
# C6 mode studies + perf benches (TPU; single chip — sequential only).
cd /root/repo/tests/golden
set -x
python run_ours_e2e.py ballbeam 6 0 pgnoop pgnoop
python run_ours_e2e.py ballbeam 6 1 pgnoop_seed1 pgnoop
python run_ours_e2e.py ballbeam 6 0 ancestor ancestor
python run_ours_e2e.py ballbeam 6 1 ancestor_seed1 ancestor
python bench_sampler.py subset_grad_r2
python bench_tri_inv.py
python /root/repo/bench.py
echo OURS_BATCH4_DONE
