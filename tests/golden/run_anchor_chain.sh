#!/bin/bash
# Sequential TF-reference anchor runs (single-core machine: run one at a time).
cd /root/repo/tests/golden
set -x
for case in 2 5 6 1 3; do
  nice -n 10 python run_tf_reference_e2e.py ballbeam 2000 $case 30
done
for seed in 1 2 3 4 5; do
  nice -n 10 python run_tf_reference_e2e.py drive 2000 4 30 seed$seed
done
for seed in 1 2 3 4 5; do
  nice -n 10 python run_tf_reference_e2e.py flutter 2000 4 30 seed$seed
done
echo ANCHOR_CHAIN_DONE
