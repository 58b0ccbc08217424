#!/bin/bash
# Sequential OURS e2e runs on the TPU (one at a time - single tunneled chip).
cd /root/repo/tests/golden
set -x
python run_ours_e2e.py ballbeam 2
for seed in 1 2 3 4 5; do
  python run_ours_e2e.py drive 4 $seed seed$seed
done
for seed in 1 2 3 4 5; do
  python run_ours_e2e.py flutter 4 $seed seed$seed
done
echo OURS_CHAIN_DONE
