#!/bin/bash
# Ours with the reference rollout-variance slip reproduced (NLL study).
cd /root/repo/tests/golden
set -x
for seed in 1 2 3; do
  python run_ours_e2e.py drive 4 $seed compat_seed$seed compat
done
for seed in 1 2 3; do
  python run_ours_e2e.py flutter 4 $seed compat_seed$seed compat
done
echo COMPAT_CHAIN_DONE
