#!/bin/bash
# Second follow-up: reference seed spread for the sampler cases C2/C5/C6.
cd /root/repo/tests/golden
set -x
for seed in 2 3; do
  nice -n 10 python run_tf_reference_e2e.py ballbeam 2000 2 30 seed$seed
  nice -n 10 python run_tf_reference_e2e.py ballbeam 2000 6 30 seed$seed
  nice -n 10 python run_tf_reference_e2e.py ballbeam 2000 5 30 seed$seed
done
echo ANCHOR_RESUME2_DONE
