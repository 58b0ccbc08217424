#!/bin/bash
# Resume of run_anchor_chain.sh: the remaining reference anchors.
cd /root/repo/tests/golden
set -x
nice -n 10 python run_tf_reference_e2e.py ballbeam 2000 3 30
for seed in 1 2 3 4 5; do
  nice -n 10 python run_tf_reference_e2e.py drive 2000 4 30 seed$seed
done
for seed in 1 2 3 4 5; do
  nice -n 10 python run_tf_reference_e2e.py flutter 2000 4 30 seed$seed
done
echo ANCHOR_RESUME_DONE
