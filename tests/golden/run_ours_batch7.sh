#!/bin/bash
# Complete the deep-2 table across all six datasets + a 3-layer probe on
# flutter (where deep-2 paid the most).  Waits for batch6 (single TPU chip).
cd /root/repo/tests/golden
while ! grep -q OURS_BATCH6_DONE ours_batch6.log 2>/dev/null; do sleep 60; done
set -x
python run_ours_e2e.py dryer 4 0 deep2 deep2
python run_ours_e2e.py gas_furnace 4 0 deep2 deep2
python run_ours_e2e.py actuator 4 0 deep2 deep2
python run_ours_e2e.py flutter 4 0 deep3 deep3
echo OURS_BATCH7_DONE
