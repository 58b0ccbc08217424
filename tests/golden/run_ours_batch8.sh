#!/bin/bash
# Deep follow-ups: (a) actuator deep-2 second seed - is the regression seed
# noise?  (b) deep x SGHMC sampler e2e (flutter C5 deep2, drive C2 deep2).
cd /root/repo/tests/golden
set -x
python run_ours_e2e.py actuator 4 1 deep2_seed1 deep2
python run_ours_e2e.py flutter 5 0 deep2 deep2
python run_ours_e2e.py drive 2 0 deep2 deep2
echo OURS_BATCH8_DONE
