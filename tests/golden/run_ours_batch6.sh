#!/bin/bash
# Deep-transition e2e on the two hardest datasets (shallow RMSE: drive 0.73,
# flutter 0.95): does the deep transition buy accuracy where the shallow
# model struggles?
cd /root/repo/tests/golden
set -x
python run_ours_e2e.py flutter 4 0 deep2 deep2
python run_ours_e2e.py drive 4 0 deep2 deep2
python run_ours_e2e.py flutter 4 1 deep2_seed1 deep2
python run_ours_e2e.py drive 4 1 deep2_seed1 deep2
echo OURS_BATCH6_DONE
