#!/bin/bash
# Sampler x deep e2e with the MAP-hidden default (deep_sample_hidden=False):
# does the fixed default train stably where the sampled-hidden run escaped?
cd /root/repo/tests/golden
set -x
python run_ours_e2e.py flutter 5 0 deep2 deep2
python run_ours_e2e.py drive 2 0 deep2 deep2
echo OURS_BATCH9_DONE
