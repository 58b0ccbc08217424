#!/bin/bash
# Round-2 follow-up: more ours-side sampler-case seeds (TPU, sequential —
# single chip) to widen the PARITY §2b spread columns.
cd /root/repo/tests/golden
set -x
python run_ours_e2e.py ballbeam 2 3 seed3
python run_ours_e2e.py ballbeam 5 4 seed4
python run_ours_e2e.py ballbeam 6 5 seed5
python run_ours_e2e.py ballbeam 3 2 seed2
echo OURS_BATCH5_DONE
