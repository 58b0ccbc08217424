#!/bin/bash
# Round-4 validation chain — SERIALIZED TPU jobs (single tunneled chip;
# never run two JAX processes against it concurrently).
#
# 1. ds64 refine=1 budget validation (VERDICT r3 item 1, stall-study arm):
#    drive + flutter long12k at collapse_precision=ds64, ds64_refine=1
#    -> fp32_stall_study.json tags *_ds64r1
# 2. ds64 refine=1 escape validation (item 1, retrain arm): flutter C5
#    5 seeds -> escape_validation.json tags *_ds64r1
# 3. hybrid schedule (item 3): flutter C5 5 seeds, native burn-in +
#    500-iter ds64(refine=1) tail -> escape_validation.json tags *_hybrid
# 4. tri-inv re-measure (item 7): tri_inv_timings.json row r4
# 5. C6 statistical validation (item 4): ancestor-trace 5 seeds x
#    {ballbeam, drive} + live 5 seeds ballbeam, with mixing diagnostics
#    -> pg_c6_study.json
set -x
cd /root/repo || exit 1

FFVD_STALL_DS64R1=1 python tests/golden/fp32_stall_study.py drive flutter \
  2>&1 | grep -v "^WARNING"
FFVD_ESCAPE_MODE=ds64r1 python tests/golden/escape_validation.py flutter \
  2>&1 | grep -v "^WARNING"
FFVD_ESCAPE_MODE=hybrid python tests/golden/escape_validation.py flutter \
  2>&1 | grep -v "^WARNING"
python tests/golden/bench_tri_inv.py r4 2>&1 | grep -v "^WARNING"
python tests/golden/pg_c6_study.py 2>&1 | grep -v "^WARNING"
echo R4 CHAIN DONE
