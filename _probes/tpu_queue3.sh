#!/bin/bash
# Round-5 prioritized hardware program (recreated after the workspace wipe
# lost the gitignored _probes/; now committed). Run on a healthy claim,
# steps strictly sequential -- ONE TPU process at a time.
#
#   1. kernel validation  : RT_TEST_TPU gated suite (megakernel v2 parity
#                           + soak, Pallas sampler, TPU goldens)
#   2. headline + chained : bench.py default (practice7_1) -- BENCH_r05
#   3. kernel/engine A/Bs : ab_matrix.py kernels
#   4. traversal decision : ab_matrix.py traversal (grouped vs treelet on
#                           practice7_2/7_3, cull+pop, K2B, split3,
#                           wavefront e2e) -> apply ROUNDLOG_r03 rule
#   5. full matrix        : RT_BENCH_MATRIX=1 (incl. reconstructed
#                           practice6_1) -> BENCH_r05_matrix.txt
#   6. golden regen       : tests/regen_tpu_golden.py if step 1 flagged
#   7. contract frame     : contract_frame.py practice7_3 1024 spp with
#                           mid-run resume (VERDICT r4 next #4) -- LAST,
#                           it monopolizes the chip ~30 min.
set -x
cd "$(dirname "$0")/.."
mkdir -p _probes/out
R=_probes/out
RT_TEST_TPU=1 timeout 3000 python -m pytest tests/test_megakernel.py \
  tests/test_pallas_sampler.py tests/test_tpu_golden.py -q \
  2>&1 | tail -30 | tee $R/q3_step1_tests.log
timeout 1800 python bench.py 2>&1 | tee $R/q3_step2_headline.log
timeout 7200 python _probes/ab_matrix.py kernels 2>&1 | tail -20
timeout 14000 python _probes/ab_matrix.py traversal 2>&1 | tail -20
RT_BENCH_MATRIX=1 timeout 10000 python bench.py \
  2> $R/q3_step5_matrix.stderr.txt | tee $R/q3_step5_matrix.json
timeout 14000 python _probes/contract_frame.py 2>&1 | tee $R/q3_step7_contract.log
