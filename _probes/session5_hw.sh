#!/bin/bash
# Round-5 session-5 hardware program (single TPU process at a time):
#   1. e2e lane-count sweep for the bvh wavefront (the never-swept-below-
#      262k dimension; session-4 traversal-only probe hinted 131k wins)
#   2. the CAPDIV=64 straggler arm (queued at end of session 4)
#   3. per-scene straggler check on practice6_1 (lost 3% to the new
#      global defaults)
cd /root/repo
OUT=_probes/out
mkdir -p $OUT
echo "[s5] lanes sweep $(date -u +%H:%M:%S)" | tee -a $OUT/session5.log
timeout 3600 python _probes/ab_matrix.py lanes >> $OUT/session5.log 2> $OUT/ab_lanes.stderr.txt
echo "[s5] lanes rc=$? $(date -u +%H:%M:%S)" | tee -a $OUT/session5.log
sleep 20
echo "[s5] cap64 arm $(date -u +%H:%M:%S)" | tee -a $OUT/session5.log
timeout 900 python _probes/ab_matrix.py straggler 73_r0_4_cap64 >> $OUT/session5.log 2> $OUT/ab_cap64.stderr.txt
echo "[s5] cap64 rc=$? $(date -u +%H:%M:%S)" | tee -a $OUT/session5.log
sleep 20
echo "[s5] straggler61 $(date -u +%H:%M:%S)" | tee -a $OUT/session5.log
timeout 2400 python _probes/ab_matrix.py straggler61 >> $OUT/session5.log 2> $OUT/ab_straggler61.stderr.txt
echo "[s5] straggler61 rc=$? $(date -u +%H:%M:%S)" | tee -a $OUT/session5.log
echo "[s5] done $(date -u +%H:%M:%S)" | tee -a $OUT/session5.log
