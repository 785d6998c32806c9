#!/bin/bash
# Round-5 session-4 hardware program (sequential -- ONE TPU process at a time):
#   1. treelet traversal-only decomposition on practice7_3 (fills the one
#      missing row of the GAP.md ladder: treelet chained ms/bounce)
#   2. the measured full-contract checkpointed frame w/ mid-run resume
#      (VERDICT r4 next #4): practice7_3 1280x720 @ 1024 spp
cd /root/repo
OUT=_probes/out
mkdir -p $OUT
echo "[s4] prof_traverse treelet $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
timeout 1200 python _probes/prof_traverse.py practice7_3.gltf 262144 24 \
  >> $OUT/prof_traverse.jsonl 2> $OUT/prof_traverse_treelet.stderr.txt
echo "[s4] prof_traverse rc=$? $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
sleep 30   # let a possibly-wedged claim drain before the next process
echo "[s4] contract_frame $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
timeout 5400 python _probes/contract_frame.py \
  > $OUT/contract_frame.json 2> $OUT/contract_frame.stderr.txt
echo "[s4] contract_frame rc=$? $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
