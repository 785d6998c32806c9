#!/bin/bash
# Round-5 session-4 hardware program, part 2 (after contract_frame):
#   1. bench.py headline smoke post-grouped-deletion (BENCH_r05 insurance)
#   2. treelet straggler-knob sweep (ab_matrix straggler set)
#   3. prof_traverse treelet decomposition retry at 131k lanes (262k OOMed)
cd /root/repo
OUT=_probes/out
mkdir -p $OUT
echo "[s4b] bench headline $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
timeout 1500 python bench.py > $OUT/bench_headline_s4.json 2> $OUT/bench_headline_s4.stderr.txt
echo "[s4b] bench rc=$? $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
sleep 20
echo "[s4b] straggler sweep $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
timeout 4200 python _probes/ab_matrix.py straggler >> $OUT/session4.log 2> $OUT/ab_straggler.stderr.txt
echo "[s4b] straggler rc=$? $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
sleep 20
echo "[s4b] prof_traverse treelet 131k $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
timeout 1200 python _probes/prof_traverse.py practice7_3.gltf 131072 24 \
  >> $OUT/prof_traverse.jsonl 2> $OUT/prof_traverse_treelet.stderr.txt
echo "[s4b] prof_traverse rc=$? $(date -u +%H:%M:%S)" | tee -a $OUT/session4.log
