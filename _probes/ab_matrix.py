"""Hardware A/B driver: run bench_one under env-knob combos, one bounded
TPU subprocess per combo (sequential -- single-chip rule), one JSON line
per result.

This is the round-5 traversal/kernel decision program (VERDICT r4 next
#1-3, #5): megakernel/camera fusion, cull+pop, tier-2b, split precision,
sticky engine, grouped-vs-treelet e2e on the big meshes, chained
accounting on the small scenes. Results drive the ops/traverse.py default
decision (ROUNDLOG_r03 rule).

Usage: python _probes/ab_matrix.py [set]   # set in {kernels,traversal,all}
Logs to stdout AND _probes/out/ab_<set>.jsonl.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_SRC = r"""
import json, os, sys
sys.path.insert(0, os.environ["RT_REPO"])
import bench
res = bench.bench_one(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                      int(sys.argv[4]), reps=int(os.environ.get("RT_BENCH_REPS", "3")),
                      batch_cap=int(os.environ.get("RT_BENCH_BATCH", "1048576")))
print("ABRESULT " + json.dumps(res), flush=True)
"""

# (label, env-overrides, scene, w, h, measure_spp)
SMALL = ("practice3_1.txt", 640, 480, 16)
P71 = ("practice7_1.gltf", 1280, 720, 16)
P72 = ("practice7_2.gltf", 1280, 720, 4)
P73 = ("practice7_3.gltf", 1280, 720, 4)

KERNELS = [
    ("71_default", {}, *P71),
    ("71_no_megacam", {"RT_MEGA_CAM": "0"}, *P71),
    ("71_no_mega", {"RT_MEGAKERNEL": "0"}, *P71),
    ("71_sticky", {"RT_ENGINE": "sticky"}, *P71),
    ("31_default_chained", {}, *SMALL),
    ("31_no_megacam", {"RT_MEGA_CAM": "0"}, *SMALL),
]

# The grouped-traversal arms measured here in round-5 session 3 (grouped
# LOST every configuration; ROUNDLOG_r05.md) referred to a backend that
# has since been deleted -- recover at git tag `grouped-backend-final` to
# re-run those rows.
TRAVERSAL = [
    ("73_treelet", {}, *P73),
    ("73_treelet_slots256", {"RT_SLOTS": "256"}, *P73),
    ("73_wavefront_treelet", {"RT_ENGINE": "wavefront"}, *P73),
    ("72_treelet", {}, *P72),
]


def run_one(label, envov, scene, w, h, spp, log):
    from raytracing_course_2024_tpu.scene import SCENES_DIR
    path = os.path.join(SCENES_DIR, scene)
    if not os.path.exists(path):
        path = os.path.join(REPO, "scenes", scene)
    env = dict(os.environ, RT_REPO=REPO, **envov)
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", BENCH_SRC, path, str(w), str(h), str(spp)],
            capture_output=True, text=True, timeout=2400, env=env)
        lines = [l for l in p.stdout.splitlines() if l.startswith("ABRESULT ")]
        rec = json.loads(lines[-1][9:]) if lines else {
            "error": (p.stderr or p.stdout)[-1500:], "rc": p.returncode}
    except subprocess.TimeoutExpired:
        rec = {"error": "timeout 2400s"}
    rec = {"ab": label, "env": envov, "probe_wall_s": round(time.time() - t0, 1), **rec}
    line = json.dumps(rec)
    print(line, flush=True)
    log.write(line + "\n")
    log.flush()


# Round-5 session-4: the treelet straggler-phase knobs (VERDICT r4 weak #1
# named "straggler behavior on incoherent bounces" as the known next
# lever) -- never hardware-swept. R0 = full-batch rounds before waves
# (default 3 ~ p95 crossings 5); CAPDIV = wave width divisor (default 16,
# only 16-vs-old-8-single-shot was ever measured). Baseline 73_treelet =
# 4.15 Mrays/s (ab_traversal.jsonl, measured twice this round).
STRAGGLER = [
    ("73_r0_2", {"RT_TREELET_R0": "2"}, *P73),
    ("73_r0_4", {"RT_TREELET_R0": "4"}, *P73),
    ("73_r0_5", {"RT_TREELET_R0": "5"}, *P73),
    ("73_cap8", {"RT_TREELET_CAPDIV": "8"}, *P73),
    ("73_cap32", {"RT_TREELET_CAPDIV": "32"}, *P73),
    ("73_r0_4_cap32", {"RT_TREELET_R0": "4", "RT_TREELET_CAPDIV": "32"}, *P73),
    ("73_r0_4_cap64", {"RT_TREELET_R0": "4", "RT_TREELET_CAPDIV": "64"}, *P73),
]


P61 = ("practice6_1.gltf", 640, 480, 16)

# Post-flip confirmation of the new (R0=4, CAPDIV=32) treelet defaults on
# every bvh-family config (the sweep only measured practice7_3).
CONFIRM = [
    ("73_new_defaults", {}, *P73),
    ("72_new_defaults", {}, *P72),
    ("61_new_defaults", {}, *P61),
]

# Session-5: e2e lane-count sweep for the bvh wavefront. Round 1 set
# BVH_BATCH=262144 after measuring only 512k (worse, commit 89f094c);
# below-262k was never swept, and the session-4 traversal-only probe
# measured 6.21 Mrays/s at 131k lanes vs 4.31 e2e at 262k. RT_BENCH_BATCH
# flows to Renderer(batch_size=) -> wavefront lanes.
LANES = [
    ("73_lanes_64k", {"RT_BENCH_BATCH": "65536"}, *P73),
    ("73_lanes_131k", {"RT_BENCH_BATCH": "131072"}, *P73),
    ("73_lanes_196k", {"RT_BENCH_BATCH": "196608"}, *P73),
    ("73_lanes_524k", {"RT_BENCH_BATCH": "524288"}, *P73),
]

# Session-5 follow-up: the first lanes sweep came back monotonic downward
# (64k=4.79 > 131k=4.65 > 196k=4.48 > 262k-default=4.31) -- extend below
# 64k and test straggler-knob interaction at 64k (cap = lanes/CAPDIV, so
# the 64k default wave width is 2048).
LANES2 = [
    ("73_lanes_32k", {"RT_BENCH_BATCH": "32768"}, *P73),
    ("73_lanes_48k", {"RT_BENCH_BATCH": "49152"}, *P73),
    ("73_lanes_96k", {"RT_BENCH_BATCH": "98304"}, *P73),
    ("73_lanes_64k_cap16", {"RT_BENCH_BATCH": "65536", "RT_TREELET_CAPDIV": "16"}, *P73),
    ("73_lanes_64k_r0_3", {"RT_BENCH_BATCH": "65536", "RT_TREELET_R0": "3"}, *P73),
]

# Session-5: the curve kept climbing below 64k (32k=4.92) -- find the knee.
# At 16k lanes the wave cap clamps to its 1024 floor (= B/16).
LANES3 = [
    ("73_lanes_16k", {"RT_BENCH_BATCH": "16384"}, *P73),
    ("73_lanes_24k", {"RT_BENCH_BATCH": "24576"}, *P73),
    ("73_lanes_8k", {"RT_BENCH_BATCH": "8192"}, *P73),
]

# Session-5: 16k is the 7_3 peak (5.31, +23% over the 262k default; 8k
# = 5.28, 24k = 5.02). Confirm 16k cross-scene + re-check R0 there (at
# 16k lanes the 1024 wave floor makes CAPDIV>=16 equivalent).
LANES16K = [
    ("73_16k_r0_5", {"RT_BENCH_BATCH": "16384", "RT_TREELET_R0": "5"}, *P73),
    ("72_lanes_16k", {"RT_BENCH_BATCH": "16384"}, *P72),
    ("61_lanes_16k", {"RT_BENCH_BATCH": "16384"}, *P61),
    ("61_lanes_16k_r0_3", {"RT_BENCH_BATCH": "16384", "RT_TREELET_R0": "3"}, *P61),
]

# Session-5: per-scene straggler check -- practice6_1 (16k-tri mesh, small
# treelet table) lost 3% under the new global (R0=4, CAPDIV=32) defaults;
# measure whether the old knobs (or intermediates) are the small-mesh
# optimum before deciding a per-scene rule.
STRAGGLER61 = [
    ("61_r0_3_cap16", {"RT_TREELET_R0": "3", "RT_TREELET_CAPDIV": "16"}, *P61),
    ("61_r0_3_cap32", {"RT_TREELET_R0": "3", "RT_TREELET_CAPDIV": "32"}, *P61),
    ("61_r0_4_cap16", {"RT_TREELET_R0": "4", "RT_TREELET_CAPDIV": "16"}, *P61),
]


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    combos = {"kernels": KERNELS, "traversal": TRAVERSAL,
              "straggler": STRAGGLER, "confirm": CONFIRM,
              "lanes": LANES, "lanes2": LANES2, "lanes3": LANES3,
              "lanes16k": LANES16K,
              "straggler61": STRAGGLER61,
              "all": KERNELS + TRAVERSAL}[which]
    if len(sys.argv) > 2:  # optional label filter for reruns
        names = set(sys.argv[2:])
        combos = [c for c in combos if c[0] in names]
    os.makedirs(os.path.join(REPO, "_probes", "out"), exist_ok=True)
    with open(os.path.join(REPO, "_probes", "out", f"ab_{which}.jsonl"), "a") as log:
        log.write(f"# run {time.strftime('%F %T')}\n")
        for combo in combos:
            run_one(*combo, log)


if __name__ == "__main__":
    main()
