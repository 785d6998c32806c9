"""Benchmarks: Mrays/sec/chip over the BASELINE.json config matrix.

Metric contract (BASELINE.json:2): Mrays/sec/chip + wall-time for a
1280x720 @ 256 spp frame. Rays = path vertices (one scene intersection per
live bounce), counted exactly by the instrumented integrator -- the same
accounting SURVEY.md section 6 uses (~1.4 G vertices for that frame).

Modes:

* default (driver contract): the HEADLINE config -- practice7_1 1280x720,
  throughput measured at RT_BENCH_SPP (default 16; spp-invariant program)
  -- printed as ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
  vs_baseline is against the 200 Mrays/s/chip north-star (BASELINE.json:5);
  the reference publishes no numbers (BASELINE.md).
* RT_BENCH_MATRIX=1: every BASELINE.json config (practice3_1 @16,
  practice3_2..5 @64, practice6_1 @256 via the reconstructed wrapper,
  practice7_1 @256, practice7_2/7_3/7_4 @1024); throughput measured at a
  per-config measure-spp, the contract-spp wall time derived, plus a
  MEASURED full-contract-spp frame where RT_BENCH_FULL=1 (always for
  practice7_1 -- VERDICT r1 weak #2). One JSON line per config + a
  markdown table on stderr.

Accounting: configs whose dispatched frame is < 0.25 s are ALSO measured
device-chained (N whole frames serialized in one dispatch, each frame's RNG
data-dependent on the previous frame's radiance) and the chained per-frame
throughput is the reported contract value, labeled "(device-chained
frames)" in the metric. Rationale: the ~29 ms/dispatch round-trip of the
tunneled single-chip relay is an environment artifact, not renderer cost
(ROUNDLOG_r03 proof; VERDICT r3 next #4); a production host pipelines
frames exactly like the chained program. Dispatched numbers stay in the
comment lines.

Claim handling: the device claim is probed in bounded subprocesses
(SIGTERM-first on timeout) and retried for RT_BENCH_CLAIM_WINDOW s
(default 900 -- must fit the driver's ~30-min kill budget, VERDICT r4)
with a JSON heartbeat line per failed probe, then a structured error line.

Env knobs: RT_BENCH_{SCENE,W,H,SPP,BATCH,REPS,MATRIX,FULL,CHAINED,
CHAIN_FRAMES,CLAIM_WINDOW,CLAIM_TIMEOUT}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET = 200.0  # Mrays/s/chip north-star (BASELINE.json:5)

# (scene, w, h, contract_spp, measure_spp) -- BASELINE.json:6-12.
# practice6_1 renders through the RECONSTRUCTED wrapper at repo scenes/
# (the reference snapshot ships only the orphaned .bin; geometry recovered
# byte-exactly, materials/camera are documented stand-ins -- see
# scenes/gen_practice6_1.py and PARITY.md).
MATRIX = [
    ("practice3_1.txt", 640, 480, 16, 16),
    ("practice3_2.txt", 640, 480, 64, 16),
    ("practice3_3.txt", 640, 480, 64, 16),
    ("practice3_4.txt", 640, 480, 64, 16),
    ("practice3_5.txt", 640, 480, 64, 16),
    ("practice6_1.gltf", 640, 480, 256, 16),
    ("practice7_1.gltf", 1280, 720, 256, 16),
    ("practice7_2.gltf", 1280, 720, 1024, 4),
    ("practice7_3.gltf", 1280, 720, 1024, 4),
    ("practice7_4.gltf", 1280, 720, 1024, 16),
]

REPO_SCENES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scenes")


def bench_one(scene: str, width: int, height: int, spp: int,
              reps: int, batch_cap: int, full_spp: int | None = None):
    """Measure steady-state throughput (and optionally one full
    ``full_spp`` frame) for a scene config, through the PRODUCTION
    ``Renderer`` (so whatever engine ships for the scene class -- batch
    for dense, regeneration wavefront for bvh -- is what gets measured).
    Returns a result dict."""
    from raytracing_course_2024_tpu.runtime.render import Renderer
    from raytracing_course_2024_tpu.scene import load_scene

    desc = load_scene(scene, width, height, spp)
    r = Renderer(desc, batch_size=batch_cap)
    backend = r.backend

    # warmup: compile + one-off device autotune pass (the first post-compile
    # execution is ~6x slower than steady state on the axon tunnel)
    for w in range(2):
        r.render_frame_device(seed=1000 + w, samples=spp)

    # per-rep timing -> median + spread: run-to-run spread on the axon
    # tunnel was measured ~4% (VERDICT r2 weak #8), so single-rep numbers
    # make round-over-round deltas unattributable.
    # Timed via render_frame_device (syncs on the path-vertex scalar,
    # radiance stays on device): the frame FETCH costs ~0.3-0.5 s for a
    # 1280x720 f32 image on this pipe relay (~40 MB/s -- an environment
    # artifact of the tunneled chip, not the renderer) and is timed
    # separately below.
    import numpy as _np

    rep_thr, rep_walls, rep_rays = [], [], []
    for rep in range(reps):
        t0 = time.perf_counter()
        outs, nrays = r.render_frame_device(seed=rep, samples=spp)
        dt = time.perf_counter() - t0
        rep_thr.append(nrays / dt / 1e6)
        rep_walls.append(dt)
        rep_rays.append(nrays)
    t0 = time.perf_counter()
    for o in outs:
        _np.asarray(o)
    fetch_s = time.perf_counter() - t0
    order = sorted(range(reps), key=lambda q: rep_thr[q])
    mid = order[reps // 2]

    res = {
        "scene": os.path.basename(scene),
        "size": f"{width}x{height}",
        "backend": backend,
        "engine": r.engine,
        "measure_spp": spp,
        "mrays": rep_thr[mid],
        "mrays_min": min(rep_thr),
        "mrays_max": max(rep_thr),
        "reps": reps,
        "wall_at_measure_spp": rep_walls[mid],
        "path_vertices": rep_rays[mid],
        "frame_fetch_s": fetch_s,
    }

    # Device-chained whole-frame accounting (VERDICT r3 next #4): for
    # sub-0.25 s dispatched frames the ~29 ms relay round-trip per dispatch
    # dominates (ROUNDLOG_r03: practice3_1 = 22.3 ms/frame device-chained
    # vs ~51 ms dispatched). Serialize CHAIN_FRAMES whole frames in one
    # dispatch (frame i+1's RNG consumes frame i's radiance -- no overlap,
    # no elision) and report the per-frame device throughput alongside the
    # dispatched number. RT_BENCH_CHAINED=0 disables.
    if (
        os.environ.get("RT_BENCH_CHAINED", "1") != "0"
        and res["engine"] == "batch"
        and res["wall_at_measure_spp"] < 0.25
    ):
        try:
            n_chain = int(os.environ.get("RT_BENCH_CHAIN_FRAMES", "8"))
            r.render_frames_chained(n_chain, seed=3000, samples=spp)  # compile
            chain_thr = []
            for rep in range(reps):
                t0 = time.perf_counter()
                verts = r.render_frames_chained(n_chain, seed=rep, samples=spp)
                dt = time.perf_counter() - t0
                chain_thr.append(verts / dt / 1e6)
            chain_thr.sort()
            res["mrays_chained"] = chain_thr[len(chain_thr) // 2]
            res["chain_frames"] = n_chain
        except ValueError:
            pass  # multi-batch frame or non-batch engine: not applicable

    if full_spp is not None and full_spp != spp:
        # measured (not implied) wall time of one full contract-spp frame,
        # through the production renderer to the finished u8 image (device
        # tonemap + u8 fetch -- the reference's timed region also ends at
        # the u8 buffer, src/rendering.rs:21-69)
        r.render_u8(seed=2000, samples=full_spp)  # compile
        t0 = time.perf_counter()
        r.render_u8(seed=0, samples=full_spp)
        res["full_spp"] = full_spp
        res["wall_full_frame"] = time.perf_counter() - t0
        # exact verts were counted at measure-spp; expected counts scale
        # linearly in spp (same pixels, independent samples)
        res["mrays_full"] = (
            rep_rays[mid] * (full_spp / spp) / res["wall_full_frame"] / 1e6
        )
    return res


def _emit(res, contract_spp):
    scaled = res["wall_at_measure_spp"] * contract_spp / res["measure_spp"]
    # Accounting: device-chained per-frame throughput is the contract
    # number where measured (sub-0.25 s dispatched frames -- there the
    # ~29 ms/dispatch relay round-trip is an artifact of THIS tunneled
    # single-chip environment, not of the renderer; a production host
    # pipelines frames exactly like the chained program does). The
    # dispatched number stays in the comment line for comparison.
    headline = res.get("mrays_chained", res["mrays"])
    chained = "mrays_chained" in res
    line = {
        "metric": (
            f"Mrays/sec/chip, {res['scene']} {res['size']} path vertices"
            + (" (device-chained frames)" if chained else "")
        ),
        "value": round(headline, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(headline / TARGET, 4),
    }
    print(json.dumps(line))
    extra = ""
    if chained:
        extra += (
            f"; device-chained {res['chain_frames']}-frame throughput "
            f"{res['mrays_chained']:.1f} Mrays/s (dispatched "
            f"{res['mrays']:.1f})"
        )
    if "wall_full_frame" in res:
        extra += (
            f"; MEASURED {res['full_spp']}-spp frame: "
            f"{res['wall_full_frame']:.2f}s ({res['mrays_full']:.1f} Mrays/s)"
        )
    print(
        f"# {res['scene']} {res['size']} @ {res['measure_spp']} spp "
        f"({res['backend']}): {res['wall_at_measure_spp']:.2f}s, "
        f"{res['path_vertices']/1e6:.1f} M path-vertices, "
        f"{res['mrays']:.1f} Mrays/s (median of {res.get('reps', 1)}, "
        f"min {res.get('mrays_min', res['mrays']):.1f} / max "
        f"{res.get('mrays_max', res['mrays']):.1f}; frame fetch "
        f"+{res.get('frame_fetch_s', 0.0):.2f}s over the pipe relay); "
        f"implied {contract_spp}-spp frame: {scaled:.1f}s{extra}",
        file=sys.stderr,
    )
    return line


def _claim_watchdog():
    """Retry the device claim across a bounded window, then fail loudly.

    VERDICT r3 weak #2: a single 900-s abort window around a multi-hour
    relay outage left round 3 with a zero bench record. Claim probes now
    run in SUBPROCESSES (a wedged claim can't hang this process; a probe
    that times out is killed cleanly) and retry for up to
    RT_BENCH_CLAIM_WINDOW seconds (default 2700) before emitting the
    structured error line. A healthy chip passes the first probe in
    ~10-20 s. The in-process watchdog stays as the last line of defense
    for a claim that wedges BETWEEN the probe and the real claim."""
    import subprocess
    import threading

    # Window default must fit INSIDE the driver's kill budget (~30 min
    # observed: round 4's 2700-s window was SIGKILLed with 960 s left,
    # leaving a bare rc=124 record -- VERDICT r4 weak #4). 900 s of retry
    # leaves the bench itself time to run after a late-successful claim.
    window_s = float(os.environ.get("RT_BENCH_CLAIM_WINDOW", "900"))
    probe_timeout = float(os.environ.get("RT_BENCH_CLAIM_TIMEOUT", "300"))
    probe = (
        "import jax, jax.numpy as jnp; "
        "jnp.ones((8, 128)).block_until_ready()"
    )
    deadline = time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        timed_out = False
        # graceful termination: subprocess.run(timeout=) SIGKILLs, and a
        # SIGKILLed claim wedges the chip for minutes (ADVICE r4) -- send
        # SIGTERM first and give the probe a grace period to release.
        proc = subprocess.Popen(
            [sys.executable, "-c", probe],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        try:
            rc = proc.wait(timeout=probe_timeout)
        except subprocess.TimeoutExpired:
            timed_out = True
            proc.terminate()
            try:
                proc.wait(timeout=15)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            rc = -1
        if rc == 0:
            break
        if time.monotonic() >= deadline:
            print(
                json.dumps({
                    "metric": "bench aborted: TPU claim not granted",
                    "value": 0.0,
                    "unit": "Mrays/s",
                    "vs_baseline": 0.0,
                    "error": (
                        f"device claim failed for {window_s:.0f}s "
                        f"({attempt} probe attempts)"
                    ),
                }),
                flush=True,
            )
            sys.exit(3)
        # JSON heartbeat on stdout: if the driver SIGKILLs us mid-window,
        # the record still ends in a parseable line (VERDICT r4 next #6).
        print(
            json.dumps({
                "metric": "bench heartbeat: TPU claim probe failed",
                "value": 0.0,
                "unit": "Mrays/s",
                "vs_baseline": 0.0,
                "error": (
                    f"probe {attempt} "
                    f"{'timed out' if timed_out else 'failed'}; "
                    f"{deadline - time.monotonic():.0f}s left in window"
                ),
            }),
            flush=True,
        )
        # a timed-out (vs cleanly failed) probe may have wedged the relay;
        # back off longer so the next probe doesn't hit the wedge window
        pause = 120.0 if timed_out else 60.0
        time.sleep(min(pause, max(0.0, deadline - time.monotonic())))

    armed = threading.Event()

    def fire():
        if armed.wait(probe_timeout + 300):
            return
        print(
            json.dumps({
                "metric": "bench aborted: TPU claim wedged post-probe",
                "value": 0.0,
                "unit": "Mrays/s",
                "vs_baseline": 0.0,
                "error": "in-process claim wedged after a healthy probe",
            }),
            flush=True,
        )
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    jnp.zeros((8, 128)).block_until_ready()  # the actual claim
    armed.set()


def main():
    from raytracing_course_2024_tpu.scene import SCENES_DIR

    _claim_watchdog()
    reps = int(os.environ.get("RT_BENCH_REPS", "3"))
    batch_cap = int(os.environ.get("RT_BENCH_BATCH", "1048576"))

    if os.environ.get("RT_BENCH_MATRIX"):
        full = bool(os.environ.get("RT_BENCH_FULL"))
        rows = []
        for scene, w, h, contract_spp, measure_spp in MATRIX:
            want_full = full or scene == "practice7_1.gltf"
            path = os.path.join(SCENES_DIR, scene)
            if not os.path.exists(path):
                path = os.path.join(REPO_SCENES, scene)
            res = bench_one(
                path, w, h, measure_spp,
                reps=reps, batch_cap=batch_cap,
                full_spp=contract_spp if want_full else None,
            )
            _emit(res, contract_spp)
            rows.append((res, contract_spp))
        print("\n| scene | size | contract spp | backend | Mrays/s | "
              "wall (contract spp) |", file=sys.stderr)
        print("|---|---|---|---|---|---|", file=sys.stderr)
        for res, cspp in rows:
            if "wall_full_frame" in res:
                wall = f"{res['wall_full_frame']:.2f}s measured"
            elif "mrays_chained" in res:
                wall = (
                    f"{res['path_vertices'] * cspp / res['measure_spp'] / res['mrays_chained'] / 1e6:.2f}s"
                    " chained"
                )
            else:
                wall = (
                    f"{res['wall_at_measure_spp'] * cspp / res['measure_spp']:.2f}s"
                    " implied"
                )
            print(
                f"| {res['scene']} | {res['size']} | {cspp} | "
                f"{res['backend']} | {res['mrays']:.1f} | {wall} |",
                file=sys.stderr,
            )
        return

    # headline (driver contract: ONE JSON line)
    width = int(os.environ.get("RT_BENCH_W", "1280"))
    height = int(os.environ.get("RT_BENCH_H", "720"))
    spp = int(os.environ.get("RT_BENCH_SPP", "16"))
    scene = os.environ.get(
        "RT_BENCH_SCENE", os.path.join(SCENES_DIR, "practice7_1.gltf")
    )
    res = bench_one(scene, width, height, spp, reps=reps, batch_cap=batch_cap)
    _emit(res, 256)


if __name__ == "__main__":
    main()
