"""Throughput-vs-log-size sweep — the "does per-event cost hold as the
log grows?" evidence for BENCH.md §4 (scale-up story).

Replays logs of increasing size at a FIXED parallelism (local[32] by
default) with a FIXED micro-batch size (2M events/segment) and a FIXED
key cardinality (400k docs — the headline config), so the number of
triggers AND the accumulated table state grow with the log while each
trigger's shape stays identical: a flat events/sec line means per-
trigger cost is O(batch) with a bounded orchestration floor — no
O(table) term creeping into the apply path as state accumulates.

Key cardinality must be held fixed or the sweep measures the wrong
thing: with docs ∝ events (the headline's docs=events/10 rule), bigger
logs have FEWER intra-batch duplicate keys per trigger, so the LWW
winner set written per trigger grows ~2.5x from 4M to 12M and events/s
"declines" for reasons that have nothing to do with accumulated state
(measured 244k -> 156k ev/s before this was pinned; per-written-winner
cost was flat).  Each log is generated, timed, and deleted before the
next so peak scratch stays one-log-sized.

    python tools/scale_sweep.py [sizes_millions ...]   # default: 4 12 24

Prints one JSON line: {"sweep": [{"n_events":..., "segments":...,
"walls": [...], "events_per_sec": ...}, ...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

FAST_DIR = "/dev/shm" if os.path.isdir("/dev/shm") else None
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SEG_EVENTS = 2_000_000  # fixed micro-batch size across the sweep
N_DOCS = int(os.environ.get("SPARK_GRAFT_SWEEP_DOCS", "400000"))  # fixed keys
REPS = int(os.environ.get("SPARK_GRAFT_SWEEP_REPS", "2"))
SEED = 42


def gen(path: str, n: int, segs: int) -> None:
    code = (
        f"import sys; sys.path.insert(0, {ROOT!r});"
        "from cfe_39_spark.fixtures import gen_bench_log_spark;"
        "from cfe_39_spark.session import get_spark;"
        f"s = get_spark(master='local[{CPUS}]', app_name='sweep-gen');"
        "s.sparkContext.setLogLevel('ERROR');"
        f"gen_bench_log_spark(s, {path!r}, {n}, {N_DOCS}, "
        f"n_segments={segs}, mean_len=256, seed={SEED}, key_dist='uniform')"
    )
    env = dict(os.environ)
    env.setdefault("CFE39_GEN_PAR", "4")
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=7200, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"gen failed:\n{r.stderr[-2000:]}")


def run_one(log_dir: str, segs_limit: int = 0) -> "tuple[float, list]":
    script = os.path.join(ROOT, "tools", "scaling_bench.py")
    env = dict(os.environ, CFE39_SWEEP_FILESTATS="1")
    if segs_limit:
        env["CFE39_SEGS_LIMIT"] = str(segs_limit)
    out = subprocess.run(
        [sys.executable, script, f"local[{CPUS}]", log_dir]
        + ([FAST_DIR] if FAST_DIR else []),
        capture_output=True, text=True, timeout=3600, env=env,
    )
    wall, files = None, []
    for line in out.stdout.splitlines():
        if line.startswith("WALL "):
            wall = float(line.split()[1])
        elif line.startswith("FILES "):
            files = json.loads(line[6:])
    if wall is None:
        raise RuntimeError(f"replay failed:\n{out.stderr[-2000:]}")
    return wall, files


def main() -> None:
    sizes = [int(a) * 1_000_000 for a in sys.argv[1:]] or [4_000_000, 12_000_000, 24_000_000]
    # prefix mode (CFE39_SWEEP_PREFIX=1): generate ONE log at max(sizes)
    # and replay segment PREFIXES for the smaller points — byte-identical
    # inputs per prefix (segments are generated independently per index),
    # one generation instead of len(sizes), peak scratch unchanged
    prefix_mode = bool(os.environ.get("CFE39_SWEEP_PREFIX"))
    sweep = []
    shared_dir = None
    if prefix_mode:
        # a prefix IS its recorded size only when every size is a whole
        # number of fixed-size segments — refuse the silent mismatch
        bad = [n for n in sizes if n % SEG_EVENTS]
        if bad:
            raise SystemExit(
                f"prefix mode needs sizes in multiples of {SEG_EVENTS}: {bad}")
        shared_dir = tempfile.mkdtemp(prefix="cfe39-sweep-", dir=FAST_DIR)
        n_max = max(sizes)
        t0 = time.monotonic()
        gen(os.path.join(shared_dir, "log"), n_max, max(1, n_max // SEG_EVENTS))
        print(f"# gen {n_max} events (shared, prefix mode): "
              f"{time.monotonic()-t0:.0f}s", file=sys.stderr, flush=True)
    try:
        for n in sizes:
            segs = max(1, n // SEG_EVENTS)
            if prefix_mode:
                d, log_dir = None, os.path.join(shared_dir, "log")
            else:
                d = tempfile.mkdtemp(prefix="cfe39-sweep-", dir=FAST_DIR)
                log_dir = os.path.join(d, "log")
            try:
                if not prefix_mode:
                    t0 = time.monotonic()
                    gen(log_dir, n, segs)
                    print(f"# gen {n} events / {segs} segs: "
                          f"{time.monotonic()-t0:.0f}s",
                          file=sys.stderr, flush=True)
                walls, files = [], []
                for r in range(REPS):
                    w, files = run_one(log_dir, segs_limit=segs if prefix_mode else 0)
                    walls.append(w)
                    print(f"# {n} rep{r}: {walls[-1]:.1f}s "
                          f"({n/walls[-1]/1000:.0f}k ev/s)",
                          file=sys.stderr, flush=True)
            finally:
                # a failed gen/replay must not leak a tens-of-GB tmpfs dir
                if d is not None:
                    shutil.rmtree(d, ignore_errors=True)
            wmed = sorted(walls)[len(walls) // 2] if len(walls) % 2 else (
                sum(sorted(walls)[len(walls)//2-1:len(walls)//2+1]) / 2)
            # read-amplification summary: deltas a reader must merge,
            # at its per-trigger max and at end-of-replay; file counts at
            # the last APPLY trigger (compaction commits reset the series)
            applies = [f for f in files if not str(f["batch_id"]).startswith("__")]
            point = {
                "n_events": n, "segments": segs,
                "walls": [round(w, 2) for w in walls],
                "median_wall_sec": round(wmed, 2),
                "events_per_sec": round(n / wmed, 1),
            }
            if applies:
                point["files_per_trigger"] = [f["n_files"] for f in applies]
                point["delta_per_trigger"] = [f["n_delta"] for f in applies]
                point["max_outstanding_delta"] = max(f["n_delta"] for f in applies)
                point["final_files"] = files[-1]["n_files"]
                point["n_compactions"] = sum(
                    1 for f in files if str(f["batch_id"]).startswith("__compact")
                )
            sweep.append(point)
    finally:
        if shared_dir is not None:
            shutil.rmtree(shared_dir, ignore_errors=True)
    print(json.dumps({"master": f"local[{CPUS}]", "seg_events": SEG_EVENTS,
                      "n_docs": N_DOCS,
                      "prefix_mode": prefix_mode, "sweep": sweep}), flush=True)


if __name__ == "__main__":
    main()
