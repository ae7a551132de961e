"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule requires >= 0.8 throughput scaling efficiency between N and 4N
executor clusters; the sandbox stand-in is the same KG pipeline job on the
same input at local[8] vs local[32] (one JVM, 8 vs 32 executor threads).
efficiency = (throughput@32 / throughput@8) / 4.

NOTE on interpretation: in local mode both runs share one driver JVM and one
host's memory bandwidth, so this under-states true multi-executor scaling
(no per-executor memory isolation, shuffle through local disk). The number
is recorded in BASELINE.md alongside absolute throughput.

Usage: python bench_scaling.py [n_convs]   (default sized for ~330k turns)
Writes BENCH_SCALING.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from bench import transcripts_path
from importtoneo4j_spark.plans.pipeline import KGPipeline
from importtoneo4j_spark.session import get_spark

REPO = os.path.dirname(os.path.abspath(__file__))


def run_at(cores: int, data: str, repeats: int = 2, pin: bool = True) -> dict:
    """Best-of-N pipeline runs at a given core count. The sandbox VM shows
    2-3x wall-clock swings from I/O writeback between identical runs, so a
    single sample is meaningless; min-of-repeats approximates the
    contention-free cost (os.sync between runs to flush dirty pages).

    pin=True applies sched_setaffinity to 2*cores CPUs (N task slots + N
    Python sidecar workers): an unpinned local[2] JVM on an idle 32-core box
    borrows extra cores for GC/shuffle-IO/Python, inflating the small-N
    denominator of the N-vs-4N comparison. Pinning keeps the CPU grant
    proportional, the way separate N- and 4N-executor clusters would be."""
    if pin:
        try:
            os.sched_setaffinity(0, set(range(min(2 * cores, os.cpu_count() or 32))))
        except OSError:
            pin = False
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        time.sleep(2)
    # tmpfs for shuffle + stage tables: on a real cluster local disks scale
    # WITH the executor count; this sandbox's single shared virtual disk does
    # not, which would unfairly I/O-bound the 4N measurement (materialize was
    # flat at 44s on /tmp at both core counts). RAM-backed dirs restore the
    # per-node-storage assumption the north rule's cluster story implies.
    shm = "/dev/shm/sparktmp"
    os.makedirs(shm, exist_ok=True)
    spark = get_spark(
        f"scale{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.local.dir": f"{shm}/local{cores}"},
    )
    best = None
    for _ in range(repeats):
        work = tempfile.mkdtemp(prefix=f"kg_scale{cores}_", dir=shm)
        pipe = KGPipeline(spark, data, work, run_id=f"scale-{cores}")
        m = pipe.run(resume=False)
        shutil.rmtree(work, ignore_errors=True)
        if best is None or m["wall_sec"] < best["wall_sec"]:
            best = m
        os.sync()
        time.sleep(3)
    m = best
    checksum = m["materialize"]["checksum"]
    n_turns = m["ingest"]["valid"] + m["ingest"]["rejected"]
    spark.stop()
    time.sleep(2)
    if pin:
        os.sched_setaffinity(0, set(range(os.cpu_count() or 32)))
    return {
        "cores": cores,
        "pinned_cpus": min(2 * cores, os.cpu_count() or 32) if pin else None,
        "stage_secs": m.get("stage_secs", {}),
        "wall_sec": round(m["wall_sec"], 3),
        "turns": n_turns,
        "triples": m["materialize"]["triples"],
        "turns_per_sec": round(n_turns / m["wall_sec"], 1),
        "triples_per_sec": round(m["materialize"]["triples"] / m["wall_sec"], 1),
        "checksum": checksum,
    }


def _run_single(cores: int, n_convs: int, repeats: int) -> None:
    """Child-process entry: affinity is set in run_at BEFORE the JVM starts
    (a py4j JVM persists for the process lifetime, so per-core-count pinning
    requires a fresh process per configuration)."""
    data = transcripts_path(n_convs)
    print("RESULT " + json.dumps(run_at(cores, data, repeats=repeats)))


def _interleaved(n_convs: int, lo: int, hi: int, cycles: int) -> None:
    """Noise-immune protocol: alternate (lo, hi) legs so BOTH experience the
    same box phases — this VM's throughput swings on ~10-minute scales, and
    the sequential protocol (all lo legs, then all hi legs) can straddle a
    phase flip, which corrupts the ratio no matter how many repeats each
    side gets. Efficiency is computed per adjacent (lo, hi) cycle; a cycle
    whose two legs landed in the same phase shows the true pairing."""
    import subprocess

    transcripts_path(n_convs)
    legs: list[tuple[int, dict]] = []
    for cyc in range(cycles):
        for c in (lo, hi):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", str(c), str(n_convs), "1"],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
            if not line:
                raise RuntimeError(f"cores={c} failed: {out.stderr[-2000:]}")
            legs.append((c, json.loads(line[-1][len("RESULT "):])))
    pairs = []
    for i in range(0, len(legs), 2):
        (c_lo, r_lo), (c_hi, r_hi) = legs[i], legs[i + 1]
        pairs.append(round((r_hi["turns_per_sec"] / r_lo["turns_per_sec"]) / (c_hi // c_lo), 4))
    out = {
        "n_convs": n_convs,
        "protocol": f"interleaved {lo}/{hi}-core legs x {cycles} cycles, "
        "1 run per leg, fresh JVM + pinned CPUs per leg; per-cycle pairing "
        "cancels slow box phases that straddle the sequential protocol",
        "legs": [{"cores": c, **r} for c, r in legs],
        "cycle_efficiencies": pairs,
        "scaling_efficiency": min(pairs),
        "scaling_efficiency_best": max(pairs),
        "result_identical": len({r["checksum"] for _, r in legs}) == 1,
    }
    with open(os.path.join(REPO, "BENCH_SCALING_INTERLEAVED.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: out[k] for k in ["cycle_efficiencies", "scaling_efficiency", "scaling_efficiency_best", "result_identical"]}))


def main() -> None:
    if sys.argv[1:2] == ["--single"]:
        _run_single(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    if len(sys.argv) > 2 and sys.argv[2].startswith("interleave:"):
        lo, hi = (int(x) for x in sys.argv[2][len("interleave:"):].split(","))
        cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        _interleaved(int(sys.argv[1]), lo, hi, cycles)
        return
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
    cores = [int(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2 else [2, 8, 32])]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    transcripts_path(n_convs)  # generate once before the children race

    import subprocess

    runs = {}
    for c in cores:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(c), str(n_convs), str(repeats)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            raise RuntimeError(f"cores={c} failed: {out.stderr[-2000:]}")
        runs[c] = json.loads(line[-1][len("RESULT "):])
    out = {"n_convs": n_convs}
    for c in cores:
        out[f"local{c}"] = runs[c]
    # every measured N vs 4N pair (the north rule's two-cluster-size check)
    pairs = {}
    for c in cores:
        if 4 * c in runs:
            eff = (runs[4 * c]["turns_per_sec"] / runs[c]["turns_per_sec"]) / 4
            pairs[f"{c}->{4 * c}"] = round(eff, 4)
    out["scaling_efficiency_pairs"] = pairs
    # headline = the WORST measured N->4N pair (ADVICE r1: a single key
    # carrying the best sample reads as cherry-picking); the best-conditions
    # number stays available under its own explicit name
    out["scaling_efficiency"] = min(pairs.values()) if pairs else None
    out["scaling_efficiency_best"] = max(pairs.values()) if pairs else None
    out["result_identical"] = len({r["checksum"] for r in runs.values()}) == 1
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
