"""Process-isolated scaling evidence: 1 vs 4 executor PROCESSES.

The north rule's two-cluster-size criterion compares N-executor and
4N-executor CLUSTERS — separate executor JVMs, each with its own heap, GC,
shuffle threads and Python-worker pool. The single-JVM protocol
(bench_scaling.py, local[N] vs local[4N]) shares ALL of those across the N
threads: one young generation absorbing 4x the allocation rate, one
Python-worker fork pool, one shuffle-IO pipeline. Its measured 2->8
ceiling (~0.55 efficiency with roughly UNIFORM per-stage ratios even in
best-phase interleaved cycles — BENCH_SCALING_INTERLEAVED.json, round 3)
is the signature of that shared-runtime contention, not of a plan
bottleneck: no stage dominates the loss, and the same plans hit 270k
turns/s at local[32].

This protocol scales the way a cluster does: each "executor" is its own
JVM process pinned to its own 2 cores (+2 sidecar CPUs, same grant rule as
bench_scaling.run_at), running the FULL pipeline over a conversation-hashed
shard of the corpus.

  config A (N):  1 process  x local[2] over the full corpus
  config B (4N): 4 processes x local[2], each over its disjoint quarter,
                 launched concurrently; wall = last process exit

  efficiency = throughput_B / (4 * throughput_A) = T_A / (4 * T_B)

Fidelity notes, stated rather than hidden:
* conversations are independent through ingest/extract (the dominant
  cost); shard-local linking/canonicalization run the same code on
  quarter vocabularies. A cluster would run ONE global fixpoint — that
  stage is vocabulary-sized (entities, not turns) and takes ~2 s of a
  ~300 s run here, so per-shard fixpoints do not materially flatter B.
* per-shard triple sets are not unioned/deduped across shards; the
  sanity check asserts the total turn count instead of a global checksum
  (the single-JVM protocol already proves bit-identical results across
  core counts).

Usage: python bench_scaling_multiproc.py [n_convs] [cycles]
Writes BENCH_SCALING_MULTIPROC.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SHM = "/dev/shm/sparktmp"
SHARDS = 4
CORES = 2  # per executor process


def prepare_shards(n_convs: int) -> list[str]:
    """One-time, untimed: hash-split the cached corpus into SHARDS
    conversation-disjoint parquet directories (each executor process reads
    only its own shard — no read amplification inside the timed runs)."""
    from bench import transcripts_path

    full = transcripts_path(n_convs)
    base = os.path.join(REPO, ".bench_data", f"convs_{n_convs}_shard{SHARDS}")
    paths = [os.path.join(base, f"s{k}") for k in range(SHARDS)]
    if os.path.exists(os.path.join(base, "_DONE")):
        return paths
    from pyspark.sql import functions as F

    from importtoneo4j_spark.session import get_spark

    spark = get_spark("shardprep", master="local[8]", shuffle_partitions=8)
    df = spark.read.parquet(full)
    for k, p in enumerate(paths):
        df.filter(F.pmod(F.xxhash64("conv_id"), F.lit(SHARDS)) == k).write.mode(
            "overwrite"
        ).parquet(p)
    spark.stop()
    with open(os.path.join(base, "_DONE"), "w") as fh:
        fh.write("ok")
    time.sleep(2)
    return paths


def _child(cores: int, cpu0: int, data: str) -> None:
    """One executor process: pin affinity BEFORE the JVM starts, run the
    full pipeline on a tmpfs workdir, print one RESULT line."""
    os.sched_setaffinity(0, set(range(cpu0, cpu0 + 2 * cores)))
    from importtoneo4j_spark.plans.pipeline import KGPipeline
    from importtoneo4j_spark.session import get_spark

    os.makedirs(SHM, exist_ok=True)
    spark = get_spark(
        f"mp{cpu0}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.local.dir": f"{SHM}/mp_local{cpu0}"},
    )
    work = tempfile.mkdtemp(prefix=f"kg_mp{cpu0}_", dir=SHM)
    t0 = time.time()
    m = KGPipeline(spark, data, work, run_id=f"mp-{cpu0}").run(resume=False)
    wall = time.time() - t0
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(
        "RESULT "
        + json.dumps(
            {
                "wall": round(wall, 3),
                "turns": m["ingest"]["valid"] + m["ingest"]["rejected"],
                "triples": m["materialize"]["triples"],
                "stage_secs": m.get("stage_secs", {}),
            }
        )
    )


def _spawn(cpu0: int, data: str) -> subprocess.Popen:
    env = dict(os.environ, SPARK_DRIVER_MEM="12g")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(CORES), str(cpu0), data],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
        env=env,
    )


def _collect(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
    if not lines:
        raise RuntimeError("child produced no RESULT line")
    return json.loads(lines[-1][len("RESULT "):])


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        _child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from bench import transcripts_path

    full = transcripts_path(n_convs)
    shards = prepare_shards(n_convs)

    legs = []
    effs = []
    for _ in range(cycles):
        # config A: one 2-core executor process, full corpus
        ra = _collect(_spawn(0, full))
        os.sync()
        time.sleep(3)
        # config B: four 2-core executor processes, disjoint quarters,
        # concurrent; wall = slowest process (they start together)
        t0 = time.time()
        procs = [_spawn(4 * k, shards[k]) for k in range(SHARDS)]
        rbs = [_collect(p) for p in procs]
        wall_b = time.time() - t0
        os.sync()
        time.sleep(3)
        turns = ra["turns"]
        assert sum(r["turns"] for r in rbs) == turns, "shards do not cover corpus"
        thr_a = turns / ra["wall"]
        thr_b = turns / wall_b
        effs.append(round(thr_b / (SHARDS * thr_a), 4))
        legs.append(
            {
                "A_1proc_full": ra,
                "B_4proc_wall_sec": round(wall_b, 3),
                "B_procs": rbs,
                "thr_A_turns_per_sec": round(thr_a, 1),
                "thr_B_turns_per_sec": round(thr_b, 1),
            }
        )
    out = {
        "n_convs": n_convs,
        "protocol": f"1 vs {SHARDS} executor PROCESSES x local[{CORES}] "
        "(own JVM heap/GC/python pool per executor, own pinned CPUs, "
        "conversation-disjoint shards) — the faithful sandbox analog of the "
        "north rule's N vs 4N executor clusters; see module docstring for "
        "the per-shard-fixpoint caveat",
        "cycles": legs,
        "cycle_efficiencies": effs,
        "scaling_efficiency": min(effs),
        "scaling_efficiency_best": max(effs),
    }
    with open(os.path.join(REPO, "BENCH_SCALING_MULTIPROC.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: out[k] for k in ["cycle_efficiencies", "scaling_efficiency", "scaling_efficiency_best"]}))


if __name__ == "__main__":
    main()
