"""Scale evidence for the AQE-chosen materialize joins (VERDICT round 1,
What's-wrong #1): run canonical_triples / canonical_nodes against a
synthetically inflated vocabulary (>= 10^6 distinct surfaces, > the 64 MB
broadcast threshold) in a memory-bounded driver and record that

* the join strategy is runtime-chosen SortMergeJoin (no forced broadcast of
  a vocabulary that would OOM executors at 10^9 surfaces), and
* the job completes — no driver/executor OOM.

Usage: python bench_inflated_vocab.py [n_surfaces] [n_mentions]
Writes BENCH_VOCAB.json. Run with SPARK_DRIVER_MEM=4g SPARK_GRAFT_CPUS=8 to
keep the memory bound honest.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "4g")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import functions as F

from importtoneo4j_spark.operators.materialize import canonical_nodes, canonical_triples
from importtoneo4j_spark.session import get_spark


def surface_expr(i):
    """Deterministic ~50-char surface form for index i (same expression on
    the mention and vocabulary sides, so the equi-join hits)."""
    return F.concat(F.lit("surface entity form "), F.md5(i.cast("string")))


def main() -> None:
    n_surfaces = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_mentions = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000
    spark = get_spark("bench-inflated-vocab")

    links = spark.range(n_surfaces).select(
        surface_expr(F.col("id")).alias("surface"),
        F.md5(F.concat(F.lit("c"), F.col("id").cast("string"))).alias("canonical_id"),
    )
    m = spark.range(n_mentions)
    extracted = m.select(
        F.concat(F.lit("conv"), (F.col("id") % 50_000).cast("string")).alias("conv_id"),
        (F.col("id") % 1000).cast("int").alias("turn_idx"),
        F.lit("triple").alias("kind"),
        surface_expr(F.col("id") % n_surfaces).alias("subj_surface"),
        surface_expr((F.col("id") * 7 + 13) % n_surfaces).alias("obj_surface"),
        F.concat(F.lit("pred_"), (F.col("id") % 20).cast("string")).alias("pred"),
        (F.pmod(F.col("id"), 100) / 100.0).alias("quality"),
        F.when(F.col("id") % 2 == 0, "assistant").otherwise("user").alias("role"),
    )

    out: dict = {
        "n_surfaces": n_surfaces,
        "n_mentions": n_mentions,
        "driver_mem": os.environ["SPARK_DRIVER_MEM"],
        "cores": os.environ["SPARK_GRAFT_CPUS"],
    }
    for name, df in (
        ("canonical_triples", canonical_triples(extracted, links)),
        ("canonical_nodes", canonical_nodes(extracted, links)),
    ):
        counted = df.groupBy().count()
        t0 = time.time()
        rows = counted.collect()[0][0]
        wall = round(time.time() - t0, 2)
        plan = counted._jdf.queryExecution().executedPlan().toString()
        out[name] = {
            "rows": int(rows),
            "wall_sec": wall,
            "sort_merge_joins": plan.count("SortMergeJoin"),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "final_plan": "isFinalPlan=true" in plan,
        }
        print(name, out[name], file=sys.stderr)

    out["no_oom"] = True  # reaching this line IS the evidence
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_VOCAB.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
