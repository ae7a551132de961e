"""Physical-plan assertions: the optimizations we rely on must actually
appear in the executed plans (SURVEY.md §4 — verify with explain)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q6_filter_pushdown(spark):
    """Filters must reach the parquet scan as PushedFilters."""
    df = entry_mod.q6_forecast_revenue(spark, SF_DIR)
    scan = df._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters: [" in scan
    assert "l_shipdate" in scan.split("PushedFilters")[1][:300]


def test_q1_column_pruning(spark):
    """The q1 scan must read only the needed columns, not all 11."""
    df = entry_mod.q1_pricing_summary(spark, SF_DIR)
    scan = df._jdf.queryExecution().sparkPlan().toString()
    read_schema = scan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q5_broadcasts_dims(spark):
    """Only the fixed-cardinality nation/region carry forced broadcast hints;
    supplier (grows with SF) must be AQE-chosen — and at sandbox scale AQE
    must still pick broadcast for all three from measured sizes."""
    df = entry_mod.q5_nation_revenue(spark, SF_DIR)
    optimized = optimized_of(df)
    # exactly the two safe-by-construction hints survive optimization
    # (hints print as ResolvedHint pre-elimination or strategy=broadcast
    # once folded into the Join node — count both spellings)
    n_hints = optimized.count("ResolvedHint") + optimized.count("strategy=broadcast")
    assert n_hints <= 2
    df.collect()  # AQE finalizes join strategies on execution
    assert plan_of(df).count("BroadcastHashJoin") >= 3


def test_kg_flagship_broadcasts(spark):
    """Scale guard (VERDICT r2 what's-wrong #2): customer/part grow linearly
    with SF, so kg_flagship must carry NO forced broadcast hint; AQE still
    picks broadcast-hash at sandbox scale from runtime-measured sizes."""
    df = entry_mod.kg_flagship(spark, SF_DIR)
    optimized = optimized_of(df)
    assert "ResolvedHint" not in optimized
    assert "strategy=broadcast" not in optimized
    df.collect()
    assert "BroadcastHashJoin" in plan_of(df)


def test_whole_stage_codegen_everywhere(spark):
    """Aggregation queries stay inside whole-stage codegen. AQE reports the
    final plan only after execution, so run the query first."""
    for name in ["q1_pricing_summary", "c8_dynamic_rel_type", "a6_guarded_ratio"]:
        df = entry_mod.queries()[name](spark, SF_DIR)
        df.collect()
        plan = plan_of(df)
        # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
        assert "*(" in plan or "WholeStageCodegen" in plan, name
        assert "partial_" in plan, name  # map-side combine present


def test_no_python_udf_outside_extraction(spark):
    """Python crosses the JVM boundary ONLY in the extraction operator:
    every driver query must compile to a plan free of Python evals."""
    for name, q in entry_mod.queries().items():
        plan = plan_of(q(spark, SF_DIR))
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in plan, f"{name} contains {marker}"


def test_extraction_is_arrow_batched(spark, gen):
    """Round 6: the DEFAULT extraction runs entirely in the JVM — no Python
    node of any kind in the plan (guide §4.1: built-ins over UDFs). The
    retained Arrow extension point still uses MapInPandas (batched), never
    row-at-a-time BatchEvalPython."""
    from importtoneo4j_spark.operators.extract import (
        extract_assertions,
        extract_assertions_arrow,
    )
    from importtoneo4j_spark.sources.transcripts import with_stable_order

    df = with_stable_order(spark.createDataFrame(gen.turns_pandas(5)))
    plan = plan_of(extract_assertions(df))
    for marker in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
    arrow_plan = plan_of(extract_assertions_arrow(df))
    assert "MapInPandas" in arrow_plan
    assert "BatchEvalPython" not in arrow_plan


def test_first_wins_has_partial_aggregation(spark):
    """The dedup aggregate must partial-merge map-side (skew defense)."""
    from importtoneo4j_spark.operators.merge import first_wins

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df = first_wins(e, ["user_id"], ["ts", "event_id"], ["value"], salt_buckets=1)
    plan = plan_of(df)
    assert "partial_min" in plan or plan.count("HashAggregate") >= 2


def test_anti_join_strategy(spark):
    df = entry_mod.u2_anti_join_delta(spark, SF_DIR)
    plan = plan_of(df)
    assert "LeftAnti" in plan


def _tiny_extracted_and_links(spark):
    extracted = spark.createDataFrame(
        [
            ("c1", 1, "triple", "Acme Corp", "ships", "Widget", 0.9, "assistant"),
            ("c1", 2, "triple", "Widget", "made_by", "Acme Corp", 0.8, "user"),
            ("c2", 1, "triple", "Acme Corp", "ships", "Gadget", 0.7, "assistant"),
        ],
        "conv_id string, turn_idx int, kind string, subj_surface string,"
        " obj_surface string, pred string, quality double, role string",
    )
    links = spark.createDataFrame(
        [("Acme Corp", "acme corp"), ("Widget", "widget"), ("Gadget", "gadget")],
        "surface string, canonical_id string",
    )
    return extracted, links


def test_materialize_joins_are_aqe_chosen(spark):
    """Scale guard: canonical_triples/canonical_nodes must NOT carry a forced
    broadcast hint (the vocabulary can be 10^9 rows at 100 TB); with a small
    links table AQE must still pick broadcast-hash at runtime from measured
    sizes — both directions asserted."""
    from importtoneo4j_spark.operators.materialize import (
        canonical_nodes,
        canonical_triples,
    )

    extracted, links = _tiny_extracted_and_links(spark)
    for df in (canonical_triples(extracted, links), canonical_nodes(extracted, links)):
        assert "ResolvedHint" not in optimized_of(df)  # no forced strategy
        df.collect()  # AQE finalizes the physical plan on execution
        assert "BroadcastHashJoin" in plan_of(df)  # ...and picks broadcast
        # when the runtime-measured vocabulary actually is small


def test_bucketed_tables_join_without_shuffle(spark, tmp_path_factory):
    """bucket(N, key) layout (SCALE.md): two tables bucketed on the same key
    with the same count sort-merge-join with NO hash-partitioning exchange
    on either side — the co-located-join analog of index-before-load."""
    from pyspark.sql import functions as F

    from importtoneo4j_spark.sources.tables import TableStore

    store = TableStore(spark, str(tmp_path_factory.mktemp("bkt") / "store"))
    t1 = spark.range(2000).select(
        F.concat(F.lit("e"), (F.col("id") % 500).cast("string")).alias("subj"),
        F.col("id").alias("a"),
    )
    t2 = spark.range(1000).select(
        F.concat(F.lit("e"), (F.col("id") % 500).cast("string")).alias("subj"),
        (F.col("id") * 2).alias("b"),
    )
    store.write_bucketed(t1, "t1", ["subj"], 8, sort_cols=["subj"])
    store.write_bucketed(t2, "t2", ["subj"], 8, sort_cols=["subj"])
    j = store.read("t1").join(store.read("t2").hint("merge"), "subj")
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucket-co-located
    store.drop("t1")
    store.drop("t2")


def test_pipeline_bucketed_triples_layout(spark, small_transcripts_path, tmp_path_factory):
    """bucket_subj pipeline option: triples land as a bucketed catalog table,
    results identical to the plain layout."""
    from importtoneo4j_spark.plans.pipeline import KGPipeline

    work = str(tmp_path_factory.mktemp("bktp") / "kg")
    pipe = KGPipeline(spark, small_transcripts_path, work, run_id="r1", bucket_subj=8)
    m = pipe.run()
    assert spark.catalog.tableExists(pipe.store.catalog_name("triples"))
    assert m["materialize"]["triples"] > 0
    # subj self-join on the bucketed table: no hash-partitioning exchange
    t = pipe.triples()
    j = t.select("subj", "pred").join(t.select("subj", "obj").hint("merge"), "subj")
    j.count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_interval_join_is_equi_not_nested_loop(spark):
    """The bin-equi-join formulation must never plan a broadcast nested
    loop or cartesian product — the whole point of the binning
    (operators/temporal.py::point_in_interval_join)."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["t6_interval_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_triangle_count_all_equi_joins(spark):
    """Every join in the oriented triangle count is an equi-join (wedge
    build + closing-edge probe) — no nested loops at any scale."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["g4_triangles"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hash_split_is_map_side_only(spark):
    """Split assignment adds no shuffle: the plan of hash_split over a
    scan contains no Exchange (stable under growth BECAUSE it is
    per-row)."""
    from importtoneo4j_spark.operators.sampling import hash_split

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = hash_split(d, "doc_id", {"train": 0.9, "test": 0.1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
