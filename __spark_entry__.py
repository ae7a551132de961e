"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2) over the
driver's parquet tables; ``oracle_sql()`` carries the DuckDB-equivalent SQL.
Column names AND value rounding are aligned pairwise. KG-pipeline-specific
parity (extraction/linking/canonicalization on transcripts) is covered by
``tests/`` against the pure-Python oracle; here the same operators are
exercised on the TPC-H-ish tables so the DuckDB gate can score them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


# --------------------------------------------------------------------------
# flagship: graph materialization over relational input — build canonical
# (subj, pred, obj) triples with a data-derived predicate vocabulary,
# first-wins-style earliest attribution and aggregated edge weight.
# Reference semantics: dynamic rel types (VariantDatabase.java:463,476) +
# edge dedup (Neo4j.java:192-194) + first-wins (Neo4j.java:230-242).
# --------------------------------------------------------------------------

def kg_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customer/part grow linearly with scale factor, so no F.broadcast hints:
    # AQE picks broadcast at sandbox scale (plan-asserted in
    # tests/test_plans.py) and falls back to shuffle joins when a 100x input
    # would no longer fit in executor memory — forcing the hint here is how
    # the driver OOMs at scale (SCALE.md "never force-broadcast").
    # Round 6 (guide §2.3 "shuffle keys and metadata instead of payloads"):
    # aggregate BEFORE attaching the subject name — the groupBy exchange
    # carries (o_custkey bigint, l_returnflag char, p_name) instead of two
    # long strings plus the concatenated pred, and the pred concat runs once
    # per GROUP instead of once per lineitem. Equivalence is exact:
    # c_custkey <-> c_name is a bijection (0 duplicate c_name at every SF,
    # checked), so the (o_custkey, l_returnflag, obj) groups are identical
    # to the (subj, pred, obj) groups; min/count are order-insensitive and
    # the revenue summands are exact 4-decimal quantities (price x (1 -
    # discount) with 2+2 decimal digits), so round(sum, 4) is unaffected by
    # summation order. Verified: exceptAll == 0 in both directions vs the
    # round-5 form at sf1.0, and the DuckDB oracle gate still hash-matches.
    # Measured: 4.37 -> 3.33 s at sf1.0.
    # Deliberate join strategy (guide §3.1, round 6): orders grows with the
    # scale factor, and its file-size estimate sat under the broadcast
    # threshold, so AQE built a megarow broadcast hash relation —
    # single-threaded build, ~2x the whole query's cost at sf1.0 (measured
    # 5.6 -> 2.5 s with sort-merge). SMJ is also the only strategy that is
    # safe when orders is 100x bigger; the genuinely small sides (part,
    # customer) keep their AQE broadcasts.
    t = _load(spark, sf_dir, "customer", "orders", "lineitem", "part")
    pre = (
        t["lineitem"]
        .join(t["orders"].hint("merge"), t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("o_custkey"),
            F.col("l_returnflag"),
            F.col("p_name").alias("obj"),
            F.col("o_orderdate"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .groupBy("o_custkey", "l_returnflag", "obj")
        .agg(
            F.min("o_orderdate").alias("first_seen"),
            F.count("*").alias("n_facts"),
            F.round(F.sum("rev"), 4).alias("revenue"),
        )
    )
    return pre.join(t["customer"], F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_name").alias("subj"),
        F.concat(F.lit("ORDERED_"), F.upper(F.col("l_returnflag"))).alias("pred"),
        "obj",
        "first_seen",
        "n_facts",
        "revenue",
    )


def _sql_kg_flagship() -> str:
    return """
    SELECT c_name AS subj,
           'ORDERED_' || upper(l_returnflag) AS pred,
           p_name AS obj,
           min(o_orderdate) AS first_seen,
           count(*) AS n_facts,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part     ON l_partkey = p_partkey
    GROUP BY 1, 2, 3
    """


# --------------------------------------------------------------------- TPC-H

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _sql_q1() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """


def q3_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _load(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz"))
        # merge hint on the LINEITEM side only (guide §3.1, round 6): the
        # customer⋈orders join keeps its cheap 30k-row customer broadcast,
        # while the big join stops broadcasting ~700k filtered orders rows
        # (single-threaded build dominated the query: 3.78 -> 1.02 s at
        # sf1.0; scale-safe — SMJ is the strategy a 100x lineitem needs)
        .join(t["lineitem"].hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def _sql_q3() -> str:
    return """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY 1, 2, 3
    """


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _load(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        t["lineitem"]
        # merge hint: stop broadcasting the 1.5M-row orders build side
        # (guide §3.1; 2.02 -> 1.41 s at sf1.0, scale-safe — see kg_flagship)
        .join(t["orders"].hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            # supplier grows with scale factor — AQE-chosen strategy, no hint
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        # nation/region are FIXED cardinality (25/5 at every SF): the only
        # tables where a forced broadcast is safe by construction
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _sql_q5() -> str:
    return """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter + agg — exercises predicate pushdown into the parquet scan
    (reference early-filter F1, VariantDatabase.java:178)."""
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


def _sql_q6() -> str:
    return """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """


# ------------------------------------------------------- operator inventory

def c2_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite natural-key construction (VariantDatabase.java:140)."""
    o = _load(spark, sf_dir, "orders")["orders"]
    return (
        o.withColumn(
            "analysis_key",
            F.concat_ws("_", F.col("o_orderstatus"), F.col("o_orderpriority")),
        )
        .groupBy("analysis_key")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


def _sql_c2() -> str:
    return """
    SELECT o_orderstatus || '_' || o_orderpriority AS analysis_key,
           count(*) AS n, round(sum(o_totalprice), 4) AS total
    FROM orders GROUP BY 1
    """


def c8_dynamic_rel_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic relationship types from data (VariantDatabase.java:463,476):
    rel_type stays a column, never N DataFrames."""
    e = _load(spark, sf_dir, "events")["events"]
    return (
        e.withColumn(
            "rel_type",
            F.concat(F.lit("HAS_"), F.upper(F.col("event_type")), F.lit("_EVENT")),
        )
        .groupBy("rel_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def _sql_c8() -> str:
    return """
    SELECT 'HAS_' || upper(event_type) || '_EVENT' AS rel_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1
    """


def c9_total_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total classification with an 'other' bucket — the fixed version of the
    reference's crashing MT branch (VariantDatabase.java:296-302)."""
    e = _load(spark, sf_dir, "events")["events"]
    bucket = (
        F.when(F.col("value").isNull(), "other")
        .when(F.col("value") < 10, "low")
        .when(F.col("value") < 100, "mid")
        .otherwise("high")
    )
    return e.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


def _sql_c9() -> str:
    return """
    SELECT CASE WHEN value IS NULL THEN 'other'
                WHEN value < 10 THEN 'low'
                WHEN value < 100 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n
    FROM events GROUP BY 1
    """


def j3_edge_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-uniqueness guard (Neo4j.java:192-194): distinct (src,dst) pairs."""
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.select("l_suppkey", "l_orderkey")
        .dropDuplicates(["l_suppkey", "l_orderkey"])
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_distinct_orders"))
    )


def _sql_j3() -> str:
    return """
    SELECT l_suppkey, count(*) AS n_distinct_orders
    FROM (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem)
    GROUP BY 1
    """


def j7_first_wins_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-writer-wins MERGE (Neo4j.java:230-242) via the engine's
    min-struct first_wins operator.

    Round 6: single-phase (salt_buckets=1). min(struct) partial-aggregates
    map-side, so the hot-key argument for two-phase salting never applied
    here — and because the salt hashes the near-unique (ts, event_id), the
    salted partial barely collapsed: BOTH shuffles carried ~|rows| rows.
    Single-phase shuffles one |users|-sized partial per map task instead
    (guide §2.3 "aggregate before you shuffle"); identical rows (min is
    associative; exceptAll == 0 both directions). Measured 1.70 -> 0.65 s
    at sf1.0. The salted path stays exercised by the operator tests and by
    first_wins callers with non-partial aggregates."""
    from importtoneo4j_spark.operators.merge import first_wins

    e = _load(spark, sf_dir, "events")["events"]
    won = first_wins(
        e,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        payload=["event_type", "value"],
        salt_buckets=1,
    )
    return won.select(
        "user_id",
        F.col("event_type").alias("first_event_type"),
        F.round(F.col("value"), 4).alias("first_value"),
    )


def _sql_j7() -> str:
    return """
    SELECT user_id, event_type AS first_event_type,
           round(value, 4) AS first_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """


def j1_enrich_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 second-pass enrichment (VariantDatabase.java:320-352): an external
    attribute table is joined on the canonical key and first-wins-merged into
    the node properties map — an existing property key ('segment') keeps its
    node value, a new key ('nation_name') is added, and every attribute row
    must hit a node (crash-on-miss, :336)."""
    from importtoneo4j_spark.operators.enrich import enrich_nodes

    t = _load(spark, sf_dir, "customer", "nation")
    nodes = t["customer"].select(
        F.col("c_custkey").cast("long").alias("entity_id"),
        F.create_map(F.lit("segment"), F.col("c_mktsegment")).alias("properties"),
    )
    attrs = (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey").cast("long").alias("entity_id"),
            F.lit("ATTR_MUST_LOSE").alias("segment"),  # collides -> node wins
            F.col("n_name").alias("nation_name"),  # new key -> added
        )
    )
    enriched = enrich_nodes(nodes, attrs, fail_on_miss=True)
    return enriched.select(
        "entity_id",
        F.col("properties")["segment"].alias("segment"),
        F.col("properties")["nation_name"].alias("nation_name"),
    )


def _sql_j1_enrich() -> str:
    return """
    SELECT CAST(c_custkey AS BIGINT) AS entity_id,
           c_mktsegment AS segment,
           n_name AS nation_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """


# ------------------------------------------ GraphView operator library (F9/J4/agg)

def _tpch_graph(spark: SparkSession, sf_dir: str):
    """GraphView over TPC-H-ish tables so the graph operator library
    (operators/graph.py — Neo4j.java parity) is driver-gate-checked:
    nodes = customers/suppliers/parts (labels + properties map), edges =
    customer -ordered-> part and supplier -supplies-> part."""
    from importtoneo4j_spark.operators.graph import GraphView

    t = _load(spark, sf_dir, "customer", "supplier", "part", "orders", "lineitem")
    li_ord = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    ordered = li_ord.select(
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
        F.lit("ordered").alias("pred"),
        F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
    ).distinct()
    supplies = t["lineitem"].select(
        F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("subj"),
        F.lit("supplies").alias("pred"),
        F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
    ).distinct()
    triples = ordered.unionByName(supplies)
    parts = t["part"].select(
        F.concat(F.lit("P"), F.col("p_partkey").cast("string")).alias("entity_id"),
        F.array(F.lit("Part")).alias("labels"),
        F.col("p_name").alias("name"),
        F.create_map(F.lit("brand"), F.col("p_brand")).alias("properties"),
    )
    custs = t["customer"].select(
        F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("entity_id"),
        F.array(F.lit("Customer")).alias("labels"),
        F.col("c_name").alias("name"),
        F.create_map(F.lit("segment"), F.col("c_mktsegment")).alias("properties"),
    )
    sups = t["supplier"].select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("entity_id"),
        F.array(F.lit("Supplier")).alias("labels"),
        F.col("s_name").alias("name"),
        F.create_map(F.lit("segment"), F.lit("wholesale")).alias("properties"),
    )
    return GraphView(parts.unionByName(custs).unionByName(sups), triples)


def j4_one_hop_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hop traversal join with rel-type + end-label filters, set form
    (Neo4j.findNeighbourNodes, Neo4j.java:254-277) -> neighbour count per
    source entity."""
    g = _tpch_graph(spark, sf_dir)
    nb = g.find_neighbours(pred="ordered", direction="out", end_label="Part")
    return nb.groupBy("from_id").agg(F.count("*").alias("n_parts"))


def _sql_j4() -> str:
    return """
    WITH e AS (SELECT DISTINCT 'C' || o_custkey AS from_id,
                               'P' || l_partkey AS to_id
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT from_id, count(*) AS n_parts FROM e GROUP BY 1
    """


def f9_label_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label + property node scan (Neo4j.getNodes, Neo4j.java:116-136):
    array_contains on labels + a properties-map probe."""
    g = _tpch_graph(spark, sf_dir)
    hits = g.get_nodes(label="Part", brand="Brand#4")
    return hits.select(
        "entity_id", "name", F.col("properties")["brand"].alias("brand")
    )


def _sql_f9() -> str:
    return """
    SELECT 'P' || p_partkey AS entity_id, p_name AS name, p_brand AS brand
    FROM part WHERE p_brand = 'Brand#4'
    """


def j5_traversal_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traversal with conjunctive end-node property equalities
    (Neo4j.findNeighbourNodesWithParameters, Neo4j.java:278-312: ALL
    supplied parameters must match) — a fixed customer's ordered parts of
    one brand."""
    g = _tpch_graph(spark, sf_dir)
    nb = g.find_neighbours_with_params("C1", pred="ordered", brand="Brand#4")
    return nb.select("to_id", "name", F.col("properties")["brand"].alias("brand"))


def _sql_j5() -> str:
    return """
    SELECT DISTINCT 'P' || l_partkey AS to_id, p_name AS name, p_brand AS brand
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE o_custkey = 1 AND p_brand = 'Brand#4'
    """


def g2_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop shared-neighbour traversal (customer -ordered-> part
    <-supplies- supplier) -> distinct supplier-partner count per customer.
    operators/graph.py::two_hop_partners — the hub-capped middle-node
    self-join."""
    g = _tpch_graph(spark, sf_dir)
    pairs = g.two_hop_partners("ordered", "supplies")
    return pairs.groupBy(F.col("x").alias("cust_id")).agg(
        F.countDistinct("y").alias("n_suppliers")
    )


def _sql_g2() -> str:
    return """
    WITH e1 AS (SELECT DISTINCT 'C' || o_custkey AS x, 'P' || l_partkey AS m
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e2 AS (SELECT DISTINCT 'S' || l_suppkey AS y, 'P' || l_partkey AS m
                FROM lineitem)
    SELECT x AS cust_id, count(DISTINCT y) AS n_suppliers
    FROM e1 JOIN e2 ON e1.m = e2.m
    GROUP BY 1
    """


def g1_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph degree aggregate over the edge table (out-degree + distinct
    rel-type count per source) — partial-aggregating groupBy, no window."""
    g = _tpch_graph(spark, sf_dir)
    return g.degree("out")


def _sql_g1() -> str:
    return """
    WITH e AS (
      SELECT DISTINCT 'C' || o_custkey AS subj, 'ordered' AS pred,
                      'P' || l_partkey AS obj
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT DISTINCT 'S' || l_suppkey, 'supplies', 'P' || l_partkey
      FROM lineitem
    )
    SELECT subj AS entity_id, count(*) AS degree,
           count(DISTINCT pred) AS n_pred_types
    FROM e GROUP BY 1
    """


def t3_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.py): latest click at or before each
    purchase per user — one shuffle + per-key sort, no range cross-join;
    oracle = DuckDB's native ASOF LEFT JOIN."""
    from importtoneo4j_spark.operators.temporal import asof_join

    e = _load(spark, sf_dir, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    j = asof_join(purchases, clicks, on="user_id", right_cols=["event_id", "value"])
    return j.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("last_click_id"),
        F.round("r_value", 4).alias("click_value"),
    )


def _sql_t3() -> str:
    return """
    SELECT l.user_id, l.event_id AS purchase_id, r.event_id AS last_click_id,
           round(r.value, 4) AS click_value
    FROM (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT user_id, event_id, value, ts FROM events
                    WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """


def a3_label_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label set-union (Neo4j.java:243-253) via the engine's two-phase
    collect_set; sorted + joined for a deterministic comparable value."""
    from importtoneo4j_spark.operators.merge import label_union

    e = _load(spark, sf_dir, "events")["events"]
    lbl = label_union(e, keys=["user_id"], label_col="event_type")
    return lbl.select("user_id", F.array_join("labels", ",").alias("labels"))


def _sql_a3() -> str:
    return """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS labels
    FROM events GROUP BY 1
    """


def a6_guarded_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived aggregate with a guard (AF = AC/AN if AN > threshold,
    VariantDatabase.java:497-501)."""
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_partkey")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
        )
        .select(
            "l_partkey",
            F.round(F.col("sum_qty"), 4).alias("sum_qty"),
            F.round(
                F.when(F.col("sum_qty") > 50, F.col("sum_price") / F.col("sum_qty")),
                4,
            ).alias("price_per_unit"),
        )
    )


def _sql_a6() -> str:
    return """
    SELECT l_partkey, round(sum_qty, 4) AS sum_qty,
           round(CASE WHEN sum_qty > 50 THEN sum_price / sum_qty END, 4)
             AS price_per_unit
    FROM (SELECT l_partkey, sum(l_quantity) sum_qty,
                 sum(l_extendedprice) sum_price
          FROM lineitem GROUP BY 1)
    """


def u2_anti_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-minus-existing delta (VariantDatabase.java:235-263) as left_anti:
    customers that never ordered."""
    t = _load(spark, sf_dir, "customer", "orders")
    no_orders = t["customer"].join(
        t["orders"].select(F.col("o_custkey").alias("c_custkey")).distinct(),
        "c_custkey",
        "left_anti",
    )
    return no_orders.groupBy("c_nationkey").agg(F.count("*").alias("n_customers"))


def _sql_u2() -> str:
    return """
    SELECT c_nationkey, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """


def u3_union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch union (VariantDatabase.java:201-221 genotype branches)."""
    o = _load(spark, sf_dir, "orders")["orders"]
    b1 = o.filter(F.col("o_orderstatus") == "F")
    b2 = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        b1.unionByName(b2)
        .dropDuplicates(["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def _sql_u3() -> str:
    return """
    SELECT o_orderstatus, count(*) AS n
    FROM (SELECT DISTINCT ON (o_orderkey) *
          FROM (SELECT * FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT * FROM orders WHERE o_orderpriority = '1-URGENT')
          ORDER BY o_orderkey)
    GROUP BY 1
    """


def w1_stable_order_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable per-key ordering window (the turn-ordering invariant,
    BASELINE.json input_hint): first 3 events per user."""
    e = _load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


def _sql_w1() -> str:
    return """
    SELECT user_id, event_id, CAST(rn AS INTEGER) AS rn
    FROM (SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn <= 3
    """


def w2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + cumulative sum over the stable
    window) — the batch analog of a streaming session window."""
    e = _load(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    epoch = F.col("ts").cast("timestamp").cast("long")  # NTZ -> LTZ is
    # identity under the UTC session timezone pinned in session.py
    gap = epoch - F.lag(epoch).over(w)
    sess = e.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return sess.groupBy("user_id").agg(
        F.sum("new_sess").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def _sql_w2() -> str:
    return """
    SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM (SELECT user_id,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                      OR lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events)
    GROUP BY 1
    """


# -------------------------------------------------- text analysis (documents)

def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load(spark, sf_dir, "documents")["documents"]
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
    )


def _sql_text_tokens() -> str:
    return r"""
    SELECT lang, count(*) AS n_docs,
           round(avg(len(regexp_split_to_array(trim(text), '\s+'))), 4)
             AS avg_tokens,
           round(avg(length(text)), 4) AS avg_chars
    FROM documents GROUP BY 1
    """


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: word pieces + standalone punctuation via a
    sub-word regex — the tokenizer-approximation used for training-data
    budgeting (whitespace counting underestimates punctuated text)."""
    d = _load(spark, sf_dir, "documents")["documents"]
    bpe = F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]', 0)"))
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(bpe).alias("bpe_tokens"),
        F.sum(ws).alias("ws_tokens"),
    )


def _sql_text_bpe() -> str:
    return r"""
    SELECT source, count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
             AS bpe_tokens,
           CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
             AS ws_tokens
    FROM documents GROUP BY 1
    """


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count + stopword ratio + a quality band."""
    d = _load(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin("the", "a")))
    ratio = F.round(n_stop.cast("double") / n_toks, 4)
    band = (
        F.when(n_toks < 40, "short")
        .when(ratio > 0.15, "stopword_heavy")
        .otherwise("ok")
    )
    return d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        ratio.alias("stop_ratio"),
        band.alias("quality_band"),
    )


def _sql_text_quality() -> str:
    return r"""
    SELECT doc_id, len(toks) AS n_tokens,
           round(len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0
                 / len(toks), 4) AS stop_ratio,
           CASE WHEN len(toks) < 40 THEN 'short'
                WHEN len(list_filter(toks, x -> x IN ('the', 'a'))) * 1.0
                     / len(toks) > 0.15 THEN 'stopword_heavy'
                ELSE 'ok' END AS quality_band
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents)
    """


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of the normalized text (md5 is identical
    in Spark and DuckDB — also the basis of the MinHash oracle)."""
    d = _load(spark, sf_dir, "documents")["documents"]
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select("source", F.md5(norm).alias("fp")).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_unique_fp"),
    )


def _sql_text_fp() -> str:
    return r"""
    SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_unique_fp
    FROM (SELECT source,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM documents)
    GROUP BY 1
    """


# ------------------------------------------------------- dedup (documents)

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, keep-min-doc_id semantics."""
    d = _load(spark, sf_dir, "documents")["documents"]
    hashed = d.select(F.md5("text").alias("h"), "doc_id")
    kept = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.countDistinct("h").alias("n_unique"),
    )


def _sql_dedup_exact() -> str:
    return """
    SELECT count(*) AS n_kept, count(DISTINCT h) AS n_unique
    FROM (SELECT md5(text) AS h, min(doc_id) AS keep_id
          FROM documents GROUP BY 1)
    """


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact token-5-gram Jaccard >= 0.5. Blocking is the
    df-capped inverted-index self-join (shingles with document frequency
    > 64 are dropped from candidate generation — the drop_hot_buckets
    pattern); verification is exact Jaccard on the full shingle sets, so
    emitted scores are unaffected by the cap. operators/dedup.py:
    ngram_jaccard_pairs; oracle mirrors the cap (_sql_dedup_ngram)."""
    from importtoneo4j_spark.operators.dedup import ngram_jaccard_pairs

    d = _load(spark, sf_dir, "documents")["documents"]
    out = ngram_jaccard_pairs(d, "doc_id", "text", n=5, threshold=0.5, max_df=64)
    # exact integer set sizes + integer-division-scaled score: round(double,
    # 4) splits between engines on exactly-half small rationals (the g8
    # finding, applied to the whole jaccard gate family in round 5)
    return out.select(
        "a_id",
        "b_id",
        F.col("n_inter").cast("long").alias("n_inter"),
        F.col("n_union").cast("long").alias("n_union"),
        (F.expr("(n_inter * 10000) div n_union").cast("double") / 10000.0).alias("jac"),
    )


def _sql_dedup_ngram(max_df: int = 64) -> str:
    return rf"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+4], ' ')
                            for i in range(1, len(toks) - 3)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 5
    ), inv AS (
      SELECT doc_id, len(s) AS n_sh, unnest(s) AS sg FROM sh
    ), hot AS (
      SELECT sg FROM inv GROUP BY sg HAVING count(*) > {max_df}
    ), capped AS (
      SELECT * FROM inv WHERE sg NOT IN (SELECT sg FROM hot)
    ), cand AS (
      SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
      FROM capped a JOIN capped b ON a.sg = b.sg AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT c.a_id, c.b_id, a.n_sh na, b.n_sh nb, count(*) AS common
      FROM cand c
      JOIN inv a ON a.doc_id = c.a_id
      JOIN inv b ON b.doc_id = c.b_id AND a.sg = b.sg
      GROUP BY 1, 2, 3, 4
    )
    SELECT a_id, b_id, CAST(common AS BIGINT) AS n_inter,
           CAST(na + nb - common AS BIGINT) AS n_union,
           ((common * 10000) // (na + nb - common)) / 10000.0 AS jac
    FROM pairs
    WHERE common * 1.0 / (na + nb - common) >= 0.5
    """


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified by exact Jaccard >= 0.5 —
    the scale path (inverted-index join is quadratic in bucket size; LSH
    bounds bucket entropy). md5-based minhash keeps it oracle-identical."""
    from importtoneo4j_spark.operators.dedup import minhash_near_dups

    d = _load(spark, sf_dir, "documents")["documents"]
    out = minhash_near_dups(
        d, "doc_id", "text", n=5, num_perm=16, bands=8, rows_per_band=2, threshold=0.5
    )
    # integer-division-scaled score (see dedup_ngram_jaccard)
    return out.select(
        "a_id",
        "b_id",
        F.col("n_inter").cast("long").alias("n_inter"),
        F.col("n_union").cast("long").alias("n_union"),
        (F.expr("(n_inter * 10000) div n_union").cast("double") / 10000.0).alias("jac"),
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination: near-dup pairs ACROSS two disjoint corpus
    halves (even vs odd doc_id) — LSH band join A x B, never a self-join."""
    from importtoneo4j_spark.operators.dedup import cross_corpus_overlap

    d = _load(spark, sf_dir, "documents")["documents"]
    out = cross_corpus_overlap(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
        n=5,
        num_perm=16,
        bands=8,
        rows_per_band=2,
        threshold=0.5,
    )
    # integer-division-scaled score (see dedup_ngram_jaccard)
    return out.select(
        "a_id",
        "b_id",
        F.col("n_inter").cast("long").alias("n_inter"),
        F.col("n_union").cast("long").alias("n_union"),
        (F.expr("(n_inter * 10000) div n_union").cast("double") / 10000.0).alias("jac"),
    )


def _sql_contamination() -> str:
    from importtoneo4j_spark.functions.text import MINHASH_PRIME, minhash_coeffs

    perms, bands, rows = 16, 8, 2
    hexpr = "(('0x' || substr(md5(u), 1, 7))::BIGINT)"
    mh = ", ".join(
        f"list_min([({a} * {hexpr} + {b}) % {MINHASH_PRIME} for u in s]) AS m{p}"
        for p, (a, b) in ((p, minhash_coeffs(p)) for p in range(perms))
    )
    band_keys = ", ".join(
        f"'{b}' || '|' || m{b * rows} || '|' || m{b * rows + 1}" for b in range(bands)
    )
    return rf"""
    WITH sh AS (
      SELECT doc_id, doc_id % 2 AS par,
             list_distinct([array_to_string(toks[i:i+4], ' ')
                            for i in range(1, len(toks) - 3)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 5
    ), mh AS (
      SELECT doc_id, par, s, {mh} FROM sh
    ), bands AS (
      SELECT doc_id, par, unnest([{band_keys}]) AS band_key FROM mh
    ), cand AS (
      SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
      FROM bands a JOIN bands b ON a.band_key = b.band_key
      WHERE a.par = 0 AND b.par = 1
    )
    SELECT a_id, b_id,
           CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter,
           CAST(len(list_distinct(sa.s || sb.s)) AS BIGINT) AS n_union,
           ((len(list_intersect(sa.s, sb.s)) * 10000)
            // len(list_distinct(sa.s || sb.s))) / 10000.0 AS jac
    FROM cand
    JOIN sh sa ON a_id = sa.doc_id
    JOIN sh sb ON b_id = sb.doc_id
    WHERE len(list_intersect(sa.s, sb.s)) * 1.0
          / len(list_distinct(sa.s || sb.s)) >= 0.5
    """


def _minhash_pair_ctes() -> str:
    """The MinHash-LSH pair derivation as a WITH-body string, shared by the
    dedup_minhash_lsh and dedup_clusters oracles (ends in a `pairs` CTE)."""
    from importtoneo4j_spark.functions.text import MINHASH_PRIME, minhash_coeffs

    perms = 16
    bands, rows = 8, 2
    hexpr = "(('0x' || substr(md5(u), 1, 7))::BIGINT)"
    mh_terms = []
    for p in range(perms):
        a, b = minhash_coeffs(p)
        mh_terms.append(
            f"list_min([({a} * {hexpr} + {b}) % {MINHASH_PRIME} for u in s]) AS m{p}"
        )
    mh = ", ".join(mh_terms)
    band_keys = ", ".join(
        f"'{b}' || '|' || m{b * rows} || '|' || m{b * rows + 1}" for b in range(bands)
    )
    return rf"""sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+4], ' ')
                            for i in range(1, len(toks) - 3)]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 5
    ), mh AS (
      SELECT doc_id, s, {mh} FROM sh
    ), bands AS (
      SELECT doc_id, unnest([{band_keys}]) AS band_key FROM mh
    ), cand AS (
      SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT a_id, b_id,
             CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter,
             CAST(len(list_distinct(sa.s || sb.s)) AS BIGINT) AS n_union,
             ((len(list_intersect(sa.s, sb.s)) * 10000)
              // len(list_distinct(sa.s || sb.s))) / 10000.0 AS jac
      FROM cand
      JOIN sh sa ON a_id = sa.doc_id
      JOIN sh sb ON b_id = sb.doc_id
      WHERE len(list_intersect(sa.s, sb.s)) * 1.0
            / len(list_distinct(sa.s || sb.s)) >= 0.5
    )"""


def _sql_dedup_minhash() -> str:
    return f"""
    WITH {_minhash_pair_ctes()}
    SELECT a_id, b_id, n_inter, n_union, jac FROM pairs
    """


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: hash-min connected components (the pipeline's own
    canonicalization machinery, operators/canonicalize.py) over the verified
    MinHash pair graph; keep_id = min doc_id per component. Oracle: the same
    pair derivation + a recursive-CTE transitive closure."""
    from importtoneo4j_spark.operators.dedup import dedup_clusters as op

    d = _load(spark, sf_dir, "documents")["documents"]
    return op(
        d, "doc_id", "text", n=5, num_perm=16, bands=8, rows_per_band=2, threshold=0.5
    )


def _sql_dedup_clusters() -> str:
    return f"""
    WITH RECURSIVE {_minhash_pair_ctes()},
    edges AS (
      SELECT a_id AS s, b_id AS d FROM pairs
      UNION
      SELECT b_id, a_id FROM pairs
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id, LEAST(s, MIN(d)) AS keep_id
    FROM reach GROUP BY s
    """


def contamination_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 13-gram decontamination probe (the published eval-set
    decontamination window) across the same even/odd corpus split as
    contamination_check: one row per contaminated eval doc with shared
    n-gram and train-doc counts. operators/dedup.py::
    exact_ngram_contamination (df-capped inverted join)."""
    from importtoneo4j_spark.operators.dedup import exact_ngram_contamination

    d = _load(spark, sf_dir, "documents")["documents"]
    train = d.filter(F.col("doc_id") % 2 == 0)
    ev = d.filter(F.col("doc_id") % 2 == 1)
    out = exact_ngram_contamination(train, ev, "doc_id", "text", n=13, max_df=1000)
    return out.select(
        "eval_id",
        F.col("n_shared_ngrams").cast("long").alias("n_shared_ngrams"),
        F.col("n_train_docs").cast("long").alias("n_train_docs"),
    )


def _sql_contamination_exact(n: int = 13, max_df: int = 1000) -> str:
    return rf"""
    WITH g AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                                   for i in range(1, len(toks) - {n - 2})])) AS gram
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= {n}
    ), train AS (
      SELECT * FROM g WHERE doc_id % 2 = 0
    ), hot AS (
      SELECT gram FROM train GROUP BY gram HAVING count(*) > {max_df}
    ), train_c AS (
      SELECT * FROM train WHERE gram NOT IN (SELECT gram FROM hot)
    )
    SELECT e.doc_id AS eval_id,
           count(DISTINCT e.gram) AS n_shared_ngrams,
           count(DISTINCT t.doc_id) AS n_train_docs
    FROM g e JOIN train_c t ON e.gram = t.gram
    WHERE e.doc_id % 2 = 1
    GROUP BY 1
    """


def o5_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values (functions/stats.py::
    equi_width_histogram — min/max-derived bins, map-side assignment, one
    tiny groupBy shuffle; the distribution-profiling primitive). Bin
    edges derive from identical min/max doubles in both engines; rounded
    to 4 for display."""
    from importtoneo4j_spark.functions.stats import equi_width_histogram

    e = _load(spark, sf_dir, "events")["events"]
    out = equi_width_histogram(e, "value", bins=20)
    return out.select(
        F.col("bin").cast("long").alias("bin"),
        F.round("lo", 4).alias("lo"),
        F.round("hi", 4).alias("hi"),
        F.col("n").cast("long").alias("n"),
    )


def _sql_o5(bins: int = 20) -> str:
    return f"""
    WITH src AS (
      SELECT CAST(value AS DOUBLE) AS x FROM events WHERE value IS NOT NULL
    ), bounds AS (
      SELECT min(x) AS lo, max(x) AS hi FROM src
    ), binned AS (
      SELECT least(CASE WHEN hi > lo
                        THEN CAST(floor((x - lo) / ((hi - lo) / {bins}))
                                  AS BIGINT)
                        ELSE 0 END, {bins - 1}) AS bin,
             lo AS t_lo, hi AS t_hi
      FROM src, bounds
    )
    SELECT bin, round(t_lo + bin * (t_hi - t_lo) / {bins}, 4) AS lo,
           round(t_lo + (bin + 1) * (t_hi - t_lo) / {bins}, 4) AS hi,
           count(*) AS n
    FROM binned GROUP BY bin, t_lo, t_hi
    """


def o6_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile over orders (functions/stats.py::
    profile_table — a single wide aggregate, exact distincts, min/max as
    strings): the first query a pipeline runs against an unfamiliar
    table."""
    from importtoneo4j_spark.functions.stats import profile_table

    o = _load(spark, sf_dir, "orders")["orders"]
    # exact=True: the precise distinct count is this gate's oracle contract;
    # the operator's default is approx (no Expand) since round 6
    return profile_table(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
        exact=True,
    )


def _sql_o6() -> str:
    parts = []
    for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]:
        parts.append(f"""
      SELECT '{c}' AS column, count(*) AS n_rows,
             CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
             CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
             CAST(min({c}) AS VARCHAR) AS min_str,
             CAST(max({c}) AS VARCHAR) AS max_str
      FROM orders""")
    return " UNION ALL ".join(parts)


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram log-likelihood under the corpus's own
    unigram distribution (functions/text.py::unigram_logprob — the
    model-free fluency/outlier filter; corpus-rare-token documents score
    low). Exact count ratios; tokens collapse to (doc, term, tf) before
    the term join, so one ln per DISTINCT pairing and a tf-weighted mean
    (code-review round 5 — the avg-over-occurrences form shipped one join
    row per token); rounded to 4."""
    from importtoneo4j_spark.functions.text import unigram_logprob

    d = _load(spark, sf_dir, "documents")["documents"]
    out = unigram_logprob(d, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("logprob", 4).alias("logprob"),
    )


def _sql_text_unigram_logprob() -> str:
    return r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
             AS term
      FROM documents
    ), t2 AS (
      SELECT doc_id, term FROM toks WHERE term <> ''
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY doc_id, term
    ), freq AS (
      SELECT term, sum(tf) AS cnt FROM tf GROUP BY term
    ), tot AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq
    )
    SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           round(sum(tf.tf * ln(freq.cnt / tot.total)) / sum(tf.tf), 4)
             AS logprob
    FROM tf JOIN freq USING (term), tot
    GROUP BY tf.doc_id
    """


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality signals (the Gopher/C4 filter
    family): duplicate-3-gram fraction and top-word dominance ratio per
    document — all native expressions plus one explode/groupBy for the
    word mode."""
    d = _load(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    g3 = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(2)),
        lambda i: F.array_join(F.slice(toks, i, 3), " "),
    )
    base = d.filter(F.size(toks) >= 3).select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n_words"),
        F.size(g3).alias("n3"),
        F.size(F.array_distinct(g3)).alias("n3d"),
    )
    word_mode = (
        base.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_w"))
    )
    return base.join(word_mode, "doc_id").select(
        "doc_id",
        "n_words",
        F.round(1 - F.col("n3d").cast("double") / F.col("n3"), 4).alias(
            "dup_3gram_frac"
        ),
        F.round(F.col("top_w").cast("double") / F.col("n_words"), 4).alias(
            "top_word_ratio"
        ),
    )


def _sql_text_repetition() -> str:
    return r"""
    WITH b AS (
      SELECT doc_id, toks,
             CAST(len(toks) AS INTEGER) AS n_words,
             [array_to_string(toks[i:i+2], ' ')
              for i in range(1, len(toks) - 1)] AS g3
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ), wm AS (
      SELECT doc_id, max(c) AS top_w
      FROM (SELECT doc_id, w, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS w FROM b)
            GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT b.doc_id, b.n_words,
           round(1 - len(list_distinct(g3)) * 1.0 / len(g3), 4) AS dup_3gram_frac,
           round(top_w * 1.0 / n_words, 4) AS top_word_ratio
    FROM b JOIN wm ON b.doc_id = wm.doc_id
    """


# -------------------------------------------- similarity search (embeddings)

def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a fixed query set — the correctness
    baseline for ANN. Dot/norm in double via zip_with + aggregate (native
    higher-order functions, no UDF).

    Round 6 (guide §2.5 / §1.2): the corpus norm is hoisted out of the
    5-way crossJoin (it was recomputed once per (query, vector) pair —
    |Q|x the flops; dot/(nq*ne) is bit-identical to the inline cosine,
    same fold and operand order), and the single-file embeddings scan is
    fanned out so the pair scoring uses every core instead of the scan's
    one partition."""
    from importtoneo4j_spark.operators.similarity import dot_d, norm, to_double
    from importtoneo4j_spark.session import fan_out

    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    # norms AND double-cast copies are projected below the join boundary so
    # they are computed once per row, not once per scored pair (CollapseProject
    # cannot inline across a join; see similarity.norm docstring)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        to_double(F.col("embedding")).alias("_qd"),
        norm(F.col("embedding")).alias("_nq"),
    )
    corpus = fan_out(
        e.select(
            "vec_id",
            to_double(F.col("embedding")).alias("_vd"),
            norm(F.col("embedding")).alias("_ne"),
        )
    )
    pairs = corpus.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    )
    sims = pairs.select(
        "qid",
        "vec_id",
        (
            dot_d(F.col("_qd"), F.col("_vd")) / (F.col("_nq") * F.col("_ne"))
        ).alias("sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "vec_id", F.round("sim", 4).alias("sim"), "rank")
    )


def _sql_ann_topk() -> str:
    return """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < 5),
    sims AS (
      SELECT qid, vec_id,
             list_sum([qe[i]::DOUBLE * embedding[i]::DOUBLE
                       for i in generate_series(1, len(qe))])
             / (sqrt(list_sum([qe[i]::DOUBLE * qe[i]::DOUBLE
                               for i in generate_series(1, len(qe))]))
                * sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
                                 for i in generate_series(1, len(embedding))])))
             AS sim
      FROM q, embeddings WHERE vec_id != qid
    )
    SELECT qid, vec_id, round(sim, 4) AS sim, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY sim DESC, vec_id) AS rank
          FROM sims)
    WHERE rank <= 5
    """


def _sql_cosine(a: str, b: str) -> str:
    """Inline double-precision cosine for the DuckDB oracle (macro-free)."""
    def dotexpr(x: str, y: str) -> str:
        return (
            f"list_sum([{x}[i]::DOUBLE * {y}[i]::DOUBLE "
            f"for i in generate_series(1, len({x}))])"
        )

    return f"({dotexpr(a, b)} / (sqrt({dotexpr(a, a)}) * sqrt({dotexpr(b, b)})))"


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (deterministic coarse quantizer): the scale path —
    assignment via broadcast centroid join, probe-limited search."""
    from importtoneo4j_spark.operators.similarity import ivf_topk

    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    out = ivf_topk(e, q, k=3, n_centroids=16, nprobe=4)
    return out.select(
        "qid", "vec_id", F.round("sim", 4).alias("sim"), F.col("rank").cast("int").alias("rank")
    )


def _sql_ann_ivf() -> str:
    cos_ec = _sql_cosine("e.embedding", "c.ce")
    cos_qc = _sql_cosine("q.qe", "c.ce")
    cos_pa = _sql_cosine("p.qe", "a.embedding")
    return f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
      ORDER BY vec_id LIMIT 16
    ), assigned AS (
      SELECT vec_id, bucket, embedding FROM (
        SELECT e.vec_id, c.centroid_id AS bucket, e.embedding,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.centroid_id) AS rnk
        FROM embeddings e, cents c)
      WHERE rnk = 1
    ), q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
    ), probes AS (
      SELECT qid, qe, bucket FROM (
        SELECT q.qid, q.qe, c.centroid_id AS bucket,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {cos_qc} DESC, c.centroid_id) AS rnk
        FROM q, cents c)
      WHERE rnk <= 4
    ), sims AS (
      SELECT p.qid, a.vec_id, {cos_pa} AS sim
      FROM probes p JOIN assigned a USING (bucket)
      WHERE a.vec_id != p.qid
    )
    SELECT qid, vec_id, round(sim, 4) AS sim, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY sim DESC, vec_id) AS rank
          FROM sims)
    WHERE rank <= 3
    """


def ann_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the int8-quantized corpus (operators/similarity.py::
    ivf_topk_quantized — every corpus-side shuffle carries array<int>
    codes, plan-asserted in tests): same probe/search shape as
    ann_ivf_topk, but centroids, assignment and scoring all read the
    dequantized codes. The affine quantization is bit-reproducible across
    engines (emb_quantize's gate), so the ENTIRE quantized search path is
    oracle-checkable — new driver gate in round 5 (the r4 verdict noted
    this path had only suite coverage)."""
    from importtoneo4j_spark.operators.similarity import ivf_topk_quantized

    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    # k large enough to keep EVERY probed candidate: the gate applies its
    # own top-3 cut ranked by the ROUNDED similarity (CLAUDE.md window
    # top-k rule — a sub-1e-4 cross-engine float divergence at the cut
    # must not flip membership), with the integer id as tiebreak, and the
    # oracle ranks identically.
    cands = ivf_topk_quantized(e, q, k=2**31 - 1, n_centroids=16, nprobe=4)
    w = Window.partitionBy("qid").orderBy(
        F.round("sim", 4).desc(), F.col("vec_id").asc()
    )
    return (
        cands.withColumn("rrank", F.row_number().over(w))
        .filter(F.col("rrank") <= 3)
        .select(
            "qid",
            "vec_id",
            F.round("sim", 4).alias("sim"),
            F.col("rrank").cast("int").alias("rank"),
        )
    )


def _sql_ann_ivf_quantized() -> str:
    cos_dc = _sql_cosine("e.d", "c.ce")
    cos_qc = _sql_cosine("q.qe", "c.ce")
    cos_pd = _sql_cosine("p.qe", "a.d")
    return f"""
    WITH src AS (
      SELECT vec_id,
             list_aggregate(embedding, 'min')::DOUBLE AS vmin,
             list_aggregate(embedding, 'max')::DOUBLE AS vmax,
             embedding
      FROM embeddings
    ), deq AS (
      SELECT vec_id,
             [CASE WHEN vmax > vmin
                   THEN vmin + CAST(round((x::DOUBLE - vmin)/(vmax - vmin)*255, 0)
                                    AS INTEGER)::DOUBLE * (vmax - vmin) / 255
                   ELSE vmin END
              for x in embedding] AS d
      FROM src
    ), cents AS (
      SELECT vec_id AS centroid_id, d AS ce FROM deq
      ORDER BY vec_id LIMIT 16
    ), assigned AS (
      SELECT vec_id, bucket, d FROM (
        SELECT e.vec_id, c.centroid_id AS bucket, e.d,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_dc} DESC, c.centroid_id) AS rnk
        FROM deq e, cents c)
      WHERE rnk = 1
    ), q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
    ), probes AS (
      SELECT qid, qe, bucket FROM (
        SELECT q.qid, q.qe, c.centroid_id AS bucket,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {cos_qc} DESC, c.centroid_id) AS rnk
        FROM q, cents c)
      WHERE rnk <= 4
    ), sims AS (
      SELECT p.qid, a.vec_id, {cos_pd} AS sim
      FROM probes p JOIN assigned a USING (bucket)
      WHERE a.vec_id != p.qid
    )
    SELECT qid, vec_id, round(sim, 4) AS sim, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY qid
                                       ORDER BY round(sim, 4) DESC, vec_id)
                    AS rank
          FROM sims)
    WHERE rank <= 3
    """


def emb_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, IVF-bucket-blocked, with the
    hot-bucket cap active (auto mode: buckets over 8x the uniform
    expectation, floored at 256, are dropped before the pair join — the
    oracle SQL mirrors the same HAVING guard, so the gate verifies the
    GUARDED plan, VERDICT r3 #1)."""
    from importtoneo4j_spark.operators.similarity import embedding_near_dups

    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    out = embedding_near_dups(e, threshold=0.45, n_centroids=16)
    return out.select("a_id", "b_id", F.round("sim", 4).alias("sim"))


def _sql_emb_near_dups() -> str:
    cos_ec = _sql_cosine("e.embedding", "c.ce")
    cos_ab = _sql_cosine("a.embedding", "b.embedding")
    return f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
      ORDER BY vec_id LIMIT 16
    ), assigned AS (
      SELECT vec_id, bucket, embedding FROM (
        SELECT e.vec_id, c.centroid_id AS bucket, e.embedding,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.centroid_id) AS rnk
        FROM embeddings e, cents c)
      WHERE rnk = 1
    ), hot AS (
      SELECT bucket FROM assigned GROUP BY bucket
      HAVING count(*) > greatest(256.0,
                                 8.0 * (SELECT count(*) FROM assigned) / 16)
    ), capped AS (
      SELECT * FROM assigned WHERE bucket NOT IN (SELECT bucket FROM hot)
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, round({cos_ab}, 4) AS sim
    FROM capped a JOIN capped b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos_ab} >= 0.45
    """


def emb_near_dups_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedding_near_dups with nprobe=2 (round 5): every vector joins its
    TWO nearest IVF buckets, recovering pairs that straddle one bucket
    boundary; pairs surfacing via both shared buckets dedupe BEFORE
    scoring. Completes the oracle coverage of the multi-probe path — the
    r4 gate checked only the plain argmax assignment (nprobe=1). The auto
    hot-bucket cap runs over the multi-probe assignment (2N memberships),
    exactly mirrored in the HAVING guard."""
    from importtoneo4j_spark.operators.similarity import embedding_near_dups

    e = _load(spark, sf_dir, "embeddings")["embeddings"]
    out = embedding_near_dups(e, threshold=0.45, n_centroids=16, nprobe=2)
    return out.select("a_id", "b_id", F.round("sim", 4).alias("sim"))


def _sql_emb_near_dups_multiprobe() -> str:
    cos_ec = _sql_cosine("e.embedding", "c.ce")
    cos_ab = _sql_cosine("ea.embedding", "eb.embedding")
    return f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS ce FROM embeddings
      ORDER BY vec_id LIMIT 16
    ), assigned AS (
      SELECT vec_id, bucket FROM (
        SELECT e.vec_id, c.centroid_id AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_ec} DESC, c.centroid_id) AS rnk
        FROM embeddings e, cents c)
      WHERE rnk <= 2
    ), hot AS (
      SELECT bucket FROM assigned GROUP BY bucket
      HAVING count(*) > greatest(256.0,
                                 8.0 * (SELECT count(*) FROM assigned) / 16)
    ), capped AS (
      SELECT * FROM assigned WHERE bucket NOT IN (SELECT bucket FROM hot)
    ), cand AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM capped a JOIN capped b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, round({cos_ab}, 4) AS sim
    FROM cand
    JOIN embeddings ea ON cand.a_id = ea.vec_id
    JOIN embeddings eb ON cand.b_id = eb.vec_id
    WHERE {cos_ab} >= 0.45
    """


def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 affine quantization round-trip quality (operators/similarity.py
    ::quantize_embeddings — 4x embedding storage reduction at 100 TB):
    per-vector max reconstruction error and cosine(original, dequantized).
    The codes are purely elementwise expressions (no sums), so both
    engines produce identical ints."""
    from importtoneo4j_spark.operators.similarity import (
        cosine,
        dequantize_embeddings,
        quantize_embeddings,
    )

    e = _load(spark, sf_dir, "embeddings")["embeddings"].filter(F.col("vec_id") < 20)
    deq = dequantize_embeddings(quantize_embeddings(e)).withColumnRenamed(
        "embedding", "demb"
    )
    j = e.join(deq, "vec_id")
    max_err = F.array_max(
        F.zip_with("embedding", "demb", lambda a, b: F.abs(a.cast("double") - b))
    )
    return j.select(
        "vec_id",
        F.round(max_err, 4).alias("max_err"),
        F.round(cosine(F.col("embedding"), F.col("demb")), 4).alias("cos_q"),
    )


def _sql_emb_quantize() -> str:
    cos_dd = _sql_cosine("embedding", "d")
    return f"""
    WITH src AS (
      SELECT vec_id, embedding,
             list_aggregate(embedding, 'min')::DOUBLE AS vmin,
             list_aggregate(embedding, 'max')::DOUBLE AS vmax
      FROM embeddings WHERE vec_id < 20
    ), qz AS (
      SELECT vec_id, embedding, vmin, vmax,
             [CASE WHEN vmax > vmin
                   THEN CAST(round((x::DOUBLE - vmin)/(vmax - vmin)*255, 0) AS INTEGER)
                   ELSE 0 END
              for x in embedding] AS q
      FROM src
    ), dq AS (
      SELECT vec_id, embedding,
             [vmin + qi::DOUBLE * (vmax - vmin) / 255 for qi in q] AS d
      FROM qz
    )
    SELECT vec_id,
           round(list_aggregate(
             [abs(d[i] - embedding[i]::DOUBLE)
              for i in generate_series(1, len(d))], 'max'), 4) AS max_err,
           round({cos_dd}, 4) AS cos_q
    FROM dq
    """


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups, fully oracle-checked: all 128 md5 bits feed the
    per-bit majority votes (md5 hex is identical in Spark and DuckDB), the
    blocking is four 32-bit bands (2^32 key space — no 2^16 bucket ceiling)
    with a drop_hot_buckets cap at 64 docs/bucket, and the 128-bit Hamming
    verification is reproducible in DuckDB SQL (generated in
    _sql_dedup_simhash). tests/ additionally verify the pairs against exact
    n-gram Jaccard and the planted-clone skew guard."""
    from importtoneo4j_spark.operators.dedup import simhash_near_dups

    d = _load(spark, sf_dir, "documents")["documents"]
    return simhash_near_dups(d, "doc_id", "text", max_hamming=8, max_bucket=64)


def _sql_dedup_simhash(max_hamming: int = 8, n: int = 3, max_bucket: int = 64) -> str:
    """Programmatically generated SimHash oracle: 128 vote columns, four
    32-bit band values, the hot-bucket cap and the Hamming sum are
    mechanical expansions of the same definitions the Spark operator uses
    (operators/dedup.py::simhash128 / simhash_near_dups). Bit convention:
    word w = bit // 32, words = md5 hex chars [9-16, 1-8, 17-24, 25-32]."""
    starts = [9, 1, 17, 25]
    words = ",\n             ".join(
        f"('0x' || substr(md5(t), {starts[w]}, 8))::BIGINT AS w{w}"
        for w in range(4)
    )
    votes = ",\n             ".join(
        f"SUM(CASE WHEN ((w{b // 32} >> {b % 32}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(128)
    )
    band_exprs = ", ".join(
        "'{b}|' || CAST(({terms}) AS VARCHAR)".format(
            b=b,
            terms=" + ".join(
                f"CASE WHEN v{b * 32 + i} > 0 THEN {1 << i} ELSE 0 END"
                for i in range(32)
            ),
        )
        for b in range(4)
    )
    # chunk the 128-term sum into parenthesized groups: DuckDB's binder
    # recurses per '+' in a left-associated chain and caps at depth 128
    terms = [
        f"CASE WHEN (va.v{b} > 0) <> (vb.v{b} > 0) THEN 1 ELSE 0 END"
        for b in range(128)
    ]
    hamming = " + ".join(
        "(" + " + ".join(terms[i : i + 16]) + ")" for i in range(0, 128, 16)
    )
    return rf"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                            for i in range(1, len(toks) - {n - 2})]) AS s
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= {n}
    ), h AS (
      SELECT doc_id,
             {words}
      FROM (SELECT doc_id, unnest(s) AS t FROM sh)
    ), votes AS (
      SELECT doc_id,
             {votes}
      FROM h GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, unnest([{band_exprs}]) AS band_key FROM votes
    ), hot AS (
      SELECT band_key FROM bands GROUP BY band_key HAVING count(*) > {max_bucket}
    ), capped AS (
      SELECT * FROM bands WHERE band_key NOT IN (SELECT band_key FROM hot)
    ), cand AS (
      SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
      FROM capped a JOIN capped b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, CAST({hamming} AS INTEGER) AS hamming
    FROM cand JOIN votes va ON a_id = va.doc_id
              JOIN votes vb ON b_id = vb.doc_id
    WHERE {hamming} <= {max_hamming}
    """


def text_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID (stopword markers), compared against the
    labeled lang column."""
    d = _load(spark, sf_dir, "documents")["documents"]
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    guess = (
        F.when(padded.like("% the %") | padded.like("% a %"), "en")
        .when(padded.like("% le %") | padded.like("% la %"), "fr")
        .when(padded.like("% der %") | padded.like("% und %"), "de")
        .when(padded.like("% el %") | padded.like("% los %"), "es")
        .otherwise("unk")
    )
    return d.groupBy(F.col("lang"), guess.alias("guessed")).agg(
        F.count("*").alias("n")
    )


def _sql_text_lang_guess() -> str:
    return """
    SELECT lang,
           CASE WHEN p LIKE '% the %' OR p LIKE '% a %' THEN 'en'
                WHEN p LIKE '% le %' OR p LIKE '% la %' THEN 'fr'
                WHEN p LIKE '% der %' OR p LIKE '% und %' THEN 'de'
                WHEN p LIKE '% el %' OR p LIKE '% los %' THEN 'es'
                ELSE 'unk' END AS guessed,
           count(*) AS n
    FROM (SELECT lang, ' ' || text || ' ' AS p FROM documents)
    GROUP BY 1, 2
    """


def c1_kv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-value metadata parsing (reference C1: ##SAMPLE k=v split,
    VariantDatabase.java:125-127): extract the numeric k from the props
    JSON-ish string with a regexp, aggregate per event_type."""
    e = _load(spark, sf_dir, "events")["events"]
    # try_cast: ANSI mode throws on the '' a non-matching regexp_extract
    # returns; NULL is also what the oracle's guarded CASE produces
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).try_cast("int")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("n_unparsed"),
    )


def _sql_c1() -> str:
    return r"""
    SELECT event_type, round(avg(k), 4) AS avg_k, max(k) AS max_k,
           count(*) FILTER (k IS NULL) AS n_unparsed
    FROM (SELECT event_type,
                 CASE WHEN regexp_extract(props, '"k":\s*(\d+)', 1) = ''
                      THEN NULL
                      ELSE CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)
                 END AS k
          FROM events)
    GROUP BY 1
    """


def a1_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (HashSet dedup A1 analog)."""
    e = _load(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def _sql_a1() -> str:
    return """
    SELECT event_type, count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY 1
    """


def o2_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — Spark
    percentile == DuckDB quantile_cont. The exact aggregator buffers every
    group value; the scale-safe default is o3_percentiles_approx
    (functions/stats.py docstring records the tradeoff)."""
    from importtoneo4j_spark.functions.stats import group_percentiles

    e = _load(spark, sf_dir, "events")["events"]
    return group_percentiles(e, "value", ["event_type"], exact=True)


def _sql_o2() -> str:
    return """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95
    FROM events GROUP BY 1
    """


def o3_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe percentiles: Greenwald-Khanna sketch, constant memory per
    group (VERDICT r3 #6). For groups under the accuracy parameter the
    sketch is exhaustive, so the result is the exact DISCRETE percentile —
    bit-equal to DuckDB quantile_disc, making this gate fully
    hash-checked, not tolerance-checked."""
    from importtoneo4j_spark.functions.stats import group_percentiles

    e = _load(spark, sf_dir, "events")["events"]
    return group_percentiles(e, "value", ["event_type"], exact=False)


def _sql_o3() -> str:
    return """
    SELECT event_type,
           round(quantile_disc(value, 0.5), 4) AS p50,
           round(quantile_disc(value, 0.95), 4) AS p95
    FROM events GROUP BY 1
    """


def a7_cube_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with coalesced group markers."""
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("ls"),
            "n",
            "sum_qty",
        )
    )


def _sql_a7() -> str:
    return """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """


def p1_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts by status x priority (conditional aggregation)."""
    o = _load(spark, sf_dir, "orders")["orders"]
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    alias = ["n_urgent", "n_high", "n_medium", "n_notspec", "n_low"]
    return o.groupBy("o_orderstatus").agg(
        *[
            F.count(F.when(F.col("o_orderpriority") == p, 1)).alias(a)
            for p, a in zip(pri, alias)
        ]
    )


def _sql_p1() -> str:
    return """
    SELECT o_orderstatus,
           count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
           count(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
           count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
           count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
           count(*) FILTER (o_orderpriority = '5-LOW') AS n_low
    FROM orders GROUP BY 1
    """


def t4_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream — the batch form
    of the Structured Streaming windowed agg (streaming/windows.py uses the
    same F.window operator): hourly event counts + value totals per type.
    Oracle: DuckDB time_bucket (both align windows to the epoch)."""
    e = _load(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "total_value"
        )
    )


def _sql_t4() -> str:
    return """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """


def s9_schema_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema registry as data (SURVEY §1.1): the declared type vocabulary —
    including reserved-but-uninstantiated entries, the reference's pattern
    of declaring 7 labels + 7 rel-types it never creates
    (VariantDatabase.java:33-65) — full-outer-joined with the observed
    labels/rel-types of a materialized graph. Dynamic rel-types
    (ORDERED_N/ORDERED_R here) surface as observed-but-undeclared rows.
    operators/registry.py::schema_registry over the kg_flagship triple set."""
    from importtoneo4j_spark.operators.registry import schema_registry

    flag = kg_flagship(spark, sf_dir).select("subj", "pred", "obj")
    nodes = (
        flag.select(
            F.col("subj").alias("entity_id"), F.array(F.lit("Customer")).alias("labels")
        )
        .unionByName(
            flag.select(
                F.col("obj").alias("entity_id"), F.array(F.lit("Part")).alias("labels")
            )
        )
        .distinct()
    )
    return schema_registry(
        nodes,
        flag,
        declared_labels=[
            ("Customer", "entity_id"),
            ("Part", "entity_id"),
            ("Document", "doc_id"),  # reserved, never instantiated
        ],
        declared_rels=["ORDERED_A", "SAME_AS"],  # SAME_AS reserved
    )


def _sql_s9() -> str:
    return """
    WITH triples AS (
      SELECT DISTINCT c_name AS subj,
             'ORDERED_' || upper(l_returnflag) AS pred,
             p_name AS obj
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part     ON l_partkey = p_partkey
    ), obs AS (
      SELECT 'rel_type' AS kind, pred AS name, count(*) AS n
      FROM triples GROUP BY 2
      UNION ALL
      SELECT 'node_label', 'Customer', count(DISTINCT subj) FROM triples
      UNION ALL
      SELECT 'node_label', 'Part', count(DISTINCT obj) FROM triples
    ), decl(kind, name, key_constraint) AS (
      VALUES ('node_label', 'Customer', 'entity_id'),
             ('node_label', 'Part', 'entity_id'),
             ('node_label', 'Document', 'doc_id'),
             ('rel_type', 'ORDERED_A', CAST(NULL AS VARCHAR)),
             ('rel_type', 'SAME_AS', CAST(NULL AS VARCHAR))
    )
    SELECT coalesce(d.kind, o.kind) AS kind,
           coalesce(d.name, o.name) AS name,
           d.key_constraint,
           d.name IS NOT NULL AS declared,
           o.name IS NOT NULL AS instantiated,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_instances
    FROM decl d FULL OUTER JOIN obs o ON d.kind = o.kind AND d.name = o.name
    """


def g3_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the customer/supplier/part graph
    (operators/graph.py::pagerank — one edge-rank join + one partial-
    aggregating groupBy per iteration, rank vector checkpointed). Oracle:
    the same three iterations unrolled as chained DuckDB CTEs; the
    simplified dangling-mass semantics are identical on both sides."""
    from importtoneo4j_spark.operators.graph import pagerank

    t = _load(spark, sf_dir, "orders", "lineitem")
    ordered = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    supplies = (
        t["lineitem"]
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    pr = pagerank(ordered.unionByName(supplies), iters=3)
    # per-mille rank with the driver-proven round(x, 4) convention (every
    # float gate uses it): raw ranks sit at ~1e-4, where round(_, 6) keeps
    # too few digits and deviates from the established pattern
    return pr.select(
        "entity_id", F.round(F.col("rank") * 1000, 4).alias("rank_pm")
    )


def _sql_g3(iters: int = 3, damping: float = 0.85) -> str:
    prev = "r0"
    iter_ctes = []
    for k in range(1, iters + 1):
        iter_ctes.append(
            f"""r{k} AS (
      SELECT nd.id,
             {1 - damping}/(SELECT n FROM meta)
             + {damping}*COALESCE(c.inflow, 0) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst AS id, SUM(r.rank/o.odeg) AS inflow
        FROM e JOIN {prev} r ON e.src = r.id
               JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst) c USING (id)
    )"""
        )
        prev = f"r{k}"
    chain = ", ".join(iter_ctes)
    return f"""
    WITH e AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                      'P' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR),
                      'P' || CAST(l_partkey AS VARCHAR)
      FROM lineitem
    ), nodes AS (
      SELECT src AS id FROM e UNION SELECT dst FROM e
    ), meta AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
    ), outdeg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS odeg FROM e GROUP BY src
    ), r0 AS (
      SELECT id, 1.0/(SELECT n FROM meta) AS rank FROM nodes
    ), {chain}
    SELECT id AS entity_id, round(rank * 1000, 4) AS rank_pm FROM {prev}
    """


def g11_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from two supplier seeds over the same
    customer/supplier/part graph as g3 (operators/graph.py::
    personalized_pagerank — teleport mass restricted to the seed set; the
    seed-relatedness query). Oracle: three unrolled CTEs with the
    (1-d)*p(v) teleport term; zero-rank nodes are part of the result (the
    frame is total over vertices, like g3)."""
    from importtoneo4j_spark.operators.graph import personalized_pagerank

    t = _load(spark, sf_dir, "orders", "lineitem")
    ordered = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    supplies = (
        t["lineitem"]
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    fwd = ordered.unionByName(supplies)
    und = fwd.unionByName(
        fwd.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
    )
    srcs = spark.createDataFrame([("S1",), ("S2",)], "id string")
    out = personalized_pagerank(und, srcs, iters=3)
    return out.select("entity_id", F.round(F.col("rank") * 1000, 4).alias("rank_pm"))


def _sql_g11(iters: int = 3, damping: float = 0.85) -> str:
    prev = "r0"
    iter_ctes = []
    for k in range(1, iters + 1):
        iter_ctes.append(
            f"""r{k} AS (
      SELECT nd.id, nd.p,
             {1 - damping}*nd.p + {damping}*COALESCE(c.inflow, 0) AS rank
      FROM p nd LEFT JOIN (
        SELECT e.dst AS id, SUM(r.rank/o.odeg) AS inflow
        FROM e JOIN {prev} r ON e.src = r.id
               JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst) c USING (id)
    )"""
        )
        prev = f"r{k}"
    chain = ", ".join(iter_ctes)
    return f"""
    WITH base AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                      'P' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR),
                      'P' || CAST(l_partkey AS VARCHAR)
      FROM lineitem
    ), e AS (
      SELECT src, dst FROM base UNION ALL SELECT dst, src FROM base
    ), nodes AS (
      SELECT src AS id FROM e UNION SELECT dst FROM e
    ), s(id) AS (VALUES ('S1'), ('S2')), smeta AS (
      SELECT CAST(count(*) AS DOUBLE) AS ns FROM s
    ), p AS (
      SELECT nodes.id,
             CASE WHEN s.id IS NOT NULL
                  THEN 1.0/(SELECT ns FROM smeta) ELSE 0.0 END AS p
      FROM nodes LEFT JOIN s ON nodes.id = s.id
    ), outdeg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS odeg FROM e GROUP BY src
    ), r0 AS (
      SELECT id, p, p AS rank FROM p
    ), {chain}
    SELECT id AS entity_id, round(rank * 1000, 4) AS rank_pm FROM {prev}
    """


def g4_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count of the part co-purchase graph (parts sharing
    an order). The Spark plan uses the degree-ordered orientation
    (operators/graph.py::triangle_count — wedge fan-out bounded by the
    arboricity, hub-safe at scale); the oracle counts by plain id
    ordering. The total is orientation-invariant, so the gate hash-matches
    while verifying the scale-shaped plan."""
    from importtoneo4j_spark.operators.graph import triangle_count

    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("x"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("y"))
    edges = (
        a.join(b, "ok").filter(F.col("x") < F.col("y")).select("x", "y").distinct()
    )
    return triangle_count(edges, src="x", dst="y")


def _sql_g4() -> str:
    return """
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT count(*) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.y = e2.x
              JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    """


def t5_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 10-minute windows every 5
    minutes, so each event lands in exactly two windows — the overlapping
    twin of t4's tumbling window (streaming form: the same F.window
    operator under a watermark). Oracle: each event's two candidate
    window starts are time_bucket(5m, ts) and that minus 5m (UNION ALL),
    which is exactly Spark's epoch-aligned window assignment."""
    e = _load(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "total_value"
        )
    )


def _sql_t5() -> str:
    return """
    WITH assigned AS (
      SELECT time_bucket(INTERVAL 5 MINUTES, ts) AS win_start,
             event_type, value
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 5 MINUTES, ts) - INTERVAL 5 MINUTES,
             event_type, value
      FROM events
    )
    SELECT win_start, event_type, count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM assigned GROUP BY 1, 2
    """


def u4_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping (df.unpivot / melt) then re-aggregation:
    three lineitem measures become (measure, val) rows — the inverse of
    p1's pivot. Oracle: the UNION ALL expansion DuckDB's UNPIVOT
    desugars to."""
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"), F.round(F.sum("val"), 4).alias("total")
    )


def _sql_u4() -> str:
    return """
    WITH long AS (
      SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, measure, count(*) AS n, round(sum(val), 4) AS total
    FROM long GROUP BY 1, 2
    """


def o4_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group: Pearson correlation, sample
    stddev and sample covariance — single-pass partial-aggregating
    co-moment aggregates on both engines."""
    e = _load(spark, sf_dir, "events")["events"]
    return e.groupBy("event_type").agg(
        F.round(F.corr("value", "user_id"), 4).alias("corr_vu"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.covar_samp("value", "user_id"), 4).alias("cov_vu"),
    )


def _sql_o4() -> str:
    return """
    SELECT event_type,
           round(corr(value, user_id), 4) AS corr_vu,
           round(stddev_samp(value), 4) AS sd_value,
           round(covar_samp(value, user_id), 4) AS cov_vu
    FROM events GROUP BY 1
    """


def g5_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS shortest hop distance (3 hops) from two supplier
    nodes over the undirected customer/supplier/part graph
    (operators/graph.py::bfs_distances — level-synchronous frontier
    expansion, checkpointed per hop). Oracle: the bounded recursive CTE
    formulation; min(dist) over the walk == BFS distance."""
    from importtoneo4j_spark.operators.graph import bfs_distances

    t = _load(spark, sf_dir, "orders", "lineitem")
    ordered = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    supplies = (
        t["lineitem"]
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    fwd = ordered.unionByName(supplies)
    und = fwd.unionByName(
        fwd.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
    )
    srcs = spark.createDataFrame([("S1",), ("S2",)], "id string")
    out = bfs_distances(und, srcs, max_hops=3)
    return out.select("id", F.col("dist").cast("int").alias("dist"))


def _sql_g5() -> str:
    return """
    WITH RECURSIVE base AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                      'P' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR),
                      'P' || CAST(l_partkey AS VARCHAR)
      FROM lineitem
    ), e AS (
      SELECT src, dst FROM base UNION SELECT dst, src FROM base
    ), walk(id, dist) AS (
      SELECT id, 0 FROM (VALUES ('S1'), ('S2')) s(id)
      UNION
      SELECT e.dst, walk.dist + 1
      FROM walk JOIN e ON e.src = walk.id
      WHERE walk.dist < 3
    )
    SELECT id, CAST(min(dist) AS INTEGER) AS dist FROM walk GROUP BY id
    """


def g7_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman-Ford weighted shortest paths (4 relax rounds) from
    two customer nodes over the bidirectional customer<->supplier graph,
    integer edge weights = min lineitem quantity on the relation
    (operators/graph.py::shortest_paths — one relax join + one min
    groupBy per round; integer sums stay exact across engines). Oracle:
    the same 4 relaxations as unrolled CTEs — min-plus semiring, no path
    enumeration (a recursive-CTE walk would enumerate deg^4 paths)."""
    from importtoneo4j_spark.operators.graph import shortest_paths

    t = _load(spark, sf_dir, "orders", "lineitem")
    fwd = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("obj"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("subj", "obj")
        .agg(F.min("w").alias("w"))
    )
    edges = fwd.unionByName(
        fwd.select(
            F.col("obj").alias("subj"), F.col("subj").alias("obj"), F.col("w")
        )
    )
    srcs = spark.createDataFrame([("C1",), ("C2",)], "id string")
    out = shortest_paths(edges, srcs, weight="w", max_iters=4)
    return out.select("id", F.col("dist").cast("long").alias("dist"))


def _sql_g7() -> str:
    relax = """
      SELECT id, min(dist) AS dist FROM (
        SELECT id, dist FROM {prev}
        UNION ALL
        SELECT e.dst AS id, {prev}.dist + e.w AS dist
        FROM {prev} JOIN e ON e.src = {prev}.id
      ) GROUP BY id"""
    ctes = ", ".join(
        f"d{i + 1} AS ({relax.format(prev=f'd{i}')})" for i in range(4)
    )
    return f"""
    WITH base AS (
      SELECT 'C' || CAST(o_custkey AS VARCHAR) AS src,
             'S' || CAST(l_suppkey AS VARCHAR) AS dst,
             min(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), e AS (
      SELECT src, dst, w FROM base
      UNION ALL
      SELECT dst, src, w FROM base
    ), d0 AS (
      SELECT id, CAST(0 AS BIGINT) AS dist FROM (VALUES ('C1'), ('C2')) s(id)
    ), {ctes}
    SELECT id, CAST(dist AS BIGINT) AS dist FROM d4
    """


def g8_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbour link prediction over the bipartite customer-part
    graph (custkey < 100): customer pairs sharing >= 2 parts, scored by
    shared count and neighbourhood Jaccard (operators/graph.py::
    link_prediction_common_neighbors — wedge join through the shared
    neighbour + one partial-agg groupBy, the KG-completion primitive).
    Gate keeps the customer-customer side; the oracle mirrors the wedge
    self-join, degree table and Jaccard exactly (integer counts, one
    rounded double)."""
    from importtoneo4j_spark.operators.graph import (
        link_prediction_common_neighbors,
    )

    t = _load(spark, sf_dir, "orders", "lineitem")
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_custkey") < 100)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    out = link_prediction_common_neighbors(edges, min_common=2)
    # the gate's jaccard is an INTEGER-division-scaled rational instead of
    # round(double, 4): Spark rounds the shortest-decimal repr (BigDecimal
    # HALF_UP) while DuckDB rounds the binary-scaled value, and
    # exactly-half ratios like 278/1600 split between 0.1737 and 0.1738 —
    # (n_common * 10000) div n_union is bit-identical in both engines for
    # any degree (code-review round 5, empirically probed divergence)
    scaled = F.expr("(n_common * 10000) div n_union")
    return (
        out.filter(F.col("a").startswith("C"))
        .select(
            "a",
            "b",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_union").cast("long").alias("n_union"),
            (scaled.cast("double") / 10000.0).alias("jaccard"),
        )
    )


def _sql_g8() -> str:
    return """
    WITH cp AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS u,
                      'P' || CAST(l_partkey AS VARCHAR) AS v
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_custkey < 100
    ), und AS (
      SELECT u, v FROM cp UNION SELECT v, u FROM cp
    ), deg AS (
      SELECT u, count(*) AS deg FROM und GROUP BY u
    ), cand AS (
      SELECT a.u AS a, b.u AS b, count(*) AS n_common
      FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT cand.a, cand.b, CAST(n_common AS BIGINT) AS n_common,
           CAST(da.deg + db.deg - n_common AS BIGINT) AS n_union,
           ((n_common * 10000) // (da.deg + db.deg - n_common)) / 10000.0
             AS jaccard
    FROM cand
    JOIN deg da ON cand.a = da.u
    JOIN deg db ON cand.b = db.u
    WHERE cand.a LIKE 'C%'
      AND NOT EXISTS (SELECT 1 FROM und WHERE und.u = cand.a AND und.v = cand.b)
    """


def g9_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (k=8, 3 rounds) over the bipartite
    customer-part graph, custkey < 300 (operators/graph.py::k_core — one
    degree groupBy + two semi-joins per round; the density filter before
    expensive per-node work). This graph genuinely peels: 765 -> 725 ->
    646 survivors at sf0.01. Oracle: three unrolled peel CTEs, final
    degrees over the induced subgraph."""
    from importtoneo4j_spark.operators.graph import k_core

    t = _load(spark, sf_dir, "orders", "lineitem")
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_custkey") < 300)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    out = k_core(edges, k=8, rounds=3)
    return out.select("id", F.col("deg").cast("long").alias("deg"))


def _sql_g9() -> str:
    peel = """
    v{i} AS (
      SELECT u FROM (SELECT u, count(*) c FROM e{p} GROUP BY u) WHERE c >= 8
    ), e{i} AS (
      SELECT e{p}.u, e{p}.v FROM e{p}
      JOIN v{i} a ON e{p}.u = a.u JOIN v{i} b ON e{p}.v = b.u
    )"""
    ctes = ",".join(peel.format(i=i + 1, p=i) for i in range(3))
    return f"""
    WITH cp AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS a,
                      'P' || CAST(l_partkey AS VARCHAR) AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_custkey < 300
    ), e0 AS (
      SELECT a AS u, b AS v FROM cp UNION SELECT b, a FROM cp
    ), {ctes}
    SELECT u AS id, CAST(count(*) AS BIGINT) AS deg FROM e3 GROUP BY u
    """


def g10_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of unnormalized HITS over the directed customer->supplier
    graph, custkey < 300 (operators/graph.py::hits — hub_0 = 1 keeps every
    score an exact int64, so the fixed-iteration run is bit-identical
    across engines; normalization is a presentation-level rescale).
    Oracle: the two rounds as unrolled CTEs with left-join/coalesce for
    zero-score nodes."""
    from importtoneo4j_spark.operators.graph import hits

    t = _load(spark, sf_dir, "orders", "lineitem")
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_custkey") < 300)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    out = hits(edges, iters=2)
    return out.select(
        "entity_id",
        F.col("auth").cast("long").alias("auth"),
        F.col("hub").cast("long").alias("hub"),
    )


def _sql_g10() -> str:
    return """
    WITH base AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                      'S' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_custkey < 300
    ), nodes AS (
      SELECT src AS id FROM base UNION SELECT dst FROM base
    ), a1 AS (
      SELECT n.id, coalesce(s.a, 0) AS a FROM nodes n
      LEFT JOIN (SELECT dst AS id, count(*) AS a FROM base GROUP BY 1) s
        USING (id)
    ), h1 AS (
      SELECT n.id, coalesce(s.h, 0) AS h FROM nodes n
      LEFT JOIN (SELECT base.src AS id, sum(a1.a) AS h
                 FROM base JOIN a1 ON base.dst = a1.id GROUP BY 1) s
        USING (id)
    ), a2 AS (
      SELECT n.id, coalesce(s.a, 0) AS a FROM nodes n
      LEFT JOIN (SELECT base.dst AS id, sum(h1.h) AS a
                 FROM base JOIN h1 ON base.src = h1.id GROUP BY 1) s
        USING (id)
    ), h2 AS (
      SELECT n.id, coalesce(s.h, 0) AS h FROM nodes n
      LEFT JOIN (SELECT base.src AS id, sum(a2.a) AS h
                 FROM base JOIN a2 ON base.dst = a2.id GROUP BY 1) s
        USING (id)
    )
    SELECT a2.id AS entity_id, CAST(a2.a AS BIGINT) AS auth,
           CAST(h2.h AS BIGINT) AS hub
    FROM a2 JOIN h2 ON a2.id = h2.id
    """


def g6_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of deterministic synchronous label propagation over the
    undirected customer/supplier/part graph (operators/graph.py::
    label_propagation — min-struct argmax per node, never a window over
    neighbour lists). Oracle: the same two rounds unrolled as CTEs with a
    row_number argmax (count desc, label asc)."""
    from importtoneo4j_spark.operators.graph import label_propagation

    t = _load(spark, sf_dir, "orders", "lineitem")
    ordered = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    supplies = (
        t["lineitem"]
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("subj"),
            F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("obj"),
        )
        .distinct()
    )
    return label_propagation(ordered.unionByName(supplies), iters=2)


def _sql_g6(iters: int = 2) -> str:
    prev = "l0"
    chain = []
    for k in range(1, iters + 1):
        chain.append(
            f"""c{k} AS (
      SELECT und.u AS id, l.community, count(*) AS cnt
      FROM und JOIN {prev} l ON und.v = l.id
      GROUP BY 1, 2
    ), b{k} AS (
      SELECT id, community FROM (
        SELECT id, community,
               row_number() OVER (PARTITION BY id
                                  ORDER BY cnt DESC, community) AS rn
        FROM c{k})
      WHERE rn = 1
    ), l{k} AS (
      SELECT {prev}.id, COALESCE(b{k}.community, {prev}.community) AS community
      FROM {prev} LEFT JOIN b{k} USING (id)
    )"""
        )
        prev = f"l{k}"
    ctes = ", ".join(chain)
    return f"""
    WITH base AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                      'P' || CAST(l_partkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR),
                      'P' || CAST(l_partkey AS VARCHAR)
      FROM lineitem
    ), und AS (
      SELECT u, v FROM (
        SELECT src AS u, dst AS v FROM base
        UNION
        SELECT dst, src FROM base)
      WHERE u <> v
    ), l0 AS (
      SELECT DISTINCT u AS id, u AS community FROM und
    ), {ctes}
    SELECT id AS entity_id, community FROM {prev}
    """


def t6_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval containment join via the bin-equi-join plan
    (operators/temporal.py::point_in_interval_join — a raw inequality
    join would execute as a broadcast nested loop in Spark): events
    falling inside each early user's 2-hour activity window. Oracle: the
    plain inequality join DuckDB executes natively as a range join."""
    from importtoneo4j_spark.operators.temporal import point_in_interval_join

    e = _load(spark, sf_dir, "events")["events"]
    intervals = (
        e.filter(F.col("user_id") < 50)
        .groupBy(F.col("user_id").alias("owner"))
        .agg(
            F.min("ts").alias("w_start"),
            (F.min("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end"),
        )
    )
    pts = e.select("ts", "value")
    joined = point_in_interval_join(
        pts, intervals, ts_col="ts", start_col="w_start", end_col="w_end"
    )
    return joined.groupBy("owner").agg(
        F.count("*").alias("n_in"),
        F.round(F.sum("value"), 4).alias("total"),
    )


def _sql_t6() -> str:
    return """
    WITH iv AS (
      SELECT user_id AS owner, min(ts) AS s,
             min(ts) + INTERVAL 2 HOUR AS e
      FROM events WHERE user_id < 50 GROUP BY user_id
    )
    SELECT owner, count(*) AS n_in, round(sum(value), 4) AS total
    FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts < iv.e
    GROUP BY 1
    """


def ssj_bounded_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded stream-stream correlation, run through the SAME
    operator the streaming path uses (streaming/joins.py::
    stream_stream_join — the join condition's time bound is what makes the
    streaming state store expirable; on static frames the identical
    expression is a plain batch join): purchases within one hour after
    each click by the same user. Gated here (VERDICT r4 next #5) so the
    driver's DuckDB oracle verifies the operator's join semantics, not
    just the batch-parity unit test."""
    from importtoneo4j_spark.streaming.joins import (
        stream_stream_join,
        with_right_prefix,
    )

    e = _load(spark, sf_dir, "events")["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = with_right_prefix(
        e.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts"
        ),
        "user_id",
    )
    joined = stream_stream_join(
        clicks, purchases, key="user_id", within="1 hour"
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("r_event_id").alias("purch_id"),
        F.col("ts").alias("click_ts"),
        F.col("r_ts").alias("purch_ts"),
    )


def _sql_ssj() -> str:
    return """
    SELECT l.user_id, l.event_id AS click_id, r.event_id AS purch_id,
           l.ts AS click_ts, r.ts AS purch_ts
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    WHERE l.event_type = 'click' AND r.event_type = 'purchase'
    """


def w4_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window — the expression
    streaming/windows.py::session_window_stream runs under a watermark;
    identical semantics on a static frame): per-user sessions closed after
    a 30-minute quiet period. The window is [first_ts, last_ts + gap); a
    new session starts only when the quiet period EXCEEDS the gap — a
    pair of events exactly 30 minutes apart shares one session
    (empirically verified on Spark 4.1.2: gaps of 1800 s merge, 1801 s
    split; the oracle's lag test uses strict '>'). Gated (VERDICT r4
    next #5) so the session-merge semantics are oracle-verified, not just
    parity-tested."""
    e = _load(spark, sf_dir, "events")["events"]
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("sess_start"),
            F.col("win.end").alias("sess_end"),
            "n_events",
        )
    )


def _sql_w4() -> str:
    return """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), grouped AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, min(ts) AS sess_start,
           max(ts) + INTERVAL 30 MINUTE AS sess_end,
           count(*) AS n_events
    FROM grouped GROUP BY user_id, sid
    """


def s10_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (operators/sampling.py):
    md5-bucket thresholds — stable across runs, engines and corpus growth,
    unlike rand(). md5 parity between Spark and DuckDB makes per-document
    assignment (not just the split sizes) hash-checkable."""
    from importtoneo4j_spark.operators.sampling import hash_split

    d = _load(spark, sf_dir, "documents")["documents"]
    split = hash_split(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return split.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
    )


def _sql_s10() -> str:
    return """
    WITH b AS (
      SELECT lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % 10000 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs
    FROM b GROUP BY 1
    """


def txt_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (functions/text.py::tf_idf —
    two partial-aggregating groupBys + a broadcast 1-row corpus size).
    Ranking uses the ROUNDED score then the term, so the order is
    identical across engines despite last-ulp float differences."""
    from importtoneo4j_spark.functions.text import tf_idf

    d = _load(spark, sf_dir, "documents")["documents"]
    scored = tf_idf(d).withColumn("tfidf_r", F.round("tfidf", 4))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_r").desc(), F.col("term").asc()
    )
    return (
        scored.filter(F.col("doc_id") < 20)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", F.col("tfidf_r").alias("tfidf"), "rank")
    )


def _sql_txt_tfidf() -> str:
    return r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
      GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), n AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 4) AS tfidf
      FROM tf JOIN dfreq USING (term), n
    )
    SELECT doc_id, term, tf, tfidf, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rank
          FROM scored WHERE doc_id < 20)
    WHERE rank <= 3
    """


def w3_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-frame window: 7-row moving average over the daily revenue
    series per returnflag (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW on a
    unique date ordering, so the frame is deterministic). The daily
    aggregate is rounded BEFORE the moving average so both engines
    average identical inputs."""
    li = _load(spark, sf_dir, "lineitem")["lineitem"]
    daily = li.groupBy(
        F.col("l_returnflag").alias("rf"),
        F.to_date("l_shipdate").alias("d"),
    ).agg(F.round(F.sum("l_extendedprice"), 4).alias("rev"))
    w = (
        Window.partitionBy("rf")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "rf", "d", "rev", F.round(F.avg("rev").over(w), 4).alias("mavg7")
    )


def _sql_w3() -> str:
    return """
    WITH daily AS (
      SELECT l_returnflag AS rf, CAST(l_shipdate AS DATE) AS d,
             round(sum(l_extendedprice), 4) AS rev
      FROM lineitem GROUP BY 1, 2
    )
    SELECT rf, d, rev,
           round(avg(rev) OVER (PARTITION BY rf ORDER BY d
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                 4) AS mavg7
    FROM daily
    """


def c12_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (the scalar the entity-linking family
    verifies candidates with when token Jaccard is too coarse): nation
    name pairs within levenshtein <= 4. Both engines implement the same
    Wagner-Fischer distance."""
    n = _load(spark, sf_dir, "nation")["nation"]
    a = n.select(F.col("n_name").alias("n1"))
    b = n.select(F.col("n_name").alias("n2"))
    return (
        a.join(b, F.col("n1") < F.col("n2"))
        .withColumn("dist", F.levenshtein("n1", "n2"))
        .filter(F.col("dist") <= 4)
        .select("n1", "n2", "dist")
    )


def _sql_c12() -> str:
    return """
    SELECT a.n_name AS n1, b.n_name AS n2,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    """


def c13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JSON path extraction (get_json_object — the reference parses
    its k=v INFO fields by hand, VariantDatabase.java:125-127; a modern
    corpus carries JSON): numeric field stats per event_type."""
    e = _load(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").try_cast("int")
    return e.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_parsed"),
    )


def _sql_c13() -> str:
    return """
    SELECT event_type,
           CAST(sum(TRY_CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
           min(TRY_CAST(props->>'$.k' AS INTEGER)) AS min_k,
           count(*) FILTER (TRY_CAST(props->>'$.k' AS INTEGER) IS NOT NULL)
             AS n_parsed
    FROM events GROUP BY 1
    """


def u5_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators proper (completing §2.7 beyond union/anti-join):
    customers appearing in BOTH high-value and recent order branches
    (INTERSECT) and high-value-only customers (EXCEPT), tagged and
    unioned."""
    o = _load(spark, sf_dir, "orders")["orders"]
    high = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    recent = o.filter(F.col("o_orderdate") >= "2024-01-01").select("o_custkey")
    both = high.intersect(recent).withColumn("tag", F.lit("both"))
    # plain EXCEPT (set semantics): a customer present in both branches is
    # never tagged high_only, regardless of per-branch multiplicities —
    # exceptAll().distinct() leaked customers with more high-value than
    # recent orders into both tags (ADVICE r4)
    only_high = high.subtract(recent).withColumn("tag", F.lit("high_only"))
    return (
        both.unionByName(only_high)
        .groupBy("tag")
        .agg(F.count("*").alias("n_customers"))
    )


def _sql_u5() -> str:
    return """
    WITH high AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
    recent AS (SELECT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '2024-01-01'),
    both_t AS (SELECT o_custkey, 'both' AS tag
               FROM (SELECT o_custkey FROM high
                     INTERSECT SELECT o_custkey FROM recent)),
    only_t AS (SELECT o_custkey, 'high_only' AS tag
               FROM (SELECT o_custkey FROM high
                     EXCEPT SELECT o_custkey FROM recent))
    SELECT tag, count(*) AS n_customers
    FROM (SELECT * FROM both_t UNION ALL SELECT * FROM only_t)
    GROUP BY 1
    """


def c14_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regexp extraction (regexp_extract_all — the fan-out
    scalar the extraction UDF vectorizes; here the native JVM form):
    all digit runs per props string, aggregated per event_type."""
    e = _load(spark, sf_dir, "events")["events"]
    nums = F.expr(r"regexp_extract_all(props, '(\\d+)', 1)")
    return e.select("event_type", nums.alias("nums")).groupBy("event_type").agg(
        F.sum(F.size("nums")).cast("bigint").alias("n_matches"),
        F.sum(
            F.aggregate(
                F.transform("nums", lambda s: s.cast("long")),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
        ).cast("bigint").alias("sum_nums"),
    )


def _sql_c14() -> str:
    return r"""
    SELECT event_type,
           CAST(sum(len(nums)) AS BIGINT) AS n_matches,
           CAST(sum(list_sum([n::BIGINT for n in nums])) AS BIGINT) AS sum_nums
    FROM (SELECT event_type, regexp_extract_all(props, '(\d+)', 1) AS nums
          FROM events)
    GROUP BY 1
    """


def c15_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (filter / exists / transform) over the
    embedding vectors: per-vector count of positive components, whether
    any component exceeds 2, and the clipped-positive sum."""
    e = _load(spark, sf_dir, "embeddings")["embeddings"].filter(F.col("vec_id") < 50)
    vec = F.col("embedding")
    pos = F.filter(vec, lambda x: x > 0)
    return e.select(
        "vec_id",
        F.size(pos).alias("n_pos"),
        F.exists(vec, lambda x: x > 2).alias("has_gt2"),
        F.round(
            F.aggregate(
                F.transform(pos, lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            4,
        ).alias("pos_sum"),
    )


def _sql_c15() -> str:
    return """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           CAST(len(list_filter(embedding, x -> x > 2)) > 0 AS BOOLEAN) AS has_gt2,
           round(coalesce(list_sum([x::DOUBLE
                  for x in list_filter(embedding, x -> x > 0)]), 0.0), 4)
             AS pos_sum
    FROM embeddings WHERE vec_id < 50
    """


# ---------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return kg_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering is deliberate (gate rotation, VERDICT r5 #2): the driver
    # harness samples gates in dict order with a cap (~the FIRST 50), so the
    # keys least recently driver-verified come first. Round 6 rotation: the
    # 26 gates NOT in the r5 sample (all green in the r4 artifact and in the
    # local 76-gate oracle suite) lead, followed by the r5-verified fifty in
    # their prior relative order. Every gate thus has a driver-verified
    # artifact within two consecutive rounds.
    return {
        "g3_pagerank": g3_pagerank,
        "g4_triangles": g4_triangles,
        "s9_schema_catalog": s9_schema_catalog,
        "t3_asof_join": t3_asof_join,
        "t4_tumbling_window": t4_tumbling_window,
        "t5_hopping_window": t5_hopping_window,
        "t6_interval_join": t6_interval_join,
        "s10_hash_split": s10_hash_split,
        "txt_tfidf_top_terms": txt_tfidf_top_terms,
        "a3_label_union": a3_label_union,
        "a6_guarded_ratio": a6_guarded_ratio,
        "u2_anti_join_delta": u2_anti_join_delta,
        "u3_union_branches": u3_union_branches,
        "u4_unpivot": u4_unpivot,
        "c14_regexp_extract_all": c14_regexp_extract_all,
        "c15_array_hof": c15_array_hof,
        "w1_stable_order_topk": w1_stable_order_topk,
        "w2_sessionize": w2_sessionize,
        "w3_moving_avg": w3_moving_avg,
        "c12_edit_distance": c12_edit_distance,
        "text_token_stats": text_token_stats,
        "text_bpe_tokens": text_bpe_tokens,
        "text_quality_score": text_quality_score,
        "text_fingerprint": text_fingerprint,
        "dedup_exact": dedup_exact,
        "contamination_exact": contamination_exact,
        "emb_quantize": emb_quantize,
        "o3_percentiles_approx": o3_percentiles_approx,
        "o4_corr_stats": o4_corr_stats,
        "dedup_simhash": dedup_simhash,
        "text_repetition": text_repetition,
        "ann_cosine_topk": ann_cosine_topk,
        "ann_ivf_topk": ann_ivf_topk,
        "emb_near_dups": emb_near_dups,
        "text_lang_guess": text_lang_guess,
        "c1_kv_parse": c1_kv_parse,
        "a1_distinct_users": a1_distinct_users,
        "o2_percentiles": o2_percentiles,
        "a7_cube_totals": a7_cube_totals,
        "p1_pivot_status_priority": p1_pivot_status_priority,
        "ssj_bounded_join": ssj_bounded_join,
        "w4_session_window": w4_session_window,
        "ann_ivf_quantized": ann_ivf_quantized,
        "emb_near_dups_multiprobe": emb_near_dups_multiprobe,
        "g7_weighted_sssp": g7_weighted_sssp,
        "g8_link_prediction": g8_link_prediction,
        "g9_kcore": g9_kcore,
        "g10_hits": g10_hits,
        "text_unigram_logprob": text_unigram_logprob,
        "o5_histogram": o5_histogram,
        "o6_profile": o6_profile,
        "g11_personalized_pagerank": g11_personalized_pagerank,
        "u5_intersect_except": u5_intersect_except,
        "c13_json_extract": c13_json_extract,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_clusters": dedup_clusters,
        "contamination_check": contamination_check,
        "g5_bfs_distances": g5_bfs_distances,
        "g6_label_propagation": g6_label_propagation,
        "kg_flagship": kg_flagship,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_unshipped_revenue": q3_unshipped_revenue,
        "q5_nation_revenue": q5_nation_revenue,
        "q6_forecast_revenue": q6_forecast_revenue,
        "c2_composite_key": c2_composite_key,
        "c8_dynamic_rel_type": c8_dynamic_rel_type,
        "c9_total_classification": c9_total_classification,
        "j3_edge_dedup": j3_edge_dedup,
        "j7_first_wins_merge": j7_first_wins_merge,
        "j1_enrich_lookup": j1_enrich_lookup,
        "j4_one_hop_traversal": j4_one_hop_traversal,
        "f9_label_scan": f9_label_scan,
        "g1_degree": g1_degree,
        "j5_traversal_theta": j5_traversal_theta,
        "g2_two_hop": g2_two_hop,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_flagship": _sql_kg_flagship(),
        "q1_pricing_summary": _sql_q1(),
        "q3_unshipped_revenue": _sql_q3(),
        "q5_nation_revenue": _sql_q5(),
        "q6_forecast_revenue": _sql_q6(),
        "c2_composite_key": _sql_c2(),
        "c8_dynamic_rel_type": _sql_c8(),
        "c9_total_classification": _sql_c9(),
        "j3_edge_dedup": _sql_j3(),
        "j7_first_wins_merge": _sql_j7(),
        "j1_enrich_lookup": _sql_j1_enrich(),
        "j4_one_hop_traversal": _sql_j4(),
        "f9_label_scan": _sql_f9(),
        "g1_degree": _sql_g1(),
        "j5_traversal_theta": _sql_j5(),
        "g2_two_hop": _sql_g2(),
        "g3_pagerank": _sql_g3(),
        "g4_triangles": _sql_g4(),
        "s9_schema_catalog": _sql_s9(),
        "t3_asof_join": _sql_t3(),
        "t4_tumbling_window": _sql_t4(),
        "t5_hopping_window": _sql_t5(),
        "g5_bfs_distances": _sql_g5(),
        "g6_label_propagation": _sql_g6(),
        "t6_interval_join": _sql_t6(),
        "s10_hash_split": _sql_s10(),
        "txt_tfidf_top_terms": _sql_txt_tfidf(),
        "a3_label_union": _sql_a3(),
        "a6_guarded_ratio": _sql_a6(),
        "u2_anti_join_delta": _sql_u2(),
        "u3_union_branches": _sql_u3(),
        "u4_unpivot": _sql_u4(),
        "u5_intersect_except": _sql_u5(),
        "c14_regexp_extract_all": _sql_c14(),
        "c15_array_hof": _sql_c15(),
        "w1_stable_order_topk": _sql_w1(),
        "w2_sessionize": _sql_w2(),
        "w3_moving_avg": _sql_w3(),
        "c12_edit_distance": _sql_c12(),
        "c13_json_extract": _sql_c13(),
        "text_token_stats": _sql_text_tokens(),
        "text_bpe_tokens": _sql_text_bpe(),
        "text_quality_score": _sql_text_quality(),
        "text_fingerprint": _sql_text_fp(),
        "dedup_exact": _sql_dedup_exact(),
        "dedup_ngram_jaccard": _sql_dedup_ngram(),
        "dedup_minhash_lsh": _sql_dedup_minhash(),
        "dedup_clusters": _sql_dedup_clusters(),
        "contamination_check": _sql_contamination(),
        "contamination_exact": _sql_contamination_exact(),
        "dedup_simhash": _sql_dedup_simhash(),
        "text_repetition": _sql_text_repetition(),
        "ann_cosine_topk": _sql_ann_topk(),
        "ann_ivf_topk": _sql_ann_ivf(),
        "emb_near_dups": _sql_emb_near_dups(),
        "emb_quantize": _sql_emb_quantize(),
        "text_lang_guess": _sql_text_lang_guess(),
        "c1_kv_parse": _sql_c1(),
        "a1_distinct_users": _sql_a1(),
        "o2_percentiles": _sql_o2(),
        "o3_percentiles_approx": _sql_o3(),
        "o4_corr_stats": _sql_o4(),
        "a7_cube_totals": _sql_a7(),
        "p1_pivot_status_priority": _sql_p1(),
        "ssj_bounded_join": _sql_ssj(),
        "w4_session_window": _sql_w4(),
        "ann_ivf_quantized": _sql_ann_ivf_quantized(),
        "emb_near_dups_multiprobe": _sql_emb_near_dups_multiprobe(),
        "g7_weighted_sssp": _sql_g7(),
        "g8_link_prediction": _sql_g8(),
        "g9_kcore": _sql_g9(),
        "g10_hits": _sql_g10(),
        "text_unigram_logprob": _sql_text_unigram_logprob(),
        "o5_histogram": _sql_o5(),
        "o6_profile": _sql_o6(),
        "g11_personalized_pagerank": _sql_g11(),
    }
