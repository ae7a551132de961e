"""Graph materialization: canonical triples + nodes + per-partition lineage.

Replaces the reference's per-call-transaction graph sink (Neo4j.addNode
Neo4j.java:96-115, createRelationship :190-211 with the hasRelationship
existence guard :192-194,212-229) with set-oriented writes:

* triples — canonical (subj, pred, obj) unique after first-wins dedup; the
  earliest (conv_id, turn_idx) attribution and its quality survive, matching
  the reference's first-writer-wins and edge-uniqueness semantics.
* nodes   — one row per canonical entity; canonical_surface = first surface
  form seen in stream order; labels = set-union of classification rules.
* lineage — per-partition row counts + order-insensitive checksum
  (bit_xor of row hashes), generalizing the new-variants delta sink
  (VariantDatabase.java:235-263) into an auditable manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from importtoneo4j_spark.operators.merge import first_wins, label_union

# Materialized-layout knobs — the distributed analog of the reference's
# index-before-load (Main.java:69, VariantDatabase.java:96-111): triples are
# written partitioned by pred (bounded rel-type vocabulary -> rel-type scans
# prune partitions) and nodes by a stable hash bucket of entity_id (point
# lookups prune to 1/NODE_BUCKETS of the files).
NODE_BUCKETS = 32


def node_bucket(entity_id: Column) -> Column:
    """Stable partition bucket for a node key. Must be the same expression
    at write time (pipeline) and lookup time (GraphView) — xxhash64 is
    deterministic and foldable on literals, so Catalyst turns the lookup
    into a partition filter."""
    return F.pmod(F.xxhash64(entity_id), F.lit(NODE_BUCKETS))


def canonical_triples(extracted: DataFrame, links: DataFrame) -> DataFrame:
    """extracted assertions + (surface -> canonical_id) links -> triples.

    Two equi-joins map both mention positions to canonical ids. The join
    strategy is deliberately left to AQE: the links table is the distinct
    surface vocabulary, which at 10^12 turns is plausibly 10^8-10^9 rows —
    an unconditional broadcast hint would OOM executors there, while AQE
    picks broadcast-hash from the *measured* runtime size whenever the
    vocabulary really is small (verified in tests/test_plans.py and
    bench_inflated_vocab.py at >=10^6 surfaces). Then a first-wins dedup on
    (subj, pred, obj) keeps the earliest attribution.
    """
    l_subj = links.select(
        F.col("surface").alias("subj_surface"), F.col("canonical_id").alias("subj")
    )
    l_obj = links.select(
        F.col("surface").alias("obj_surface"), F.col("canonical_id").alias("obj")
    )
    mapped = (
        extracted.filter(F.col("kind") == "triple")
        .join(l_subj, "subj_surface")
        .join(l_obj, "obj_surface")
        .select(
            "subj",
            "pred",
            "obj",
            "conv_id",
            "turn_idx",
            F.col("quality").cast("float").alias("quality"),
            "role",
        )
    )
    deduped = first_wins(
        mapped,
        keys=["subj", "pred", "obj"],
        order_by=["conv_id", "turn_idx"],
        payload=["quality", "role"],
        salt_buckets=1,  # (subj,pred,obj) is fine-grained and min(struct)
        # partial-aggregates map-side; two-phase salting would double the
        # shuffle volume for no skew benefit here
    )
    return deduped.select(
        "subj",
        "pred",
        "obj",
        "conv_id",
        "turn_idx",
        "quality",
        F.create_map(F.lit("source_role"), F.col("role")).alias("properties"),
    )


def canonical_nodes(extracted: DataFrame, links: DataFrame) -> DataFrame:
    """Canonical entity nodes with first-wins surface + label set-union.

    Labels classify by mention position and role — the analog of the
    reference's chromosome/Snp/Indel label rules
    (VariantDatabase.java:296-305), a total classification (no crashing MT
    branch — SURVEY.md §2.8 C9 quirk intentionally not replicated).

    One fused aggregation per canonical id: min(struct) first-wins,
    collect_set label-union and count all have partial (map-side) merge, so
    the hot entity's mentions pre-combine inside each map task before the
    single shuffle — the skew never reaches one reducer un-reduced.
    n_surfaces comes from the vocabulary-sized links table, not a
    mention-scale countDistinct.
    """
    t = extracted.filter(F.col("kind") == "triple")
    subj = t.select(
        F.col("subj_surface").alias("surface"),
        "conv_id",
        "turn_idx",
        F.lit("Subject").alias("pos_label"),
        "role",
    )
    obj = t.select(
        F.col("obj_surface").alias("surface"),
        "conv_id",
        "turn_idx",
        F.lit("Object").alias("pos_label"),
        "role",
    )
    # join strategy AQE-chosen (see canonical_triples docstring): links is
    # vocabulary-sized, not guaranteed broadcastable at 100 TB
    mentions = subj.unionByName(obj).join(links, "surface")
    role_label = F.concat(F.lit("MENTIONED_BY_"), F.upper(F.col("role")))
    agg = mentions.groupBy("canonical_id").agg(
        F.min(F.struct("conv_id", "turn_idx", "surface")).alias("_first"),
        F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_set(F.array(F.col("pos_label"), role_label)))
            )
        ).alias("labels"),
        F.count("*").alias("n_mentions"),
    )
    n_surfaces = links.groupBy("canonical_id").agg(
        F.countDistinct("surface").alias("n_surfaces")
    )
    return agg.join(n_surfaces, "canonical_id").select(
        F.col("canonical_id").alias("entity_id"),
        F.col("_first.surface").alias("canonical_surface"),
        "labels",
        F.create_map(
            F.lit("first_conv_id"),
            F.col("_first.conv_id"),
            F.lit("first_turn_idx"),
            F.col("_first.turn_idx").cast("string"),
        ).alias("properties"),
        "n_mentions",
        "n_surfaces",
    )


def lineage_manifest(
    df: DataFrame, run_id: str, stage: str, hash_cols: list[str] | None = None
) -> DataFrame:
    """Per-partition lineage rows: (run_id, stage, partition_id, output_rows,
    checksum). Checksum = bit_xor of xxhash64 over hash_cols — order- and
    partitioning-insensitive when aggregated, so two runs at different
    parallelism produce comparable manifests."""
    cols = hash_cols or df.columns
    hashed = df.select(
        F.spark_partition_id().alias("partition_id"),
        F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("h"),
    )
    return (
        hashed.groupBy("partition_id")
        .agg(
            F.count("*").alias("output_rows"),
            F.expr("bit_xor(h)").cast("string").alias("checksum"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            F.lit(None).cast("long").alias("input_rows"),
            "output_rows",
            F.lit(None).cast("long").alias("rejected_rows"),
            "checksum",
        )
    )


def global_checksum(df: DataFrame, hash_cols: list[str] | None = None) -> str:
    """Order-insensitive whole-table checksum (resume / idempotency tests)."""
    cols = hash_cols or df.columns
    row = df.select(
        F.expr(
            "bit_xor("
            + f"xxhash64({', '.join(f'cast({c} as string)' for c in cols)})"
            + ")"
        ).alias("x"),
        F.count("*").alias("n"),
    ).first()
    return f"{row['n']}:{row['x']}"
