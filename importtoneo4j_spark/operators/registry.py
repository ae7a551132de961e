"""Schema registry as data (SURVEY.md §1.1).

The reference declares its graph schema up front as two enums-as-arrays —
7 node labels and 7 relationship types, several of which the importer never
instantiates (VariantDatabase.java:33-65: the reserved Mt label, the
HAS_MT_VARIANT rel-type, ...) — so "what types exist" is answerable without
scanning the graph. This engine records the same thing as a queryable
TABLE: every declared type (with its key constraint), every observed type
(with instance counts), and the two flags that relate them. Dynamic
rel-types (reference VariantDatabase.java:463,476 — predicate names built
from data) appear as observed-but-undeclared rows, never silently.

Registry schema::

    kind            'node_label' | 'rel_type'
    name            the label / rel-type
    key_constraint  unique-key column for declared node labels (the analog
                    of the reference's uniqueness constraints,
                    Neo4j.java:163-167), NULL otherwise
    declared        in the engine's declared vocabulary
    instantiated    at least one instance exists in the materialized graph
    n_instances     observed count (0 for reserved-but-uninstantiated)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the KG pipeline's declared vocabulary: everything the extractor/
# materializer can emit, plus reserved types kept for forward compatibility
# (declared-but-uninstantiated, the reference's Mt/HAS_MT_VARIANT pattern).
DECLARED_NODE_LABELS: list[tuple[str, str]] = [
    ("Subject", "entity_id"),
    ("Object", "entity_id"),
    ("MENTIONED_BY_USER", "entity_id"),
    ("MENTIONED_BY_ASSISTANT", "entity_id"),
    ("MENTIONED_BY_SYSTEM", "entity_id"),
    ("MENTIONED_BY_TOOL", "entity_id"),
    # reserved: declared, never created by the current extractor
    ("Document", "doc_id"),
    ("Session", "conv_id"),
]
DECLARED_REL_TYPES: list[str] = [
    # same_as evidence is consumed at linking (operators/link.py) and never
    # materialized as an edge — declared so the catalog records that fact
    "SAME_AS",
    # reserved for a future containment edge (turn -> conversation)
    "PART_OF",
]


def schema_registry(
    nodes: DataFrame,
    triples: DataFrame,
    declared_labels: list[tuple[str, str]] | None = None,
    declared_rels: list[str] | None = None,
) -> DataFrame:
    """The (declared ∪ observed) type catalog of a materialized graph.

    Two tiny aggregations (explode labels / groupBy pred) full-outer-joined
    with the declared vocabulary — output cardinality is the number of
    TYPES, so this is safe to recompute on every materialize at any corpus
    scale.
    """
    if declared_labels is None:
        declared_labels = DECLARED_NODE_LABELS
    if declared_rels is None:
        declared_rels = DECLARED_REL_TYPES
    spark = nodes.sparkSession
    # one pass over each input; cached because BOTH output branches consume
    # it (without the cache the union would re-scan nodes+triples twice)
    obs = (
        nodes.select(F.explode("labels").alias("name"))
        .groupBy("name")
        .agg(F.count("*").alias("n_instances"))
        .withColumn("kind", F.lit("node_label"))
        .unionByName(
            triples.groupBy(F.col("pred").alias("name"))
            .agg(F.count("*").alias("n_instances"))
            .withColumn("kind", F.lit("rel_type"))
        )
        .cache()
    )
    decl_rows = [("node_label", n, k) for n, k in declared_labels] + [
        ("rel_type", r, None) for r in declared_rels
    ]
    decl = spark.createDataFrame(
        decl_rows, "kind string, name string, key_constraint string"
    )
    # declared LEFT-join observed + observed ANTI declared, instead of one
    # full_outer: a full outer join can never broadcast (SMJ on both sides,
    # two extra shuffle/sort stages); both of these broadcast the tiny
    # type-cardinality sides
    declared_part = decl.join(obs, ["kind", "name"], "left").select(
        "kind",
        "name",
        "key_constraint",
        F.lit(True).alias("declared"),
        F.col("n_instances").isNotNull().alias("instantiated"),
        F.coalesce("n_instances", F.lit(0)).cast("long").alias("n_instances"),
    )
    undeclared_part = obs.join(decl.select("kind", "name"), ["kind", "name"], "left_anti").select(
        "kind",
        "name",
        F.lit(None).cast("string").alias("key_constraint"),
        F.lit(False).alias("declared"),
        F.lit(True).alias("instantiated"),
        F.col("n_instances").cast("long").alias("n_instances"),
    )
    return declared_part.unionByName(undeclared_part)
