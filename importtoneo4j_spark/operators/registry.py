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
    )
    decl_rows = [("node_label", n, k) for n, k in declared_labels] + [
        ("rel_type", r, None) for r in declared_rels
    ]
    decl = spark.createDataFrame(
        decl_rows, "kind string, name string, key_constraint string"
    )
    d, o = decl.alias("d"), obs.alias("o")
    j = d.join(
        o,
        (F.col("d.kind") == F.col("o.kind")) & (F.col("d.name") == F.col("o.name")),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("d.kind"), F.col("o.kind")).alias("kind"),
        F.coalesce(F.col("d.name"), F.col("o.name")).alias("name"),
        F.col("d.key_constraint").alias("key_constraint"),
        F.col("d.name").isNotNull().alias("declared"),
        F.col("o.name").isNotNull().alias("instantiated"),
        F.coalesce(F.col("o.n_instances"), F.lit(0)).cast("long").alias("n_instances"),
    )
