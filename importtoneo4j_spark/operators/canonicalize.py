"""Canonicalization: iterative hash-min connected components + canonical-id
assignment.

The reference enforces one node per natural key via uniqueness constraints
and MERGE (Neo4j.java:160-173; VariantDatabase.java:100-109). After fuzzy
linking, "one entity, one node" becomes a graph problem: the connected
components of the linking-evidence graph. Catalyst cannot express fixpoints
(SURVEY.md §4), so this is a driver-side loop of joins with
``localCheckpoint`` lineage truncation — the canonical GraphFrames-style
hash-min algorithm: every vertex repeatedly adopts the minimum component id
among itself and its neighbors; converges in O(component diameter) rounds
(alias clusters are tiny, so 2-4 rounds in practice).

Canonical id = lexicographic min norm_key of the component — deterministic,
independent of partitioning and parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 25, checkpoint_every: int = 1
) -> DataFrame:
    """(src, dst) string edges -> (id, comp) with comp = min id in component.

    Vertices appearing only as singletons are NOT included — callers union
    them back with comp = own id (see assign_canonical_ids).
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_comp = F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp")))
        # convergence flag computed inside the iteration plan: the count of
        # changed rows is a cheap scan of the checkpointed result, not a
        # join-back against the previous labels
        new_labels = labels.join(nbr_min, "id", "left").select(
            "id",
            new_comp.alias("comp"),
            (new_comp != F.col("comp")).alias("_changed"),
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} iters")
    return labels


def assign_canonical_ids(vocab: DataFrame, edges: DataFrame) -> DataFrame:
    """(surface, norm_key) vocab + link edges -> (surface, norm_key,
    canonical_id). Singleton keys canonicalize to themselves."""
    comp = connected_components(edges)
    return vocab.join(
        comp.withColumnRenamed("id", "norm_key"), "norm_key", "left"
    ).withColumn("canonical_id", F.coalesce(F.col("comp"), F.col("norm_key"))).drop(
        "comp"
    )
