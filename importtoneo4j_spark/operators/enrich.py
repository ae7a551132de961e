"""Second-pass node enrichment (EP2, the reference's ``-a`` annotation
import).

The reference's second pass (VariantDatabase.java:320-352) streams an
annotation source, looks each record's canonical key up against the
already-materialized nodes (:331-334), hard-fails when the key is missing
(:336), and adds properties first-wins — a property already present on the
node is never overwritten (:339-345, via the addNodeProperties guard at
Neo4j.java:236).

Re-expressed set-wise:

* ``missing_keys``  — attrs left_anti nodes: the crash-on-miss integrity
  check becomes "this set must be empty", checked with one cheap probe.
* ``enrich_nodes``  — one left join nodes<-attrs + a native map merge that
  keeps existing property keys (first-wins) and adds only the new ones.
  Re-applying the same attribute table is therefore a no-op (idempotent),
  which is what makes the enrichment stage safely re-runnable.

The attrs side is an external *attribute table* (the analog of the GATK
AF-join resource tables in import.sh:60-89): one row per canonical key plus
arbitrary attribute columns; values are stringified into the properties map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attrs_as_map(attrs: DataFrame, key: str) -> DataFrame:
    """(key, a, b, ...) -> (key, _attr_map: map<string,string>), nulls
    dropped (a null attribute adds nothing, matching the reference's
    null-sentinel skip before addNodeProperties)."""
    cols = [c for c in attrs.columns if c != key]
    if not cols:
        raise ValueError("attribute table has no attribute columns")
    pairs: list = []
    for c in cols:
        pairs.extend([F.lit(c), F.col(c).cast("string")])
    amap = F.map_filter(F.create_map(*pairs), lambda k, v: v.isNotNull())
    return attrs.select(F.col(key), amap.alias("_attr_map"))


def missing_keys(nodes: DataFrame, attrs: DataFrame, key: str = "entity_id") -> DataFrame:
    """Attribute rows whose key has no materialized node — the set form of
    the reference's crash-on-miss (VariantDatabase.java:336)."""
    return attrs.join(nodes.select(key), key, "left_anti")


def enrich_nodes(
    nodes: DataFrame,
    attrs: DataFrame,
    key: str = "entity_id",
    props_col: str = "properties",
    fail_on_miss: bool = True,
    on_duplicate: str = "fail",
) -> DataFrame:
    """First-wins property enrichment of existing nodes.

    Returns nodes with ``props_col`` extended by the attribute columns of
    ``attrs`` for keys the map does not already carry. Schema is unchanged,
    so the result can overwrite the nodes table in place.

    ``fail_on_miss=True`` aborts if any attribute key misses a node
    (integrity check, one limit-1 probe job); pass False to enrich
    best-effort and count misses yourself via ``missing_keys``.

    ``on_duplicate`` guards the node-uniqueness invariant: an attribute
    table with duplicate keys would fan the left join out and the enriched
    frame would carry duplicated ``key`` rows — silently breaking what
    fail_fast enforces at materialize (the reference processes annotation
    records one-at-a-time and can never duplicate a node,
    VariantDatabase.java:331-345).
    * 'fail'     (default): one cheap probe job; abort on any duplicate key.
    * 'min_wins': pre-aggregate duplicates to one map per key, resolving
      per-attribute conflicts by minimum value — deterministic set-wise
      (DataFrames have no stable row order for a true "first"-wins).
    """
    am = _attrs_as_map(attrs, key)
    if on_duplicate == "fail":
        dup = (
            am.groupBy(key).count().filter(F.col("count") > 1).limit(1).first()
        )
        if dup is not None:
            raise ValueError(
                f"attribute table has duplicate {key}={dup[key]!r}; "
                "dedupe it or pass on_duplicate='min_wins'"
            )
    elif on_duplicate == "min_wins":
        am = (
            am.select(F.col(key), F.explode("_attr_map").alias("_k", "_v"))
            .groupBy(key, "_k")
            .agg(F.min("_v").alias("_v"))
            .groupBy(key)
            .agg(F.map_from_entries(F.collect_list(F.struct("_k", "_v"))).alias("_attr_map"))
        )
    else:
        raise ValueError(f"on_duplicate must be 'fail' or 'min_wins', got {on_duplicate!r}")
    if fail_on_miss:
        miss = missing_keys(nodes, attrs, key).limit(1).first()
        if miss is not None:
            raise ValueError(f"enrichment key misses a node: {key}={miss[key]!r}")
    joined = nodes.join(am, key, "left")
    existing = F.col(props_col)
    incoming = F.coalesce(F.col("_attr_map"), F.map_from_arrays(F.array(), F.array()))
    # first-wins: keep every existing entry, add only keys absent from the
    # node's map (map_concat under ANSI throws on duplicate keys — the
    # filter is the dedup policy, made explicit)
    merged = F.map_concat(
        existing,
        F.map_filter(incoming, lambda k, _: ~F.map_contains_key(existing, k)),
    )
    out_cols = [
        merged.alias(props_col) if c == props_col else F.col(c) for c in nodes.columns
    ]
    return joined.select(*out_cols)
