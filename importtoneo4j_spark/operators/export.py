"""Graph export in neo4j-admin bulk-import CSV layout (round 4).

The reference's sink IS an embedded Neo4j store (VariantDatabase.java:84-93);
this engine materializes parquet/Iceberg tables instead. This bridge closes
the loop for a migrating user: export nodes/triples in the exact header
convention `neo4j-admin database import` consumes, so the graph this engine
builds can be bulk-loaded into a real Neo4j instance (the reference's
runtime) without any per-row transactional import.

Layout (the tool's documented convention):
  nodes_header.csv          one line: entity_id:ID,canonical_surface,...,:LABEL
  nodes/part-*.csv          data only, no headers (distributed write)
  relationships_header.csv  :START_ID,:END_ID,:TYPE,...
  relationships/part-*.csv  data only

Multi-valued labels join with ';' (the tool's array delimiter); the
properties map flattens to a JSON string property. Everything is a plain
distributed CSV write — no driver-side iteration at any corpus size.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NODE_HEADER = "entity_id:ID,canonical_surface,:LABEL,n_mentions:long,n_surfaces:long,properties"
REL_HEADER = ":START_ID,:END_ID,:TYPE,conv_id,turn_idx:int,quality:double,properties"


def _write_text(spark, path: str, content: str) -> None:
    """One small text file through the Hadoop FS API (scheme-portable,
    like sources/tables.py markers — never os.*)."""
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _csv_opts(w):
    # neo4j-admin defaults: comma delimiter, '"' quotes doubled for escape
    return (
        w.option("header", "false")
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", "")
        .option("nullValue", "")
    )


def export_neo4j_admin(nodes: DataFrame, triples: DataFrame, out_dir: str) -> dict:
    """Write the nodes/relationships CSV groups + header files under
    ``out_dir`` and return a manifest including the ready-to-run
    ``neo4j-admin database import full`` command."""
    spark = nodes.sparkSession
    # a ';' INSIDE a label value is unrepresentable: it is the array
    # delimiter, and neo4j-admin offers no escape for it within a quoted
    # array cell (quoting protects the ',' field delimiter only). Fail the
    # write loudly, row-side and distributed, instead of silently exporting
    # a label that would import as two
    checked_label = lambda x: F.when(  # noqa: E731
        x.contains(";"),
        F.raise_error(
            F.concat(
                F.lit("label value contains the ';' array delimiter: "), x
            )
        ),
    ).otherwise(x)
    n = nodes.select(
        F.col("entity_id").cast("string"),
        F.coalesce(F.col("canonical_surface"), F.lit("")).alias("canonical_surface"),
        F.array_join(F.transform(F.array_sort("labels"), checked_label), ";").alias(
            "labels"
        ),
        F.col("n_mentions").cast("long"),
        F.col("n_surfaces").cast("long"),
        F.coalesce(F.to_json("properties"), F.lit("")).alias("properties"),
    )
    r = triples.select(
        F.col("subj").cast("string"),
        F.col("obj").cast("string"),
        # Neo4j rel-type convention is UPPER_SNAKE (the reference's dynamic
        # rel-types are built the same way, VariantDatabase.java:463,476)
        F.upper(F.col("pred")).alias("type"),
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("quality").cast("double"),
        F.coalesce(F.to_json("properties"), F.lit("")).alias("properties"),
    )
    nodes_dir = posixpath.join(out_dir, "nodes")
    rels_dir = posixpath.join(out_dir, "relationships")
    _csv_opts(n.write.mode("overwrite")).csv(nodes_dir)
    _csv_opts(r.write.mode("overwrite")).csv(rels_dir)
    nodes_header = posixpath.join(out_dir, "nodes_header.csv")
    rels_header = posixpath.join(out_dir, "relationships_header.csv")
    _write_text(spark, nodes_header, NODE_HEADER + "\n")
    _write_text(spark, rels_header, REL_HEADER + "\n")
    return {
        "nodes_header": nodes_header,
        "nodes_dir": nodes_dir,
        "relationships_header": rels_header,
        "relationships_dir": rels_dir,
        "import_command": (
            "neo4j-admin database import full "
            f'--nodes="{nodes_header},{nodes_dir}/part-.*\\.csv" '
            f'--relationships="{rels_header},{rels_dir}/part-.*\\.csv" '
            # multiline-fields: the writer quotes embedded newlines (RFC
            # 4180), which the tool only accepts with this flag
            "--array-delimiter=';' --multiline-fields=true neo4j"
        ),
    }
