"""Transcript source: read, validate, quarantine, stable ordering.

Mirrors the reference's ingest discipline:
* record filter F1 + warn-and-skip F3 (VariantDatabase.java:178,189-192):
  invalid rows are split into a quarantine DataFrame with a reject_reason —
  never silently dropped, never a crash.
* fail-fast F4 (VariantDatabase.java:193-195): structural violations
  (duplicate (conv_id, turn_idx)) raise in the driver.
* stable per-conversation turn ordering (input_hint invariant): the
  reference gets order for free from its sequential iterator
  (VariantDatabase.java:174); we make it explicit with a window over
  (conv_id, turn_idx) before any grouped extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from importtoneo4j_spark.functions.text import nullify_sentinels
from importtoneo4j_spark.schemas import TRANSCRIPTS


def read_transcripts(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Read transcripts with the authoritative schema enforced.

    ``fmt``: 'parquet' (default for paths), 'json' (JSON-lines), 'csv'
    (with header), or 'table' (catalog name — the default when ``path``
    has no '/'). Every format goes through the same schema enforcement
    and the same downstream quarantine (tag_rejects), so a malformed
    JSONL/CSV row becomes a typed NULL -> reject_reason, never a crash —
    the reference's warn-and-skip discipline regardless of wire format
    (VariantDatabase.java:189-192)."""
    if fmt is None:
        fmt = "table" if "/" not in path else "parquet"
    if fmt == "table":
        df = spark.read.table(path)
    elif fmt == "parquet":
        df = spark.read.schema(TRANSCRIPTS).parquet(path)
    elif fmt == "json":
        df = spark.read.schema(TRANSCRIPTS).json(path)
    elif fmt == "csv":
        df = (
            spark.read.schema(TRANSCRIPTS)
            .option("header", "true")
            .csv(path)
        )
    else:
        raise ValueError(f"unknown transcripts format: {fmt}")
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )


def tag_rejects(df: DataFrame) -> DataFrame:
    """Attach ``reject_reason`` (NULL = valid row).

    Reject reasons (warn-and-skip semantics, VariantDatabase.java:189-192):
      null_conv_id, null_turn_idx, negative_turn_idx, null_or_sentinel_text.
    """
    reason = (
        F.when(F.col("conv_id").isNull(), "null_conv_id")
        .when(F.col("turn_idx").isNull(), "null_turn_idx")
        .when(F.col("turn_idx") < 0, "negative_turn_idx")
        .when(nullify_sentinels(F.col("text")).isNull(), "null_or_sentinel_text")
    )
    return df.withColumn("reject_reason", reason)


def split_valid_rejects(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, rejects-with-reason). NOTE: each returned frame
    re-scans the input when actioned separately — the batch pipeline instead
    writes ONE validity-partitioned table (stage_ingest), which is the
    single-input-scan form; this helper remains for streaming micro-batches
    (already in memory) and tests."""
    tagged = tag_rejects(df)
    valid = tagged.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    rejects = tagged.filter(F.col("reject_reason").isNotNull()).select(
        "conv_id", "turn_idx", "reject_reason"
    )
    return valid, rejects


def assert_unique_turns(df: DataFrame) -> None:
    """Fail-fast structural check: (conv_id, turn_idx) must be unique —
    the analog of the reference's uniqueness-constraint abort
    (Main.java:73-76, Neo4j.java:163-167)."""
    row = (
        df.groupBy("conv_id", "turn_idx")
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .first()  # one job: first() on the limited plan, no separate count
    )
    if row is not None:
        raise ValueError(
            f"duplicate (conv_id, turn_idx): ({row['conv_id']}, {row['turn_idx']})"
        )


def with_stable_order_tagged(df: DataFrame, flag_dups: bool = False) -> DataFrame:
    """Stable ordering computed over a reject-TAGGED frame in the same
    single pass that writes the ingest table (one input scan total — the
    two-table split costs a second full read of the corpus at 100 TB):

    * ``seq``  — cumulative count of VALID rows over (conv_id ORDER BY
      turn_idx, ts); for valid rows this equals row_number over the valid
      subset (rejects contribute 0); rejects carry seq NULL.
    * ``_dup`` — valid row repeating the previous VALID row's turn_idx
      (lag-equivalent via last(ignorenulls) over the preceding frame).

    All expressions share one window spec -> Catalyst emits ONE Window node.
    """
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turn_idx").asc(), F.col("ts").asc()
    )
    ok = F.col("reject_reason").isNull()
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn(
        "seq", F.when(ok, F.sum(ok.cast("int")).over(run)).cast("int")
    )
    if flag_dups:
        prev = F.last(F.when(ok, F.col("turn_idx")), ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        out = out.withColumn(
            "_dup",
            F.coalesce((ok & (prev == F.col("turn_idx"))).cast("int"), F.lit(0)),
        )
    return out


def with_stable_order(df: DataFrame, flag_dups: bool = False) -> DataFrame:
    """Attach a global per-conversation sequence number.

    row_number over (conv_id ORDER BY turn_idx, ts) — the explicit form of
    the reference's input-order dependence. Downstream first-wins merges
    order by this column, which is what makes them deterministic under
    parallelism (SURVEY.md §7 hard part 1).

    flag_dups=True adds ``_dup`` (1 when this row repeats the previous
    row's turn_idx within the conversation) computed by a lag over the SAME
    window spec — Catalyst fuses it into the one Window node, so the F4
    duplicate check rides the ordering pass for free instead of costing a
    second full scan (it would be a second pass over 100 TB).
    """
    w = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc(), F.col("ts").asc())
    out = df.withColumn("seq", F.row_number().over(w))
    if flag_dups:
        dup = (F.lag("turn_idx").over(w) == F.col("turn_idx")).cast("int")
        out = out.withColumn("_dup", F.coalesce(dup, F.lit(0)))
    return out
