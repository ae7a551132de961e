"""Custom stateful streaming operator: per-conversation progress tracking
via ``applyInPandasWithState`` — the extension point for operators Spark's
built-in streaming aggregates can't express (arbitrary per-key state).

State per conv_id: (n_turns_seen, max_turn_idx). Each micro-batch emits one
row per updated conversation with the running totals — the streaming
analog of the reference's session-state HashMaps
(VariantDatabase.java:29-30 runInfoNodes/addedVariantNodes accumulators).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from importtoneo4j_spark.schemas import TRANSCRIPTS

OUTPUT_DDL = "conv_id string, n_turns long, max_turn_idx int"
STATE_DDL = "n_turns long, max_turn_idx int"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    n, mx = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        n += len(pdf)
        mx = max(mx, int(pdf["turn_idx"].max()))
    state.update((n, mx))
    yield pd.DataFrame({"conv_id": [conv_id], "n_turns": [n], "max_turn_idx": [mx]})


def conversation_progress_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    stream = spark.readStream.schema(TRANSCRIPTS).parquet(input_dir)
    return (
        stream.select("conv_id", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
