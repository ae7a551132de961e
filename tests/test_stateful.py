"""applyInPandasWithState custom stateful operator test."""

from __future__ import annotations

from importtoneo4j_spark.streaming.stateful import conversation_progress_stream


def test_conversation_progress_matches_batch(
    spark, small_transcripts_path, tmp_path_factory
):
    ckpt = str(tmp_path_factory.mktemp("st") / "ckpt")
    df = conversation_progress_stream(spark, small_transcripts_path)
    q = (
        df.writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_progress")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode may emit a conversation several times; the LAST emission
    # carries the final state — with availableNow over one directory the
    # final micro-batch values equal the batch totals
    rows = spark.sql(
        "SELECT conv_id, max(n_turns) AS n, max(max_turn_idx) AS mx "
        "FROM conv_progress GROUP BY conv_id"
    ).collect()
    got = {r["conv_id"]: (r["n"], r["mx"]) for r in rows}
    batch = (
        spark.read.parquet(small_transcripts_path)
        .groupBy("conv_id")
        .agg({"turn_idx": "max", "*": "count"})
        .collect()
    )
    want = {r["conv_id"]: (r["count(1)"], r["max(turn_idx)"]) for r in batch}
    assert got == want
