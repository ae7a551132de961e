"""Watermarked stream-stream join == the same join run as batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from importtoneo4j_spark.schemas import TRANSCRIPTS
from importtoneo4j_spark.streaming.joins import stream_stream_join, with_right_prefix


def test_stream_stream_join_matches_batch(
    spark, small_transcripts_path, tmp_path_factory
):
    base = spark.read.parquet(small_transcripts_path)
    left_dir = str(tmp_path_factory.mktemp("ssj") / "left")
    right_dir = str(tmp_path_factory.mktemp("ssj") / "right")
    base.filter(F.col("role") == "user").write.parquet(left_dir)
    base.filter(F.col("role") == "assistant").write.parquet(right_dir)

    ls = spark.readStream.schema(TRANSCRIPTS).parquet(left_dir)
    rs = with_right_prefix(
        spark.readStream.schema(TRANSCRIPTS).parquet(right_dir), "conv_id"
    )
    joined = stream_stream_join(
        ls, rs, key="conv_id", within="30 minutes"
    ).select("conv_id", "turn_idx", "r_turn_idx")
    ckpt = str(tmp_path_factory.mktemp("ssj") / "ckpt")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["conv_id"], r["turn_idx"], r["r_turn_idx"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    lb = spark.read.parquet(left_dir)
    rb = with_right_prefix(spark.read.parquet(right_dir), "conv_id")
    batch = stream_stream_join(lb, rb, key="conv_id", within="30 minutes")
    want = {
        (r["conv_id"], r["turn_idx"], r["r_turn_idx"])
        for r in batch.select("conv_id", "turn_idx", "r_turn_idx").collect()
    }
    assert got == want
    assert len(got) > 0
    # time bound holds: every matched response is within [ts, ts + 30 min]
    bounds = batch.select(
        (F.col("r_ts") >= F.col("ts"))
        & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 30 minutes"))
    ).collect()
    assert all(r[0] for r in bounds)
