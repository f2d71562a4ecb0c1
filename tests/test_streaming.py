"""Streaming-mode tests: the readStream twin of the batch pipeline."""

import os

from pyspark.sql import functions as F

from hetman_spark.sources.webtext import write_webtext
from hetman_spark.streaming.stream import streaming_pipeline, windowed_counts_stream


def test_streaming_pipeline_matches_batch(spark, tmp_path):
    wt = str(tmp_path / "wt")
    write_webtext(spark, wt, 1000, n_splits=4)

    out = str(tmp_path / "out")
    q = streaming_pipeline(spark, wt, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    data = spark.read.parquet(os.path.join(out, "data"))
    counts = {r["sink_id"]: r["n"] for r in data.groupBy("sink_id").agg(F.count("*").alias("n")).collect()}
    assert max(counts.values()) == 1000  # match-all sink got every row

    # restart with same checkpoint: no new files -> no duplicates
    q2 = streaming_pipeline(spark, wt, out, str(tmp_path / "ckpt"))
    q2.awaitTermination(60)
    data2 = spark.read.parquet(os.path.join(out, "data"))
    assert data2.count() == data.count()


def test_windowed_counts(spark, tmp_path):
    wt = str(tmp_path / "wt2")
    write_webtext(spark, wt, 500, n_splits=2)
    agg = windowed_counts_stream(spark, wt, window="6 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT sum(n) AS total FROM win_counts").collect()
    assert rows[0]["total"] == 500
