"""Structured Streaming windowed aggregation: streaming result (append
mode, watermark-finalized windows) must equal the batch computation over
the same events, restricted to windows the final watermark closed."""

import os

import pyspark.sql.functions as F

from lucene_solr_spark.streaming.windows import windowed_event_stats


def test_windowed_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    pdf = events.orderBy("ts").toPandas()
    n = len(pdf)
    # three Spark-written files -> three micro-batches in ts order (files
    # written in ascending max-ts order so the watermark advances
    # monotonically; pandas would write TIMESTAMP_NTZ, which watermarks
    # reject)
    for i, lo, hi in ((0, 0, n // 3), (1, n // 3, 2 * n // 3), (2, 2 * n // 3, n)):
        spark.createDataFrame(pdf.iloc[lo:hi]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{in_dir}/chunk{i:03d}")

    schema = spark.read.parquet(f"{in_dir}/chunk000").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    agg = windowed_event_stats(src, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["win_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in spark.sql("select * from winagg").collect()
    }
    assert got, "no windows finalized"

    # batch truth restricted to windows closed under the final watermark
    max_ts = pdf["ts"].max()
    batch = windowed_event_stats(events).collect()
    import datetime

    wm = max_ts - datetime.timedelta(minutes=30)
    want = {
        (r["win_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in batch
        if r["win_end"] <= wm.to_pydatetime()
    }
    assert got == want


def test_sliding_window_batch_counts(spark):
    """slide < window: each event lands in exactly window/slide
    windows — total row-weight multiplies accordingly."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tumble = windowed_event_stats(events, window="30 minutes")
    slide = windowed_event_stats(
        events, window="30 minutes", slide="10 minutes"
    )
    n = events.count()
    assert (
        tumble.agg(F.sum("cnt")).collect()[0][0] == n
    )
    assert (
        slide.agg(F.sum("cnt")).collect()[0][0] == 3 * n
    )
    # every sliding window start is 10-minute aligned
    starts = [r["win_start"] for r in slide.select("win_start").collect()]
    assert all(s.minute % 10 == 0 and s.second == 0 for s in starts)
