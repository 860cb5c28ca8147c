"""Session windows + applyInPandasWithState custom stateful operator.

- sessionize (native session_window) batch result must equal the
  gap-and-island reference computed in pandas.
- running_totals_stateful: per-key GroupState carried across THREE
  micro-batches; the final emission per key must equal the batch
  groupBy aggregate (stream == batch for a custom stateful operator).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from lucene_solr_spark.streaming.sessions import (
    running_totals_stateful,
    sessionize,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sessionize_matches_gap_island_reference(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in sessionize(events).collect()
    }
    pdf = events.select("user_id", "ts", "value").orderBy(
        "user_id", "ts"
    ).toPandas()
    want = {}
    import pandas as pd

    gap = pd.Timedelta(minutes=30)
    for uid, g in pdf.groupby("user_id"):
        start = last = None
        cnt, sv = 0, 0.0
        for _, row in g.iterrows():
            if last is not None and row["ts"] - last >= gap:
                want[
                    (
                        uid,
                        start.strftime("%Y-%m-%d %H:%M:%S.%f"),
                        (last + gap).strftime("%Y-%m-%d %H:%M:%S.%f"),
                    )
                ] = (cnt, round(sv, 2))
                start, cnt, sv = None, 0, 0.0
            if start is None:
                start = row["ts"]
            last = row["ts"]
            cnt += 1
            sv += row["value"]
        if start is not None:
            want[
                (
                    uid,
                    start.strftime("%Y-%m-%d %H:%M:%S.%f"),
                    (last + gap).strftime("%Y-%m-%d %H:%M:%S.%f"),
                )
            ] = (cnt, round(sv, 2))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6, (k, got[k], want[k])


def test_stateful_running_totals_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    pdf = events.orderBy("ts").toPandas()
    n = len(pdf)
    for i, lo, hi in (
        (0, 0, n // 3),
        (1, n // 3, 2 * n // 3),
        (2, 2 * n // 3, n),
    ):
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
    out = running_totals_stateful(src)
    q = (
        out.writeStream.format("memory")
        .queryName("runtot")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emitted = spark.sql("select * from runtot").collect()
    assert emitted, "stateful operator emitted nothing"
    # state evolved across batches: more than one emission per key
    from collections import Counter

    per_key = Counter(r["event_type"] for r in emitted)
    assert max(per_key.values()) > 1, per_key
    # final (largest-cnt) emission per key == batch aggregate
    final = {}
    for r in emitted:
        k = r["event_type"]
        if k not in final or r["cnt"] > final[k][0]:
            final[k] = (r["cnt"], r["sum_value"])
    want = {
        r["event_type"]: (r["cnt"], r["sv"])
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv"))
        .collect()
    }
    assert set(final) == set(want)
    for k in want:
        assert final[k][0] == want[k][0]
        assert abs(final[k][1] - want[k][1]) < 1e-6 * max(
            1.0, abs(want[k][1])
        )
