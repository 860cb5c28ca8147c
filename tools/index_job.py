#!/usr/bin/env python
"""spark-submit entry point: full index build (tokenize -> invert ->
term-hash shuffle -> block-encode -> segment commit) over a transcript
parquet table. Emits one JSON line of timings for the scaling harness.

Usage (what tools/bench_scaling.py runs):

  spark-submit --master local[8] --py-files lucene_solr_spark.zip \
      tools/index_job.py <input_parquet> <index_dir> [shuffle_partitions]

This is the north-rule job shape (BASELINE.json): the same artifact runs
unchanged on a multi-executor cluster by swapping --master; parallelism
enters only through master/shuffle partitions, never through the code.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    inp, index_dir = sys.argv[1], sys.argv[2]
    shuffle = sys.argv[3] if len(sys.argv) > 3 else "32"

    spark = (
        SparkSession.builder.appName("lucene-solr-spark-index-job")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.index.segments import write_segments

    shutil.rmtree(index_dir, ignore_errors=True)

    docs = spark.read.parquet(inp)
    t0 = time.perf_counter()
    idx = build_index(spark, docs, order_cols=["conv_id", "turn_idx"])
    t_invert = time.perf_counter() - t0

    t0 = time.perf_counter()
    seg = write_segments(idx, index_dir, n_buckets=16)
    t_segments = time.perf_counter() - t0

    n_turns = idx.stats.max_doc
    total = t_invert + t_segments
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "invert_sec": round(t_invert, 3),
                "segments_sec": round(t_segments, 3),
                "total_sec": round(total, 3),
                "turns_per_sec": round(n_turns / total, 1),
                "master": spark.sparkContext.master,
                "generation": seg.manifest["generation"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
