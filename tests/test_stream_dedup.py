"""Streaming exact dedup (streaming/dedupe.py): stream==batch first
occurrences, bounded state via watermark."""

import os

import pyspark.sql.functions as F

from lucene_solr_spark.streaming.dedupe import (
    deduped_stream,
    first_occurrences_batch,
    with_signature,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _dup_corpus(spark):
    """Documents with injected duplicates: every third doc repeats an
    earlier doc's text (punctuation-varied -> same signature) at a
    later timestamp."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    base = d.select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(1700000000) + F.col("doc_id") * 60
        ).alias("ts"),
    )
    dups = base.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("  !!")).alias("text"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("ts"),
    )
    return base.unionByName(dups)


def test_signature_collapses_punct_variants(spark):
    df = _dup_corpus(spark)
    sigs = with_signature(df)
    n_all = sigs.count()
    n_distinct = sigs.select("fingerprint").distinct().count()
    assert n_all > n_distinct  # the injected dups share signatures


def test_batch_first_occurrence_semantics(spark):
    df = _dup_corpus(spark)
    out = first_occurrences_batch(df)
    # one survivor per signature, and it is the EARLIEST arrival
    assert out.count() == with_signature(df).select(
        "fingerprint"
    ).distinct().count()
    assert out.where(F.col("doc_id") >= 1000).count() == 0


def test_stream_equals_batch(spark, tmp_path):
    df = _dup_corpus(spark).orderBy("ts")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    pdf = df.toPandas()
    n = len(pdf)
    for i, lo, hi in ((0, 0, n // 2), (1, n // 2, n)):
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
    out = deduped_stream(src, watermark="120 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("streamdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["fingerprint"]
        for r in spark.sql("select * from streamdedup").collect()
    }
    want_rows = first_occurrences_batch(
        spark.read.option("recursiveFileLookup", "true").parquet(in_dir)
    ).collect()
    want = {r["fingerprint"] for r in want_rows}
    assert got == want
    # duplicates really dropped: emitted rows == distinct signatures
    assert (
        spark.sql("select count(*) c from streamdedup").first()["c"]
        == len(want)
    )
