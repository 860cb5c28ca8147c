"""Incremental / near-real-time indexing — Structured Streaming analogue
of Lucene's NRT machinery (SURVEY.md §2.10).

Reference mapping:
  - NRT segment flush (IndexWriter.getReader / NRTManager,
    lucene/core/.../search/NRTManager.java): each micro-batch becomes an
    immutable delta segment of flat postings + docs under
    ``index_dir/segments/seg=<batch_id>/``.
  - docBase (AtomicReaderContext.java:30-42): the manifest records
    ``next_doc_id``; a batch's docs get globally dense IDs
    offset + local id, so batch and streaming builds agree.
  - UpdateLog replay / exactly-once (solr/core/.../update/UpdateLog.java:
    56-108): ``process_batch`` is idempotent — a replayed batch_id is
    skipped, so Structured Streaming checkpoint recovery gives
    exactly-once index contents.
  - soft commit vs hard commit (solr/core/.../update/CommitTracker.java):
    micro-batch trigger interval = visibility cadence; the two-phase
    manifest rename = durability point.
  - TieredMergePolicy background merges (lucene/core/.../index/
    TieredMergePolicy.java:76-83): ``compact()`` unions small delta
    segments into one (merge-on-read -> merge-on-write compaction).

Query side: ``reader()`` returns a view duck-typed to InvertedIndex, so
``Searcher`` works unchanged over base + un-compacted deltas.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..index.builder import (
    POSTINGS_FLAT_SCHEMA,
    CollectionStats,
    _invert_partitions,
)
from ..index.docids import assign_doc_ids

MANIFEST = "streaming_manifest.json"


def _commit(index_dir: str, manifest: dict) -> None:
    tmp = os.path.join(index_dir, MANIFEST + ".tmp")
    final = os.path.join(index_dir, MANIFEST)
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def _read(index_dir: str) -> dict:
    path = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(path):
        return {
            "generation": 0,
            "next_doc_id": 0,
            "sum_total_term_freq": 0,
            "segments": {},
        }
    with open(path) as f:
        return json.load(f)


class IncrementalIndexWriter:
    """foreachBatch sink: append-only delta segments with dense docIDs."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        order_cols: tuple[str, str] = ("conv_id", "turn_idx"),
        text_col: str = "text",
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.order_cols = list(order_cols)
        self.text_col = text_col
        os.makedirs(index_dir, exist_ok=True)

    # -- sink --------------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        man = _read(self.index_dir)
        key = str(batch_id)
        if key in man["segments"]:
            return  # checkpoint replay -> exactly-once
        docs = assign_doc_ids(batch_df, self.order_cols, "local_id")
        offset = int(man["next_doc_id"])
        docs = docs.withColumn(
            "doc_id", (F.col("local_id") + F.lit(offset)).cast("long")
        ).drop("local_id")
        docs = docs.persist()

        seg_docs = f"{self.index_dir}/docs/seg={key}"
        seg_post = f"{self.index_dir}/postings/seg={key}"
        docs.write.mode("overwrite").parquet(seg_docs)
        flat = docs.select(
            F.col("doc_id"),
            F.col(self.text_col).cast("string").alias("text"),
        ).mapInPandas(_invert_partitions, POSTINGS_FLAT_SCHEMA)
        flat.write.mode("overwrite").parquet(seg_post)

        written = self.spark.read.parquet(seg_post)
        n_docs = docs.count()
        sttf = written.agg(F.sum("tf")).collect()[0][0] or 0
        docs.unpersist()

        man["segments"][key] = {
            "doc_base": offset,
            "max_doc": int(n_docs),
            "sum_total_term_freq": int(sttf),
        }
        man["next_doc_id"] = offset + int(n_docs)
        man["sum_total_term_freq"] += int(sttf)
        man["generation"] += 1
        _commit(self.index_dir, man)

    def foreach_batch(self):
        """Bind for ``writeStream.foreachBatch(...)``."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        return fn

    # -- merge-on-write compaction ----------------------------------------

    def compact(self, min_segments: int = 2) -> bool:
        """Union all delta segments into one (segment merge analogue).
        Returns True if a merge happened. Crash-safe: the merged segment
        is fully written before the manifest swap; old dirs are removed
        after commit (dead segments, like un-referenced .si files)."""
        man = _read(self.index_dir)
        segs = sorted(
            man["segments"], key=lambda s: man["segments"][s]["doc_base"]
        )
        if len(segs) < min_segments:
            return False
        gen = man["generation"]
        merged_key = f"m{gen}"
        post = self.spark.read.parquet(
            *[f"{self.index_dir}/postings/seg={s}" for s in segs]
        )
        docs = self.spark.read.parquet(
            *[f"{self.index_dir}/docs/seg={s}" for s in segs]
        )
        post.write.mode("overwrite").parquet(
            f"{self.index_dir}/postings/seg={merged_key}"
        )
        docs.write.mode("overwrite").parquet(
            f"{self.index_dir}/docs/seg={merged_key}"
        )
        man["segments"] = {
            merged_key: {
                "doc_base": 0,
                "max_doc": int(man["next_doc_id"]),
                "sum_total_term_freq": int(man["sum_total_term_freq"]),
            }
        }
        man["generation"] = gen + 1
        _commit(self.index_dir, man)
        import shutil

        for s in segs:
            shutil.rmtree(f"{self.index_dir}/postings/seg={s}", True)
            shutil.rmtree(f"{self.index_dir}/docs/seg={s}", True)
        return True

    # -- reader ------------------------------------------------------------

    def reader(self) -> "StreamingIndexReader":
        return StreamingIndexReader(self.spark, self.index_dir)


@dataclass
class StreamingIndexReader:
    """InvertedIndex duck-type over the current committed segment set
    (SearcherManager.maybeRefresh analogue: construct a new reader to see
    newly committed batches)."""

    spark: SparkSession
    index_dir: str

    def __post_init__(self):
        man = _read(self.index_dir)
        segs = sorted(man["segments"])
        if not segs:
            raise FileNotFoundError(f"no committed segments in {self.index_dir}")
        self.manifest = man
        self.postings = self.spark.read.parquet(
            *[f"{self.index_dir}/postings/seg={s}" for s in segs]
        )
        self.docs = self.spark.read.parquet(
            *[f"{self.index_dir}/docs/seg={s}" for s in segs]
        )
        self.terms_stats = self.postings.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
        )
        self.stats = CollectionStats(
            max_doc=int(man["next_doc_id"]),
            sum_total_term_freq=int(man["sum_total_term_freq"]),
        )

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        rows = (
            self.terms_stats.where(F.col("term").isin(list(terms)))
            .select("term", "df", "ttf")
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}


def index_stream(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire a streaming transcript source into the incremental writer.

    ``stream_df`` is a streaming DataFrame (readStream) with the
    transcript schema. Returns the StreamingQuery.
    """
    writer = IncrementalIndexWriter(stream_df.sparkSession, index_dir)
    ws = (
        stream_df.writeStream.foreachBatch(writer.foreach_batch())
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        ws = ws.trigger(availableNow=True)
    return ws.start()
