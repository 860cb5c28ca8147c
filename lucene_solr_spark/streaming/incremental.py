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
            "n_docs": 0,
            "sum_total_term_freq": 0,
            "segments": {},
            "deletes": [],
        }
    with open(path) as f:
        man = json.load(f)
    man.setdefault("deletes", [])
    man.setdefault("n_docs", man["next_doc_id"])
    return man


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
        man["n_docs"] = man.get("n_docs", 0) + int(n_docs)
        man["sum_total_term_freq"] += int(sttf)
        man["generation"] += 1
        _commit(self.index_dir, man)

    # -- deletes / updates ---------------------------------------------------

    def delete_by_keys(
        self, keys_df: DataFrame, key_col: str = "uid"
    ) -> int:
        """Delete documents whose ``key_col`` value appears in
        ``keys_df`` — the deleteByTerm path (lucene/core/.../index/
        BufferedDeletesStream.java; Solr delete-by-uniqueKey,
        S/update/DirectUpdateHandler2.java). Deletes are TOMBSTONES
        (per-generation doc_id parquet — the .del BitVector analogue,
        lucene/core/.../codecs/lucene40/BitVector.java): every reader
        filters matches through the live-docs anti-join immediately;
        postings are purged physically at the next compaction, exactly
        Lucene's merge-time delete reclamation. Returns the number of
        newly deleted docs."""
        man = _read(self.index_dir)
        reader = self.reader()  # live view: excludes prior tombstones
        ids = reader.docs.join(
            F.broadcast(keys_df.select(key_col).distinct()),
            key_col,
            "left_semi",
        ).select("doc_id")
        gen = man["generation"]
        path = f"{self.index_dir}/deletes/del={gen}"
        ids.write.mode("overwrite").parquet(path)
        n = self.spark.read.parquet(path).count()
        man["deletes"].append(str(gen))
        man["n_docs"] = man.get("n_docs", man["next_doc_id"]) - int(n)
        man["generation"] += 1
        _commit(self.index_dir, man)
        return int(n)

    def update_documents(
        self,
        batch_df: DataFrame,
        batch_id: int,
        key_col: str = "uid",
    ) -> None:
        """Overwrite-by-uniqueKey update (DirectUpdateHandler2.addDoc
        with overwrite=true): atomically delete any live doc holding the
        same key, then add the new version as a delta segment with a
        fresh docID — Lucene updateDocument semantics (the old internal
        docID dies, the new doc gets the next one)."""
        man = _read(self.index_dir)
        if str(batch_id) in man["segments"]:
            return  # checkpoint replay
        if man["segments"]:
            self.delete_by_keys(batch_df.select(key_col), key_col)
        self.process_batch(batch_df, batch_id)

    def add_with_signature_dedup(
        self,
        batch_df: DataFrame,
        batch_id: int,
        text_col: str | None = None,
        overwrite_dupes: bool = True,
    ) -> None:
        """Ingest-time content dedup (SignatureUpdateProcessorFactory,
        solr/core/src/java/org/apache/solr/update/processor/
        SignatureUpdateProcessorFactory.java): compute a content
        signature per doc (md5 over sorted distinct analyzed tokens —
        the Lookup3/MD5Signature analogue) into ``fingerprint`` and use
        it as the dedup key. ``overwrite_dupes=True`` mirrors
        overwriteDupes: the signature acts as the uniqueKey — docs in
        this batch delete any LIVE doc carrying the same signature, and
        within the batch the last doc in ingestion order (order_cols)
        wins, exactly Solr's sequential per-doc overwrite. With
        ``False`` the signature field is stored but nothing is deleted
        (Solr leaves dedup to a signature-valued uniqueKey downstream).

        Distribution: the signature is one Catalyst projection; the
        within-batch last-wins is a window over the signature (one
        shuffle on the dedup key, same shape as exact dedup)."""
        from pyspark.sql import Window

        from ..functions.text_analysis import with_fingerprint

        sig = with_fingerprint(batch_df, text_col or self.text_col)
        if not overwrite_dupes:
            self.process_batch(sig, batch_id)
            return
        w = Window.partitionBy("fingerprint").orderBy(
            *[F.desc(c) for c in self.order_cols]
        )
        last = (
            sig.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        self.update_documents(last, batch_id, key_col="fingerprint")

    def foreach_batch(self):
        """Bind for ``writeStream.foreachBatch(...)``."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        return fn

    # -- merge-on-write compaction ----------------------------------------

    def compact(self, min_segments: int = 2) -> bool:
        """Union all delta segments into one (segment merge analogue),
        PURGING tombstoned docs physically (merge-time delete
        reclamation, lucene/core/.../index/SegmentMerger.java skipping
        deleted docs via liveDocs) and refreshing collection stats from
        the surviving postings — after a merge, df/sumTTF/N no longer
        count deleted docs, exactly the reference's behavior.
        Returns True if a merge happened. Crash-safe: the merged segment
        is fully written before the manifest swap; old dirs are removed
        after commit (dead segments, like un-referenced .si files)."""
        man = _read(self.index_dir)
        segs = sorted(
            man["segments"], key=lambda s: man["segments"][s]["doc_base"]
        )
        has_deletes = bool(man["deletes"])
        if len(segs) < min_segments and not has_deletes:
            return False
        gen = man["generation"]
        merged_key = f"m{gen}"
        post = self.spark.read.parquet(
            *[f"{self.index_dir}/postings/seg={s}" for s in segs]
        )
        docs = self.spark.read.parquet(
            *[f"{self.index_dir}/docs/seg={s}" for s in segs]
        )
        if has_deletes:
            tomb = self.spark.read.parquet(
                *[
                    f"{self.index_dir}/deletes/del={d}"
                    for d in man["deletes"]
                ]
            ).select("doc_id").distinct()
            post = post.join(F.broadcast(tomb), "doc_id", "left_anti")
            docs = docs.join(F.broadcast(tomb), "doc_id", "left_anti")
        post.write.mode("overwrite").parquet(
            f"{self.index_dir}/postings/seg={merged_key}"
        )
        docs.write.mode("overwrite").parquet(
            f"{self.index_dir}/docs/seg={merged_key}"
        )
        merged_post = self.spark.read.parquet(
            f"{self.index_dir}/postings/seg={merged_key}"
        )
        n_docs = self.spark.read.parquet(
            f"{self.index_dir}/docs/seg={merged_key}"
        ).count()
        sttf = int(merged_post.agg(F.sum("tf")).collect()[0][0] or 0)
        man["segments"] = {
            merged_key: {
                "doc_base": 0,
                "max_doc": int(n_docs),
                "sum_total_term_freq": sttf,
            }
        }
        man["n_docs"] = int(n_docs)
        man["sum_total_term_freq"] = sttf
        old_deletes = man["deletes"]
        man["deletes"] = []
        man["generation"] = gen + 1
        _commit(self.index_dir, man)
        import shutil

        for s in segs:
            shutil.rmtree(f"{self.index_dir}/postings/seg={s}", True)
            shutil.rmtree(f"{self.index_dir}/docs/seg={s}", True)
        for d in old_deletes:
            shutil.rmtree(f"{self.index_dir}/deletes/del={d}", True)
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
        raw_post = self.spark.read.parquet(
            *[f"{self.index_dir}/postings/seg={s}" for s in segs]
        )
        raw_docs = self.spark.read.parquet(
            *[f"{self.index_dir}/docs/seg={s}" for s in segs]
        )
        # liveDocs (.del BitVector analogue): every match stream is
        # anti-joined against tombstones, so deletes are visible
        # IMMEDIATELY; term/collection stats keep counting deleted docs
        # until compaction, exactly the reference pre-merge semantics
        # (TermsEnum.docFreq "does not take deleted docs into account").
        if man["deletes"]:
            tomb = self.spark.read.parquet(
                *[
                    f"{self.index_dir}/deletes/del={d}"
                    for d in man["deletes"]
                ]
            ).select("doc_id").distinct()
            self.postings = raw_post.join(
                F.broadcast(tomb), "doc_id", "left_anti"
            )
            self.docs = raw_docs.join(
                F.broadcast(tomb), "doc_id", "left_anti"
            )
        else:
            self.postings = raw_post
            self.docs = raw_docs
        self.terms_stats = raw_post.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
        )
        # maxDoc = Σ per-segment maxDoc: counts deleted docs until the
        # merge drops them (Lucene maxDoc semantics across a merge)
        self.stats = CollectionStats(
            max_doc=sum(
                int(s["max_doc"]) for s in man["segments"].values()
            ),
            sum_total_term_freq=int(man["sum_total_term_freq"]),
        )

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        rows = (
            self.terms_stats.where(F.col("term").isin(list(terms)))
            .select("term", "df", "ttf")
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}

    def get(self, keys: list, key_col: str = "doc_id") -> DataFrame:
        """RealTimeGetComponent analogue (S/handler/component/
        RealTimeGetComponent.java): fetch current LIVE versions by
        unique key — deletes and overwrites from any committed
        micro-batch are visible without waiting for compaction."""
        return self.docs.where(F.col(key_col).isin(list(keys)))


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
