"""Segment-style persisted index — the SegmentInfos / commit-point analogue.

Layout under ``index_dir``:
  postings/bucket=<b>/...parquet   block-encoded postings (codec.py)
  terms_stats/...parquet           (term, df, ttf, bucket)
  docs/...parquet                  doc store (stored-fields analogue)
  segments_<gen>.json              commit manifest (two-phase: .tmp+rename,
                                   mirroring prepareCommit/finishCommit,
                                   lucene/core/.../index/SegmentInfos.java:57-117)

Scale design:
  - postings are shuffled ONCE by (term, doc-range split): the split key
    ``doc_id // SPLIT_RANGE`` statically salts skewed high-df terms
    (a df=10^11 stopword-adjacent term at 10^12-turn scale becomes 10^6
    bounded groups instead of one straggler reducer). Blocks are
    independent (each encodes its own first_doc), so term-splits concat
    without a merge pass.
  - bucket = hash(term) % n_buckets is written as a parquet partition
    column -> query-time partition pruning on term lookups (the FST .tip
    term index replaced by partition + row-group pruning).
  - per-bucket lineage in the manifest enables kill-and-resume: finished
    buckets are skipped on restart (UpdateLog-replay analogue,
    solr/core/.../update/UpdateLog.java:56-108).
  - per-block ``ub_factor`` = max(tf/(tf+cache[norm])) over the block is
    the block-max WAND bound (valid for the avgdl recorded in the
    manifest; recomputed on compaction).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..search.bm25 import avg_field_length, norm_cache
from .builder import CollectionStats, InvertedIndex
from .codec import BLOCK_SIZE, decode_block, encode_term_blocks

SPLIT_RANGE = 1 << 20  # doc-range salt width for skewed terms

SEGMENT_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("term", StringType(), False),
        StructField("num_docs", IntegerType(), False),
        StructField("first_doc", LongType(), False),
        StructField("last_doc", LongType(), False),
        StructField("max_tf", IntegerType(), False),
        StructField("ub_factor", DoubleType(), False),
        StructField("docs_bin", BinaryType(), False),
        StructField("tfs_bin", BinaryType(), False),
        StructField("norms_bin", BinaryType(), False),
        StructField("pos_bin", BinaryType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("positions", ArrayType(IntegerType(), False), True),
        StructField("norm_byte", IntegerType(), False),
    ]
)


def _bucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def _pack_groups(
    cache: np.ndarray, n_buckets: int, keep_positions: bool
):
    """applyInPandas packer: one group = (term, doc-range split)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        term = pdf["term"].iloc[0]
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        norms = pdf["norm_byte"].to_numpy(dtype=np.int64).astype(np.uint8)
        positions = (
            [np.asarray(p, dtype=np.int64) for p in pdf["positions"]]
            if keep_positions
            else None
        )
        blocks = encode_term_blocks(doc_ids, tfs, norms, positions)
        rows = []
        # int64 hash of term consistent with Spark xxhash64 is not needed
        # here: bucket was computed as a column before the groupBy.
        bucket = int(pdf["bucket"].iloc[0])
        for blk in blocks:
            s = np.where(doc_ids >= blk["first_doc"])[0][0]
            e = s + blk["num_docs"]
            tf_b = tfs[s:e].astype(np.float64)
            denom = cache[norms[s:e].astype(np.int64)].astype(np.float64)
            ub = float(np.max(tf_b / (tf_b + denom)))
            rows.append(
                {
                    "bucket": bucket,
                    "term": term,
                    "num_docs": blk["num_docs"],
                    "first_doc": blk["first_doc"],
                    "last_doc": blk["last_doc"],
                    "max_tf": blk["max_tf"],
                    "ub_factor": ub,
                    "docs_bin": blk["docs_bin"],
                    "tfs_bin": blk["tfs_bin"],
                    "norms_bin": blk["norms_bin"],
                    "pos_bin": blk["pos_bin"],
                }
            )
        return pd.DataFrame(rows)

    return pack


def write_segments(
    index: InvertedIndex,
    index_dir: str,
    n_buckets: int = 16,
    keep_positions: bool = True,
    resume: bool = True,
    split_range: int = SPLIT_RANGE,
) -> "SegmentIndex":
    """Persist ``index`` as a segment store. With ``resume=True``, buckets
    already recorded in the manifest are skipped (kill-and-resume)."""
    os.makedirs(index_dir, exist_ok=True)
    spark = index.spark
    manifest = read_manifest(index_dir)
    done: set[int] = set(manifest["buckets"]) if manifest else set()
    avgdl = avg_field_length(
        index.stats.sum_total_term_freq, index.stats.max_doc
    )
    cache = norm_cache(avgdl)

    if manifest is None:
        # doc store + stats written once up front (cheap vs postings)
        index.docs.write.mode("overwrite").parquet(f"{index_dir}/docs")
        (
            index.terms_stats.withColumn(
                "bucket", _bucket_col(F.col("term"), n_buckets)
            )
            .write.mode("overwrite")
            .parquet(f"{index_dir}/terms_stats")
        )
        manifest = {
            "generation": 0,
            "n_buckets": n_buckets,
            "block_size": BLOCK_SIZE,
            "split_range": split_range,
            "keep_positions": keep_positions,
            "max_doc": index.stats.max_doc,
            "sum_total_term_freq": index.stats.sum_total_term_freq,
            "avgdl": float(avgdl),
            "buckets": {},
        }
    else:
        n_buckets = manifest["n_buckets"]
        keep_positions = manifest["keep_positions"]
        split_range = manifest.get("split_range", SPLIT_RANGE)

    todo = [b for b in range(n_buckets) if b not in done and str(b) not in done]
    if todo:
        # A crash may have left partial partition dirs for unfinished
        # buckets (data files without a manifest entry) — remove them so
        # the rebuild is idempotent, like UpdateLog replay discarding
        # uncommitted tlog tail.
        import shutil

        for b in todo:
            part_dir = f"{index_dir}/postings/bucket={b}"
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
        flat = index.postings.withColumn(
            "bucket", _bucket_col(F.col("term"), n_buckets)
        )
        if len(todo) < n_buckets:
            flat = flat.where(F.col("bucket").isin(todo))
        flat = flat.withColumn(
            "split", (F.col("doc_id") / F.lit(split_range)).cast("long")
        )
        packed = flat.groupBy("bucket", "term", "split").applyInPandas(
            _pack_groups(cache, n_buckets, keep_positions), SEGMENT_SCHEMA
        )
        (
            packed.repartition(max(len(todo), 1), "bucket")
            .sortWithinPartitions("term", "first_doc")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(f"{index_dir}/postings")
        )
        counts = (
            spark.read.parquet(f"{index_dir}/postings")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("blocks"))
            .collect()
        )
        blocks_by_bucket = {int(r["bucket"]): int(r["blocks"]) for r in counts}
        for b in todo:
            manifest["buckets"][str(b)] = {
                "blocks": blocks_by_bucket.get(b, 0),
                "committed_at_gen": manifest["generation"] + 1,
            }
    manifest["generation"] += 1
    commit_manifest(index_dir, manifest)
    return SegmentIndex.open(spark, index_dir)


def commit_manifest(index_dir: str, manifest: dict) -> None:
    """Two-phase commit: write segments_<gen>.json.tmp, fsync, rename
    (prepareCommit/finishCommit analogue, SegmentInfos.java:57-117)."""
    gen = manifest["generation"]
    tmp = f"{index_dir}/segments_{gen}.json.tmp"
    final = f"{index_dir}/segments_{gen}.json"
    manifest = dict(manifest)
    manifest["committed_unix"] = int(time.time())
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)


def read_manifest(index_dir: str) -> dict | None:
    """Latest committed generation (highest segments_N), like
    SegmentInfos.getLastCommitGeneration."""
    if not os.path.isdir(index_dir):
        return None
    gens = []
    for name in os.listdir(index_dir):
        if name.startswith("segments_") and name.endswith(".json"):
            gens.append(int(name[len("segments_"):-len(".json")]))
    if not gens:
        return None
    with open(f"{index_dir}/segments_{max(gens)}.json") as f:
        return json.load(f)


def _decode_partitions(want_positions: bool):
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_term, out_doc, out_tf, out_pos, out_nb = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                d, t, nb, pos = decode_block(
                    row.first_doc,
                    row.num_docs,
                    row.docs_bin,
                    row.tfs_bin,
                    row.norms_bin,
                    row.pos_bin if want_positions else None,
                )
                out_term.append(np.full(len(d), row.term, dtype=object))
                out_doc.append(d)
                out_tf.append(t)
                out_nb.append(nb.astype(np.int32))
                if pos is not None:
                    out_pos.extend([p.astype(np.int32) for p in pos])
                else:
                    out_pos.extend([None] * len(d))
            if not out_doc:
                yield pd.DataFrame(
                    {
                        "term": pd.Series([], dtype="object"),
                        "doc_id": pd.Series([], dtype="int64"),
                        "tf": pd.Series([], dtype="int32"),
                        "positions": pd.Series([], dtype="object"),
                        "norm_byte": pd.Series([], dtype="int32"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "term": np.concatenate(out_term),
                    "doc_id": np.concatenate(out_doc),
                    "tf": np.concatenate(out_tf).astype("int32"),
                    "positions": pd.Series(out_pos, dtype="object"),
                    "norm_byte": np.concatenate(out_nb).astype("int32"),
                }
            )

    return decode


class SegmentIndex:
    """Query-side view over the persisted segment store, duck-typed to
    InvertedIndex (Searcher works unchanged): ``postings`` decodes blocks
    lazily behind a term-pruned scan."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        manifest: dict,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.manifest = manifest
        self.docs = spark.read.parquet(f"{index_dir}/docs")
        self.terms_stats = spark.read.parquet(f"{index_dir}/terms_stats")
        self.blocks = spark.read.parquet(f"{index_dir}/postings")
        self.stats = CollectionStats(
            max_doc=manifest["max_doc"],
            sum_total_term_freq=manifest["sum_total_term_freq"],
        )
        self.n_buckets = manifest["n_buckets"]
        self.split_range = int(manifest.get("split_range", SPLIT_RANGE))
        self._bucket_cache: dict[tuple, list[int]] = {}

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str) -> "SegmentIndex":
        manifest = read_manifest(index_dir)
        if manifest is None:
            raise FileNotFoundError(f"no segments_N.json under {index_dir}")
        return cls(spark, index_dir, manifest)

    # --- InvertedIndex duck-type ---

    @property
    def postings(self) -> DataFrame:
        """Full decoded postings view. Filters on ``term`` applied by the
        caller land on the block scan via _TermPrunedPostings below; the
        generic view decodes everything (used only by MatchAll-ish paths).
        """
        return self.blocks.mapInPandas(
            _decode_partitions(self.manifest["keep_positions"]),
            DECODED_SCHEMA,
        )

    def postings_for_terms(
        self, terms: list[str], want_positions: bool = False
    ) -> DataFrame:
        """Pruned decode: bucket partition pruning + term row-group
        pruning happen BEFORE decode (the .tip/FST lookup analogue)."""
        pruned = self.blocks.where(
            F.col("bucket").isin(self.buckets_of(terms))
            & F.col("term").isin(list(terms))
        )
        return pruned.mapInPandas(
            _decode_partitions(
                want_positions and self.manifest["keep_positions"]
            ),
            DECODED_SCHEMA,
        )

    def buckets_of(self, terms: list[str]) -> list[int]:
        """Bucket ids for terms — one tiny local job (must match
        _bucket_col: Spark xxhash64, default seed 42)."""
        uniq = sorted(set(terms))
        key = tuple(uniq)
        cached = self._bucket_cache.get(key)
        if cached is not None:
            return cached
        rows = (
            self.spark.createDataFrame(
                [(t,) for t in uniq], "term string"
            )
            .select(_bucket_col(F.col("term"), self.n_buckets).alias("b"))
            .collect()
        )
        out = sorted({int(r["b"]) for r in rows})
        self._bucket_cache[key] = out
        return out

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        rows = (
            self.terms_stats.where(F.col("term").isin(list(terms)))
            .select("term", "df", "ttf")
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}
