"""Index splitters — reshard a segment store without re-indexing.

Reference: lucene/misc/src/java/org/apache/lucene/index/
PKIndexSplitter.java (split one index into two by a doc filter,
typically a primary-key range) and MultiPassIndexSplitter.java (split
into N parts round-robin or by sequential ranges). The reference
re-writes every segment through FilterIndexReader passes; the Spark
store makes range splits almost free instead:

  Postings blocks are encoded per (term, doc-range split) with their
  own [first_doc, last_doc] (index/codec.py), so a PK range split at
  ``mid`` copies every block that lies entirely on one side VERBATIM
  (no decode) and re-encodes only the blocks straddling the boundary —
  at 10^12 docs that is O(#terms) boundary blocks vs O(corpus) total,
  i.e. a metadata-speed reshard. Round-robin (MultiPass) splitting has
  no such locality and routes every block through the same
  decode/re-encode kernel — the honest cost of that layout choice.

Each output half is a complete, self-contained store: per-term stats
(df/ttf) are re-aggregated from its own blocks, collection stats
(maxDoc, sumTTF, avgdl) recomputed, manifest committed two-phase.
Searching a half is bit-identical to searching a fresh index built
over the same doc subset (pinned by tests/test_splitter.py).
"""

from __future__ import annotations

import os
from typing import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..search.bm25 import avg_field_length
from .codec import BLOCK_SIZE, decode_block
from .segments import (
    SEGMENT_SCHEMA,
    SPLIT_RANGE,
    SegmentIndex,
    _bucket_col,
    _pack_run,
    _rows_frame,
    commit_manifest,
)

# part-id column appended to SEGMENT_SCHEMA by the re-encode kernel.
# Built as a FRESH StructType: StructType.add mutates in place, and
# poisoning the shared SEGMENT_SCHEMA would break every packer/decoder.
from pyspark.sql.types import IntegerType, StructField, StructType

_KERNEL_SCHEMA = StructType(
    list(SEGMENT_SCHEMA.fields)
    + [StructField("part", IntegerType(), False)]
)


def _reencode_kernel(part_of_doc: Callable[[np.ndarray], np.ndarray]):
    """mapInPandas kernel: decode each posting block, route its docs to
    parts via ``part_of_doc`` (vectorized doc_id -> part id), re-encode
    one run per (block, part). Block-at-a-time — bounded memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list = []
            parts_out: list[int] = []
            for r in pdf.itertuples(index=False):
                doc_ids, tfs, norms, positions = decode_block(
                    r.first_doc,
                    r.num_docs,
                    r.docs_bin,
                    r.tfs_bin,
                    r.norms_bin,
                    r.pos_bin,
                )
                pids = part_of_doc(doc_ids)
                for pid in np.unique(pids):
                    m = pids == pid
                    before = len(rows)
                    _pack_run(
                        r.term,
                        int(r.bucket),
                        doc_ids[m],
                        tfs[m],
                        norms[m].astype(np.uint8),
                        [p for p, k in zip(positions, m) if k]
                        if positions is not None
                        else None,
                        rows,
                    )
                    parts_out.extend([int(pid)] * (len(rows) - before))
            if rows:
                out = _rows_frame(rows)
                out["part"] = pd.Series(parts_out, dtype="int32")
                yield out

    return run


def _write_part_store(
    spark: SparkSession,
    out_dir: str,
    blocks: DataFrame,
    docs: DataFrame,
    manifest_base: dict,
) -> SegmentIndex:
    """Materialize one output store: postings (bucket-partitioned),
    per-term stats re-aggregated from the part's own blocks, doc store,
    recomputed collection stats, two-phase manifest."""
    os.makedirs(out_dir, exist_ok=True)
    (
        blocks.write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/postings")
    )
    written = spark.read.parquet(f"{out_dir}/postings")
    n_buckets = manifest_base["n_buckets"]
    (
        written.groupBy("term")
        .agg(
            F.sum("num_docs").cast("long").alias("df"),
            F.sum("sum_tf").cast("long").alias("ttf"),
        )
        .withColumn("bucket", _bucket_col(F.col("term"), n_buckets))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/terms_stats")
    )
    docs.write.mode("overwrite").parquet(f"{out_dir}/docs")
    max_doc = spark.read.parquet(f"{out_dir}/docs").count()
    sum_ttf = int(
        spark.read.parquet(f"{out_dir}/terms_stats")
        .agg(F.coalesce(F.sum("ttf"), F.lit(0)))
        .first()[0]
    )
    per_bucket = {
        str(r["bucket"]): {"blocks": int(r["n"]), "committed_at_gen": 1}
        for r in written.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "generation": 0,
        "n_buckets": n_buckets,
        "block_size": manifest_base.get("block_size", BLOCK_SIZE),
        "split_range": manifest_base.get("split_range", SPLIT_RANGE),
        "keep_positions": manifest_base["keep_positions"],
        "max_doc": int(max_doc),
        "sum_total_term_freq": sum_ttf,
        "avgdl": float(avg_field_length(sum_ttf, max(int(max_doc), 1))),
        "buckets": per_bucket,
    }
    manifest["generation"] = 1
    commit_manifest(out_dir, manifest)
    return SegmentIndex.open(spark, out_dir)


def pk_split(
    spark: SparkSession,
    src_dir: str,
    out_lo: str,
    out_hi: str,
    mid_doc: int,
    stats_out: dict | None = None,
) -> tuple[SegmentIndex, SegmentIndex]:
    """PKIndexSplitter.java analogue: split at ``mid_doc`` — docs with
    doc_id < mid go to ``out_lo``, the rest to ``out_hi``. Blocks
    entirely on one side copy verbatim; only straddling blocks decode.
    ``stats_out`` receives blocks_total / blocks_copied /
    blocks_reencoded — the metadata-speed-reshard proof hook."""
    from .segments import read_manifest

    man = read_manifest(src_dir)
    if man is None:
        raise ValueError(f"no committed manifest under {src_dir}")
    blocks = spark.read.parquet(f"{src_dir}/postings")
    mid = int(mid_doc)
    lo_whole = blocks.where(F.col("last_doc") < mid)
    hi_whole = blocks.where(F.col("first_doc") >= mid)
    straddle = blocks.where(
        (F.col("first_doc") < mid) & (F.col("last_doc") >= mid)
    )
    if stats_out is not None:
        total = blocks.count()
        re_n = straddle.count()
        stats_out.update(
            blocks_total=total,
            blocks_copied=total - re_n,
            blocks_reencoded=re_n,
        )
    re = straddle.mapInPandas(
        _reencode_kernel(
            lambda d: (d >= mid).astype(np.int32)
        ),
        _KERNEL_SCHEMA,
    )
    seg_cols = [f.name for f in SEGMENT_SCHEMA.fields]
    re_lo = re.where(F.col("part") == 0).select(*seg_cols)
    re_hi = re.where(F.col("part") == 1).select(*seg_cols)
    docs = spark.read.parquet(f"{src_dir}/docs")
    lo = _write_part_store(
        spark,
        out_lo,
        lo_whole.unionByName(re_lo),
        docs.where(F.col("doc_id") < mid),
        man,
    )
    hi = _write_part_store(
        spark,
        out_hi,
        hi_whole.unionByName(re_hi),
        docs.where(F.col("doc_id") >= mid),
        man,
    )
    return lo, hi


def multipass_split(
    spark: SparkSession,
    src_dir: str,
    out_dirs: list[str],
    sequential: bool = False,
) -> list[SegmentIndex]:
    """MultiPassIndexSplitter.java analogue: N parts, round-robin
    (doc_id % N, the reference default) or sequential doc ranges.
    Round-robin interleaves every block, so every block re-encodes —
    use pk_split when ranges suffice."""
    from .segments import read_manifest

    man = read_manifest(src_dir)
    if man is None:
        raise ValueError(f"no committed manifest under {src_dir}")
    n = len(out_dirs)
    max_doc = int(man["max_doc"])
    if sequential:
        width = (max_doc + n - 1) // n

        def part_of(d: np.ndarray) -> np.ndarray:
            return np.minimum(d // width, n - 1).astype(np.int32)

        def doc_part(col):
            return F.least(
                (col / F.lit(width)).cast("int"), F.lit(n - 1)
            )

    else:

        def part_of(d: np.ndarray) -> np.ndarray:
            return (d % n).astype(np.int32)

        def doc_part(col):
            return (col % F.lit(n)).cast("int")

    blocks = spark.read.parquet(f"{src_dir}/postings")
    re = blocks.mapInPandas(_reencode_kernel(part_of), _KERNEL_SCHEMA)
    re = re.localCheckpoint()  # one decode pass feeds all N writes
    docs = spark.read.parquet(f"{src_dir}/docs")
    seg_cols = [f.name for f in SEGMENT_SCHEMA.fields]
    out = []
    for i, d in enumerate(out_dirs):
        out.append(
            _write_part_store(
                spark,
                d,
                re.where(F.col("part") == i).select(*seg_cols),
                docs.where(doc_part(F.col("doc_id")) == i),
                man,
            )
        )
    return out
