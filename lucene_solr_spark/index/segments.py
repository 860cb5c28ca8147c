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
  - per-block (``max_tf``, ``min_nb``) = max term frequency + the norm
    byte of the smallest quantized doc length in the block. The WAND
    bound max_tf/(max_tf + cache[min_nb]) is derived at QUERY time from
    the live collection stats (the modern-Lucene BMW shape: impacts in
    the index, bound under the current similarity) — so the write path
    needs no global avgdl pass and incremental appends never invalidate
    stored bounds.
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

from ..search.bm25 import avg_field_length
from .norms import NORM_TABLE
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
        StructField("min_nb", IntegerType(), False),
        StructField("sum_tf", LongType(), False),
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


def _pack_run(
    term: str,
    bucket: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    positions: list | None,
    rows: list,
) -> None:
    """Pack one (term, split) posting run (sorted by doc_id) into block
    rows, appended to ``rows``."""
    blocks = encode_term_blocks(doc_ids, tfs, norms, positions)
    s = 0
    for blk in blocks:
        e = s + blk["num_docs"]
        nbs = norms[s:e].astype(np.int64)
        # norm byte of the smallest quantized dl: minimizes the BM25
        # denominator addend under ANY avgdl (NORM_TABLE is the decoded
        # quantized dl; the cache is monotone in it)
        min_nb = int(nbs[np.argmin(NORM_TABLE[nbs])])
        rows.append(
            (
                bucket,
                term,
                blk["num_docs"],
                blk["first_doc"],
                blk["last_doc"],
                blk["max_tf"],
                min_nb,
                int(tfs[s:e].sum()),
                blk["docs_bin"],
                blk["tfs_bin"],
                blk["norms_bin"],
                blk["pos_bin"],
            )
        )
        s = e


def _pack_frame(pdf: pd.DataFrame, keep_positions: bool, rows: list) -> None:
    """Pack every (term, split) run of a sorted frame. Run boundaries are
    found once with numpy (the frame is sorted by term, split, doc_id) —
    no pandas groupby: its per-group sub-frame materialization costs
    ~100µs × one group per RARE term, which dominates at Zipfian
    vocabularies (most terms have df < block size)."""
    terms_arr = pdf["term"].to_numpy()
    splits_arr = pdf["split"].to_numpy()
    n = len(pdf)
    change = np.flatnonzero(
        (terms_arr[1:] != terms_arr[:-1]) | (splits_arr[1:] != splits_arr[:-1])
    ) + 1
    bounds = np.concatenate(([0], change, [n]))
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    norms = pdf["norm_byte"].to_numpy(dtype=np.int64).astype(np.uint8)
    buckets = pdf["bucket"].to_numpy(dtype=np.int64)
    pos_arr = pdf["positions"].to_numpy() if keep_positions else None
    for i in range(len(bounds) - 1):
        s, e = int(bounds[i]), int(bounds[i + 1])
        positions = (
            [np.asarray(p, dtype=np.int64) for p in pos_arr[s:e]]
            if pos_arr is not None
            else None
        )
        _pack_run(
            terms_arr[s],
            int(buckets[s]),
            doc_ids[s:e],
            tfs[s:e],
            norms[s:e],
            positions,
            rows,
        )


_PACKED_COLS = [
    "bucket", "term", "num_docs", "first_doc", "last_doc", "max_tf",
    "min_nb", "sum_tf", "docs_bin", "tfs_bin", "norms_bin", "pos_bin",
]


def _rows_frame(rows: list) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=_PACKED_COLS)
    out["bucket"] = out["bucket"].astype("int32")
    out["num_docs"] = out["num_docs"].astype("int32")
    out["max_tf"] = out["max_tf"].astype("int32")
    out["min_nb"] = out["min_nb"].astype("int32")
    out["sum_tf"] = out["sum_tf"].astype("int64")
    return out


def _pack_stream(keep_positions: bool):
    """mapInPandas packer over a partition hash-partitioned by
    (term, split) and sorted by (term, split, doc_id).

    Replaces a per-group applyInPandas (one Spark group per (term, split)
    — ruinous overhead at 10^4-10^8 tiny groups) with a streaming run
    packer: thousands of groups per Arrow batch, one Python call each.
    Groups can span Arrow batch boundaries, so the trailing incomplete
    (term, split) run is carried into the next batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            # trailing run of the last (term, split) may continue in the
            # next batch — hold it back
            last_t = pdf["term"].iloc[-1]
            last_s = pdf["split"].iloc[-1]
            tail_mask = (
                (pdf["term"].to_numpy() == last_t)
                & (pdf["split"].to_numpy() == last_s)
            )
            # count the contiguous trailing True run
            flipped = tail_mask[::-1]
            n_tail = int(np.argmin(flipped)) if not flipped.all() else n
            head = pdf.iloc[: n - n_tail]
            carry = pdf.iloc[n - n_tail :]
            if len(head):
                rows: list = []
                _pack_frame(head, keep_positions, rows)
                yield _rows_frame(rows)
        if carry is not None and len(carry):
            rows = []
            _pack_frame(carry, keep_positions, rows)
            yield _rows_frame(rows)

    return run


FLUSH_POSTINGS = 2_000_000  # map-side flush threshold (16MB-RAM analogue)


def _invert_flush_partitions(split_range: int, keep_positions: bool):
    """Map-side DWPT: tokenize docs and FLUSH per-partition partial
    posting runs (one binary row per (term, split) seen in the flush)
    instead of per-(doc,term) rows. The shuffle then moves ~30x fewer
    rows, all binary — no per-posting Python objects cross Arrow.

    Mirrors the reference's flush-by-RAM
    (lucene/core/.../index/FlushByRamOrCountsPolicy.java; 16MB default
    IndexWriterConfig.java:84-90): accumulate ~FLUSH_POSTINGS tokens,
    then sort by (term, doc) and emit runs, like
    FreqProxTermsWriter.flush (:41-104) iterating terms in sorted order.

    The whole path is FLAT-array vectorized end to end: tokenize_flat
    emits token-level numpy arrays (no per-doc Python), ONE lexsort
    orders them (term, doc, pos), and the only Python loop is per
    (term, split) RUN (~vocabulary-sized) — per-doc position lists are
    never materialized, so flush cost is independent of doc count at
    fixed token count. This is the hot kernel behind the north-rule
    scaling numbers.
    """
    from ..analysis.tokenizer import tokenize_flat
    from .norms import encode_norm
    from .codec import encode_run

    def flush(parts: list[dict]) -> pd.DataFrame:
        from .codec import varint_encode, varint_value_starts

        if len(parts) > 1:
            doc = np.concatenate([p["doc"] for p in parts])
            term = np.concatenate([p["term"] for p in parts])
            pos = np.concatenate([p["pos"] for p in parts])
            nb = np.concatenate([p["nb"] for p in parts])
        else:
            p0 = parts[0]
            doc, term, pos, nb = p0["doc"], p0["term"], p0["pos"], p0["nb"]
        codes, uniques = pd.factorize(term, sort=False)
        # split = doc // split_range is monotone in doc, so sorting by
        # (code, doc, pos) makes every (term, split) run contiguous
        order = np.lexsort((pos, doc, codes))
        doc, pos, nb, codes = (
            doc[order], pos[order], nb[order], codes[order]
        )
        splits = doc // split_range
        n = len(doc)
        # token-level run boundaries on (code, split)
        run_change = np.flatnonzero(
            (codes[1:] != codes[:-1]) | (splits[1:] != splits[:-1])
        ) + 1
        run_bounds = np.concatenate(([0], run_change, [n]))
        # token-level doc boundaries (within runs; a doc never spans runs)
        doc_change = np.flatnonzero(
            (codes[1:] != codes[:-1]) | (doc[1:] != doc[:-1])
        ) + 1
        doc_starts = np.concatenate(([0], doc_change))
        doc_ends = np.concatenate((doc_change, [n]))
        tf_all = doc_ends - doc_starts  # per (doc, term) occurrence count
        # doc-group-level arrays
        dg_doc = doc[doc_starts]
        dg_nb = nb[doc_starts]
        n_dg = len(dg_doc)
        # run boundaries in doc-group index space (runs align with
        # doc-group boundaries by construction)
        run_dg = np.searchsorted(doc_starts, run_bounds)
        # BATCH ENCODE: varint streams concatenate, so ALL runs' gaps /
        # tf / position deltas are encoded in ONE vectorized call each
        # and sliced per run by value byte offsets — the Python loop
        # below only slices bytes and assembles tuples (~2 us/run).
        gaps = np.empty(n_dg, dtype=np.uint64)
        if n_dg:
            gaps[1:] = (dg_doc[1:] - dg_doc[:-1]).astype(np.uint64)
        gaps[run_dg[:-1]] = 0
        docs_stream = varint_encode(gaps)
        d_off = np.append(
            varint_value_starts(docs_stream), len(docs_stream)
        )
        tfs_stream = varint_encode((tf_all - 1).astype(np.uint64))
        t_off = np.append(
            varint_value_starts(tfs_stream), len(tfs_stream)
        )
        norms_stream = dg_nb.astype(np.uint8).tobytes()
        if keep_positions:
            deltas = np.empty(n, dtype=np.int64)
            if n:
                deltas[1:] = pos[1:] - pos[:-1]
            deltas[doc_starts] = pos[doc_starts]  # absolute per doc
            pos_stream = varint_encode(deltas.astype(np.uint64))
            p_off = np.append(
                varint_value_starts(pos_stream), len(pos_stream)
            )
        # per-run metadata, vectorized
        rs = run_dg[:-1]
        first_doc = dg_doc[rs]
        last_doc = dg_doc[run_dg[1:] - 1]
        max_tf = np.maximum.reduceat(tf_all, rs)
        sum_tf = np.add.reduceat(tf_all, rs)
        min_nb = np.minimum.reduceat(dg_nb.astype(np.int64), rs)
        num_docs = np.diff(run_dg)
        terms_out = np.asarray(uniques, dtype=object)[
            codes[run_bounds[:-1]]
        ]
        rows = []
        for i in range(len(rs)):
            ds, de = int(run_dg[i]), int(run_dg[i + 1])
            if keep_positions:
                ts, te = int(run_bounds[i]), int(run_bounds[i + 1])
                pos_bin = pos_stream[int(p_off[ts]) : int(p_off[te])]
            else:
                pos_bin = None
            rows.append(
                (
                    -1,  # bucket assigned by a Catalyst column afterwards
                    terms_out[i],
                    int(num_docs[i]),
                    int(first_doc[i]),
                    int(last_doc[i]),
                    int(max_tf[i]),
                    int(min_nb[i]),  # placeholder; final min_nb on merge
                    int(sum_tf[i]),
                    docs_stream[int(d_off[ds]) : int(d_off[de])],
                    tfs_stream[int(t_off[ds]) : int(t_off[de])],
                    norms_stream[ds:de],
                    pos_bin,
                )
            )
        return _rows_frame(rows)

    def run_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accum: list = []
        n_accum = 0
        for pdf in batches:
            fl = tokenize_flat(pdf["text"])
            if len(fl["row"]):
                docid_arr = pdf["doc_id"].to_numpy(dtype=np.int64)
                nb_per_row = encode_norm(fl["dl"])
                accum.append(
                    {
                        "doc": docid_arr[fl["row"]],
                        "term": fl["term"],
                        "pos": fl["pos"],
                        "nb": nb_per_row[fl["row"]].astype(np.uint8),
                    }
                )
                n_accum += len(fl["row"])
            if n_accum >= FLUSH_POSTINGS:
                yield flush(accum)
                accum, n_accum = [], 0
        if accum:
            yield flush(accum)

    return run_udf


# rank of each norm byte's decoded quantized dl (ties by byte value):
# min-rank within a block gives the byte that minimizes the BM25
# denominator addend under ANY avgdl (same argument as _pack_run)
_NB_RANK = np.argsort(np.argsort(NORM_TABLE, kind="stable"), kind="stable")
_BYTE_OF_RANK = np.argsort(_NB_RANK, kind="stable")


def _merge_partials_stream(
    split_range: int, keep_positions: bool, stats_dir: str | None = None
):
    """Reducer: rows hash-partitioned by (term, split) and sorted by
    (term, first_doc) — each (term, split) group's partial runs are
    contiguous. BATCH re-block (SegmentMerger.mergeTerms analogue):
    at Zipfian vocabularies most groups hold a handful of docs, so a
    per-group numpy loop pays ~350 us of call overhead per TERM; here
    the whole Arrow frame is decoded with ONE varint_decode per stream,
    doc-sorted with ONE global in-group lexsort (only when map-task doc
    ranges interleaved), and re-encoded with ONE varint_encode per
    stream, sliced per block by value byte offsets. Positions are
    byte-sliced per doc, never decoded (each doc's sub-stream starts
    with an absolute position — encode_run).

    ``stats_dir``: when set, each reduce task ALSO writes its partial
    (bucket, term, df, ttf) aggregate as a tiny parquet side file —
    the Lucene shape, where the terms dict is written during segment
    flush (lucene/core/.../index/FreqProxTermsWriter.java flush), not
    by a post-pass re-reading the postings. The write is idempotent
    under task retry/speculation: the task's input partition is
    deterministic, the part is keyed by partitionId only, and it lands
    via tmp-file + atomic rename (last writer wins with identical
    bytes). Requires ``stats_dir`` on storage every executor can reach
    — the same contract the manifest/doc-store paths already assume."""
    from .codec import varint_decode, varint_encode, varint_value_starts

    def pack_frame(
        pdf: pd.DataFrame, rows: list, stats_acc: list | None = None
    ) -> None:
        terms_arr = pdf["term"].to_numpy()
        first_doc = pdf["first_doc"].to_numpy(dtype=np.int64)
        splits_arr = first_doc // split_range
        num_docs = pdf["num_docs"].to_numpy(dtype=np.int64)
        buckets = pdf["bucket"].to_numpy(dtype=np.int64)
        npart = len(pdf)
        change = np.flatnonzero(
            (terms_arr[1:] != terms_arr[:-1])
            | (splits_arr[1:] != splits_arr[:-1])
        ) + 1
        p_bounds = np.concatenate(([0], change, [npart]))

        # ---- decode every partial in one shot ----
        docs_cat = b"".join(pdf["docs_bin"])
        tfs_cat = b"".join(pdf["tfs_bin"])
        norms_cat = b"".join(pdf["norms_bin"])
        total = int(num_docs.sum())
        gaps = varint_decode(docs_cat, total).astype(np.int64)
        tfs = varint_decode(tfs_cat, total).astype(np.int64) + 1
        norms = np.frombuffer(norms_cat, dtype=np.uint8)
        pd_starts = np.zeros(npart, dtype=np.int64)
        np.cumsum(num_docs[:-1], out=pd_starts[1:])
        pidx = np.repeat(np.arange(npart), num_docs)
        g = np.cumsum(gaps)
        docs = first_doc[pidx] + (g - g[pd_starts][pidx])

        # group bounds in doc space
        g_start_doc = pd_starts[p_bounds[:-1]]
        g_bounds_doc = np.append(g_start_doc, total)
        ngroups = len(g_start_doc)
        grp_of_doc = np.repeat(
            np.arange(ngroups), np.diff(g_bounds_doc)
        )

        if keep_positions:
            pos_cat = b"".join(x or b"" for x in pdf["pos_bin"])
            tok_off = np.append(
                varint_value_starts(pos_cat), len(pos_cat)
            )
            tf_cum = np.zeros(total + 1, dtype=np.int64)
            np.cumsum(tfs, out=tf_cum[1:])
            # per-doc position byte spans (relocatable)
            span_lo = tok_off[tf_cum[:-1]]
            span_hi = tok_off[tf_cum[1:]]

        # ---- repair interleaved map-task doc ranges (one lexsort) ----
        inner = np.ones(total, dtype=bool)
        inner[g_start_doc] = False  # group-start positions excluded
        needs_sort = bool(
            total > 1 and np.any((np.diff(docs) <= 0) & inner[1:])
        )
        if needs_sort:
            order = np.lexsort((docs, grp_of_doc))
            docs = docs[order]
            tfs = tfs[order]
            norms = norms[order]
            if keep_positions:
                span_lo = span_lo[order]
                span_hi = span_hi[order]

        # ---- re-block: every group cut into BLOCK_SIZE blocks ----
        glen = np.diff(g_bounds_doc)
        if stats_acc is not None:
            # per-(term,split) group df/ttf — summed per task below, so
            # terms_stats needs no post-pass over the postings store
            stats_acc.append(
                pd.DataFrame(
                    {
                        "bucket": buckets[p_bounds[:-1]],
                        "term": terms_arr[p_bounds[:-1]],
                        "df": glen,
                        "ttf": np.add.reduceat(tfs, g_start_doc),
                    }
                )
            )
        nb_per_group = (glen + BLOCK_SIZE - 1) // BLOCK_SIZE
        nblocks = int(nb_per_group.sum())
        block_group = np.repeat(np.arange(ngroups), nb_per_group)
        nb_excl = np.zeros(ngroups, dtype=np.int64)
        np.cumsum(nb_per_group[:-1], out=nb_excl[1:])
        within = np.arange(nblocks) - nb_excl[block_group]
        b_start = g_start_doc[block_group] + within * BLOCK_SIZE
        b_end = np.minimum(
            b_start + BLOCK_SIZE, g_bounds_doc[1:][block_group]
        )

        # ---- encode all blocks' streams in one call each ----
        new_gaps = np.empty(total, dtype=np.int64)
        if total > 1:
            new_gaps[1:] = docs[1:] - docs[:-1]
        new_gaps[b_start] = 0
        docs_stream = varint_encode(new_gaps.astype(np.uint64))
        d_off = np.append(
            varint_value_starts(docs_stream), len(docs_stream)
        )
        tfs_stream = varint_encode((tfs - 1).astype(np.uint64))
        t_off = np.append(
            varint_value_starts(tfs_stream), len(tfs_stream)
        )
        norms_stream = norms.tobytes()

        # ---- per-block metadata, vectorized ----
        first_b = docs[b_start]
        last_b = docs[b_end - 1]
        max_tf = np.maximum.reduceat(tfs, b_start)
        sum_tf = np.add.reduceat(tfs, b_start)
        min_rank = np.minimum.reduceat(
            _NB_RANK[norms.astype(np.int64)], b_start
        )
        min_nb = _BYTE_OF_RANK[min_rank]
        term_b = terms_arr[p_bounds[:-1]][block_group]
        bucket_b = buckets[p_bounds[:-1]][block_group]
        ndocs_b = b_end - b_start

        if keep_positions and needs_sort:
            # positions must follow the doc permutation: rebuild the
            # buffer from permuted per-doc spans (Python slicing loop,
            # only on interleaved frames)
            pos_cat = b"".join(
                pos_cat[int(a) : int(b)]
                for a, b in zip(span_lo, span_hi)
            )
            lens = span_hi - span_lo
            span_lo = np.zeros(total, dtype=np.int64)
            np.cumsum(lens[:-1], out=span_lo[1:])
            span_hi = span_lo + lens

        for i in range(nblocks):
            ds, de = int(b_start[i]), int(b_end[i])
            pos_bin = None
            if keep_positions:
                pos_bin = pos_cat[
                    int(span_lo[ds]) : int(span_hi[de - 1])
                ]
            rows.append(
                (
                    int(bucket_b[i]),
                    term_b[i],
                    int(ndocs_b[i]),
                    int(first_b[i]),
                    int(last_b[i]),
                    int(max_tf[i]),
                    int(min_nb[i]),
                    int(sum_tf[i]),
                    docs_stream[int(d_off[ds]) : int(d_off[de])],
                    tfs_stream[int(t_off[ds]) : int(t_off[de])],
                    norms_stream[ds:de],
                    pos_bin,
                )
            )

    def _flush_stats(stats_acc: list) -> None:
        """Write this task's (bucket, term, df, ttf) partial aggregate
        as one tiny parquet side file (tmp + atomic rename; content is
        canonical-sorted so retries produce identical bytes)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        if stats_acc:
            sdf = (
                pd.concat(stats_acc, ignore_index=True)
                .groupby(["bucket", "term"], as_index=False)
                .sum()
                .sort_values(["bucket", "term"], ignore_index=True)
            )
        else:
            sdf = pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int64"),
                    "term": pd.Series([], dtype="object"),
                    "df": pd.Series([], dtype="int64"),
                    "ttf": pd.Series([], dtype="int64"),
                }
            )
        # explicit schema: an empty object Series would otherwise be
        # inferred as a `term: null` parquet column, which conflicts
        # with populated parts' `term: string` at read time and crashes
        # the multi-part stats read on any empty reduce partition
        stats_schema = pa.schema(
            [
                ("bucket", pa.int64()),
                ("term", pa.string()),
                ("df", pa.int64()),
                ("ttf", pa.int64()),
            ]
        )
        os.makedirs(stats_dir, exist_ok=True)
        tmp = os.path.join(
            stats_dir, f".part-{pid:05d}-{os.getpid()}.tmp"
        )
        pq.write_table(
            pa.Table.from_pandas(
                sdf, schema=stats_schema, preserve_index=False
            ),
            tmp,
        )
        os.replace(tmp, os.path.join(stats_dir, f"part-{pid:05d}.parquet"))

    def run_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        stats_acc: list | None = [] if stats_dir is not None else None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            last_t = pdf["term"].iloc[-1]
            last_s = int(pdf["first_doc"].iloc[-1]) // split_range
            tail_mask = (
                (pdf["term"].to_numpy() == last_t)
                & (
                    pdf["first_doc"].to_numpy(dtype=np.int64) // split_range
                    == last_s
                )
            )
            flipped = tail_mask[::-1]
            n_tail = int(np.argmin(flipped)) if not flipped.all() else n
            head = pdf.iloc[: n - n_tail]
            carry = pdf.iloc[n - n_tail :]
            if len(head):
                rows: list = []
                pack_frame(head, rows, stats_acc)
                yield _rows_frame(rows)
        if carry is not None and len(carry):
            rows = []
            pack_frame(carry, rows, stats_acc)
            yield _rows_frame(rows)
        if stats_acc is not None:
            _flush_stats(stats_acc)

    return run_udf


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
        # ONE full-width shuffle keyed by (term, split): the doc-range
        # split both salts skewed high-df terms across reducers AND keeps
        # every reducer's task count = spark.sql.shuffle.partitions (the
        # old per-bucket repartition capped parallelism at n_buckets).
        shuffled = flat.repartition("term", "split").sortWithinPartitions(
            "term", "split", "doc_id"
        )
        packed = shuffled.mapInPandas(
            _pack_stream(keep_positions), SEGMENT_SCHEMA
        )
        # per-bucket block counts observed DURING the write job — no
        # second read-back pass over the store
        from pyspark.sql import Observation

        obs = Observation()
        packed = packed.observe(
            obs,
            *[
                F.sum(
                    F.when(F.col("bucket") == b, 1).otherwise(0)
                ).alias(f"b{b}")
                for b in todo
            ],
        )
        (
            packed.write.mode("append")
            .partitionBy("bucket")
            .parquet(f"{index_dir}/postings")
        )
        observed = obs.get
        for b in todo:
            manifest["buckets"][str(b)] = {
                "blocks": int(observed.get(f"b{b}") or 0),
                "committed_at_gen": manifest["generation"] + 1,
            }
    manifest["generation"] += 1
    commit_manifest(index_dir, manifest)
    return SegmentIndex.open(spark, index_dir)


def build_segment_store(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_buckets: int = 16,
    keep_positions: bool = True,
    split_range: int | None = None,
    text_col: str = "text",
    order_cols: list[str] | None = None,
) -> "SegmentIndex":
    """End-to-end segment build with a SINGLE tokenize pass.

    Contrast with build_index + write_segments (3 inversion passes:
    stats agg, terms_stats write, pack): here the numbered doc store is
    materialized first, the pack pass is the only inversion, and both
    terms_stats and the collection stats are derived afterwards from
    block METADATA only (df = Σ num_docs, ttf = Σ sum_tf per term —
    parquet column pruning never touches the binary block columns).
    This is the Lucene shape too: stats live in the segment files, not
    in a separate corpus pass (SegmentInfos / TermContext accumulation).

    Resume-safe at bucket granularity like write_segments: stats are
    recomputed from the on-disk blocks, so they cover buckets committed
    by a previous crashed run."""
    import time as _time

    phases: dict[str, float] = {}

    def _mark(name: str, t0: float) -> float:
        phases[name] = round(_time.perf_counter() - t0, 3)
        return _time.perf_counter()

    _t = _time.perf_counter()
    os.makedirs(index_dir, exist_ok=True)
    manifest = read_manifest(index_dir)
    if manifest is None:
        if "doc_id" not in docs.columns:
            from .docids import assign_doc_ids

            docs = assign_doc_ids(
                docs, order_cols or ["conv_id", "turn_idx"]
            )
        _t = _mark("plan_docids", _t)
        docs.write.mode("overwrite").parquet(f"{index_dir}/docs")
        _t = _mark("docs_write", _t)
        manifest = {
            "generation": 0,
            "n_buckets": n_buckets,
            "block_size": BLOCK_SIZE,
            "split_range": split_range,
            "keep_positions": keep_positions,
            "max_doc": 0,  # filled from the doc store below
            "sum_total_term_freq": 0,  # filled from block metadata below
            "avgdl": 0.0,
            "buckets": {},
        }
    else:
        n_buckets = manifest["n_buckets"]
        keep_positions = manifest["keep_positions"]
        split_range = manifest.get("split_range", SPLIT_RANGE)
    stored = spark.read.parquet(f"{index_dir}/docs")
    n_docs = stored.count()  # parquet footer count — metadata-only

    if split_range is None:
        # Doc-range salt for the pack shuffle. With map-side flush the
        # shuffle rows are binary partial RUNS (not per-posting rows), so
        # a Zipf-head term's whole group is a cheap vectorized merge —
        # the salt only has to bound group size in memory, hence the
        # coarse default (2^20 docs ≈ one group few MB even at tf-heavy
        # fields). Salt granularity is therefore independent of
        # parallelism, and rare-term blocks never fragment.
        split_range = SPLIT_RANGE
        manifest["split_range"] = split_range

    done: set[str] = set(manifest["buckets"])
    todo = [b for b in range(n_buckets) if str(b) not in done]
    # Fresh full build: reduce tasks side-write their partial term stats
    # (see _merge_partials_stream) so terms_stats derives from a tiny
    # parts scan instead of a post-pass over the whole postings store.
    # A resumed build mixes generations in the parts dir, so it falls
    # back to the metadata read-back (which covers resumed buckets).
    full_build = len(todo) == n_buckets
    stats_dir = f"{index_dir}/_term_stats_parts"
    stats_from_parts = False
    sum_ttf: int | None = None
    if todo:
        import shutil

        for b in todo:
            part_dir = f"{index_dir}/postings/bucket={b}"
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
        if os.path.isdir(stats_dir):
            shutil.rmtree(stats_dir)
        src_df = stored.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col(text_col).cast("string").alias("text"),
        )
        # map-side DWPT flush: per-partition partial posting runs (binary,
        # one row per (term, split) per flush) -> ~30x fewer, object-free
        # shuffle rows vs per-(doc,term) postings
        partials = src_df.mapInPandas(
            _invert_flush_partitions(split_range, keep_positions),
            SEGMENT_SCHEMA,
        ).withColumn("bucket", _bucket_col(F.col("term"), n_buckets))
        if len(todo) < n_buckets:
            partials = partials.where(F.col("bucket").isin(todo))
        split_expr = (
            F.col("first_doc") / F.lit(split_range)
        ).cast("long")
        shuffled = partials.repartition(
            split_expr, F.col("term")
        ).sortWithinPartitions("term", "first_doc")
        packed = shuffled.mapInPandas(
            _merge_partials_stream(
                split_range,
                keep_positions,
                stats_dir=stats_dir if full_build else None,
            ),
            SEGMENT_SCHEMA,
        )
        from pyspark.sql import Observation

        obs = Observation()
        packed = packed.observe(
            obs,
            F.sum("num_docs").alias("nd_total"),
            F.sum("sum_tf").alias("tf_total"),
            *[
                F.sum(
                    F.when(F.col("bucket") == b, 1).otherwise(0)
                ).alias(f"b{b}")
                for b in todo
            ],
        )
        (
            packed.write.mode("append")
            .partitionBy("bucket")
            .parquet(f"{index_dir}/postings")
        )
        observed = obs.get
        for b in todo:
            manifest["buckets"][str(b)] = {
                "blocks": int(observed.get(f"b{b}") or 0),
                "committed_at_gen": manifest["generation"] + 1,
            }
        _t = _mark("pack_write", _t)

        if full_build and os.path.isdir(stats_dir):
            # validate the side parts against totals observed during
            # the SAME write job; any mismatch (lost part file) falls
            # back to the read-back path
            parts = spark.read.parquet(stats_dir)
            agg = parts.agg(
                F.sum("df").alias("df"), F.sum("ttf").alias("ttf")
            ).collect()[0]
            if int(agg["df"] or 0) == int(
                observed.get("nd_total") or 0
            ) and int(agg["ttf"] or 0) == int(
                observed.get("tf_total") or 0
            ):
                (
                    parts.groupBy("term", "bucket")
                    .agg(
                        F.sum("df").alias("df"),
                        F.sum("ttf").alias("ttf"),
                    )
                    .select(
                        "term",
                        "df",
                        "ttf",
                        F.col("bucket").cast("int").alias("bucket"),
                    )
                    .write.mode("overwrite")
                    .parquet(f"{index_dir}/terms_stats")
                )
                sum_ttf = int(observed.get("tf_total") or 0)
                stats_from_parts = True

    if not stats_from_parts:
        # stats + terms_stats from block metadata (covers resumed buckets)
        blocks_meta = spark.read.parquet(f"{index_dir}/postings").select(
            "bucket", "term", "num_docs", "sum_tf"
        )
        (
            blocks_meta.groupBy("term", "bucket")
            .agg(
                F.sum("num_docs").alias("df"),
                F.sum("sum_tf").alias("ttf"),
            )
            .select("term", "df", "ttf", "bucket")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/terms_stats")
        )
    _t = _mark("terms_stats", _t)
    if sum_ttf is None:
        ts = spark.read.parquet(f"{index_dir}/terms_stats")
        sum_ttf = int(ts.agg(F.sum("ttf")).collect()[0][0] or 0)
    max_doc = n_docs
    _t = _mark("stats", _t)
    manifest["max_doc"] = int(max_doc)
    manifest["sum_total_term_freq"] = sum_ttf
    manifest["avgdl"] = float(
        avg_field_length(sum_ttf, max_doc)
    )
    manifest["generation"] += 1
    manifest["build_phase_sec"] = phases  # north-rule metrics: per-phase
    commit_manifest(index_dir, manifest)
    if os.environ.get("LSS_BUILD_TIMINGS"):
        print("BUILD_PHASES", json.dumps(phases))
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


def read_manifest(
    index_dir: str, generation: int | None = None
) -> dict | None:
    """Committed manifest — the latest generation (highest segments_N,
    SegmentInfos.getLastCommitGeneration) or, with ``generation``, a
    SPECIFIC retained commit point (IndexCommit / the
    KeepOnlyLastCommit-vs-keep-all IndexDeletionPolicy axis,
    lucene/core/.../index/IndexDeletionPolicy.java +
    DirectoryReader.open(IndexCommit)); raises FileNotFoundError when
    that generation was never committed."""
    if not os.path.isdir(index_dir):
        return None
    if generation is not None:
        path = f"{index_dir}/segments_{int(generation)}.json"
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"no commit point segments_{generation} under {index_dir}"
            )
        with open(path) as f:
            return json.load(f)
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
        self._split_meta_cache: "dict[str, pd.DataFrame]" = {}
        # Optional per-split term blooms (index/bloom.py, the
        # BloomFilteringPostingsFormat analogue). None until a caller
        # attaches one; postings_for_terms then intersects its split
        # pruning with the bloom's maybe-set.
        self.blooms = None

    def attach_blooms(self, build: bool = False) -> "SegmentIndex":
        """Load (or build-and-load) the per-split term blooms and turn
        on bloom split pruning for this view. Returns self."""
        from .bloom import BloomIndex, build_blooms

        if build:
            build_blooms(self)
        self.blooms = BloomIndex.open(self)
        return self

    _SPLIT_META_CACHE_MAX = 4096  # terms; FIFO evict past this

    def split_meta(self, terms: list[str]) -> "pd.DataFrame":
        """Per-(term, split) block metadata for the WAND bound pass:
        columns (term, split, max_tf, min_nb, nd), one row per block.

        Memoized per TERM on the driver — the TermStates / skip-data
        cache analogue (Lucene readers keep term metadata hot per
        segment; here the unit is the query term). Terms not yet cached
        are fetched in ONE narrow job: filter + project + toPandas via
        Arrow, no shuffle — the groupBy that used to run per query now
        happens driver-side in pandas over ≤ (#splits × #blocks/split)
        rows per term (~10^6 at 10^12 docs, the same bounded-metadata
        budget as the bound pass itself)."""
        missing = sorted(
            {t for t in terms if t not in self._split_meta_cache}
        )
        if missing:
            fetched = (
                self.blocks.where(
                    F.col("bucket").isin(self.buckets_of(missing))
                    & F.col("term").isin(missing)
                )
                .select(
                    "term",
                    (F.col("first_doc") / F.lit(self.split_range))
                    .cast("long")
                    .alias("split"),
                    "max_tf",
                    "min_nb",
                    F.col("num_docs").alias("nd"),
                )
                .toPandas()
            )
            for t in missing:
                self._split_meta_cache[t] = fetched[
                    fetched["term"] == t
                ].reset_index(drop=True)
            while (
                len(self._split_meta_cache) > self._SPLIT_META_CACHE_MAX
            ):
                self._split_meta_cache.pop(
                    next(iter(self._split_meta_cache))
                )
        frames = [self._split_meta_cache[t] for t in sorted(set(terms))]
        return pd.concat(frames, ignore_index=True)

    @classmethod
    def open(
        cls,
        spark: SparkSession,
        index_dir: str,
        generation: int | None = None,
    ) -> "SegmentIndex":
        """Open the latest commit, or — time travel — a specific
        retained commit point (DirectoryReader.open(IndexCommit) over a
        keep-commits IndexDeletionPolicy; the Iceberg snapshot-id read
        analogue)."""
        manifest = read_manifest(index_dir, generation=generation)
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
        self,
        terms: list[str],
        want_positions: bool = False,
        splits: list[int] | None = None,
    ) -> DataFrame:
        """Pruned decode: bucket partition pruning + term row-group
        pruning happen BEFORE decode (the .tip/FST lookup analogue).
        ``splits``: optionally restrict to the given doc-range splits
        (first_doc // split_range) — the skip-list analogue the WAND
        paths use to decode only bound-surviving splits.

        With blooms attached (attach_blooms), the candidate splits are
        further intersected with the bloom's maybe-set — the
        BloomFilteringPostingsFormat.java:324 NO-answer short-circuit:
        a term absent from every split never touches the blocks scan."""
        if self.blooms is not None:
            maybe = self.blooms.splits_for(list(terms))
            n_splits = self.stats.max_doc // self.split_range + 1
            if splits is None and len(maybe) >= n_splits:
                pass  # bloom excludes nothing — keep the unpruned scan
            else:
                splits = sorted(
                    maybe if splits is None else (set(splits) & maybe)
                )
                if not splits:
                    return self.blocks.where(F.lit(False)).mapInPandas(
                        _decode_partitions(False), DECODED_SCHEMA
                    )
        pruned = self.blocks.where(
            F.col("bucket").isin(self.buckets_of(terms))
            & F.col("term").isin(list(terms))
        )
        if splits is not None:
            pruned = pruned.where(
                (F.col("first_doc") / F.lit(self.split_range))
                .cast("long")
                .isin(list(splits))
            )
        return pruned.mapInPandas(
            _decode_partitions(
                want_positions and self.manifest["keep_positions"]
            ),
            DECODED_SCHEMA,
        )

    def postings_for_matched(
        self, matched: DataFrame, want_positions: bool = False
    ) -> DataFrame:
        """Pruned decode for an UNBOUNDED matched-term frame (broad
        multi-term expansions): broadcast-semi-join the term set against
        the block scan instead of collecting the dictionary to the
        driver (MultiTermQuery rewrite beyond the 1024-clause cap,
        BooleanQuery.java:42). Bucket is recomputed on the matched side
        so the join key (bucket, term) aligns with the partition column
        — parquet row-group stats on term still prune the scan."""
        m = matched.select("term").withColumn(
            "bucket", _bucket_col(F.col("term"), self.n_buckets)
        )
        pruned = self.blocks.join(
            F.broadcast(m), on=["bucket", "term"], how="left_semi"
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
