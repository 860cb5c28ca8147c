"""Distributed inverted-index build — the IndexWriter analogue.

Reference lifecycle (SURVEY.md §3.1; lucene/core/.../index/IndexWriter.java,
DocumentsWriterPerThread.java): per-thread private in-memory segments
(DWPT) -> sorted-term flush -> k-way merge. The Spark-first shape:

  partitioned docs
    -> mapInPandas local inversion (DWPT analogue; Arrow-batched, numpy)
    -> (flat postings rows: term, doc_id, tf, positions, dl, norm_byte)
    -> groupBy/shuffle by term for stats
    -> optional segment packing (codec.py): shuffle by hash(term) % B,
       sort, delta-varint block encoding with block-max metadata.

Scale notes (100 TB / 10^12 turns):
  - The tokenize pass is embarrassingly parallel: no shuffle until the
    term-hash exchange, which is the unavoidable "flush+merge" exchange.
  - dl / norm_byte are computed inside the tokenize pass and denormalized
    onto every posting row, so BM25 query-time needs NO join to a norms
    table (Lucene reads .nrm by docID; we pay 1 byte/post instead — the
    classic space-for-shuffle trade at cluster scale).
  - terms_stats is a partial+final hash aggregate (map-side combine),
    so the hot-term skew never concentrates raw rows on one reducer.
  - doc_id assignment for tables without one is a 2-pass range-partitioned
    row numbering (docids.py) — no single-partition window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..analysis.tokenizer import invert_batch
from .norms import encode_norm

POSTINGS_FLAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("term", StringType(), False),
        StructField("tf", IntegerType(), False),
        StructField("positions", ArrayType(IntegerType(), False), True),
        StructField("dl", IntegerType(), False),
        StructField("norm_byte", IntegerType(), False),
    ]
)


@dataclass
class CollectionStats:
    """IndexSearcher.collectionStatistics analogue
    (lucene/core/.../search/IndexSearcher.java:889-906)."""

    max_doc: int
    sum_total_term_freq: int

    @property
    def avgdl(self) -> float:
        from ..search.bm25 import avg_field_length

        return float(
            avg_field_length(self.sum_total_term_freq, self.max_doc)
        )


@dataclass
class InvertedIndex:
    """The queryable index: flat postings + stats + (lazy) doc store."""

    spark: SparkSession
    docs: DataFrame  # original rows + doc_id (stored fields analogue)
    postings: DataFrame  # POSTINGS_FLAT_SCHEMA
    terms_stats: DataFrame  # (term, df, ttf)
    stats: CollectionStats

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """TermContext.build analogue — df/ttf for the query's terms only
        (lucene/core/.../index/TermContext.java:81-119). Predicate pushdown
        makes this a pruned scan, and the result is tiny (one row/term)."""
        rows = (
            self.terms_stats.where(F.col("term").isin(terms))
            .select("term", "df", "ttf")
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}


def _invert_partitions(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """DWPT analogue: local inversion per Arrow batch; vectorized norm
    encode (SmallFloat.floatToByte315) on the batch."""
    yield from _invert_partitions_opts(batches, True)


def _invert_partitions_opts(
    batches: Iterator[pd.DataFrame],
    with_positions: bool,
    analyzer=None,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        flat = invert_batch(
            pdf["doc_id"],
            pdf["text"],
            with_positions=with_positions,
            analyzer=analyzer,
        )
        if len(flat) == 0:
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "term": pd.Series([], dtype="object"),
                    "tf": pd.Series([], dtype="int32"),
                    "positions": pd.Series([], dtype="object"),
                    "dl": pd.Series([], dtype="int32"),
                    "norm_byte": pd.Series([], dtype="int32"),
                }
            )
            continue
        flat["norm_byte"] = encode_norm(flat["dl"].to_numpy()).astype("int32")
        yield flat


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    order_cols: list[str] | None = None,
    cache: bool = False,
    positions: bool = True,
    analyzer=None,
) -> InvertedIndex:
    """Build the inverted index over ``docs``.

    ``positions=False`` is the DOCS_AND_FREQS IndexOptions mode
    (lucene/core/.../index/FieldInfo.java IndexOptions enum): phrase
    queries need positions; pure BM25 term/Boolean scoring does not, and
    skipping them roughly halves the Arrow traffic out of the tokenize
    stage.

    ``analyzer``: optional replacement for the pinned chain (e.g.
    ``make_analyzer(stem=True)``) — the custom-Analyzer extension slot.
    If ``doc_id_col`` is absent, dense int64 docIDs are assigned by the
    scalable 2-pass row numbering over ``order_cols`` (default
    (conv_id, turn_idx) — the pinned stable ordering, mirroring Lucene's
    insertion-order docIDs).
    """
    if doc_id_col not in docs.columns:
        from .docids import assign_doc_ids

        order_cols = order_cols or ["conv_id", "turn_idx"]
        docs = assign_doc_ids(docs, order_cols, doc_id_col)

    src = docs.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
    )
    postings = src.mapInPandas(
        lambda it: _invert_partitions_opts(it, positions, analyzer),
        POSTINGS_FLAT_SCHEMA,
    )

    # terms_stats: partial+final hash agg — Lucene's TermContext df/ttf
    # accumulation across segments (TermContext.java:81-119) as a Spark agg.
    terms_stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
    )

    if cache:
        postings = postings.cache()
        terms_stats = terms_stats.cache()

    max_doc = docs.count()
    row = postings.agg(F.sum("tf").alias("sttf")).collect()[0]
    sum_ttf = int(row["sttf"] or 0)

    return InvertedIndex(
        spark=spark,
        docs=docs,
        postings=postings,
        terms_stats=terms_stats,
        stats=CollectionStats(max_doc=max_doc, sum_total_term_freq=sum_ttf),
    )
