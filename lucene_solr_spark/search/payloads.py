"""Payload queries — per-occurrence weights carried in the token stream.

Reference mapping:
  - DelimitedPayloadTokenFilter (lucene/analysis/common/src/java/org/
    apache/lucene/analysis/payloads/DelimitedPayloadTokenFilter.java:
    30-75): a whitespace token ``term|3.5`` splits at the LAST
    delimiter into the term and a float payload (FloatEncoder /
    PayloadHelper.encodeFloat); tokens without the delimiter carry no
    payload.
  - PayloadTermQuery (lucene/core/src/java/org/apache/lucene/search/
    payloads/PayloadTermQuery.java:80-150): score = spanScore *
    payloadScore, where spanScore is the similarity's term score
    (single-term spans have matchLength 0, slop factor 1, so freq =
    tf) and payloadScore combines the per-occurrence payload factors
    via a PayloadFunction.
  - PayloadFunction (AveragePayloadFunction.java:30-37,
    MaxPayloadFunction.java, MinPayloadFunction.java): occurrences
    WITHOUT a payload are not seen (payloadsSeen stays 0); docScore
    falls back to 1 when no payloads were seen.

Spark shape: pure Catalyst — posexplode over a whitespace split, a
substring_index parse, one groupBy(doc) aggregating tf + the payload
function, a broadcast interval join for the quantized norm, and a
TakeOrderedAndProject top-k. No UDFs anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..index.norms import NORM_TABLE, encode_norm

_DL_MAX = 100_000

_PAYLOAD_FUNCS = {"avg": F.avg, "max": F.max, "min": F.min}


def payload_token_rows(
    docs: DataFrame,
    text_col: str = "text",
    delimiter: str = "|",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, term, payload) rows: whitespace tokenization, then the
    DelimitedPayloadTokenFilter split — term = text before the LAST
    delimiter, payload = float after it, NULL payload when the token
    has no delimiter. Terms are lowercased (the filter normally sits
    after LowerCaseFilter)."""
    toks = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    ).where(F.col("token") != "")
    has_p = F.col("token").contains(delimiter)
    term = F.lower(
        F.when(
            has_p, F.substring_index("token", delimiter, 1)
        ).otherwise(F.col("token"))
    )
    payload = F.when(
        has_p, F.substring_index("token", delimiter, -1).cast("double")
    )
    return toks.select(
        id_col,
        "pos",
        term.alias("term"),
        payload.alias("payload"),
    )


def _qdl_intervals(spark) -> DataFrame:
    """Broadcast-size (lo, hi, q) rows mapping a doc length interval to
    its quantized value (floatToByte315 -> NORM_TABLE decode) — the
    same table the SQL oracle inlines, generated from the engine's own
    norm code so the two agree by construction."""
    dls = np.arange(1, _DL_MAX + 1)
    bs = encode_norm(dls).astype(int)
    rows = []
    start = 0
    for i in range(1, len(dls) + 1):
        if i == len(dls) or bs[i] != bs[start]:
            rows.append(
                (int(dls[start]), int(dls[i - 1]), float(NORM_TABLE[bs[start]]))
            )
            start = i
    return spark.createDataFrame(rows, "lo long, hi long, q double")


def payload_term_topk(
    docs: DataFrame,
    term: str,
    func: str = "avg",
    k: int = 10,
    text_col: str = "text",
    delimiter: str = "|",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k (doc_id, score) for a PayloadTermQuery over a payloaded
    corpus: BM25 term score (freq = tf, quantized norm over the
    whitespace-token doc length) multiplied by the payload function
    over the term's occurrences (includeSpanScore=true,
    PayloadTermQuery.java:144-149)."""
    if func not in _PAYLOAD_FUNCS:
        raise ValueError(f"unknown payload function {func!r}")
    spark = docs.sparkSession
    rows = payload_token_rows(docs, text_col, delimiter, id_col)
    dls = rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dls.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")
    ).collect()[0]
    # maxDoc counts every doc, including token-less ones (Lucene's
    # collectionStatistics.maxDoc)
    n_docs = docs.count()
    avgdl = (
        float(stats["sdl"]) / float(n_docs) if n_docs else 1.0
    )
    df_ = (
        rows.where(F.col("term") == F.lit(term))
        .select(id_col)
        .distinct()
        .count()
    )
    if df_ == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")
    idf = math.log(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))
    pf = F.coalesce(_PAYLOAD_FUNCS[func]("payload"), F.lit(1.0))
    matched = (
        rows.where(F.col("term") == F.lit(term))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("tf"), pf.alias("pf"))
    )
    qdl = _qdl_intervals(spark)
    scored = (
        matched.join(dls, id_col)
        .join(
            F.broadcast(qdl),
            (F.col("dl") >= F.col("lo")) & (F.col("dl") <= F.col("hi")),
        )
        .select(
            id_col,
            (
                F.lit(idf)
                * F.lit(1.2 + 1)
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(1 - 0.75)
                        + F.lit(0.75) * F.col("q") / F.lit(avgdl)
                    )
                )
                * F.col("pf")
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
