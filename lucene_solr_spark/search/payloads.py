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


def _near_ordered_walk(
    pos_lists: list,
    pay_lists: list,
    slop: int,
    expected: list | None = None,
) -> tuple[float, list]:
    """One document's NearSpansOrdered enumeration
    (lucene/core/.../spans/NearSpansOrdered.java:182-337) for
    single-term clauses (every span is [p, p+1)):

      stretchToOrder (:244-259): advance clause i until strictly after
      clause i-1 (equal-length term spans make docSpansOrdered a strict
      start comparison).
      shrinkToAfterShortestMatch (:265-337): fix the LAST clause's
      span, then walk clauses n-2..0 backward, advancing each to its
      latest occurrence before the running match start — pointers are
      left PAST the used occurrence, which is what guarantees progress;
      slop accumulates only non-overlapping gaps; a clause exhausting
      its list mid-shrink still lets the final match be evaluated
      (the reference's 'check remaining subSpans' branches).

    Returns (freq, payloads): freq = sum of 1/(matchLength+1) over
    slop-passing matches (BM25Similarity.sloppyFreq:71-73 via
    SpanScorer.setFreqCurrentDoc), payloads = the used occurrences'
    payloads of those matches (shrink's possibleMatchPayloads,
    :332-334 — collected only when the match passes)."""
    n = len(pos_lists)
    ptr = [0] * n
    freq = 0.0
    payloads: list = []
    while True:
        # stretchToOrder
        for i in range(1, n):
            while not (pos_lists[i - 1][ptr[i - 1]] < pos_lists[i][ptr[i]]):
                ptr[i] += 1
                if ptr[i] >= len(pos_lists[i]):
                    return freq, payloads
        # shrinkToAfterShortestMatch
        last = n - 1
        match_start = pos_lists[last][ptr[last]]
        match_end = match_start + 1
        last_start = match_start
        used_pay = [pay_lists[last][ptr[last]]]
        slop_acc = 0
        exhausted = False
        for i in range(n - 2, -1, -1):
            prev_start = pos_lists[i][ptr[i]]
            used = pay_lists[i][ptr[i]]
            while True:
                ptr[i] += 1
                if ptr[i] >= len(pos_lists[i]):
                    exhausted = True
                    break
                pp = pos_lists[i][ptr[i]]
                if not (pp < last_start):
                    break
                prev_start = pp
                used = pay_lists[i][ptr[i]]
            used_pay.append(used)
            if match_start > prev_start + 1:
                slop_acc += match_start - (prev_start + 1)
            match_start = prev_start
            last_start = prev_start
        if slop_acc <= slop:
            # SpanNearPayloadCheckQuery.java acceptPosition: the match
            # counts only when its used occurrences' payloads equal the
            # expected collection (order-insensitive — the reference's
            # own comment concedes order is unreliable); a missing
            # payload can never equal an expected byte array
            accept = expected is None or (
                len(used_pay) == len(expected)
                and all(p is not None for p in used_pay)
                and sorted(used_pay) == expected
            )
            if accept:
                freq += 1.0 / ((match_end - match_start) + 1)
                payloads.extend(used_pay)
        if exhausted:
            return freq, payloads


def payload_near_topk(
    docs: DataFrame,
    terms: list[str],
    slop: int,
    func: str = "avg",
    k: int = 10,
    text_col: str = "text",
    delimiter: str = "|",
    id_col: str = "doc_id",
) -> DataFrame:
    """PayloadNearQuery (lucene/core/.../payloads/PayloadNearQuery.java:
    58-66,147-201) over ordered single-term clauses: score =
    spanScore * payloadFunction.docScore, where spanScore is BM25 with
    freq = the sloppy sum over NearSpansOrdered matches and idf summed
    over the query's DISTINCT terms (SpanWeight extractTerms is a set),
    and the payload function aggregates the used occurrences' payloads
    of slop-passing matches.

    Spark shape: clause-position lists per candidate doc (docs holding
    ALL clause terms — an all-terms groupBy filter, one shuffle), the
    per-doc walk as an Arrow-batched kernel (linear in positions,
    partition-parallel), then the shared broadcast norm-interval join.
    """
    if func not in ("avg", "max", "min"):
        raise ValueError(f"unknown payload function {func!r}")
    if len(terms) < 2:
        raise ValueError("payload_near_topk needs >= 2 clauses")
    spark = docs.sparkSession
    rows = payload_token_rows(docs, text_col, delimiter, id_col)
    dls = rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dls.agg(F.sum("dl").alias("sdl")).collect()[0]
    n_docs = docs.count()
    avgdl = float(stats["sdl"]) / float(n_docs) if n_docs else 1.0
    uniq = sorted(set(terms))
    df_rows = (
        rows.where(F.col("term").isin(uniq))
        .groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .collect()
    )
    dfs = {r["term"]: r["df"] for r in df_rows}
    if any(dfs.get(t, 0) == 0 for t in uniq):
        return spark.createDataFrame([], f"{id_col} long, score double")
    idf_sum = sum(
        math.log(1 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
        for t in uniq
    )
    crows = rows.where(F.col("term").isin(uniq))
    cand = (
        crows.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "term", "payload"))
            ).alias("occ"),
            F.countDistinct("term").alias("nt"),
        )
        .where(F.col("nt") == len(uniq))
        .select(id_col, "occ")
    )
    clause_terms = list(terms)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, freqs, pfs = [], [], []
            for did, occ in zip(pdf[id_col], pdf["occ"]):
                by_term: dict = {}
                for o in occ:
                    by_term.setdefault(o["term"], ([], []))
                    by_term[o["term"]][0].append(o["pos"])
                    by_term[o["term"]][1].append(o["payload"])
                pos_lists = [by_term[t][0] for t in clause_terms]
                pay_lists = [by_term[t][1] for t in clause_terms]
                freq, pays = _near_ordered_walk(pos_lists, pay_lists, slop)
                if freq <= 0.0:
                    continue
                # occurrences without a payload are never seen by the
                # PayloadFunction (payloadsSeen not incremented) — same
                # null-ignoring contract as payload_term_topk
                pays = [p for p in pays if p is not None]
                if pays:
                    if func == "avg":
                        pf = sum(pays) / len(pays)
                    elif func == "max":
                        pf = max(pays)
                    else:
                        pf = min(pays)
                else:
                    pf = 1.0
                ids.append(did)
                freqs.append(freq)
                pfs.append(pf)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "freq": pd.Series(freqs, dtype="float64"),
                    "pf": pd.Series(pfs, dtype="float64"),
                }
            )

    matched = cand.mapInPandas(run, f"{id_col} long, freq double, pf double")
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
                F.lit(idf_sum)
                * F.lit(1.2 + 1)
                * F.col("freq")
                / (
                    F.col("freq")
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


def span_payload_check_topk(
    docs: DataFrame,
    term: str,
    payload_value: float,
    k: int = 10,
    text_col: str = "text",
    delimiter: str = "|",
    id_col: str = "doc_id",
) -> DataFrame:
    """SpanPayloadCheckQuery(SpanTermQuery(term), [payload]) — top-k
    docs where the term occurs WITH the expected payload.

    Reference (lucene/core/.../search/spans/SpanPayloadCheckQuery.
    java:30-55 acceptPosition): a position is accepted when its
    payload equals the expected bytes; a position with NO payload
    returns YES (isPayloadAvailable false -> accept). freq = number of
    accepted positions (SpanScorer: matchLength 0 -> slopFactor 1 per
    accepted match); docs with zero accepted positions never match.
    The weight's idf comes from the wrapped TERM's df (SpanWeight term
    statistics), not from the payload-filtered doc count.
    """
    spark = docs.sparkSession
    rows = payload_token_rows(docs, text_col, delimiter, id_col)
    dls = rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.count()
    sdl = dls.agg(F.sum("dl")).collect()[0][0] or 0
    avgdl = float(sdl) / float(n_docs) if n_docs else 1.0
    df_ = (
        rows.where(F.col("term") == F.lit(term))
        .select(id_col)
        .distinct()
        .count()
    )
    if df_ == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")
    idf = math.log(1 + (n_docs - df_ + 0.5) / (df_ + 0.5))
    accepted = F.col("payload").isNull() | (
        F.col("payload") == F.lit(float(payload_value))
    )
    matched = (
        rows.where((F.col("term") == F.lit(term)) & accepted)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("freq"))
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
                * F.col("freq")
                / (
                    F.col("freq")
                    + F.lit(1.2)
                    * (
                        F.lit(1 - 0.75)
                        + F.lit(0.75) * F.col("q") / F.lit(avgdl)
                    )
                )
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def span_near_payload_check_topk(
    docs: DataFrame,
    terms: list[str],
    slop: int,
    expected_payloads: list[float],
    k: int = 10,
    text_col: str = "text",
    delimiter: str = "|",
    id_col: str = "doc_id",
) -> DataFrame:
    """SpanNearPayloadCheckQuery (lucene/core/.../spans/
    SpanNearPayloadCheckQuery.java:30-60): the ordered NearSpans walk,
    but a slop-passing match is ACCEPTED only when its used
    occurrences' payloads equal the expected collection
    (order-insensitive — the reference iterates an unordered payload
    collection and says so). freq sums sloppyFreq over accepted
    matches only; score is the plain SpanScorer BM25 (no payload
    multiplication), idf summed over the clause terms' dfs."""
    if len(terms) < 2:
        raise ValueError("span_near_payload_check needs >= 2 clauses")
    expected = sorted(float(p) for p in expected_payloads)
    spark = docs.sparkSession
    rows = payload_token_rows(docs, text_col, delimiter, id_col)
    dls = rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    sdl = dls.agg(F.sum("dl")).collect()[0][0] or 0
    n_docs = docs.count()
    avgdl = float(sdl) / float(n_docs) if n_docs else 1.0
    uniq = sorted(set(terms))
    df_rows = (
        rows.where(F.col("term").isin(uniq))
        .groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .collect()
    )
    dfs = {r["term"]: r["df"] for r in df_rows}
    if any(dfs.get(t, 0) == 0 for t in uniq):
        return spark.createDataFrame([], f"{id_col} long, score double")
    idf_sum = sum(
        math.log(1 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5))
        for t in uniq
    )
    crows = rows.where(F.col("term").isin(uniq))
    cand = (
        crows.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "term", "payload"))
            ).alias("occ"),
            F.countDistinct("term").alias("nt"),
        )
        .where(F.col("nt") == len(uniq))
        .select(id_col, "occ")
    )
    clause_terms = list(terms)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, freqs = [], []
            for did, occ in zip(pdf[id_col], pdf["occ"]):
                by_term: dict = {}
                for o in occ:
                    by_term.setdefault(o["term"], ([], []))
                    by_term[o["term"]][0].append(o["pos"])
                    by_term[o["term"]][1].append(o["payload"])
                pos_lists = [by_term[t][0] for t in clause_terms]
                pay_lists = [by_term[t][1] for t in clause_terms]
                freq, _ = _near_ordered_walk(
                    pos_lists, pay_lists, slop, expected=expected
                )
                if freq <= 0.0:
                    continue
                ids.append(did)
                freqs.append(freq)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "freq": pd.Series(freqs, dtype="float64"),
                }
            )

    matched = cand.mapInPandas(run, f"{id_col} long, freq double")
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
                F.lit(idf_sum)
                * F.lit(1.2 + 1)
                * F.col("freq")
                / (
                    F.col("freq")
                    + F.lit(1.2)
                    * (
                        F.lit(1 - 0.75)
                        + F.lit(0.75) * F.col("q") / F.lit(avgdl)
                    )
                )
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
