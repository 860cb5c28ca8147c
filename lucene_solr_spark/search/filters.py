"""Filter algebra from lucene/queries + sandbox — non-scoring DocSet
operators composed as DataFrame set algebra.

References:
  - TermsFilter (lucene/queries/src/java/org/apache/lucene/queries/
    TermsFilter.java): docs containing ANY of an explicit term list —
    the classic security-/routing-filter shape.
  - BooleanFilter (.../queries/BooleanFilter.java:47-107): clause
    algebra without scores — every MUST, at least one SHOULD (when any
    SHOULD exists), no MUST_NOT.
  - ChainedFilter (.../queries/ChainedFilter.java:102-190): left fold
    over a filter chain with per-step logic OR / AND / ANDNOT / XOR;
    the initial accumulator is the first filter for AND, the
    COMPLEMENT of the first filter for ANDNOT, and the empty set for
    OR/XOR (initialResult:131-149).
  - DuplicateFilter (lucene/sandbox/.../sandbox/queries/
    DuplicateFilter.java:38-78): keep exactly one doc per distinct
    value of a field — the first or last occurrence (KeepMode); docs
    without the field never match.

Spark shape: each filter is a doc_id frame; composition is
semi/anti-joins and unions on doc_id (the partitioning postings
already have). The ChainedFilter complement needs the doc universe —
one column off the doc store, never collected.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher

OR, AND, ANDNOT, XOR = 0, 1, 2, 3  # ChainedFilter.java:49-52


def terms_filter(searcher: Searcher, terms: list[str]) -> DataFrame:
    """TermsFilter.java: the union of the terms' doc sets."""
    stats = searcher.index.term_stats(sorted(set(terms)))
    present = [t for t in set(terms) if t in stats]
    if not present:
        return searcher.index.spark.createDataFrame([], "doc_id long")
    return searcher._postings_for(present).select("doc_id").distinct()


def boolean_filter(
    searcher: Searcher,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
) -> DataFrame:
    """BooleanFilter.java:47-107 — non-scoring clause algebra over term
    filters: all MUST, >=1 SHOULD (when any), no MUST_NOT."""
    must, should, must_not = must or [], should or [], must_not or []
    out: DataFrame | None = None
    if should:
        out = terms_filter(searcher, should)
    for t in must:
        m = terms_filter(searcher, [t])
        out = m if out is None else out.join(m, "doc_id", "left_semi")
    if out is None:
        raise ValueError("BooleanFilter needs a MUST or SHOULD clause")
    if must_not:
        out = out.join(
            terms_filter(searcher, must_not), "doc_id", "left_anti"
        )
    return out


def chained_filter(
    universe: DataFrame,
    chain: list[DataFrame],
    logic: int | list[int] = OR,
) -> DataFrame:
    """ChainedFilter.java doChain fold. ``universe`` is the live doc_id
    frame (reader.maxDoc domain) — needed only by ANDNOT's complement.
    ``logic`` is one op for the whole chain or one per filter."""
    if not chain:
        raise ValueError("empty filter chain")
    logics = (
        [logic] * len(chain) if isinstance(logic, int) else list(logic)
    )
    if len(logics) != len(chain):
        # ChainedFilter.java:180 IllegalArgumentException
        raise ValueError("Invalid number of elements in logic array")
    uni = universe.select("doc_id")
    first = chain[0].select("doc_id").distinct()
    if logics[0] == AND:
        acc = first
    elif logics[0] == ANDNOT:
        acc = uni.join(first, "doc_id", "left_anti")
    else:  # OR / XOR start from the empty set: empty OP f == f for OR,
        # empty XOR f == f — so seed with the first filter directly
        acc = first
    for f_, op in zip(chain[1:], logics[1:]):
        cur = f_.select("doc_id").distinct()
        if op == OR:
            acc = acc.unionByName(cur).distinct()
        elif op == AND:
            acc = acc.join(cur, "doc_id", "left_semi")
        elif op == ANDNOT:
            acc = acc.join(cur, "doc_id", "left_anti")
        elif op == XOR:
            both = acc.join(cur, "doc_id", "left_semi")
            acc = (
                acc.unionByName(cur)
                .distinct()
                .join(both, "doc_id", "left_anti")
            )
        else:
            raise ValueError(f"unknown chain logic {op}")
    return acc


def duplicate_filter(
    docs: DataFrame,
    field: str,
    keep_mode: str = "last",
    id_col: str = "doc_id",
) -> DataFrame:
    """DuplicateFilter.java: one doc per distinct ``field`` value —
    KM_USE_FIRST_OCCURRENCE keeps the lowest doc id per value,
    KM_USE_LAST_OCCURRENCE the highest; NULL-field docs never match.
    One hash agg (min/max per value), no window."""
    agg = F.min(id_col) if keep_mode == "first" else F.max(id_col)
    return (
        docs.where(F.col(field).isNotNull())
        .groupBy(field)
        .agg(agg.alias(id_col))
        .select(id_col)
    )
