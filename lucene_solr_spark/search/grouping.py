"""Grouping extras — ngroups and group.facet (SURVEY.md §2.5; the r3
verdict's missing-feature #3).

References:
  - solr/core/src/java/org/apache/solr/search/Grouping.java:581
    (``ngroups``: the TOTAL number of matching groups returned alongside
    the per-group page when group.ngroups=true).
  - group.facet (SimpleFacets grouped faceting): facet counts computed
    by GROUP instead of by document — a facet value's count is the
    number of distinct groups containing at least one matching doc with
    that value.

Spark shape: the grouped page is the ordinary Window row_number top-k;
ngroups is a countDistinct over the same joined frame, attached via a
broadcast single-row cross join (no second scan of the match set —
Catalyst reuses the exchange). group.facet is one
select(facet, group).distinct().groupBy(facet).count() — two hash
aggs, no window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def grouped_topk(
    scored: DataFrame,
    docs: DataFrame,
    group_field: str,
    per_group: int = 2,
    ngroups: bool = False,
    group_sort: str | None = None,
    group_offset: int = 0,
) -> DataFrame:
    """Field-collapse page: top ``per_group`` docs per group by
    (score desc, doc_id asc), or by ``group_sort`` ("field asc|desc" —
    Grouping.java sortWithinGroup/setGroupSort:238) with doc_id as the
    tiebreak. With ``ngroups`` every row also carries the total
    matching-group count (Grouping.java:581). ``group_offset`` skips
    the first N docs INSIDE each group (Solr group.offset,
    Grouping.java getDocList withinGroupOffset)."""
    keep = ["doc_id", group_field]
    if group_sort:
        sfield, _, sdir = group_sort.partition(" ")
        if sfield != group_field:
            keep.append(sfield)
        ordcol = (
            F.desc(sfield)
            if sdir.strip().lower() == "desc"
            else F.asc(sfield)
        )
        order = [ordcol, F.asc("doc_id")]
    else:
        order = [F.desc("score"), F.asc("doc_id")]
    joined = scored.join(docs.select(*keep), "doc_id")
    w = Window.partitionBy(group_field).orderBy(*order)
    page = (
        joined.withColumn("rn", F.row_number().over(w))
        .where(
            (F.col("rn") > F.lit(int(group_offset)))
            & (F.col("rn") <= F.lit(int(group_offset)) + per_group)
        )
        .select(
            group_field, "doc_id", F.round("score", 4).alias("score")
        )
    )
    if not ngroups:
        return page
    ng = joined.agg(
        F.countDistinct(group_field).cast("long").alias("ngroups")
    )
    return page.crossJoin(F.broadcast(ng))


def group_facet(
    scored: DataFrame,
    docs: DataFrame,
    group_field: str,
    facet_field: str,
) -> DataFrame:
    """group.facet=true: per facet value, the count of DISTINCT groups
    (not docs) among the query's matches."""
    joined = scored.select("doc_id").join(
        docs.select("doc_id", group_field, facet_field), "doc_id"
    )
    return (
        joined.select(facet_field, group_field)
        .distinct()
        .groupBy(facet_field)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(facet_field)
    )


def group_truncate_facet(
    scored: DataFrame,
    docs: DataFrame,
    group_field: str,
    facet_field: str,
) -> DataFrame:
    """group.truncate=true: facet counts computed over the GROUP-HEAD
    docset only — the most relevant doc of each group (score desc,
    docID asc within the group), per
    solr/core/.../search/grouping/CommandHandler.java:141-166
    (computeGroupedDocSet via TermAllGroupHeadsCollector) feeding
    SimpleFacets with the truncated base DocSet.

    Spark shape: window row_number()==1 per group picks the heads (one
    shuffle on the group key), then a hash agg on the facet field —
    both scale-free of group cardinality."""
    joined = scored.select("doc_id", "score").join(
        docs.select("doc_id", group_field, facet_field), "doc_id"
    )
    w = Window.partitionBy(group_field).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    heads = joined.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        heads.groupBy(facet_field)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(facet_field)
    )


def grouped_by_queries(
    scored_main: DataFrame,
    group_queries: dict[str, DataFrame],
    per_group: int = 2,
) -> DataFrame:
    """group.query (Grouping.java CommandQuery, :~640): each named
    query IS one group — its page is the main query's top
    ``per_group`` docs restricted to that query's doc set.

    One plan for all N groups: tag each semi-joined restriction with
    the group name, union, and take a per-name window top-k — the same
    single-job fusion facet_queries uses (no per-group driver loop)."""
    tagged = None
    for name, ids in group_queries.items():
        t = scored_main.join(
            ids.select("doc_id"), "doc_id", "left_semi"
        ).withColumn("group_q", F.lit(name))
        tagged = t if tagged is None else tagged.unionByName(t)
    if tagged is None:
        raise ValueError("group.query needs at least one query")
    w = Window.partitionBy("group_q").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        tagged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_group)
        .select("group_q", "doc_id", F.round("score", 4).alias("score"))
    )


def grouped_by_func(
    scored: DataFrame,
    docs: DataFrame,
    func_expr: str,
    per_group: int = 2,
    ngroups: bool = False,
) -> DataFrame:
    """group.func (Grouping.java CommandFunc, :~520): the group key is
    a ValueSource value per doc — compiled by search.funcquery into a
    Catalyst column, then the ordinary field-collapse window applies
    (the function stays in whole-stage codegen; no extra shuffle beyond
    the group key's own)."""
    from .funcquery import parse_func

    keyed = docs.withColumn("group_f", parse_func(func_expr))
    return grouped_topk(
        scored, keyed, "group_f", per_group=per_group, ngroups=ngroups
    )


def grouped_main(
    scored: DataFrame,
    docs: DataFrame,
    group_field: str,
    per_group: int = 1,
    rows: int = 10,
    offset: int = 0,
) -> DataFrame:
    """group.format=simple / group.main=true (Grouping.java:153-232,
    Format.simple; grouped.main flattens the grouped result into the
    main docList): the top ``per_group`` docs of each group, flattened
    into ONE list ordered by the groups' head docs (score desc, doc_id
    asc), docs within a group in group order; start/rows paginate the
    flattened list. Window functions only — no extra shuffle beyond
    the groupBy the collapse already pays."""
    joined = scored.join(docs.select("doc_id", group_field), "doc_id")
    w = Window.partitionBy(group_field).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranked = (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("hscore", F.first("score").over(w))
        .withColumn("hdoc", F.first("doc_id").over(w))
        .where(F.col("rn") <= F.lit(int(per_group)))
    )
    return (
        ranked.orderBy(
            F.desc("hscore"), F.asc("hdoc"), F.asc("rn")
        )
        .select(
            group_field,
            "doc_id",
            F.round("score", 4).alias("score"),
        )
        .offset(int(offset))
        .limit(int(rows))
    )
