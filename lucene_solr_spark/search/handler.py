"""Solr-style select handler — entry point C (SURVEY.md §3.3) as a
library call: the QueryComponent pipeline (q + fq + sort + paging) and
FacetComponent over one request.

References:
  - request routing + component pipeline: solr/core/.../handler/component/
    SearchHandler.java:47-135 (QueryComponent then FacetComponent, ...)
  - q/fq split: QueryComponent.java:86-136 — fq filters are non-scoring
    DocSets intersected with the scored result
    (S/search/SolrIndexSearcher.java getProcessedFilter)
  - sort/paging: start+rows window after merged top-k
    (QueryComponent.java:747-800)
  - facets on the filtered DocSet: S/request/SimpleFacets.java:205-423

Spark shape: fq predicates are plain Catalyst filters on the doc store —
pushed into the Parquet scan (the filterCache analogue is simply AQE/
scan-level caching); scoring joins back to the filtered doc set with a
broadcast when small.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher
from .qparser import parse_lucene


def select(
    searcher: Searcher,
    q: str,
    fq: list[str] | None = None,
    sort: str | None = None,
    start: int = 0,
    rows: int = 10,
    fl: list[str] | None = None,
    facet_field: list[str] | None = None,
    facet_limit: int = 5,
    facet_mincount: int = 0,
    facet_prefix: str | None = None,
    facet_offset: int = 0,
    facet_sort: str = "count",
    facet_missing: bool = False,
    facet_docs: DataFrame | None = None,
    cursor_mark: tuple[float, int] | str | None = None,
    bf: str | None = None,
    bq: list[str] | None = None,
    boost: str | None = None,
    def_type: str = "lucene",
    mm: int | str = 0,
    tie: float = 0.0,
    sort_missing: str | None = None,
    func_now=None,
    filter_cache=None,
    q_op: str = "OR",
    q_alt: str | None = None,
) -> dict[str, DataFrame]:
    """Run one request; returns {"response": DataFrame, "facets": {field:
    DataFrame}, "next_cursor_mark": ...} (facet counts are over the full
    filtered match set, not just the returned page — SimpleFacets
    semantics).

    ``fq`` entries are SQL boolean expressions over doc-store columns
    (e.g. "lang = 'en'", "n_chars between 100 and 500") — the Solr
    filter-query role, evaluated as pushed-down scans, never scored.
    ``sort`` is "score desc" (default) or a SQL order spec over doc
    columns like "n_chars desc".

    Paging. ``start`` windows the merged top-k INSIDE the plan
    (GlobalLimit with offset — never a driver-side collect of
    start+rows rows; Solr pays the same merge cost per shard,
    QueryComponent.java:747-800). For sequential deep paging prefer
    ``cursor_mark`` (Solr cursorMark, score-sorted requests): pass "*"
    for the first page, then the returned ``next_cursor_mark`` — each
    page is a searchAfter keyset predicate (IndexSearcher.searchAfter,
    :225-247), so cost stays O(rows) per page at any depth instead of
    O(start + rows).

    Facet options (SimpleFacets.java:205-423): ``facet_mincount`` drops
    buckets with fewer matches, ``facet_prefix`` keeps values starting
    with the prefix, ``facet_offset`` skips leading buckets,
    ``facet_sort`` is "count" (count desc, value asc — default) or
    "index" (value asc). ``facet_limit`` < 0 means unlimited;
    ``facet_missing`` appends the NULL-value count as a null-key row
    exempt from mincount/limit (values that are NULL never form a term
    bucket); ``facet_docs`` overrides the frame field values are read
    from (the SimpleFacets value-source slot — lets callers facet
    derived columns).

    Boost functions (edismax bf/boost params, ExtendedDismaxQParser):
    ``bf`` is a ValueSource expression ADDED to the relevance score,
    ``boost`` MULTIPLIES it — both parsed by search.funcquery into
    Catalyst expressions (score' = score * boost + bf). Membership
    (facets, counts) is unaffected; only ranking changes.

    ``def_type`` routes the q string through the QParserPlugin registry
    (lucene | dismax | edismax — SearchHandler defType param); ``mm``
    accepts the full Solr minimum-should-match spec grammar (int,
    negative, percentage, conditional 'bound<spec') and ``tie`` the
    dismax tie-breaker.
    """
    # q.alt (DisMaxQParser.getAlternateUserQuery, DisMaxQParser.java:
    # 120-135): a blank/absent q falls back to the alternate query
    # parsed with the STANDARD parser (typically '*:*' so fq-only
    # requests match everything with constant scores)
    if (q is None or not q.strip()) and q_alt is not None:
        q = q_alt
        def_type = "lucene"
    # q-side LocalParams dispatch (QParser.getParser registry):
    # {!lucene}body reroutes the string, {!boost b=f}body multiplies the
    # wrapped query's score by a ValueSource (BoostQParserPlugin.java),
    # any other registered type yields its (constant-score) doc set
    scored = None
    lp = parse_local_params(q) if q.lstrip().startswith("{!") else None
    if lp is not None:
        ptype, lparams, body = lp
        if ptype == "lucene":
            q = body
        elif ptype == "boost":
            q = lparams.get("v", body)
            b_ = lparams["b"]
            boost = b_ if boost is None else f"product({boost},{b_})"
        else:
            ids = _fq_doc_ids(searcher, q)
            scored = ids.select(
                "doc_id",
                F.lit(1.0).cast(searcher._score_type).alias("score"),
            )
    _main_query = None
    if scored is None:
        if def_type == "lucene":
            query = parse_lucene(q, default_op=q_op)
        elif def_type == "edismax":
            from .qparser import parse_edismax

            query = parse_edismax(q, tie=tie, mm=mm)
        elif def_type == "dismax":
            from .qparser import parse_dismax

            query = parse_dismax(q, tie=tie, mm=mm)
        else:
            raise ValueError(f"unknown defType {def_type!r}")
        _main_query = query
        scored = searcher.score(query)

    if bq:
        # DisMax bq boost queries (DisMaxQParser.java:92-150
        # getBoostQueries): each bq is an optional SHOULD clause of the
        # outer query — membership stays the MAIN query's, scores of
        # matching boost queries ADD
        for qs in bq:
            bscored = searcher.score(parse_lucene(qs)).select(
                "doc_id", F.col("score").alias("_bq")
            )
            scored = scored.join(bscored, "doc_id", "left").select(
                "doc_id",
                (
                    F.col("score")
                    + F.coalesce(F.col("_bq"), F.lit(0.0))
                ).cast(searcher._score_type).alias("score"),
            )

    docs = searcher.index.docs
    # {!tag=NAME}expr on fq entries + {!ex=NAME}field on facet fields —
    # multi-select faceting (SimpleFacets.java:124 excludeStr ->
    # SolrIndexSearcher.getDocListAndSet with the tagged filters
    # removed): an ex-tagged facet counts over the docset with the
    # excluded fqs NOT applied.
    scored_prefq = scored
    fq_parsed: list[tuple[set, str]] = []
    if fq:
        for raw in fq:
            m = _TAG_RX.match(raw.strip())
            if m:
                fq_parsed.append(
                    (set(m.group("tags").split(",")),
                     m.group("body").strip())
                )
            else:
                fq_parsed.append((set(), raw))
        fq = [body for _, body in fq_parsed]
    if fq:
        for expr in fq:
            if filter_cache is not None:
                # filterCache routing (SolrIndexSearcher.getDocSet):
                # each fq's doc set is a persisted DataFrame keyed by
                # the fq string; repeats skip their scan/postings work.
                # The Solr trade applies: a cached SQL fq becomes a
                # materialized semi-join instead of a pushed-down scan
                # predicate.
                def _compute(e=expr):
                    got = _fq_doc_ids(searcher, e)
                    if got is None:
                        got = (
                            searcher.index.docs.where(F.expr(e))
                            .select("doc_id")
                        )
                    return got

                docs = docs.join(
                    filter_cache.get_or_compute(expr.strip(), _compute),
                    "doc_id",
                    "left_semi",
                )
                continue
            ids = _fq_doc_ids(searcher, expr)
            if ids is None:
                docs = docs.where(F.expr(expr))
            else:
                docs = docs.join(ids, "doc_id", "left_semi")
        filtered_ids = docs.select("doc_id")
        scored = scored.join(filtered_ids, "doc_id", "left_semi")

    if bf or boost:
        from .funcquery import compile_func

        base = searcher.index.docs
        attachments: list = []
        sexpr = F.col("score")
        if boost:
            c, att = compile_func(
                boost, searcher=searcher, docs=base, now=func_now
            )
            sexpr = sexpr * c
            attachments += att
        if bf:
            c, att = compile_func(
                bf, searcher=searcher, docs=base, now=func_now
            )
            sexpr = sexpr + c
            attachments += att
        joined = scored.join(base, "doc_id")
        # query(...) score frames: left-join so non-matching docs keep
        # the QueryValueSource default 0 (coalesce in the column)
        for alias, frame in attachments:
            joined = joined.join(frame, "doc_id", "left")
        scored = joined.select("doc_id", sexpr.alias("score"))

    score_sorted = sort is None or sort.strip().lower() in (
        "score desc",
        "score",
    )
    next_cursor = None
    if cursor_mark is not None:
        if not score_sorted:
            raise ValueError(
                "cursor_mark requires score sort (CursorMark.java "
                "requires the uniqueKey tie-break sort)"
            )
        if start:
            raise ValueError("cursor_mark and start are exclusive")
        cur = scored
        if cursor_mark != "*":
            after_score, after_doc = cursor_mark
            cur = cur.where(
                (F.col("score") < F.lit(float(after_score)))
                | (
                    (F.col("score") == F.lit(float(after_score)))
                    & (F.col("doc_id") > F.lit(int(after_doc)))
                )
            )
        page = cur.orderBy(F.desc("score"), F.asc("doc_id")).limit(rows)
        tail = page.collect()  # exactly `rows` rows — the page itself
        page = searcher.index.spark.createDataFrame(tail, page.schema)
        next_cursor = (
            (float(tail[-1]["score"]), int(tail[-1]["doc_id"]))
            if tail
            else cursor_mark
        )
    else:
        if score_sorted:
            ordered = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        else:
            joined = scored.join(docs, "doc_id")
            ordered = joined.orderBy(
                *_sort_cols(sort, now=func_now, missing=sort_missing),
                F.asc("doc_id")
            ).select("doc_id", "score")
        # plan-side offset: the skip happens in the JVM's final limit
        # stage, nothing is collected to the Python driver
        page = (ordered.offset(start) if start else ordered).limit(rows)
    if fl:
        # ReturnFields (S/search/ReturnFields.java): each entry is a
        # stored field, or an aliased ValueSource pseudo-field
        # 'alias:func(...)' — compiled to a Catalyst column over the
        # doc store (fl=price,discount:product(price,0.9))
        cols = []
        names = []
        transforms = []
        for entry in fl:
            if entry.startswith("[") and entry.endswith("]"):
                # DocTransformers (S/response/transform/
                # TransformerFactory.java defaultFactories — [docid],
                # [value v=..], [explain]): computed per returned doc,
                # never stored fields
                inner = entry[1:-1].strip()
                transforms.append(inner)
                continue
            if entry == "*":  # ReturnFields glob: every stored field
                for c in docs.columns:
                    if c != "doc_id" and c not in names:
                        cols.append(F.col(c))
                        names.append(c)
                continue
            if entry == "score":  # score is already on the page
                continue
            alias, sep, expr = entry.partition(":")
            if sep and ("(" in expr or expr in docs.columns):
                from .funcquery import parse_func

                col = (
                    parse_func(expr, now=func_now)
                    if "(" in expr
                    else F.col(expr)
                )
                cols.append(col.alias(alias))
                names.append(alias)
            else:
                cols.append(F.col(entry))
                names.append(entry)
        page = page.join(
            docs.select("doc_id", *cols), "doc_id"
        ).select("doc_id", "score", *names)
        for inner in transforms:
            page = _apply_doc_transformer(
                page, inner, searcher, _main_query
            )

    facets: dict[str, DataFrame] = {}
    if facet_field:
        match_ids = scored.select("doc_id")
        for field in facet_field:
            facet_key = field
            ex_m = _EX_RX.match(field.strip())
            if ex_m:
                excluded = set(ex_m.group("tags").split(","))
                field = ex_m.group("body").strip()
                facet_key = ex_m.group("key") or field
                # re-derive the docset with the excluded fqs dropped
                docs_ex = searcher.index.docs
                for tags, expr in fq_parsed:
                    if tags & excluded:
                        continue
                    ids = _fq_doc_ids(searcher, expr)
                    if ids is None:
                        docs_ex = docs_ex.where(F.expr(expr))
                    else:
                        docs_ex = docs_ex.join(ids, "doc_id", "left_semi")
                ex_ids = scored_prefq.select("doc_id").join(
                    docs_ex.select("doc_id"), "doc_id", "left_semi"
                )
                src = (
                    facet_docs if facet_docs is not None else docs_ex
                ).join(ex_ids, "doc_id")
            else:
                src = (
                    facet_docs if facet_docs is not None else docs
                ).join(match_ids, "doc_id")
            # NULL field values are not terms: they never form a value
            # bucket (SimpleFacets enumerates indexed terms) and are
            # reported only under facet.missing
            f = (
                src.where(F.col(field).isNotNull())
                .groupBy(field)
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            if facet_prefix:
                f = f.where(
                    F.col(field).cast("string").startswith(facet_prefix)
                )
            if facet_mincount > 0:
                f = f.where(F.col("cnt") >= F.lit(facet_mincount))
            if facet_sort == "index":
                f = f.orderBy(F.asc(field))
            else:
                f = f.orderBy(F.desc("cnt"), F.asc(field))
            if facet_offset:
                f = f.offset(facet_offset)
            if facet_limit >= 0:  # facet.limit<0 = unlimited (Solr)
                f = f.limit(facet_limit)
            if facet_missing:
                # facet.missing=true: the null-value count appended
                # AFTER the value list, exempt from mincount/limit
                # (SimpleFacets.getTermCounts: counts.add(null, ...))
                miss = (
                    src.where(F.col(field).isNull())
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .select(
                        F.lit(None)
                        .cast(src.schema[field].dataType)
                        .alias(field),
                        "cnt",
                    )
                )
                f = f.unionByName(miss)
            facets[facet_key] = f
    return {
        "response": page,
        "facets": facets,
        "next_cursor_mark": next_cursor,
    }


def pivot_facets(
    searcher: Searcher,
    q: str,
    fields: list[str],
    mincount: int = 1,
    docs: DataFrame | None = None,
) -> DataFrame:
    """facet.pivot=f1,f2,...: hierarchical counts to ANY depth
    (solr/core/.../handler/component/PivotFacetProcessor.java — round 2
    shipped only the flat 2-level cube). Solr returns a nested response;
    the relational flattening here is one row per tree node:
    (level, path, cnt) with path = '/'-joined field values — the same
    shape as the taxonomy-facet gate. One groupBy per level over the
    SAME filtered match set (Catalyst shares the scan; each level is a
    partial+final agg).

    Null field values: concat_ws skips NULLs, so a null level-k value
    yields the parent's path string at level k (Solr would report it
    under facet.missing instead) — callers faceting nullable columns
    should coalesce to a sentinel first."""
    ids = searcher.score(parse_lucene(q)).select("doc_id")
    d = (docs if docs is not None else searcher.index.docs).join(
        ids, "doc_id"
    )
    parts = []
    for lvl in range(1, len(fields) + 1):
        cols = fields[:lvl]
        parts.append(
            d.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.lit(lvl).alias("level"),
                F.concat_ws(
                    "/", *[F.col(c).cast("string") for c in cols]
                ).alias("path"),
                "cnt",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("cnt") >= F.lit(mincount)).orderBy(
        "level", "path"
    )


def facet_range(
    searcher: Searcher,
    q: str,
    field: str,
    start: float,
    end: float,
    gap: float,
    other: bool = False,
) -> DataFrame:
    """facet.range with explicit start/end/gap
    (SimpleFacets.getFacetRangeCounts, RangeEndpointCalculator): buckets
    [start + i*gap, start + (i+1)*gap) over the query match set;
    ``other`` adds Solr's facet.range.other=all rows — 'before'
    (< start) and 'after' (>= end). Returns (bucket, cnt) with bucket =
    the range lower bound as string, 'before'/'after' for the other
    rows. Pure Catalyst: one filtered scan + groupBy.

    Grouping and ordering happen on the NUMERIC lower bound (kept as a
    double until the final projection), so fractional start/gap never
    merges distinct buckets and mixed-magnitude buckets come back in
    range order ('150' before '1050'), matching getFacetRangeCounts'
    bucket iteration; 'before' sorts first and 'after' last
    structurally. Labels of integral bounds print without a decimal
    point (Solr prints the field type's repr)."""
    ids = searcher.score(parse_lucene(q)).select("doc_id")
    d = searcher.index.docs.join(ids, "doc_id")
    col = F.col(field).cast("double")
    lo_bound = (
        F.lit(start)
        + F.floor((col - F.lit(start)) / F.lit(gap)) * F.lit(gap)
    )
    inside = (
        d.where((col >= F.lit(start)) & (col < F.lit(end)))
        .groupBy(lo_bound.alias("lo"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    label = F.when(
        F.col("lo") == F.col("lo").cast("long").cast("double"),
        F.col("lo").cast("long").cast("string"),
    ).otherwise(F.col("lo").cast("string"))
    inside = inside.select(
        F.lit(1).alias("ord"), F.col("lo"), label.alias("bucket"), "cnt"
    )
    if not other:
        return inside.orderBy("lo").select("bucket", "cnt")
    before = d.where(col < F.lit(start)).agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(
        F.lit(0).alias("ord"),
        F.lit(float("-inf")).alias("lo"),
        F.lit("before").alias("bucket"),
        "cnt",
    )
    after = d.where(col >= F.lit(end)).agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(
        F.lit(2).alias("ord"),
        F.lit(float("inf")).alias("lo"),
        F.lit("after").alias("bucket"),
        "cnt",
    )
    return (
        inside.unionByName(before)
        .unionByName(after)
        .orderBy("ord", "lo")
        .select("bucket", "cnt")
    )


_LOCAL_PARAMS = re.compile(
    r"^\{!\s*(?P<type>[a-zA-Z]+)"
    r"(?P<params>(?:\s+[a-zA-Z.]+=(?:\"[^\"]*\"|'[^']*'|\S+?(?=[\s}])))*)"
    r"\s*\}(?P<body>.*)$",
    re.S,
)
_LP_PAIR = re.compile(r"([a-zA-Z.]+)=(\"[^\"]*\"|'[^']*'|[^\s}]+)")

# {!tag=a,b}fqexpr / {!ex=a key=k}facetfield — the tag/ex multi-select
# pair (QueryParsing localParams with CommonParams.TAG / EXCLUDE)
_TAG_RX = re.compile(r"^\{!\s*tag=(?P<tags>[^}\s]+)\s*\}(?P<body>.*)$")
_EX_RX = re.compile(
    r"^\{!\s*ex=(?P<tags>[^}\s]+)(?:\s+key=(?P<key>[^}\s]+))?\s*\}"
    r"(?P<body>.*)$"
)


def parse_local_params(s: str):
    """Solr LocalParams syntax ``{!type k=v ...}body``
    (solr/core/.../search/QueryParsing.java parseLocalParams + the
    QParserPlugin registry dispatch in QParser.getParser). Returns
    (type, params, body) or None when the string carries no local
    params."""
    m = _LOCAL_PARAMS.match(s.strip())
    if not m:
        return None
    params: dict[str, str] = {}
    for k, v in _LP_PAIR.findall(m.group("params")):
        if v[:1] in "'\"":
            v = v[1:-1]
        params[k] = v
    return m.group("type"), params, m.group("body").strip()


def _fq_doc_ids(searcher: Searcher, expr: str) -> DataFrame | None:
    """One fq entry → the doc_id set it admits, dispatching LocalParams
    to the matching QParserPlugin analogue: {!frange l= u=}func,
    {!geofilt pt= d=}, {!bbox pt= d=}, {!lucene}querystring. Plain
    strings return None and stay SQL boolean pushdown filters."""
    lp = parse_local_params(expr)
    if lp is None:
        return None
    ptype, params, body = lp
    if ptype == "frange":
        lower = float(params["l"]) if "l" in params else None
        upper = float(params["u"]) if "u" in params else None
        return frange(searcher, body, lower, upper)
    if ptype in ("geofilt", "bbox"):
        from .spatial import bbox_filter, geofilt

        lat_s, lon_s = params["pt"].split(",")
        lat, lon, d = float(lat_s), float(lon_s), float(params["d"])
        latf = params.get("latfield", "lat")
        lonf = params.get("lonfield", "lon")
        fn = geofilt if ptype == "geofilt" else bbox_filter
        return fn(searcher.index.docs, lat, lon, d, latf, lonf).select(
            "doc_id"
        )
    if ptype == "lucene":
        return searcher.score(parse_lucene(body)).select("doc_id")
    if ptype == "surround":
        # SurroundQParserPlugin (solr/core/.../search/
        # SurroundQParserPlugin.java — maxBasicQueries dispatch into
        # the surround QueryParser); constant-score doc set
        from .surround import surround_doc_ids

        return surround_doc_ids(searcher, body)
    if ptype == "field":
        # FieldQParserPlugin.java:40-55: the body is analyzed with the
        # field's analyzer — multiple tokens make a PhraseQuery,
        # one token a TermQuery; non-text (string) fields are not
        # analyzed, so the body is an exact match value
        from ..analysis.tokenizer import analyze
        from .query import PhraseQuery, TermQuery

        f_ = params.get("f", "text")
        if f_ != "text":
            return (
                searcher.index.docs.where(F.col(f_) == F.lit(body))
                .select("doc_id")
            )
        terms, _ = analyze(body)
        if not terms:
            return searcher.index.spark.createDataFrame([], "doc_id long")
        q_ = (
            TermQuery(terms[0])
            if len(terms) == 1
            else PhraseQuery(terms, slop=0)
        )
        return searcher.score(q_).select("doc_id")
    if ptype == "prefix":
        # PrefixQParserPlugin.java:37-44 — no analysis of the body
        from .query import PrefixQuery

        f_ = params.get("f", "text")
        if f_ != "text":
            return (
                searcher.index.docs.where(F.col(f_).startswith(body))
                .select("doc_id")
            )
        return searcher.score(PrefixQuery(body)).select("doc_id")
    if ptype == "term":
        # TermQParserPlugin.java:40-62 — one exact term via the field
        # type's readableToIndexed: numeric fields compare as their
        # native type (the Trie indexed-bytes analogue is the typed
        # Catalyst comparison), everything else as the raw value; the
        # default text field matches the single unanalyzed term
        from .query import TermQuery

        f_ = params.get("f", "text")
        if f_ != "text":
            docs_ = searcher.index.docs
            dt = dict(docs_.dtypes).get(f_, "string")
            val = (
                F.lit(body).cast(dt)
                if dt in ("bigint", "int", "double", "float", "timestamp")
                else F.lit(body)
            )
            return docs_.where(F.col(f_) == val).select("doc_id")
        return searcher.score(TermQuery(body)).select("doc_id")
    if ptype == "raw":
        # RawQParserPlugin.java:35-42 — a single raw term, never
        # analyzed (TermQuery on the exact bytes)
        from .query import TermQuery

        f_ = params.get("f", "text")
        if f_ != "text":
            return (
                searcher.index.docs.where(F.col(f_) == F.lit(body))
                .select("doc_id")
            )
        return searcher.score(TermQuery(body)).select("doc_id")
    if ptype in ("query", "boost"):
        # NestedQParserPlugin.java ({!query v=...}) re-enters the
        # parser registry; {!boost} membership in a NON-SCORING fq
        # context is just its wrapped query's doc set
        # (BoostQParserPlugin.java — the b= function changes scores,
        # never membership)
        sub = params.get("v", body)
        nested = _fq_doc_ids(searcher, sub)
        if nested is not None:
            return nested
        return searcher.score(parse_lucene(sub)).select("doc_id")
    if ptype == "join":
        # JoinQParserPlugin.java:55-90 / JoinUtil.createJoinQuery:
        # gather the from-field values of docs matching the wrapped
        # query, then admit docs whose to-field holds one of them.
        # JoinUtil enumerates the from-terms into a filter — the
        # broadcast-join shape (the from set is the small side by
        # construction; a from set too big to broadcast would OOM the
        # reference the same way).
        sub = params.get("v", body)
        from_f, to_f = params["from"], params["to"]
        sub_ids = _fq_doc_ids(searcher, sub)
        if sub_ids is None:
            sub_ids = searcher.score(parse_lucene(sub)).select("doc_id")
        d = searcher.index.docs
        vals = (
            d.join(sub_ids, "doc_id", "left_semi")
            .select(F.col(from_f).alias("__join_v"))
            .distinct()
        )
        return d.join(
            F.broadcast(vals),
            d[to_f] == F.col("__join_v"),
            "left_semi",
        ).select("doc_id")
    raise ValueError(f"unknown fq local-params type {ptype!r}")


def frange(
    searcher: Searcher,
    func_expr: str,
    lower: float | None = None,
    upper: float | None = None,
) -> DataFrame:
    """{!frange} filter query (solr/core/.../search/
    FunctionRangeQParserPlugin.java + FunctionRangeQuery): the doc set
    where a ValueSource expression falls in [l, u] — the expression is
    compiled to a Catalyst Column by search.funcquery, so the whole
    filter stays in whole-stage codegen."""
    from .funcquery import parse_func

    col = parse_func(func_expr)
    d = searcher.index.docs
    if lower is not None:
        d = d.where(col >= F.lit(float(lower)))
    if upper is not None:
        d = d.where(col <= F.lit(float(upper)))
    return d.select(F.col("doc_id").cast("long").alias("doc_id"))


def facet_date(
    d: DataFrame,
    field: str,
    start: str,
    end: str,
    gap: str,
    now=None,
    other: bool = False,
    mincount: int = 0,
) -> DataFrame:
    """facet.date with DateMath start/end/gap
    (SimpleFacets.getFacetDateCounts, solr/core/src/java/org/apache/
    solr/request/SimpleFacets.java in the 3.x line; DateMathParser
    resolves the bounds). Buckets are [b_i, b_i+gap) with b_0 =
    resolve(start) and the gap math re-applied per boundary (so
    calendar gaps like +1MONTH stay calendar-correct); hardend=false
    semantics — the last bucket may extend past resolve(end). Every
    bucket is returned (zero counts included, subject to ``mincount``),
    label = the bucket lower bound as 'YYYY-MM-DD HH:MM:SS' text;
    ``other`` adds 'before' (< start) / 'after' (>= extended end).

    Scale shape: the boundary list is tiny (buckets, not rows) —
    broadcast-joined to one groupBy over the match set; bucket
    assignment is a literal-array expression inside codegen."""
    from ..functions.datemath import parse_date_math, sql_ts

    b0 = parse_date_math(start, now)
    e = parse_date_math(end, now)
    if e <= b0:
        raise ValueError("facet.date end must be after start")
    bounds = [b0]
    while bounds[-1] < e:
        iso = bounds[-1].replace(tzinfo=None).isoformat(
            timespec="seconds"
        )
        bounds.append(parse_date_math(f"{iso}Z{gap}", now))
        if len(bounds) > 10000:
            raise ValueError("facet.date gap too small for range")
    # ONE scan: every row tagged (ord, lo) — 0/before, 1/bucket lower
    # bound, 2/after — then a single groupBy; zero-count buckets come
    # from a broadcast left join against the tiny boundary table (the
    # same one-component-pass fusion facet_queries uses).
    col = F.col(field).cast("timestamp")
    barr = F.array(
        *[F.lit(sql_ts(b)).cast("timestamp") for b in bounds[:-1]]
    )
    start_ts = F.lit(sql_ts(bounds[0])).cast("timestamp")
    end_ts = F.lit(sql_ts(bounds[-1])).cast("timestamp")
    ordc = (
        F.when(col < start_ts, F.lit(0))
        .when(col >= end_ts, F.lit(2))
        .otherwise(F.lit(1))
    )
    lower = F.when(
        ordc == 1, F.array_max(F.filter(barr, lambda b: b <= col))
    )
    counts = (
        d.where(col.isNotNull())
        .groupBy(ordc.alias("ord"), lower.alias("lo"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rows = [(1, b.replace(tzinfo=None)) for b in bounds[:-1]]
    if other:
        rows = [(0, None)] + rows + [(2, None)]
    all_buckets = d.sparkSession.createDataFrame(
        rows, "ord int, lo timestamp"
    )
    b, c = all_buckets.alias("b"), F.broadcast(counts).alias("c")
    out = b.join(
        c,
        (F.col("b.ord") == F.col("c.ord"))
        & F.col("b.lo").eqNullSafe(F.col("c.lo")),
        "left",
    ).select(
        F.col("b.ord").alias("ord"),
        F.col("b.lo").alias("lo"),
        F.when(F.col("b.ord") == 0, F.lit("before"))
        .when(F.col("b.ord") == 2, F.lit("after"))
        .otherwise(F.date_format(F.col("b.lo"), "yyyy-MM-dd HH:mm:ss"))
        .alias("bucket"),
        F.coalesce(F.col("c.cnt"), F.lit(0)).cast("long").alias("cnt"),
    )
    return (
        out.where(
            (F.col("ord") != 1) | (F.col("cnt") >= F.lit(mincount))
        )
        .orderBy("ord", "lo")
        .select("bucket", "cnt")
    )


def facet_queries(
    searcher: Searcher,
    base_q: str,
    queries: dict[str, str],
) -> DataFrame:
    """facet.query counts (SimpleFacets.getFacetQueryCounts,
    S/request/SimpleFacets.java:205-208): for each named query string,
    the count of base-query matches also matching it.

    ONE Spark job regardless of how many named queries: each query's
    doc set is tagged with its name literal, the tagged sets union into
    a single frame, one semi-join against the base doc set and one
    groupBy(name).count() produce every count — the component-pass
    shape Solr uses, vs the round-3 driver loop of N sequential
    .count() actions the verdict flagged. Names with zero matches keep
    a 0 row via a left join against the literal name list."""
    base_ids = searcher.score(parse_lucene(base_q)).select("doc_id")
    parts = [
        searcher.score(parse_lucene(qs)).select(
            F.lit(name).alias("name"), "doc_id"
        )
        for name, qs in queries.items()
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    counts = (
        unioned.join(base_ids, "doc_id", "left_semi")
        .select("name", "doc_id")
        .distinct()
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    names = searcher.index.spark.createDataFrame(
        [(n,) for n in sorted(queries)], "name string"
    )
    return (
        names.join(counts, "name", "left")
        .select(
            "name",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
        .orderBy("name")
    )


def elevate(
    searcher: Searcher,
    q: str,
    elevations: dict[str, list[int]],
    rows: int = 10,
    exclusions: dict[str, list[int]] | None = None,
) -> DataFrame:
    """QueryElevationComponent (S/handler/component/
    QueryElevationComponent.java): for a configured query string, pin
    the listed doc ids to the top IN CONFIG ORDER regardless of score;
    organic results follow in normal (score desc, doc_id) order.
    ``exclusions`` carries elevate.xml's ``<doc id=.. exclude="true"/>``
    entries — those ids are REMOVED from the result set entirely
    (QueryElevationComponent ElevationComparatorSource + the excluded
    set turned into a MUST_NOT filter). Returns (doc_id, score,
    elevated).

    Shape: the elevation map is a broadcast literal frame joined into
    the scored set — one extra column, no extra shuffle beyond the
    ordinary top-k."""
    ids = elevations.get(q.strip().lower(), [])
    scored = searcher.score(parse_lucene(q))
    spark = searcher.index.spark
    excl = (exclusions or {}).get(q.strip().lower(), [])
    if excl:
        exf = spark.createDataFrame(
            [(int(d),) for d in excl], "doc_id long"
        )
        scored = scored.join(F.broadcast(exf), "doc_id", "left_anti")
    if ids:
        elev = spark.createDataFrame(
            [(int(d), i) for i, d in enumerate(ids)],
            "doc_id long, elev_rank int",
        )
        # elevated docs appear even when the query does not match them
        # (forceElevation semantics): outer-join and default score 0
        out = scored.join(F.broadcast(elev), "doc_id", "full_outer")
        out = out.select(
            "doc_id",
            F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
            F.col("elev_rank"),
        )
    else:
        out = scored.withColumn("elev_rank", F.lit(None).cast("int"))
    ordered = out.orderBy(
        F.when(F.col("elev_rank").isNotNull(), 0).otherwise(1),
        F.asc_nulls_last("elev_rank"),
        F.desc("score"),
        F.asc("doc_id"),
    )
    return ordered.select(
        "doc_id",
        F.round("score", 4).alias("score"),
        F.col("elev_rank").isNotNull().cast("int").alias("elevated"),
    ).limit(rows)


def _split_sort_spec(sort: str) -> list[str]:
    """Split a sort spec on commas OUTSIDE parentheses, so
    'recip(n_chars,1,1000,1000) asc, n_chars desc' yields two parts."""
    parts, depth, cur = [], 0, []
    for ch in sort:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p for p in (s.strip() for s in parts) if p]


def _ast_terms(node) -> set[str]:
    """Every TermQuery term reachable in a query AST (the weight tree
    [explain] walks)."""
    out: set[str] = set()
    if node is None or isinstance(node, (str, int, float, bool)):
        return out
    t = getattr(node, "term", None)
    if isinstance(t, str):
        out.add(t)
    tl = getattr(node, "terms", None)
    if isinstance(tl, (list, tuple)):
        out |= {x for x in tl if isinstance(x, str)}
    for attr in ("clauses", "queries", "subqueries", "disjuncts"):
        for sub in getattr(node, attr, None) or []:
            out |= _ast_terms(getattr(sub, "query", sub))
    for attr in ("query", "positive", "negative"):
        out |= _ast_terms(getattr(node, attr, None))
    return out


def _apply_doc_transformer(page, spec: str, searcher, main_query):
    """One [transformer] fl entry (S/response/transform/): [docid],
    [value v=X], [explain]. The explanation is the BM25 weight
    decomposition per matching term, formatted deterministically
    ('sum of: term=part; ...', parts to 4 decimals) and joined onto
    the page."""
    if spec == "docid":
        return page.withColumn("docid", F.col("doc_id"))
    if spec.startswith("value "):
        params = dict(
            p.split("=", 1) for p in spec[len("value "):].split() if "=" in p
        )
        v = params.get("v", "")
        try:
            lit = F.lit(int(v))
        except ValueError:
            try:
                lit = F.lit(float(v))
            except ValueError:
                lit = F.lit(v)
        return page.withColumn("value", lit)
    if spec == "explain":
        from .explain import explain as _explain

        terms = sorted(_ast_terms(main_query))
        if not terms:
            return page.withColumn("explain", F.lit(None).cast("string"))
        e = _explain(searcher, terms)
        per_doc = (
            e.groupBy("doc_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("term", "score_part"))
                ).alias("parts")
            )
            .select(
                "doc_id",
                F.concat(
                    F.lit("sum of: "),
                    F.array_join(
                        F.transform(
                            F.col("parts"),
                            lambda s: F.concat(
                                s["term"],
                                F.lit("="),
                                F.format_number(s["score_part"], 4),
                            ),
                        ),
                        "; ",
                    ),
                ).alias("explain"),
            )
        )
        return page.join(per_doc, "doc_id", "left")
    raise ValueError(f"unknown doc transformer [{spec}]")


def _sort_cols(sort: str, now=None, missing: str | None = None):
    """sort= spec -> Catalyst sort columns. Each part is either a doc
    column ('n_chars desc') or a ValueSource function expression
    ('recip(n_chars,1,1000,1000) asc' — Solr sort-by-function,
    solr/core/.../search/SortSpecParsing / FunctionQParser sort).

    ``missing`` places docs WITHOUT the sort value: 'last' / 'first'
    (schema sortMissingLast/sortMissingFirst —
    solr/core/.../search/MissingStringLastComparatorSource.java,
    S/schema/FieldType sortMissingLast). None keeps Lucene's default
    missing-sorts-lowest (Spark's null ordering is identical: nulls
    first under asc, last under desc)."""
    out = []
    for part in _split_sort_spec(sort):
        bits = part.rsplit(None, 1)
        desc = len(bits) > 1 and bits[1].lower() == "desc"
        expr = bits[0] if (
            len(bits) > 1 and bits[1].lower() in ("asc", "desc")
        ) else part
        if "(" in expr:
            from .funcquery import parse_func

            col = parse_func(expr, now=now)
        elif expr.startswith("random_"):
            # RandomSortField (solr/core/.../schema/RandomSortField.
            # java:59-78): a repeatable pseudo-random order seeded by
            # the dynamic field name — same seed, same order; new seed,
            # new shuffle. The reference hashes fieldName + index
            # version; here the key is an md5-derived 60-bit int of
            # seed:doc_id (engine-portable — the oracle twin derives
            # the identical key), deterministic across executors.
            seed = expr[len("random_"):]
            col = F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(seed), F.col("doc_id").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
        else:
            col = F.col(expr)
        if missing == "last":
            out.append(
                F.desc_nulls_last(col) if desc else F.asc_nulls_last(col)
            )
        elif missing == "first":
            out.append(
                F.desc_nulls_first(col)
                if desc
                else F.asc_nulls_first(col)
            )
        else:
            out.append(F.desc(col) if desc else F.asc(col))
    return out
