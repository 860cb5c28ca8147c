"""ANSI-SQL (DuckDB) oracle builders mirroring the engine's semantics.

Every gate query in __spark_entry__.py has a SQL twin generated here. The
SQL reproduces the engine's arithmetic *textually* (same operator order,
same literals) so IEEE-double results agree to the last ulp; floats are
rounded to 4 decimals on both sides before comparison.

The norm quantization (SmallFloat.floatToByte315 -> NORM_TABLE decode),
which plain SQL cannot express bit-level, is inlined as a precomputed
interval table: dl in [lo, hi] -> quantized dl (33 intervals cover
dl <= 100000). Generated from the same numpy code the engine uses, so
the two sides agree by construction.
"""

from __future__ import annotations

import numpy as np

from .analysis.tokenizer import ENGLISH_STOP_WORDS, TOKEN_PATTERN
from .index.norms import NORM_TABLE, encode_norm

K1 = "1.2"
B = "0.75"
DL_MAX = 100_000


def _sq(s: str) -> str:
    return s.replace("'", "''")


PATTERN_LIT = "'" + _sq(TOKEN_PATTERN) + "'"
STOP_LIST = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))


def qdl_values() -> str:
    """(lo, hi, qdl) rows: dl interval -> quantized dl (float64 repr of
    the float32 NORM_TABLE entry for encode_norm(dl))."""
    dls = np.arange(1, DL_MAX + 1)
    bs = encode_norm(dls).astype(int)
    rows = []
    start = 0
    for i in range(1, len(dls) + 1):
        if i == len(dls) or bs[i] != bs[start]:
            qdl = float(NORM_TABLE[bs[start]])
            rows.append(f"({int(dls[start])}, {int(dls[i-1])}, {qdl!r})")
            start = i
    return ", ".join(rows)


_QDL_VALUES = None


def _qdl() -> str:
    global _QDL_VALUES
    if _QDL_VALUES is None:
        _QDL_VALUES = qdl_values()
    return _QDL_VALUES


def tok_ctes(table: str = "documents") -> str:
    """Shared CTEs: tok (post-stop terms), dls (doc length), coll
    (maxDoc + avgdl), qdl (quantization intervals)."""
    return f"""
tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term
    FROM {table}
  ) WHERE length(term) <= 255 AND term NOT IN ({STOP_LIST})
),
dls AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
coll AS (
  SELECT (SELECT count(*) FROM {table}) AS max_doc,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dls)
           / (SELECT CAST(count(*) AS DOUBLE) FROM {table}) AS avgdl
),
qdl AS (SELECT * FROM (VALUES {_qdl()}) AS t(lo, hi, q))
""".strip()


def _scored_cte(terms: list[str], table: str = "documents") -> str:
    """Per-(doc, term) BM25 CTE over the query terms, mirroring
    Searcher's double path: ln(1+(N-df+0.5)/(df+0.5)) * (1.2+1) * tf
    / (tf + 1.2*((1-0.75) + 0.75*qdl/avgdl))."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return f"""
qtf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT f.doc_id, f.term,
         ln(1 + ((SELECT max_doc FROM coll) - d.df + 0.5) / (d.df + 0.5))
           * ({K1}+1) * f.tf
           / (f.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM qtf f
  JOIN dfs d USING (term)
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
""".strip()


def field_ctes(
    suffix: str, text_expr: str, table: str = "documents"
) -> str:
    """Per-field twins of tok/dls/coll (tok_t, dls_t, coll_t, ...):
    the same analyzer chain over an arbitrary text expression, so a
    derived field like substr(text, 1, 80) gets its OWN document
    lengths, docFreqs and average field length — mirroring the
    engine's per-field FieldInvertState (index/fields.py). qdl is
    field-independent (one quantization table) and must be emitted
    once separately via qdl_cte()."""
    return f"""
tok{suffix} AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower({text_expr}), {PATTERN_LIT}))
             AS term
    FROM {table}
  ) WHERE length(term) <= 255 AND term NOT IN ({STOP_LIST})
),
dls{suffix} AS (SELECT doc_id, count(*) AS dl FROM tok{suffix}
                GROUP BY doc_id),
coll{suffix} AS (
  SELECT (SELECT count(*) FROM {table}) AS max_doc,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM dls{suffix})
           / (SELECT CAST(count(*) AS DOUBLE) FROM {table}) AS avgdl
)
""".strip()


def qdl_cte() -> str:
    return f"qdl AS (SELECT * FROM (VALUES {_qdl()}) AS t(lo, hi, q))"


def _scored_cte_field(
    terms: list[str],
    suffix: str,
    boost: float = 1.0,
    table: str = "documents",
) -> str:
    """Per-(doc, term) BM25 over one field's CTEs, with a query-time
    field boost multiplied FIRST — textually identical to the engine's
    weight = boost * idf * (k1+1) (executor._term_weight_value)."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return f"""
qtf{suffix} AS (
  SELECT doc_id, term, count(*) AS tf FROM tok{suffix}
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
dfs{suffix} AS (SELECT term, count(*) AS df FROM qtf{suffix}
                GROUP BY term),
scored{suffix} AS (
  SELECT f.doc_id, f.term,
         {boost!r} * ln(1 + ((SELECT max_doc FROM coll{suffix}) - d.df
                             + 0.5) / (d.df + 0.5))
           * ({K1}+1) * f.tf
           / (f.tf + {K1}*((1-{B})
                + {B}*q.q/(SELECT avgdl FROM coll{suffix})))
           AS score
  FROM qtf{suffix} f
  JOIN dfs{suffix} d USING (term)
  JOIN dls{suffix} l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
""".strip()


def bm25_fielded_term(
    term: str, text_expr: str, k: int = 10, table: str = "documents"
) -> str:
    """BM25 top-k over ONE derived field: per-field df, dl, avgdl."""
    return (
        f"WITH {qdl_cte()}, {field_ctes('_f', text_expr, table)}, "
        f"{_scored_cte_field([term], '_f', 1.0, table)} "
        + _topk("scored_f", k)
    )


def edismax_qf_sql(
    terms: list[str],
    field_specs: list[tuple[str, str, float]],
    tie: float = 0.0,
    mm: int = 1,
    k: int = 10,
    table: str = "documents",
) -> str:
    """edismax main query: per-term DisjunctionMax over the qf fields
    (max + tie*(sum-max)), summed across terms with minimum-match —
    the DisMaxQParser.java:140-180 composition. ``field_specs`` is
    [(suffix, text_expr, boost), ...]."""
    parts = [qdl_cte()]
    unions = []
    for suffix, text_expr, boost in field_specs:
        parts.append(field_ctes(suffix, text_expr, table))
        parts.append(_scored_cte_field(terms, suffix, boost, table))
        unions.append(f"SELECT doc_id, term, score FROM scored{suffix}")
    u = " UNION ALL ".join(unions)
    parts.append(f"u AS ({u})")
    parts.append(
        "per_term AS (SELECT doc_id, term, "
        f"max(score) + {tie!r} * (sum(score) - max(score)) AS score "
        "FROM u GROUP BY doc_id, term)"
    )
    parts.append(
        "agg AS (SELECT doc_id, sum(score) AS score FROM per_term "
        f"GROUP BY doc_id HAVING count(*) >= {mm})"
    )
    return "WITH " + ", ".join(parts) + " " + _topk("agg", k)


def edismax_pf_sql(
    terms: list[str],
    field_specs: list[tuple[str, str, float]],
    pf_specs: list[tuple[str, str, float]],
    tie: float = 0.0,
    mm: int = 1,
    k: int = 10,
    table: str = "documents",
) -> str:
    """edismax qf main query + pf exact-phrase boost: docs matching the
    main query get each pf field's phrase BM25 (idf-sum weight * phrase
    tf saturation, boosted) ADDED when the whole term sequence occurs
    adjacently in that field (DisMaxQParser.addBoostQuery analogue).
    ``pf_specs`` is [(suffix, text_expr, boost), ...] and each suffix
    must ALREADY have field_ctes emitted via a matching qf spec or be
    distinct from them."""
    base = edismax_qf_sql(terms, field_specs, tie, mm, 10**9, table)
    # strip the trailing top-k select; keep the WITH ... agg body
    with_body = base.rsplit(" SELECT doc_id, round(score, 4)", 1)[0]
    pf_parts = []
    pf_unions = []
    emitted = {s for s, _, _ in field_specs}
    for suffix, text_expr, boost in pf_specs:
        if suffix not in emitted:
            pf_parts.append(field_ctes(suffix, text_expr, table))
            emitted.add(suffix)
        # adjacency walk over pre-stop positions of this field's text
        p_ctes = [
            f"""
rawp{suffix} AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower({text_expr}), {PATTERN_LIT}))
             AS term,
           generate_subscripts(
             regexp_extract_all(lower({text_expr}), {PATTERN_LIT}), 1)
             AS pos
    FROM {table}
  )
)""".strip()
        ]
        joins = [f"pp{suffix}_0"]
        p_ctes.append(
            f"pp{suffix}_0 AS (SELECT doc_id, pos FROM rawp{suffix} "
            f"WHERE term = '{_sq(terms[0])}')"
        )
        for i, t in enumerate(terms[1:], start=1):
            p_ctes.append(
                f"pp{suffix}_{i} AS (SELECT doc_id, pos - {i} AS pos "
                f"FROM rawp{suffix} WHERE term = '{_sq(t)}')"
            )
            joins.append(f"pp{suffix}_{i}")
        join_expr = joins[0]
        for j in joins[1:]:
            join_expr += f" JOIN {j} USING (doc_id, pos)"
        tl = ", ".join(f"'{_sq(t)}'" for t in terms)
        idf_terms = " + ".join(
            f"ln(1 + ((SELECT max_doc FROM coll{suffix}) - "
            f"(SELECT df FROM pdfs{suffix} WHERE term = '{_sq(t)}') + 0.5)"
            f" / ((SELECT df FROM pdfs{suffix} WHERE term = '{_sq(t)}') "
            "+ 0.5))"
            for t in terms
        )
        p_ctes.append(
            f"pdfs{suffix} AS (SELECT term, count(DISTINCT doc_id) AS df "
            f"FROM tok{suffix} WHERE term IN ({tl}) GROUP BY term)"
        )
        p_ctes.append(
            f"pocc{suffix} AS (SELECT doc_id, count(*) AS tf FROM "
            f"({join_expr}) GROUP BY doc_id)"
        )
        p_ctes.append(
            f"""
pboost{suffix} AS (
  SELECT o.doc_id,
         {boost!r} * ({idf_terms}) * ({K1}+1) * o.tf
           / (o.tf + {K1}*((1-{B})
                + {B}*q.q/(SELECT avgdl FROM coll{suffix}))) AS pf_score
  FROM pocc{suffix} o
  JOIN dls{suffix} l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)""".strip()
        )
        pf_parts.extend(p_ctes)
        pf_unions.append(
            f"SELECT doc_id, pf_score FROM pboost{suffix}"
        )
    pf_parts.append(
        "pf_agg AS (SELECT doc_id, sum(pf_score) AS pf_score FROM ("
        + " UNION ALL ".join(pf_unions)
        + ") GROUP BY doc_id)"
    )
    pf_parts.append(
        "boosted AS (SELECT a.doc_id, a.score + coalesce(p.pf_score, "
        "CAST(0.0 AS DOUBLE)) AS score FROM agg a LEFT JOIN pf_agg p "
        "USING (doc_id))"
    )
    return (
        with_body + ", " + ", ".join(pf_parts) + " " + _topk("boosted", k)
    )


def _topk(select_from: str, k: int = 10, offset: int = 0) -> str:
    off = f" OFFSET {offset}" if offset else ""
    return (
        f"SELECT doc_id, round(score, 4) AS score FROM {select_from} "
        f"ORDER BY score DESC, doc_id ASC LIMIT {k}{off}"
    )


def bm25_term(term: str, k: int = 10, table: str = "documents") -> str:
    return (
        f"WITH {tok_ctes(table)}, {_scored_cte([term], table)} "
        + _topk("scored", k)
    )


def bm25_bool(
    must: list[str],
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    msm: int = 0,
    k: int = 10,
    table: str = "documents",
    offset: int = 0,
    fq: str | None = None,
) -> str:
    should = should or []
    must_not = must_not or []
    all_terms = list(dict.fromkeys(must + should))
    parts = [tok_ctes(table), _scored_cte(all_terms, table)]
    must_list = ", ".join(f"'{_sq(t)}'" for t in must) if must else ""
    should_list = ", ".join(f"'{_sq(t)}'" for t in should) if should else ""
    conds = []
    if must:
        conds.append(
            f"count(DISTINCT CASE WHEN term IN ({must_list}) THEN term END)"
            f" = {len(set(must))}"
        )
    eff_msm = msm if must else max(1, msm)
    if should and eff_msm > 0:
        conds.append(
            f"count(DISTINCT CASE WHEN term IN ({should_list}) THEN term "
            f"END) >= {eff_msm}"
        )
    having = " AND ".join(conds) if conds else "TRUE"
    agg = (
        "agg AS (SELECT doc_id, sum(score) AS score FROM scored "
        f"GROUP BY doc_id HAVING {having})"
    )
    parts.append(agg)
    final_src = "agg"
    if must_not:
        mn_list = ", ".join(f"'{_sq(t)}'" for t in must_not)
        parts.append(
            "excl AS (SELECT DISTINCT doc_id FROM tok "
            f"WHERE term IN ({mn_list}))"
        )
        parts.append(
            "kept AS (SELECT a.* FROM agg a WHERE a.doc_id NOT IN "
            "(SELECT doc_id FROM excl))"
        )
        final_src = "kept"
    if fq:
        # Solr fq: non-scoring filter over stored-field columns
        parts.append(
            f"fqd AS (SELECT s.* FROM {final_src} s JOIN {table} d "
            f"USING (doc_id) WHERE {fq})"
        )
        final_src = "fqd"
    return "WITH " + ", ".join(parts) + " " + _topk(final_src, k, offset)


def bm25_dismax(
    terms: list[str], tie: float, k: int = 10, table: str = "documents"
) -> str:
    return (
        f"WITH {tok_ctes(table)}, {_scored_cte(terms, table)}, "
        "agg AS (SELECT doc_id, max(score) + "
        f"{tie!r} * (sum(score) - max(score)) AS score "
        "FROM scored GROUP BY doc_id) " + _topk("agg", k)
    )


def bm25_phrase(
    terms: list[str], k: int = 10, table: str = "documents"
) -> str:
    """Exact phrase: adjacency on pre-stop positions; idf = sum of
    constituent idfs in term order; freq = phrase occurrences."""
    pos_ctes = f"""
rawtok AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
    FROM {table}
  )
)""".strip()
    joins = ["p0"]
    p_ctes = [
        f"p0 AS (SELECT doc_id, pos FROM rawtok WHERE term = '{_sq(terms[0])}')"
    ]
    for i, t in enumerate(terms[1:], start=1):
        p_ctes.append(
            f"p{i} AS (SELECT doc_id, pos - {i} AS pos FROM rawtok "
            f"WHERE term = '{_sq(t)}')"
        )
        joins.append(f"p{i}")
    join_expr = joins[0]
    for j in joins[1:]:
        join_expr += f" JOIN {j} USING (doc_id, pos)"
    idf_terms = " + ".join(
        "ln(1 + ((SELECT max_doc FROM coll) - "
        f"(SELECT df FROM dfs WHERE term = '{_sq(t)}') + 0.5) / "
        f"((SELECT df FROM dfs WHERE term = '{_sq(t)}') + 0.5))"
        for t in terms
    )
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return f"""
WITH {tok_ctes(table)},
{pos_ctes},
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({tl}) GROUP BY term
),
{', '.join(p_ctes)},
occ AS (SELECT doc_id, count(*) AS tf FROM ({join_expr}) GROUP BY doc_id),
scored AS (
  SELECT o.doc_id,
         ({idf_terms}) * ({K1}+1) * o.tf
           / (o.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM occ o JOIN dls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


def bm25_multi_phrase(
    positions: list[list[str]], k: int = 10, table: str = "documents"
) -> str:
    """MultiPhraseQuery exact oracle: slot i matches when ANY of
    positions[i] sits at adjusted position p (distinct terms never share
    a raw position, so each slot CTE has at most one row per (doc, pos)
    and the equi-join counts occurrences exactly). idf sums over EVERY
    term of every slot in slot order, df=0 terms included via COALESCE
    (MultiPhraseWeight ctor, MultiPhraseQuery.java:135-160)."""
    flat = [t for arr in positions for t in arr]
    pos_ctes = f"""
rawtok AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
    FROM {table}
  )
)""".strip()
    joins = []
    p_ctes = []
    for i, arr in enumerate(positions):
        tl = ", ".join(f"'{_sq(t)}'" for t in sorted(set(arr)))
        off = f" - {i}" if i else ""
        p_ctes.append(
            f"p{i} AS (SELECT doc_id, pos{off} AS pos FROM rawtok "
            f"WHERE term IN ({tl}))"
        )
        joins.append(f"p{i}")
    join_expr = joins[0]
    for j in joins[1:]:
        join_expr += f" JOIN {j} USING (doc_id, pos)"
    idf_terms = " + ".join(
        "ln(1 + ((SELECT max_doc FROM coll) - "
        f"COALESCE((SELECT df FROM dfs WHERE term = '{_sq(t)}'), 0) + 0.5) / "
        f"(COALESCE((SELECT df FROM dfs WHERE term = '{_sq(t)}'), 0) + 0.5))"
        for t in flat
    )
    tl_all = ", ".join(f"'{_sq(t)}'" for t in sorted(set(flat)))
    return f"""
WITH {tok_ctes(table)},
{pos_ctes},
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({tl_all}) GROUP BY term
),
{', '.join(p_ctes)},
occ AS (SELECT doc_id, count(*) AS tf FROM ({join_expr}) GROUP BY doc_id),
scored AS (
  SELECT o.doc_id,
         ({idf_terms}) * ({K1}+1) * o.tf
           / (o.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM occ o JOIN dls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


def bm25_phrase_sloppy(
    terms: list[str], slop: int, k: int = 10, table: str = "documents"
) -> str:
    """Sloppy 2-term phrase — exact SQL form of the SloppyPhraseScorer
    greedy walk (SloppyPhraseScorer.java:75-105, no-repeats path).

    Chain form proven equivalent to the walk for 2 distinct clauses
    (property-tested over 2000 random position lists,
    tests/test_sloppy.py::test_closed_form_equals_walk_2clause): with
    adjusted positions (raw - clause_offset), emits form a chain —
    c0 = max of the two heads (tie -> clause 1, PhraseQueue order),
    c_{{k+1}} = first element of the OPPOSITE list > c_k; each c_k emits
    match length c_k - (last element of the other list <= c_k).
    phraseFreq = float32-ordered sum of 1/(dist+1) over emits with
    dist <= slop, reproduced bit-exactly via list_reduce with REAL
    casts (chain order = ascending c). The chain is a recursive CTE
    over per-doc position lists. Scoring mirrors bm25_phrase."""
    if len(terms) != 2:
        raise NotImplementedError("SQL sloppy oracle covers 2 clauses")
    idf_terms = " + ".join(
        "ln(1 + ((SELECT max_doc FROM coll) - "
        f"(SELECT df FROM dfs WHERE term = '{_sq(t)}') + 0.5) / "
        f"((SELECT df FROM dfs WHERE term = '{_sq(t)}') + 0.5))"
        for t in terms
    )
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return _sloppy_chain_sql(
        f"term = '{_sq(terms[0])}'",
        f"term = '{_sq(terms[1])}'",
        idf_terms,
        tl,
        slop,
        k,
        table,
    )


def bm25_multi_phrase_sloppy(
    positions: list[list[str]],
    slop: int,
    k: int = 10,
    table: str = "documents",
) -> str:
    """Sloppy 2-slot MultiPhraseQuery oracle: the engine feeds each
    slot's merged union of its alternatives' positions into the same
    2-clause greedy walk (UnionDocsAndPositionsEnum semantics,
    MultiPhraseQuery.java:411-520), so the proven chain form applies
    verbatim with per-slot lists built from IN-lists. Slots must be
    disjoint (the engine raises otherwise). idf sums over every term of
    every slot in slot order, df=0 terms included via COALESCE."""
    if len(positions) != 2:
        raise NotImplementedError("SQL sloppy oracle covers 2 slots")
    flat = [t for arr in positions for t in arr]
    idf_terms = " + ".join(
        "ln(1 + ((SELECT max_doc FROM coll) - "
        f"COALESCE((SELECT df FROM dfs WHERE term = '{_sq(t)}'), 0) + 0.5) / "
        f"(COALESCE((SELECT df FROM dfs WHERE term = '{_sq(t)}'), 0) + 0.5))"
        for t in flat
    )
    tl_all = ", ".join(f"'{_sq(t)}'" for t in sorted(set(flat)))
    in0 = ", ".join(f"'{_sq(t)}'" for t in sorted(set(positions[0])))
    in1 = ", ".join(f"'{_sq(t)}'" for t in sorted(set(positions[1])))
    return _sloppy_chain_sql(
        f"term IN ({in0})",
        f"term IN ({in1})",
        idf_terms,
        tl_all,
        slop,
        k,
        table,
    )


def _sloppy_chain_sql(
    where0: str,
    where1: str,
    idf_terms: str,
    df_in_list: str,
    slop: int,
    k: int,
    table: str,
) -> str:
    """Shared SQL body for the 2-clause sloppy chain walk: clause 0/1
    position lists come from rawtok rows matching ``where0``/``where1``
    (single term or IN-list union — the chain only sees the merged
    ascending lists)."""
    pos_ctes = f"""
rawtok AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
    FROM {table}
  )
)""".strip()
    tl = df_in_list
    return f"""
WITH RECURSIVE {tok_ctes(table)},
{pos_ctes},
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({tl}) GROUP BY term
),
merged AS (
  SELECT doc_id, pos AS p, 0 AS cl FROM rawtok WHERE {where0}
  UNION ALL
  SELECT doc_id, pos - 1 AS p, 1 AS cl FROM rawtok WHERE {where1}
),
lists AS (
  SELECT doc_id,
         list(p ORDER BY p) FILTER (WHERE cl = 0) AS la,
         list(p ORDER BY p) FILTER (WHERE cl = 1) AS lb
  FROM merged GROUP BY doc_id
  HAVING count(DISTINCT cl) = 2
),
chain(doc_id, la, lb, c, ccl, dist) AS (
  SELECT doc_id, la, lb,
         CASE WHEN la[1] > lb[1] THEN la[1] ELSE lb[1] END,
         CASE WHEN la[1] > lb[1] THEN 0 ELSE 1 END,
         CASE WHEN la[1] > lb[1]
              THEN la[1] - list_filter(lb, x -> x <= la[1])[-1]
              ELSE lb[1] - list_filter(la, x -> x <= lb[1])[-1] END
  FROM lists
  UNION ALL
  SELECT doc_id, la, lb, nc, 1 - ccl,
         nc - list_filter(CASE WHEN ccl = 0 THEN la ELSE lb END,
                          x -> x <= nc)[-1]
  FROM (
    SELECT *, list_filter(CASE WHEN ccl = 0 THEN lb ELSE la END,
                          x -> x > c)[1] AS nc
    FROM chain
  ) WHERE nc IS NOT NULL
),
freqs AS (
  SELECT doc_id,
         list_reduce(
           list(CAST(1.0 AS REAL) / CAST(dist + 1 AS REAL) ORDER BY c),
           (x, y) -> CAST(x + y AS REAL)) AS tf
  FROM chain WHERE dist <= {slop} GROUP BY doc_id
),
scored AS (
  SELECT o.doc_id,
         ({idf_terms}) * ({K1}+1) * o.tf
           / (o.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM freqs o JOIN dls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


def bm25_phrase_sloppy_rpts(
    t_rpt: str,
    t_other: str,
    slop: int,
    k: int = 10,
    table: str = "documents",
) -> str:
    """Sloppy phrase "A A B"~slop with a repeated term — the hasRpts
    walk (SloppyPhraseScorer.java:106-215) simulated EXACTLY as a
    recursive-CTE state machine, one row per walk step.

    State per doc: lk/lo = raw position lists of A and B; i0,i1 index
    lk (clauses 0,1 of term A; adjusted pos = raw - offset), i2 indexes
    lo (clause 2); pp = popped clause; endp/ml/nxt = walk registers;
    emit = match length scored at this step (NULL if none).

    Init mirrors initComplex: clause 1 pre-advanced once
    (advanceRepeatGroups, group [0,1] sorted by offset), needing
    len(lk) >= 2. Collisions (both A-clauses on one raw position,
    i.e. i0 == i1) resolve by advancing clause 1 — the lesser by
    (position, offset) since its adjusted position is raw-1 — and with
    a 2-element group one extra advance always clears the collision
    (indices into one list collide iff equal). Emission order = step
    order; phraseFreq = float32 list_reduce like the 2-clause oracle.
    Covers exactly the (A A B) clause shape the gate uses."""
    assert t_rpt != t_other
    a, b = _sq(t_rpt), _sq(t_other)
    pos_ctes = f"""
rawtok AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
    FROM {table}
  )
)""".strip()
    terms = [t_rpt, t_rpt, t_other]
    idf_terms = " + ".join(
        "ln(1 + ((SELECT max_doc FROM coll) - "
        f"(SELECT df FROM dfs WHERE term = '{_sq(t)}') + 0.5) / "
        f"((SELECT df FROM dfs WHERE term = '{_sq(t)}') + 0.5))"
        for t in terms
    )
    return f"""
WITH RECURSIVE {tok_ctes(table)},
{pos_ctes},
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ('{a}', '{b}') GROUP BY term
),
lists AS (
  SELECT doc_id,
         list(pos ORDER BY pos) FILTER (WHERE term = '{a}') AS lk,
         list(pos ORDER BY pos) FILTER (WHERE term = '{b}') AS lo
  FROM rawtok WHERE term IN ('{a}', '{b}') GROUP BY doc_id
  HAVING len(list(pos ORDER BY pos) FILTER (WHERE term = '{a}')) >= 2
     AND len(list(pos ORDER BY pos) FILTER (WHERE term = '{b}')) >= 1
),
init AS (
  SELECT doc_id, lk, lo, 1 AS i0, 2 AS i1, 1 AS i2,
         CASE WHEN p0 <= p1 AND p0 <= p2 THEN 0
              WHEN p1 <= p2 THEN 1 ELSE 2 END AS pp,
         greatest(p0, p1, p2) AS endp,
         greatest(p0, p1, p2) - least(p0, p1, p2) AS ml,
         CASE WHEN p0 <= p1 AND p0 <= p2 THEN least(p1, p2)
              WHEN p1 <= p2 THEN least(p0, p2)
              ELSE least(p0, p1) END AS nxt
  FROM (SELECT doc_id, lk, lo,
               lk[1] AS p0, lk[2] - 1 AS p1, lo[1] - 2 AS p2
        FROM lists)
),
chain(doc_id, lk, lo, i0, i1, i2, pp, endp, ml, nxt, step, emit, done)
AS (
  SELECT doc_id, lk, lo, i0, i1, i2, pp, endp, ml, nxt,
         0 AS step, CAST(NULL AS BIGINT) AS emit, FALSE AS done
  FROM init
  UNION ALL
  SELECT doc_id, lk, lo,
         j0, k1, j2,
         CASE WHEN exhausted OR NOT branch THEN pp
              WHEN q0 <= q1 AND q0 <= q2 THEN 0
              WHEN q1 <= q2 THEN 1 ELSE 2 END,
         CASE WHEN exhausted THEN endp ELSE end2 END,
         CASE WHEN exhausted THEN ml
              WHEN branch THEN end2 - least(q0, q1, q2)
              ELSE least(ml, end2 - pos_pp) END,
         CASE WHEN exhausted OR NOT branch THEN nxt
              WHEN q0 <= q1 AND q0 <= q2 THEN least(q1, q2)
              WHEN q1 <= q2 THEN least(q0, q2)
              ELSE least(q0, q1) END,
         step + 1,
         CASE WHEN exhausted OR branch THEN ml END,
         exhausted
  FROM (
    SELECT *,
           CASE WHEN exhausted THEN NULL ELSE lk[j0] END AS q0,
           CASE WHEN exhausted THEN NULL ELSE lk[k1] - 1 END AS q1,
           CASE WHEN exhausted THEN NULL ELSE lo[j2] - 2 END AS q2,
           CASE WHEN exhausted THEN NULL ELSE greatest(
             endp,
             CASE pp WHEN 0 THEN lk[j0]
                     WHEN 1 THEN lk[k1] - 1
                     ELSE lo[j2] - 2 END,
             CASE WHEN coll THEN lk[k1] - 1 ELSE endp END) END AS end2,
           CASE WHEN exhausted THEN NULL
                ELSE CASE pp WHEN 0 THEN lk[j0]
                             WHEN 1 THEN lk[k1] - 1
                             ELSE lo[j2] - 2 END END AS pos_pp,
           CASE WHEN exhausted THEN FALSE
                ELSE (CASE pp WHEN 0 THEN lk[j0]
                              WHEN 1 THEN lk[k1] - 1
                              ELSE lo[j2] - 2 END) > nxt END AS branch
    FROM (
      SELECT *, exhausted_a OR (coll AND k1 > len(lk)) AS exhausted
      FROM (
        SELECT *,
               NOT exhausted_a AND pp IN (0, 1) AND j0 = j1 AS coll,
               CASE WHEN NOT exhausted_a AND pp IN (0, 1) AND j0 = j1
                    THEN j1 + 1 ELSE j1 END AS k1
        FROM (
          SELECT *,
                 (pp = 0 AND j0 > len(lk)) OR (pp = 1 AND j1 > len(lk))
                   OR (pp = 2 AND j2 > len(lo)) AS exhausted_a
          FROM (
            SELECT doc_id, lk, lo, i0, i1, i2, pp, endp, ml, nxt, step,
                   CASE pp WHEN 0 THEN i0 + 1 ELSE i0 END AS j0,
                   CASE pp WHEN 1 THEN i1 + 1 ELSE i1 END AS j1,
                   CASE pp WHEN 2 THEN i2 + 1 ELSE i2 END AS j2
            FROM chain WHERE NOT done
          )
        )
      )
    )
  )
),
freqs AS (
  SELECT doc_id,
         list_reduce(
           list(CAST(1.0 AS REAL) / CAST(emit + 1 AS REAL) ORDER BY step),
           (x, y) -> CAST(x + y AS REAL)) AS tf
  FROM chain WHERE emit IS NOT NULL AND emit <= {slop} GROUP BY doc_id
),
scored AS (
  SELECT o.doc_id,
         ({idf_terms}) * ({K1}+1) * o.tf
           / (o.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM freqs o JOIN dls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


_MEDIA_CTE = """
media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes,
         CAST(100 + doc_id % 500 AS INTEGER) AS width,
         CAST(100 + doc_id % 300 AS INTEGER) AS height,
         CASE WHEN doc_id % 3 = 2
              THEN CAST(1000 + (doc_id % 10) * 700 AS INTEGER) END
           AS duration_ms
  FROM documents
)""".strip()


def multimodal_meta() -> str:
    return f"""
WITH {_MEDIA_CTE}
SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes FROM media
ORDER BY media_id
""".strip()


def multimodal_frames(every_ms: int = 1000) -> str:
    return f"""
WITH {_MEDIA_CTE},
vids AS (
  SELECT media_id,
         greatest(duration_ms // {every_ms}, 1) AS n_frames
  FROM media WHERE kind = 'video'
)
SELECT media_id,
       CAST(unnest(range(n_frames)) AS INTEGER) AS frame_idx,
       CAST(unnest(range(n_frames)) * {every_ms} AS INTEGER) AS ts_ms
FROM vids
ORDER BY media_id, frame_idx
""".strip()


def multimodal_resize(max_side: int = 256) -> str:
    return f"""
WITH {_MEDIA_CTE}
SELECT media_id, width, height,
       CAST(round(width * CASE WHEN greatest(width, height) > {max_side}
            THEN CAST({max_side} AS DOUBLE) / greatest(width, height)
            ELSE 1.0 END) AS INTEGER) AS target_w,
       CAST(round(height * CASE WHEN greatest(width, height) > {max_side}
            THEN CAST({max_side} AS DOUBLE) / greatest(width, height)
            ELSE 1.0 END) AS INTEGER) AS target_h
FROM media WHERE kind = 'image'
ORDER BY media_id
""".strip()


def geofilt_docs(
    lat: float, lon: float, d_km: float, table: str = "documents"
) -> str:
    """{!geofilt} twin: same synthetic doc_id-derived coordinates, same
    haversine op order (2R * atan2(sqrt(a), sqrt(1-a)))."""
    r = 6371.0087714
    return f"""
WITH pts AS (
  SELECT doc_id,
         ((doc_id * 37) % 1800) / 10.0 - 90.0 AS lat,
         ((doc_id * 73) % 3600) / 10.0 - 180.0 AS lon
  FROM {table}
),
d AS (
  SELECT doc_id,
         (2.0 * {r!r}) * atan2(
           sqrt(  sin(radians(lat - {lat!r}) / 2) * sin(radians(lat - {lat!r}) / 2)
                + cos(radians({lat!r})) * cos(radians(lat))
                  * sin(radians(lon - {lon!r}) / 2) * sin(radians(lon - {lon!r}) / 2)),
           sqrt(1.0 - (sin(radians(lat - {lat!r}) / 2) * sin(radians(lat - {lat!r}) / 2)
                + cos(radians({lat!r})) * cos(radians(lat))
                  * sin(radians(lon - {lon!r}) / 2) * sin(radians(lon - {lon!r}) / 2)))
         ) AS dist_km
  FROM pts
)
SELECT doc_id, round(dist_km, 4) AS dist_km FROM d
WHERE dist_km <= {d_km!r}
ORDER BY doc_id
""".strip()


def taxonomy_facets(term: str, table: str = "documents") -> str:
    """Hierarchical facet counts over the lang/source taxonomy: one row
    per tree node (depth-1 lang and depth-2 lang/source), counts within
    the matching doc set — lucene/facet taxonomy counting shape."""
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}'),
m AS (SELECT d.lang, d.source FROM {table} d JOIN matched USING (doc_id))
SELECT path, cnt FROM (
  SELECT lang AS path, count(*) AS cnt FROM m GROUP BY lang
  UNION ALL
  SELECT lang || '/' || source AS path, count(*) AS cnt
  FROM m GROUP BY lang, source
) ORDER BY path
""".strip()


def facet_drilldown(
    term: str, lang: str = "en", table: str = "documents"
) -> str:
    """DrillDownQuery twin (DrillDown.java:57-76): drill term ANDed
    into the match set, child-category counts under the drilled path."""
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}'),
m AS (SELECT d.lang, d.source FROM {table} d JOIN matched USING (doc_id)
      WHERE d.lang = '{_sq(lang)}')
SELECT lang || '/' || source AS path, count(*) AS cnt
FROM m GROUP BY lang, source ORDER BY path
""".strip()


def facet_assoc_sum(term: str, table: str = "documents") -> str:
    """Association facet twin (AssociationIntSumAggregator.java:49-54):
    per-category SUM of the per-doc int association (n_chars) instead
    of a count."""
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}')
SELECT d.lang AS path,
       CAST(sum(d.n_chars) AS BIGINT) AS assoc_sum
FROM {table} d JOIN matched USING (doc_id)
GROUP BY d.lang ORDER BY path
""".strip()


def ngram_freq(
    n: int = 3, k: int = 20, table: str = "documents"
) -> str:
    """NGramTokenFilter twin: top-k char n-grams over the analyzed
    token stream (one gram row per token occurrence position)."""
    return f"""
WITH {tok_ctes(table)},
grams AS (
  SELECT unnest(list_transform(
           range(1, length(term) - {n} + 2),
           i -> substr(term, i::INT, {n}))) AS gram
  FROM tok
)
SELECT gram, count(*) AS cnt FROM grams
GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT {k}
""".strip()


def edge_ngram_freq(
    min_gram: int = 2,
    max_gram: int = 4,
    k: int = 20,
    table: str = "documents",
) -> str:
    """EdgeNGramTokenFilter (FRONT) twin: top-k front-edge grams of
    sizes min..max over the analyzed token stream."""
    return f"""
WITH {tok_ctes(table)},
grams AS (
  SELECT unnest(list_transform(
           range({min_gram}, least({max_gram}, length(term)) + 1),
           n -> substr(term, 1, n::INT))) AS gram
  FROM tok
)
SELECT gram, count(*) AS cnt FROM grams
GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT {k}
""".strip()


def match_all(table: str = "documents") -> str:
    return (
        f"SELECT doc_id, 1.0 AS score FROM {table} ORDER BY doc_id"
    )


def sort_by_field(
    term: str, field: str, k: int = 10, table: str = "documents"
) -> str:
    """TopFieldCollector twin: top-k of the match set by a stored field
    (desc), doc_id tiebreak, scores still reported."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT s.doc_id, round(s.score, 4) AS score
FROM scored s JOIN {table} d USING (doc_id)
ORDER BY d.{field} DESC, s.doc_id ASC
LIMIT {k}
""".strip()


def query_elevation(
    term: str,
    ids: list[int],
    k: int = 10,
    table: str = "documents",
    exclude: list[int] | None = None,
) -> str:
    """QueryElevationComponent twin: pinned ids first in config order
    (score 0 when the query does not match them), organic after;
    ``exclude`` ids (elevate.xml exclude="true") are removed."""
    vals = ", ".join(f"({int(d)}, {i})" for i, d in enumerate(ids))
    ex = (
        "WHERE s.doc_id NOT IN ("
        + ", ".join(str(int(d)) for d in exclude)
        + ")"
        if exclude
        else ""
    )
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
kept AS (SELECT * FROM scored s {ex}),
elev(e_doc, elev_rank) AS (VALUES {vals}),
j AS (
  SELECT COALESCE(s.doc_id, e.e_doc) AS doc_id,
         COALESCE(s.score, 0.0) AS score,
         e.elev_rank
  FROM kept s FULL OUTER JOIN elev e ON s.doc_id = e.e_doc
)
SELECT doc_id, round(score, 4) AS score,
       CAST(elev_rank IS NOT NULL AS INTEGER) AS elevated
FROM j
ORDER BY CASE WHEN elev_rank IS NOT NULL THEN 0 ELSE 1 END,
         elev_rank ASC NULLS LAST, score DESC, doc_id ASC
LIMIT {k}
""".strip()


def bm25_scored_all(term: str, table: str = "documents") -> str:
    """Full (doc_id, score) match set for one term — order-insensitive
    gate shape used by the delete/update gates (no top-k, so internal
    docID reassignment after updates cannot perturb tie-breaks)."""
    return (
        f"WITH {tok_ctes(table)}, {_scored_cte([term], table)} "
        f"SELECT doc_id, round(score, 4) AS score FROM scored "
        f"ORDER BY doc_id"
    )


def rtg_docs(ids: list[int], table: str = "documents") -> str:
    il = ", ".join(str(int(i)) for i in ids)
    return (
        f"SELECT doc_id, lang, n_chars FROM {table} "
        f"WHERE doc_id IN ({il}) ORDER BY doc_id"
    )


def prefix_docs(prefix: str, table: str = "documents") -> str:
    return (
        f"WITH {tok_ctes(table)} SELECT DISTINCT doc_id FROM tok "
        f"WHERE term LIKE '{_sq(prefix)}%' ORDER BY doc_id"
    )


def facet_field(
    term: str, field: str, k: int = 5, table: str = "documents"
) -> str:
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}')
SELECT d.{field} AS {field}, count(*) AS cnt
FROM {table} d JOIN matched USING (doc_id)
GROUP BY d.{field} ORDER BY cnt DESC, {field} ASC LIMIT {k}
""".strip()


def facet_field_opts(
    term: str,
    field: str,
    k: int = 5,
    mincount: int = 0,
    prefix: str | None = None,
    offset: int = 0,
    sort: str = "count",
    table: str = "documents",
) -> str:
    """facet.field with mincount / prefix / offset / sort=index
    (SimpleFacets.java:205-423) — twin of handler.select facet opts."""
    conds = []
    if prefix:
        # literal startswith (the engine/Solr semantics) — LIKE would
        # treat '%'/'_' in the prefix as metacharacters and diverge
        conds.append(f"starts_with(d.{field}, '{_sq(prefix)}')")
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    having = f" HAVING count(*) >= {mincount}" if mincount > 0 else ""
    order = (
        f"{field} ASC" if sort == "index" else f"cnt DESC, {field} ASC"
    )
    off = f" OFFSET {offset}" if offset else ""
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}')
SELECT d.{field} AS {field}, count(*) AS cnt
FROM {table} d JOIN matched USING (doc_id){where}
GROUP BY d.{field}{having} ORDER BY {order} LIMIT {k}{off}
""".strip()


def facet_pivot_nlevel(
    term: str,
    mincount: int = 1,
    table: str = "documents",
) -> str:
    """3-level hierarchical pivot twin (lang -> source -> len bucket)
    of handler.pivot_facets: one grouped count per level, '/'-joined
    paths, over the query's match set."""
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}'),
d AS (
  SELECT t.lang, t.source,
         CAST((t.n_chars // 100) * 100 AS VARCHAR) AS len_bucket
  FROM {table} t JOIN matched USING (doc_id)
),
lv AS (
  SELECT 1 AS level, lang AS path, count(*) AS cnt FROM d GROUP BY lang
  UNION ALL
  SELECT 2, lang || '/' || source, count(*) FROM d GROUP BY lang, source
  UNION ALL
  SELECT 3, lang || '/' || source || '/' || len_bucket, count(*)
  FROM d GROUP BY lang, source, len_bucket
)
SELECT level, path, cnt FROM lv WHERE cnt >= {mincount}
ORDER BY level, path
""".strip()


def events_sessions(
    gap_minutes: int = 30, table: str = "events"
) -> str:
    """Gap-and-island twin of streaming.sessions.sessionize: a new
    session starts when the gap to the previous event is >= gap (Spark
    session windows are [start, last+gap) half-open, so an event AT
    exactly prev+gap opens a new session); session_end = last + gap."""
    return f"""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL {gap_minutes} MINUTE,
                '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
""".strip()


def text_clean(table: str = "documents") -> str:
    """Twin of with_clean_text: control chars -> space, whitespace
    collapse, trim; compared via md5 of the cleaned text."""
    return f"""
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(text,
              '[\\x00-\\x08\\x0b-\\x1f]', ' ', 'g'),
              '\\s+', ' ', 'g')) AS clean_text
  FROM {table}
)
SELECT doc_id, CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
       md5(clean_text) AS clean_md5
FROM c ORDER BY doc_id
""".strip()


def split_assign(
    train_pct: int = 80, val_pct: int = 10, table: str = "documents"
) -> str:
    """Twin of with_split_assign: md5(id)[:4] % 100 bucket split."""
    hi = train_pct + val_pct
    return f"""
WITH b AS (
  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) % 100 AS bucket
  FROM {table}
)
SELECT CASE WHEN bucket < {train_pct} THEN 'train'
            WHEN bucket < {hi} THEN 'val' ELSE 'test' END AS split,
       count(*) AS cnt
FROM b GROUP BY 1 ORDER BY split
""".strip()


def facet_range_opts(
    term: str,
    start: float,
    end: float,
    gap: float,
    table: str = "documents",
) -> str:
    """facet.range with start/end/gap + other=all twin of
    handler.facet_range: [start+i*gap, start+(i+1)*gap) buckets over
    the match set, plus 'before' (< start) and 'after' (>= end)."""
    x = "CAST(n_chars AS DOUBLE)"
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}'),
d AS (SELECT t.n_chars FROM {table} t JOIN matched USING (doc_id)),
inside AS (
  SELECT CAST(CAST({start!r} + floor(({x} - {start!r}) / {gap!r})
                   * {gap!r} AS BIGINT) AS VARCHAR) AS bucket,
         count(*) AS cnt
  FROM d WHERE {x} >= {start!r} AND {x} < {end!r} GROUP BY 1
),
b AS (SELECT 'before' AS bucket, count(*) AS cnt FROM d
      WHERE {x} < {start!r}),
a AS (SELECT 'after' AS bucket, count(*) AS cnt FROM d
      WHERE {x} >= {end!r})
SELECT * FROM inside UNION ALL SELECT * FROM b UNION ALL SELECT * FROM a
ORDER BY bucket
""".strip()


def frange_docs(
    lower: float, upper: float, table: str = "documents"
) -> str:
    """{!frange} twin: recip(n_chars,1,1000,1000) in [l, u] — the
    funcquery arithmetic order (a / (m*x + b)) mirrored textually."""
    v = "1000.0 / (1.0 * CAST(n_chars AS DOUBLE) + 1000.0)"
    return (
        f"SELECT doc_id FROM {table} "
        f"WHERE {v} >= {lower!r} AND {v} <= {upper!r} ORDER BY doc_id"
    )


def facet_range_nchars(width: int = 100, table: str = "documents") -> str:
    return (
        f"SELECT (n_chars // {width}) * {width} AS bucket, count(*) AS cnt "
        f"FROM {table} GROUP BY 1 ORDER BY bucket"
    )


def facet_pivot(table: str = "documents") -> str:
    return (
        f"SELECT lang, source, count(*) AS cnt FROM {table} "
        "GROUP BY lang, source ORDER BY lang, source"
    )


def stats_nchars(term: str, table: str = "documents") -> str:
    # sum pinned to BIGINT (DuckDB sum(int)=HUGEINT otherwise); stddev
    # from exact integer sum / sum-of-squares in the SAME double op order
    # as the Spark side -> bit-identical, partition-order-independent.
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}'),
a AS (
  SELECT count(*) AS cnt, min(n_chars) AS min_v, max(n_chars) AS max_v,
         CAST(sum(n_chars) AS BIGINT) AS sum_v,
         CAST(sum(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
              AS BIGINT) AS ss
  FROM {table} d JOIN matched USING (doc_id)
)
SELECT cnt, min_v, max_v, sum_v,
       round(CAST(sum_v AS DOUBLE) / CAST(cnt AS DOUBLE), 4) AS mean_v,
       round(sqrt((CAST(ss AS DOUBLE)
                   - CAST(sum_v AS DOUBLE) * CAST(sum_v AS DOUBLE)
                     / CAST(cnt AS DOUBLE))
                  / (CAST(cnt AS DOUBLE) - 1.0)), 4) AS stddev_v
FROM a
""".strip()


def group_topk_per_field(
    term: str, field: str, per_group: int = 2, table: str = "documents"
) -> str:
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT {field}, doc_id, round(score, 4) AS score FROM (
  SELECT d.{field} AS {field}, s.doc_id, s.score,
         row_number() OVER (
           PARTITION BY d.{field} ORDER BY s.score DESC, s.doc_id ASC
         ) AS rn
  FROM scored s JOIN {table} d USING (doc_id)
) WHERE rn <= {per_group} ORDER BY {field}, score DESC, doc_id
""".strip()


def group_main_flat(
    term: str,
    field: str,
    per_group: int = 1,
    rows: int = 10,
    table: str = "documents",
) -> str:
    """group.format=simple / group.main twin: flatten per-group heads,
    groups ordered by their head doc (score desc, doc_id asc)."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT {field}, doc_id, round(score, 4) AS score FROM (
  SELECT d.{field} AS {field}, s.doc_id, s.score,
         row_number() OVER (
           PARTITION BY d.{field} ORDER BY s.score DESC, s.doc_id ASC
         ) AS rn,
         first_value(s.score) OVER (
           PARTITION BY d.{field} ORDER BY s.score DESC, s.doc_id ASC
         ) AS hscore,
         first_value(s.doc_id) OVER (
           PARTITION BY d.{field} ORDER BY s.score DESC, s.doc_id ASC
         ) AS hdoc
  FROM scored s JOIN {table} d USING (doc_id)
) WHERE rn <= {per_group}
ORDER BY hscore DESC, hdoc ASC, rn ASC
LIMIT {rows}
""".strip()


def terms_enum(prefix: str, k: int = 20, table: str = "documents") -> str:
    return f"""
WITH {tok_ctes(table)}
SELECT term, count(DISTINCT doc_id) AS df FROM tok
WHERE term LIKE '{_sq(prefix)}%'
GROUP BY term ORDER BY df DESC, term ASC LIMIT {k}
""".strip()


def join_semi_customers(min_total: float = 400000.0) -> str:
    return f"""
SELECT c.c_custkey, c.c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > {min_total!r})
ORDER BY c.c_custkey
""".strip()


def block_join_orders(min_qty: float = 50.0) -> str:
    return f"""
SELECT o.o_orderkey, o.o_totalprice FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_quantity >= {min_qty!r})
ORDER BY o.o_orderkey
""".strip()


def dedup_exact_doubled(table: str = "documents") -> str:
    return f"""
WITH u AS (
  SELECT doc_id, text FROM {table}
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM {table}
)
SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM u GROUP BY md5(text) HAVING count(*) > 1 ORDER BY text_hash
""".strip()


def dedup_keep_best(table: str = "documents") -> str:
    """exact_dedup_keep_best twin over the doubled corpus where the
    second copy carries quality+1: survivor = highest quality, ties by
    lowest id."""
    return f"""
WITH u AS (
  SELECT doc_id, text, n_chars AS q FROM {table}
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, n_chars + 1 AS q FROM {table}
),
r AS (
  SELECT md5(text) AS text_hash, doc_id, q,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY q DESC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY md5(text)) AS n_dups
  FROM u
)
SELECT text_hash, n_dups, doc_id AS keep_doc_id
FROM r WHERE rk = 1 ORDER BY text_hash
""".strip()


def _shingle_ctes(table: str = "documents", n: int = 3) -> str:
    """Post-stop consecutive token 3-gram shingles (distinct per doc)."""
    return f"""
rawtok2 AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
    FROM {table}
  ) WHERE length(term) <= 255
),
ftok AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM rawtok2 WHERE term NOT IN ({STOP_LIST})
),
sh AS (
  SELECT DISTINCT a.doc_id,
         a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM ftok a
  JOIN ftok b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
  JOIN ftok c ON a.doc_id = c.doc_id AND c.rn = a.rn + 2
)
""".strip()


def _hash60_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def _hash60b_sql(expr: str) -> str:
    """Second independent 60-bit value from the SAME md5 (chars 16-30)."""
    return f"CAST(concat('0x', substr(md5({expr}), 16, 15)) AS BIGINT)"


def minhash_pairs(
    num_hashes: int = 128,
    band_size: int = 8,
    bucket_cap: int = 1000,
    table: str = "documents",
) -> str:
    # affine double hashing, mirroring datapipe.dedup.minhash_signatures:
    # a = md5[1:15]; b = (md5[16:30] & (2^55-1)) | 1; mh_i = (a+i*b) & (2^60-1)
    # (b masked to 55 bits so a + 127*b stays inside BIGINT).
    # Mega-buckets (> bucket_cap members) mirror the engine's STAR
    # linking: each member pairs with the bucket's min doc_id only.
    mh_cols = ", ".join(
        f"min((ha + {i} * hb) & {(1 << 60) - 1}) AS mh_{i}"
        for i in range(num_hashes)
    )
    n_bands = num_hashes // band_size
    band_parts = []
    for b in range(n_bands):
        cols = " || ',' || ".join(
            f"CAST(mh_{i} AS VARCHAR)"
            for i in range(b * band_size, (b + 1) * band_size)
        )
        band_parts.append(
            f"SELECT {b} AS band, md5({cols}) AS bucket, doc_id FROM mh"
        )
    bands = " UNION ALL ".join(band_parts)
    return f"""
WITH {_shingle_ctes(table)},
shh AS (
  SELECT doc_id,
         {_hash60_sql('shingle')} AS ha,
         ({_hash60b_sql('shingle')} & {(1 << 55) - 1}) | 1 AS hb
  FROM sh
),
mh AS (SELECT doc_id, {mh_cols} FROM shh GROUP BY doc_id),
bands AS ({bands}),
sized AS (
  SELECT band, bucket, doc_id,
         count(*) OVER (PARTITION BY band, bucket) AS sz,
         min(doc_id) OVER (PARTITION BY band, bucket) AS rep
  FROM bands
),
pairs AS (
  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM sized l JOIN sized r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
  WHERE l.sz <= {bucket_cap}
  UNION ALL
  SELECT rep AS doc_a, doc_id AS doc_b FROM sized
  WHERE sz > {bucket_cap} AND doc_id <> rep
)
SELECT DISTINCT doc_a, doc_b FROM pairs
ORDER BY doc_a, doc_b
""".strip()


def payload_term(
    term: str, func: str = "avg", k: int = 10, table: str = "documents"
) -> str:
    """PayloadTermQuery oracle over the gate's payloaded view of
    ``table``: whitespace token at (1-based) position p carries payload
    ((p-1) % 5) + 1 (what the gate's DelimitedPayload construction
    attaches), score = BM25 term score over the whitespace-token doc
    length * the payload function (PayloadTermQuery.java:144-149)."""
    agg = {"avg": "avg", "max": "max", "min": "min"}[func]
    words = "list_filter(string_split(text, ' '), x -> x <> '')"
    return f"""
WITH ptok AS (
  SELECT doc_id, lower(tok) AS term, pos,
         CAST(((pos - 1) % 5) + 1 AS DOUBLE) AS payload
  FROM (
    SELECT doc_id,
           unnest({words}) AS tok,
           generate_subscripts({words}, 1) AS pos
    FROM {table}
  )
),
pdls AS (SELECT doc_id, count(*) AS dl FROM ptok GROUP BY doc_id),
pcoll AS (
  SELECT (SELECT count(*) FROM {table}) AS max_doc,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM pdls)
           / (SELECT CAST(count(*) AS DOUBLE) FROM {table}) AS avgdl
),
pdf AS (
  SELECT count(DISTINCT doc_id) AS df FROM ptok
  WHERE term = '{_sq(term)}'
),
qdl AS (SELECT * FROM (VALUES {_qdl()}) AS t(lo, hi, q)),
m AS (
  SELECT doc_id, count(*) AS tf,
         COALESCE({agg}(payload), 1.0) AS pf
  FROM ptok WHERE term = '{_sq(term)}' GROUP BY doc_id
),
scored AS (
  SELECT m.doc_id,
         ln(1 + ((SELECT max_doc FROM pcoll) - (SELECT df FROM pdf) + 0.5)
              / ((SELECT df FROM pdf) + 0.5))
           * ({K1}+1) * m.tf
           / (m.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM pcoll)))
           * m.pf AS score
  FROM m JOIN pdls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


def span_near_payload_check(
    t1: str,
    t2: str,
    slop: int,
    expected: list[float],
    k: int = 10,
    table: str = "documents",
) -> str:
    """SpanNearPayloadCheckQuery twin: the payload_near recursive-CTE
    walk, but a slop-passing match counts only when its two used
    payloads equal the expected pair (order-insensitive), and the
    score has NO payload multiplication (plain SpanScorer)."""
    lo, hi = sorted(float(p) for p in expected)
    words = "list_filter(string_split(text, ' '), x -> x <> '')"
    return f"""
WITH RECURSIVE ptok AS (
  SELECT doc_id, lower(tok) AS term, pos
  FROM (
    SELECT doc_id,
           unnest({words}) AS tok,
           generate_subscripts({words}, 1) AS pos
    FROM {table}
  )
),
pdls AS (SELECT doc_id, count(*) AS dl FROM ptok GROUP BY doc_id),
pcoll AS (
  SELECT (SELECT count(*) FROM {table}) AS max_doc,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM pdls)
           / (SELECT CAST(count(*) AS DOUBLE) FROM {table}) AS avgdl
),
p1 AS (SELECT doc_id, pos FROM ptok WHERE term = '{_sq(t1)}'),
p2 AS (SELECT doc_id, pos FROM ptok WHERE term = '{_sq(t2)}'),
idfs AS (
  SELECT sum(ln(1 + ((SELECT max_doc FROM pcoll) - df + 0.5) / (df + 0.5)))
           AS idf_sum
  FROM (
    SELECT count(DISTINCT doc_id) AS df FROM ptok
    WHERE term = '{_sq(t1)}'
    UNION ALL
    SELECT count(DISTINCT doc_id) FROM ptok WHERE term = '{_sq(t2)}'
  )
),
cand AS (
  SELECT DISTINCT p1.doc_id FROM p1 JOIN p2 USING (doc_id)
),
walk(doc_id, p1_used, p2_used) AS (
  SELECT doc_id, CAST(-1 AS BIGINT), CAST(NULL AS BIGINT) FROM cand
  UNION ALL
  SELECT s.doc_id,
         (SELECT max(pos) FROM p1
          WHERE p1.doc_id = s.doc_id AND pos < s.p2_next),
         s.p2_next
  FROM (
    SELECT w.doc_id,
           (SELECT min(p2.pos) FROM p2
            WHERE p2.doc_id = w.doc_id AND p2.pos >
              (SELECT min(p1.pos) FROM p1
               WHERE p1.doc_id = w.doc_id AND p1.pos > w.p1_used)
           ) AS p2_next
    FROM walk w
  ) s
  WHERE s.p2_next IS NOT NULL
),
matches AS (
  SELECT doc_id, p1_used, p2_used FROM walk
  WHERE p2_used IS NOT NULL AND (p2_used - p1_used - 1) <= {int(slop)}
    AND least(CAST(((p1_used - 1) % 5) + 1 AS DOUBLE),
              CAST(((p2_used - 1) % 5) + 1 AS DOUBLE))
          = CAST({lo!r} AS DOUBLE)
    AND greatest(CAST(((p1_used - 1) % 5) + 1 AS DOUBLE),
                 CAST(((p2_used - 1) % 5) + 1 AS DOUBLE))
          = CAST({hi!r} AS DOUBLE)
),
freqs AS (
  SELECT doc_id,
         sum(1.0 / ((p2_used + 1 - p1_used) + 1)) AS freq
  FROM matches GROUP BY doc_id
),
qdl AS (SELECT * FROM (VALUES {_qdl()}) AS t(lo, hi, q)),
scored AS (
  SELECT f.doc_id,
         (SELECT idf_sum FROM idfs)
           * ({K1}+1) * f.freq
           / (f.freq + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM pcoll)))
           AS score
  FROM freqs f
  JOIN pdls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


def span_payload_check(
    term: str, payload_value: float, k: int = 10,
    table: str = "documents",
) -> str:
    """SpanPayloadCheckQuery twin: accepted occurrences are those whose
    payload equals the expected value; freq = accepted count; idf uses
    the unfiltered term df (SpanWeight term statistics)."""
    words = "list_filter(string_split(text, ' '), x -> x <> '')"
    return f"""
WITH ptok AS (
  SELECT doc_id, lower(tok) AS term, pos,
         CAST(((pos - 1) % 5) + 1 AS DOUBLE) AS payload
  FROM (
    SELECT doc_id,
           unnest({words}) AS tok,
           generate_subscripts({words}, 1) AS pos
    FROM {table}
  )
),
pdls AS (SELECT doc_id, count(*) AS dl FROM ptok GROUP BY doc_id),
pcoll AS (
  SELECT (SELECT count(*) FROM {table}) AS max_doc,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM pdls)
           / (SELECT CAST(count(*) AS DOUBLE) FROM {table}) AS avgdl
),
pdf AS (
  SELECT count(DISTINCT doc_id) AS df FROM ptok
  WHERE term = '{_sq(term)}'
),
qdl AS (SELECT * FROM (VALUES {_qdl()}) AS t(lo, hi, q)),
m AS (
  SELECT doc_id, count(*) AS freq
  FROM ptok
  WHERE term = '{_sq(term)}'
    AND payload = CAST({payload_value!r} AS DOUBLE)
  GROUP BY doc_id
),
scored AS (
  SELECT m.doc_id,
         ln(1 + ((SELECT max_doc FROM pcoll) - (SELECT df FROM pdf) + 0.5)
              / ((SELECT df FROM pdf) + 0.5))
           * ({K1}+1) * m.freq
           / (m.freq + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM pcoll)))
           AS score
  FROM m JOIN pdls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


def payload_near(
    t1: str,
    t2: str,
    slop: int,
    func: str = "avg",
    k: int = 10,
    table: str = "documents",
) -> str:
    """PayloadNearQuery twin (2 ordered clauses): the NearSpansOrdered
    walk (NearSpansOrdered.java:182-337) as a recursive CTE — each step
    takes the first t1 occurrence after the previously-used one, the
    first t2 after it, then backs t1 up to the latest occurrence before
    that t2 (shrinkToAfterShortestMatch); pointer-past-used gives
    strictly increasing p1_used, so the recursion terminates. freq sums
    1/(matchLength+1) over slop-passing matches; the payload function
    aggregates both used occurrences' payloads of those matches; score
    = (idf_t1 + idf_t2) * BM25 tfNorm(freq) * pf."""
    agg = {"avg": "avg", "max": "max", "min": "min"}[func]
    words = "list_filter(string_split(text, ' '), x -> x <> '')"
    return f"""
WITH RECURSIVE ptok AS (
  SELECT doc_id, lower(tok) AS term, pos
  FROM (
    SELECT doc_id,
           unnest({words}) AS tok,
           generate_subscripts({words}, 1) AS pos
    FROM {table}
  )
),
pdls AS (SELECT doc_id, count(*) AS dl FROM ptok GROUP BY doc_id),
pcoll AS (
  SELECT (SELECT count(*) FROM {table}) AS max_doc,
         (SELECT CAST(sum(dl) AS DOUBLE) FROM pdls)
           / (SELECT CAST(count(*) AS DOUBLE) FROM {table}) AS avgdl
),
p1 AS (SELECT doc_id, pos FROM ptok WHERE term = '{_sq(t1)}'),
p2 AS (SELECT doc_id, pos FROM ptok WHERE term = '{_sq(t2)}'),
idfs AS (
  SELECT sum(ln(1 + ((SELECT max_doc FROM pcoll) - df + 0.5) / (df + 0.5)))
           AS idf_sum
  FROM (
    SELECT count(DISTINCT doc_id) AS df FROM ptok
    WHERE term = '{_sq(t1)}'
    UNION ALL
    SELECT count(DISTINCT doc_id) FROM ptok WHERE term = '{_sq(t2)}'
  )
),
cand AS (
  SELECT DISTINCT p1.doc_id FROM p1 JOIN p2 USING (doc_id)
),
walk(doc_id, p1_used, p2_used) AS (
  SELECT doc_id, CAST(-1 AS BIGINT), CAST(NULL AS BIGINT) FROM cand
  UNION ALL
  SELECT s.doc_id,
         (SELECT max(pos) FROM p1
          WHERE p1.doc_id = s.doc_id AND pos < s.p2_next),
         s.p2_next
  FROM (
    SELECT w.doc_id,
           (SELECT min(p2.pos) FROM p2
            WHERE p2.doc_id = w.doc_id AND p2.pos >
              (SELECT min(p1.pos) FROM p1
               WHERE p1.doc_id = w.doc_id AND p1.pos > w.p1_used)
           ) AS p2_next
    FROM walk w
  ) s
  WHERE s.p2_next IS NOT NULL
),
matches AS (
  SELECT doc_id, p1_used, p2_used FROM walk
  WHERE p2_used IS NOT NULL AND (p2_used - p1_used - 1) <= {int(slop)}
),
freqs AS (
  SELECT doc_id,
         sum(1.0 / ((p2_used + 1 - p1_used) + 1)) AS freq
  FROM matches GROUP BY doc_id
),
pays AS (
  SELECT doc_id, CAST(((p1_used - 1) % 5) + 1 AS DOUBLE) AS pay
  FROM matches
  UNION ALL
  SELECT doc_id, CAST(((p2_used - 1) % 5) + 1 AS DOUBLE) FROM matches
),
pfs AS (SELECT doc_id, {agg}(pay) AS pf FROM pays GROUP BY doc_id),
qdl AS (SELECT * FROM (VALUES {_qdl()}) AS t(lo, hi, q)),
scored AS (
  SELECT f.doc_id,
         (SELECT idf_sum FROM idfs)
           * ({K1}+1) * f.freq
           / (f.freq + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM pcoll)))
           * p.pf AS score
  FROM freqs f JOIN pfs p USING (doc_id)
  JOIN pdls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


def span_near_scored(
    t1: str,
    t2: str,
    slop: int,
    k: int = 10,
    table: str = "documents",
) -> str:
    """Scored ordered SpanNearQuery twin (2 clauses): the same
    recursive-CTE NearSpansOrdered walk as payload_near, over the
    ANALYZED positions (rawtok — 1-based pre-stop indices, which the
    engine's surviving-token positions match up to a constant shift,
    so matchLength/slop are identical), scored with summed idf and the
    standard quantized-norm BM25 (freq = sloppy sum)."""
    return f"""
WITH RECURSIVE {tok_ctes(table)}, {_rawtok(table)},
p1 AS (SELECT doc_id, pos FROM rawtok WHERE term = '{_sq(t1)}'),
p2 AS (SELECT doc_id, pos FROM rawtok WHERE term = '{_sq(t2)}'),
idfs AS (
  SELECT sum(ln(1 + ((SELECT max_doc FROM coll) - df + 0.5) / (df + 0.5)))
           AS idf_sum
  FROM (
    SELECT count(DISTINCT doc_id) AS df FROM tok WHERE term = '{_sq(t1)}'
    UNION ALL
    SELECT count(DISTINCT doc_id) FROM tok WHERE term = '{_sq(t2)}'
  )
),
cand AS (
  SELECT DISTINCT p1.doc_id FROM p1 JOIN p2 USING (doc_id)
),
walk(doc_id, p1_used, p2_used) AS (
  SELECT doc_id, CAST(-1 AS BIGINT), CAST(NULL AS BIGINT) FROM cand
  UNION ALL
  SELECT s.doc_id,
         (SELECT max(pos) FROM p1
          WHERE p1.doc_id = s.doc_id AND pos < s.p2_next),
         s.p2_next
  FROM (
    SELECT w.doc_id,
           (SELECT min(p2.pos) FROM p2
            WHERE p2.doc_id = w.doc_id AND p2.pos >
              (SELECT min(p1.pos) FROM p1
               WHERE p1.doc_id = w.doc_id AND p1.pos > w.p1_used)
           ) AS p2_next
    FROM walk w
  ) s
  WHERE s.p2_next IS NOT NULL
),
freqs AS (
  SELECT doc_id,
         sum(1.0 / ((p2_used + 1 - p1_used) + 1)) AS freq
  FROM walk
  WHERE p2_used IS NOT NULL AND (p2_used - p1_used - 1) <= {int(slop)}
  GROUP BY doc_id
),
scored AS (
  SELECT f.doc_id,
         (SELECT idf_sum FROM idfs)
           * ({K1}+1) * f.freq
           / (f.freq + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM freqs f
  JOIN dls l USING (doc_id) JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
{_topk('scored', k)}
""".strip()


def word_breaks(
    word: str, k: int = 5, table: str = "documents"
) -> str:
    """WordBreakSpellChecker.suggestWordBreaks twin (maxChanges=1,
    SUGGEST_WHEN_NOT_IN_INDEX, NUM_CHANGES_THEN_MAX_FREQUENCY): every
    single split whose halves are both index terms, unless the word
    itself is one."""
    w = _sq(word)
    return f"""
WITH {tok_ctes(table)},
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
splits AS (
  SELECT substr('{w}', 1, i::INT) AS l, substr('{w}', i::INT + 1) AS r
  FROM range(1, {len(word)}) t(i)
),
cand AS (
  SELECT s.l AS "left", s.r AS "right",
         dl.df AS left_df, dr.df AS right_df
  FROM splits s
  JOIN dfs dl ON dl.term = s.l
  JOIN dfs dr ON dr.term = s.r
  WHERE NOT EXISTS (SELECT 1 FROM dfs WHERE term = '{w}')
)
SELECT * FROM cand
ORDER BY greatest(left_df, right_df) DESC, "left" ASC LIMIT {k}
""".strip()


def word_combinations(
    words: list[str], k: int = 5, table: str = "documents"
) -> str:
    """WordBreakSpellChecker.suggestWordCombinations twin (maxChanges=1
    adjacent pairs, SUGGEST_WHEN_NOT_IN_INDEX — at least one original
    absent from the index, combined present)."""
    vals = ", ".join(
        f"({i}, '{_sq(words[i])}', '{_sq(words[i + 1])}', "
        f"'{_sq(words[i] + words[i + 1])}')"
        for i in range(len(words) - 1)
    )
    return f"""
WITH {tok_ctes(table)},
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
pairs AS (
  SELECT * FROM (VALUES {vals}) AS t(idx, first, second, combined)
),
cand AS (
  SELECT p.idx, p.first, p.second, p.combined, dc.df
  FROM pairs p
  JOIN dfs dc ON dc.term = p.combined
  LEFT JOIN dfs df1 ON df1.term = p.first
  LEFT JOIN dfs df2 ON df2.term = p.second
  WHERE COALESCE(df1.df, 0) = 0 OR COALESCE(df2.df, 0) = 0
)
SELECT * FROM cand ORDER BY df DESC, idx ASC LIMIT {k}
""".strip()


def boosting(
    match: str,
    context: str,
    boost: float,
    k: int = 10,
    table: str = "documents",
) -> str:
    """BoostingQuery oracle: match-term BM25 score, multiplied by
    ``boost`` when the doc also contains the context term — the coord
    table in BoostingQuery.java:57-72 (context contributes nothing
    additive)."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([match, context], table)},
agg AS (
  SELECT doc_id,
         sum(CASE WHEN term = '{_sq(match)}' THEN score END) AS ms,
         max(CASE WHEN term = '{_sq(context)}' THEN 1 ELSE 0 END) AS ctx
  FROM scored GROUP BY doc_id
),
final AS (
  SELECT doc_id,
         ms * CASE WHEN ctx = 1 THEN CAST({boost!r} AS DOUBLE)
              ELSE 1.0 END AS score
  FROM agg WHERE ms IS NOT NULL
)
{_topk('final', k)}
""".strip()


def custom_score(
    term: str,
    vs_sql: str,
    k: int = 10,
    table: str = "documents",
) -> str:
    """CustomScoreQuery oracle: BM25 term score * the value-source
    expression ``vs_sql`` (a SQL scalar over ``d.*`` stored fields) —
    CustomScoreProvider.java:73-78 default combine."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
final AS (
  SELECT s.doc_id, s.score * ({vs_sql}) AS score
  FROM scored s JOIN {table} d USING (doc_id)
)
{_topk('final', k)}
""".strip()


def atomic_update_view(table: str = "documents") -> str:
    """Expected stored-field state after the q_atomic_update flow:
    docs ingested at version 1, every 7th doc atomically updated
    (inc n_chars+100, set lang='xx') at version 2."""
    return f"""
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang,
       CASE WHEN doc_id % 7 = 0 THEN n_chars + 100 ELSE n_chars END
         AS n_chars,
       CAST(CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 1 END AS BIGINT)
         AS version
FROM {table} ORDER BY doc_id
""".strip()


def dedup_components(
    num_hashes: int = 128,
    band_size: int = 8,
    bucket_cap: int = 1000,
    table: str = "documents",
) -> str:
    """Connected components of the minhash candidate-pair graph:
    component = min doc_id reachable. The recursive CTE enumerates
    every (node, reachable) pair — O(Σ comp²), fine at oracle scale;
    the engine's large-star/small-star contraction must produce the
    identical labeling (both are 'minimum reachable id').

    ``p`` is MATERIALIZED: DuckDB otherwise inlines the whole minhash
    pipeline into each recursive iteration of ``reach`` (via ``e``,
    which reads ``p`` twice), multiplying a multi-GB tokenize+hash
    intermediate per iteration — observed OOM at sf0.1 despite the
    closure itself being tiny (~750 edges)."""
    pairs_sql = minhash_pairs(num_hashes, band_size, bucket_cap, table)
    return f"""
WITH RECURSIVE
p AS MATERIALIZED ({pairs_sql}),
e AS (
  SELECT doc_a AS u, doc_b AS v FROM p
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM p
),
nodes AS (SELECT DISTINCT u AS node FROM e),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r0.node, e.v FROM reach r0 JOIN e ON e.u = r0.r
)
SELECT node AS doc_id, min(r) AS component
FROM reach GROUP BY node ORDER BY doc_id
""".strip()


def dedup_canonical(
    num_hashes: int = 128,
    band_size: int = 8,
    bucket_cap: int = 1000,
    table: str = "documents",
) -> str:
    """Doc ids kept by dedup-by-clustering: every doc except non-minimum
    members of a pair-graph component."""
    comp_sql = dedup_components(num_hashes, band_size, bucket_cap, table)
    # strip the trailing ORDER BY of the inner query before wrapping
    inner = comp_sql.rsplit("ORDER BY doc_id", 1)[0].rstrip()
    return f"""
WITH c AS ({inner})
SELECT d.doc_id FROM {table} d
WHERE d.doc_id NOT IN (SELECT doc_id FROM c WHERE doc_id <> component)
ORDER BY d.doc_id
""".strip()


def _simhash_ctes(bits: int = 64, table: str = "documents") -> str:
    """Shared WITH-body computing (doc_id, simhash): term-hash bits
    0..59 come from md5 hex chars 1-15, bits 60..63 from the low 4 bits
    of chars 16-30 (same layout as the Arrow kernel). Bit 63's weight
    is emitted as the BIGINT minimum and ADDED LAST so every
    intermediate sum stays representable (DuckDB errors on BIGINT
    overflow; the engine's uint64 pack + int64 view is the same
    two's-complement value)."""
    sums = ", ".join(
        (
            f"sum(CASE WHEN (ha >> {b}) & 1 = 1 THEN tf ELSE -tf END)"
            f" AS s_{b}"
            if b < 60
            else f"sum(CASE WHEN (hb >> {b - 60}) & 1 = 1 THEN tf "
            f"ELSE -tf END) AS s_{b}"
        )
        for b in range(bits)
    )
    weight_terms = [
        (
            f"CASE WHEN s_{b} > 0 THEN CAST({1 << b} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END"
            if b < 63
            else f"CASE WHEN s_{b} > 0 THEN "
            "CAST(-9223372036854775808 AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        )
        for b in range(bits)
    ]
    sig = " + ".join(weight_terms)
    return f"""
{tok_ctes(table)},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
h AS (SELECT doc_id, tf, {_hash60_sql('term')} AS ha,
             ({_hash60b_sql('term')} & 15) AS hb
      FROM tf),
sums AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
sh AS (SELECT doc_id, {sig} AS simhash FROM sums)
""".strip()


def simhash_sql(bits: int = 64, table: str = "documents") -> str:
    return (
        f"WITH {_simhash_ctes(bits, table)} "
        "SELECT doc_id, simhash FROM sh ORDER BY doc_id"
    )


def simhash_pairs_sql(
    max_hamming: int = 3, bits: int = 64, table: str = "documents"
) -> str:
    """Brute-force twin of simhash_near_pairs: ALL pairs with hamming
    distance <= max_hamming over the 64-bit fingerprints. The engine
    only materializes pairs sharing one of the 4 16-bit pigeonhole
    blocks — lossless for hamming <= 3 (4 blocks, <= 3 differing bits:
    some block is untouched), so the blocked engine must equal this
    unblocked cross-join exactly."""
    return f"""
WITH {_simhash_ctes(bits, table)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
""".strip()


def jaccard_topk(
    k: int = 20,
    num_hashes: int = 128,
    band_size: int = 8,
    table: str = "documents",
) -> str:
    mh = minhash_pairs(num_hashes, band_size, table=table)
    # reuse the pair query as a subquery (without its ORDER BY)
    pair_sql = mh.rsplit("ORDER BY", 1)[0]
    return f"""
WITH pairs AS ({pair_sql}),
{_shingle_ctes(table)},
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND a.shingle = b.shingle
  GROUP BY p.doc_a, p.doc_b
)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (za.sz + zb.sz - inter), 4) AS jaccard
FROM inter
JOIN sz za ON za.doc_id = doc_a
JOIN sz zb ON zb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a, doc_b LIMIT {k}
""".strip()


def shingle_freq(k: int = 20, table: str = "documents") -> str:
    """Bigram ShingleFilter twin (analyzer-slot gate): post-stop tokens
    at raw positions, '_' fillers in the holes, bigrams anchored at
    every slot up to the last real token, all-filler grams skipped
    (vacuous for bigrams: a slot window always touches a real token via
    the anchor-or-neighbor rule enforced by the NOT(...) guard)."""
    return f"""
WITH base AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
    FROM {table}
  ) WHERE length(term) <= 255 AND term NOT IN ({STOP_LIST})
),
maxp AS (SELECT doc_id, max(pos) AS mp FROM base GROUP BY doc_id),
slots AS (
  SELECT doc_id, unnest(generate_series(1, mp - 1)) AS p FROM maxp
),
g2 AS (
  SELECT s.doc_id,
         coalesce(t1.term, '_') || ' ' || coalesce(t2.term, '_') AS gram,
         t1.term IS NULL AND t2.term IS NULL AS all_filler
  FROM slots s
  LEFT JOIN base t1 ON t1.doc_id = s.doc_id AND t1.pos = s.p
  LEFT JOIN base t2 ON t2.doc_id = s.doc_id AND t2.pos = s.p + 1
)
SELECT gram, count(*) AS cnt FROM g2 WHERE NOT all_filler
GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT {k}
""".strip()


def text_quality(table: str = "documents") -> str:
    raw = f"regexp_extract_all(lower(text), {PATTERN_LIT})"
    return f"""
WITH feats AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(list_filter({raw}, x -> length(x) <= 255)) AS n_tokens,
    len(list_filter({raw},
        x -> length(x) <= 255 AND x IN ({STOP_LIST}))) AS n_stop,
    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum,
    list_sum(list_transform(list_filter({raw}, x -> length(x) <= 255),
             x -> length(x))) AS tok_len_sum
  FROM {table}
),
ratios AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
    CAST(n_tokens AS BIGINT) AS n_tokens,
    CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens
         ELSE 0.0 END AS stop_ratio,
    CASE WHEN n_chars > 0 THEN CAST(alnum AS DOUBLE) / n_chars
         ELSE 0.0 END AS alnum_ratio,
    CASE WHEN n_tokens > 0 THEN tok_len_sum * 1.0 / n_tokens
         ELSE 0.0 END AS mean_token_len
  FROM feats
)
SELECT doc_id, n_chars, n_tokens,
  round(stop_ratio, 4) AS stop_ratio,
  round(alnum_ratio, 4) AS alnum_ratio,
  round(mean_token_len, 4) AS mean_token_len,
  round(0.4 * alnum_ratio
        + 0.3 * least(n_tokens / 100.0, 1.0)
        + 0.3 * (1.0 - abs(stop_ratio - 0.4)), 4) AS quality
FROM ratios ORDER BY doc_id
""".strip()


def lang_id(table: str = "documents") -> str:
    from .functions.text_analysis import LANG_MARKERS

    raw = f"list_filter(regexp_extract_all(lower(text), {PATTERN_LIT}), x -> length(x) <= 255)"
    counts = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        ml = ", ".join(f"'{m}'" for m in markers)
        counts.append(
            f"len(list_filter({raw}, x -> x IN ({ml}))) AS c_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"c_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND c_{lg} = {best} THEN '{lg}'" for lg in langs
    ) + " ELSE 'und' END"
    return f"""
WITH c AS (SELECT doc_id, {', '.join(counts)} FROM {table})
SELECT doc_id, {case} AS lang_pred FROM c ORDER BY doc_id
""".strip()


def token_counts(table: str = "documents") -> str:
    raw = f"regexp_extract_all(lower(text), {PATTERN_LIT})"
    return f"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(text, '\\s+'),
      x -> length(x) > 0)) AS ws_tokens,
  len(list_filter({raw},
      x -> length(x) <= 255 AND x NOT IN ({STOP_LIST}))) AS analyzer_tokens
FROM {table} ORDER BY doc_id
""".strip()


def fingerprint(table: str = "documents") -> str:
    raw = f"regexp_extract_all(lower(text), {PATTERN_LIT})"
    toks = f"list_filter({raw}, x -> length(x) <= 255 AND x NOT IN ({STOP_LIST}))"
    return f"""
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct({toks})), ' ')) AS fingerprint
FROM {table} ORDER BY doc_id
""".strip()


def knn_cosine(query_vec_id: int = 0, k: int = 5) -> str:
    return f"""
WITH q AS (
  SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = {query_vec_id}
),
e AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
dots AS (
  SELECT vec_id,
         sum(CAST(v AS DOUBLE) * CAST(qv AS DOUBLE)) AS d,
         sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nv
  FROM e JOIN q USING (i) GROUP BY vec_id
),
nq AS (SELECT sum(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS n FROM q)
SELECT vec_id,
       round(d / (sqrt(nv) * sqrt((SELECT n FROM nq))), 4) AS cos
FROM dots
ORDER BY round(d / (sqrt(nv) * sqrt((SELECT n FROM nq))), 4) DESC,
         vec_id ASC
LIMIT {k}
""".strip()


def knn_cosine_ivf(
    query_vec_id: int = 0,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> str:
    """IVF twin of datapipe.similarity.knn_cosine_ivf: centroid seeds =
    vec_ids < n_centroids, per-vector argmax-cosine assignment (ties to
    lower centroid id), nprobe nearest centroids to the query, exact
    rerank within the probed inverted lists. Same knife-edge caveat as
    the LSH gates: numpy-vs-SQL summation order could flip a near-tie
    argmax; the gate corpus keeps centroid margins far above ulp."""
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < {n_centroids}
),
ce AS (
  SELECT cid, unnest(cv) AS c, generate_subscripts(cv, 1) AS i FROM cent
),
e AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
dots AS (
  SELECT vec_id, cid,
         sum(CAST(v AS DOUBLE) * CAST(c AS DOUBLE)) AS d,
         sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nv,
         sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS nc
  FROM e JOIN ce USING (i) GROUP BY vec_id, cid
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (
             PARTITION BY vec_id
             ORDER BY d / (sqrt(nv) * sqrt(nc)) DESC, cid ASC) AS rn
    FROM dots
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM (
    SELECT cid,
           row_number() OVER (
             ORDER BY d / (sqrt(nv) * sqrt(nc)) DESC, cid ASC) AS rn
    FROM dots WHERE vec_id = {query_vec_id}
  ) WHERE rn <= {nprobe}
),
cand AS (SELECT a.vec_id FROM asg a JOIN probe p USING (cid)),
q AS (
  SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = {query_vec_id}
),
d2 AS (
  SELECT e.vec_id,
         sum(CAST(v AS DOUBLE) * CAST(qv AS DOUBLE)) AS d,
         sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nv
  FROM e JOIN q USING (i)
  WHERE e.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY e.vec_id
),
nq AS (SELECT sum(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS n FROM q)
SELECT vec_id,
       round(d / (sqrt(nv) * sqrt((SELECT n FROM nq))), 4) AS cos
FROM d2
ORDER BY round(d / (sqrt(nv) * sqrt((SELECT n FROM nq))), 4) DESC,
         vec_id ASC
LIMIT {k}
""".strip()


def events_hourly() -> str:
    return """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def events_type_stats() -> str:
    return """
SELECT event_type, count(*) AS cnt,
       round(avg(value), 4) AS mean_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
""".strip()


# ---------------- multiterm / suggest / MLT / highlight ----------------

def wildcard_docs(pattern: str, table: str = "documents") -> str:
    """Constant-score doc set of terms matching a Lucene wildcard
    (WildcardQuery.java: * = any run, ? = one char)."""
    import re as _re

    rx = "^" + "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
        for ch in pattern
    ) + "$"
    return (
        f"WITH {tok_ctes(table)} SELECT DISTINCT doc_id FROM tok "
        f"WHERE regexp_matches(term, '{_sq(rx)}') ORDER BY doc_id"
    )


def fuzzy_docs(
    word: str, max_edits: int = 2, table: str = "documents"
) -> str:
    """Constant-score doc set of terms within edit distance
    (FuzzyQuery.java CONSTANT_SCORE rewrite)."""
    return (
        f"WITH {tok_ctes(table)} SELECT DISTINCT doc_id FROM tok "
        f"WHERE levenshtein(term, '{_sq(word)}') <= {max_edits} "
        f"ORDER BY doc_id"
    )


def term_range_docs(
    lower: str, upper: str, table: str = "documents"
) -> str:
    """Lexicographic term range, inclusive (TermRangeQuery.java)."""
    return (
        f"WITH {tok_ctes(table)} SELECT DISTINCT doc_id FROM tok "
        f"WHERE term >= '{_sq(lower)}' AND term <= '{_sq(upper)}' "
        f"ORDER BY doc_id"
    )


def numeric_range(
    lo: int, hi: int, table: str = "documents"
) -> str:
    """Numeric range = native column predicate (NumericRangeQuery is
    unnecessary in Spark, SURVEY.md §1.4)."""
    return (
        f"SELECT doc_id, n_chars FROM {table} "
        f"WHERE n_chars BETWEEN {lo} AND {hi} ORDER BY doc_id"
    )


def spellcheck(
    word: str, max_edits: int = 2, k: int = 5, table: str = "documents"
) -> str:
    """DirectSpellChecker order: (edit distance asc, df desc, term asc),
    candidates share the first character (minPrefix=1)."""
    return f"""
WITH {tok_ctes(table)},
tdict AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
)
SELECT term, df, levenshtein(term, '{_sq(word)}') AS dist
FROM tdict
WHERE term <> '{_sq(word)}' AND term LIKE '{_sq(word[:1])}%'
  AND levenshtein(term, '{_sq(word)}') <= {max_edits}
ORDER BY dist ASC, df DESC, term ASC LIMIT {k}
""".strip()


def mlt_boost(
    doc_id: int,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    table: str = "documents",
) -> str:
    """MLT with boost=true twin (MoreLikeThis.createQuery:
    tq.setBoost(myScore / bestScore)): each selected term's BM25
    contribution scales by its interestingness relative to the best
    term (scores rounded to 4 as the interestingTerms surface exposes
    them)."""
    return f"""
WITH {tok_ctes(table)},
tdict AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
srcterms AS (
  SELECT term, count(*) AS tf FROM tok WHERE doc_id = {doc_id} GROUP BY term
),
sel AS (
  SELECT s.term,
         round(s.tf * (ln(CAST((SELECT max_doc FROM coll) AS DOUBLE)
                          / (d.df + 1.0)) + 1.0), 4) AS mlt
  FROM srcterms s JOIN tdict d USING (term)
  WHERE s.tf >= {min_term_freq} AND d.df >= {min_doc_freq}
  ORDER BY s.tf * (ln(CAST((SELECT max_doc FROM coll) AS DOUBLE)
                      / (d.df + 1.0)) + 1.0) DESC, s.term ASC
  LIMIT {max_query_terms}
),
best AS (SELECT max(mlt) AS m FROM sel),
qtf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT f.doc_id, f.term,
         (s.mlt / (SELECT m FROM best))
           * ln(1 + ((SELECT max_doc FROM coll) - d.df + 0.5) / (d.df + 0.5))
           * ({K1}+1) * f.tf
           / (f.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM qtf f
  JOIN sel s USING (term)
  JOIN dfs d USING (term)
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
),
summed AS (
  SELECT doc_id, round(sum(score), 4) AS score FROM scored
  WHERE doc_id <> {doc_id} GROUP BY doc_id
)
SELECT doc_id, score FROM summed
ORDER BY score DESC, doc_id ASC LIMIT {k}
""".strip()


def spellcheck_file(word: str, max_edits: int = 2, k: int = 5, table: str = "documents") -> str:
    """FileBasedSpellChecker twin: dictionary = the corpus's distinct
    post-stop terms (what the gate writes to the words file), every
    word df=1, so ranking degenerates to (distance, term)."""
    return f"""
WITH {tok_ctes(table)},
fdict AS (SELECT DISTINCT term FROM tok)
SELECT term, CAST(1 AS BIGINT) AS df,
       levenshtein(term, '{_sq(word)}') AS dist
FROM fdict
WHERE term <> '{_sq(word)}' AND term LIKE '{_sq(word[:1])}%'
  AND levenshtein(term, '{_sq(word)}') <= {max_edits}
ORDER BY dist ASC, df DESC, term ASC LIMIT {k}
""".strip()


def more_like_this(
    doc_id: int,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    table: str = "documents",
) -> str:
    """MoreLikeThis.java: select top tf*idf terms of the source doc
    (idf = ln(N/(df+1))+1), then BM25 SHOULD query excluding the source."""
    return f"""
WITH {tok_ctes(table)},
tdict AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
srcterms AS (
  SELECT term, count(*) AS tf FROM tok WHERE doc_id = {doc_id} GROUP BY term
),
sel AS (
  SELECT s.term FROM srcterms s JOIN tdict d USING (term)
  WHERE s.tf >= {min_term_freq} AND d.df >= {min_doc_freq}
  ORDER BY s.tf * (ln(CAST((SELECT max_doc FROM coll) AS DOUBLE)
                      / (d.df + 1.0)) + 1.0) DESC, s.term ASC
  LIMIT {max_query_terms}
),
qtf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT f.doc_id, f.term,
         ln(1 + ((SELECT max_doc FROM coll) - d.df + 0.5) / (d.df + 0.5))
           * ({K1}+1) * f.tf
           / (f.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM qtf f
  JOIN dfs d USING (term)
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
),
summed AS (
  SELECT doc_id, sum(score) AS score FROM scored
  WHERE doc_id <> {doc_id} GROUP BY doc_id
)
{_topk('summed', k)}
""".strip()


def highlight_snippets(
    term: str, fragment_size: int = 100, table: str = "documents"
) -> str:
    """Highlighter.java fragment semantics as mirrored Catalyst/DuckDB
    string expressions: window anchored at the first WHOLE-WORD
    occurrence (1 + length of the non-greedy prefix before it), matches
    wrapped in <b>..</b>."""
    import re as _re

    rx = f"(?i)\\b{_re.escape(term)}\\b"
    rx_prefix = f"(?is)^(.*?)\\b{_re.escape(term)}\\b"
    half = fragment_size // 2
    return f"""
SELECT doc_id,
       regexp_replace(
         substr(text,
                CAST(greatest(1,
                     length(regexp_extract(text, '{_sq(rx_prefix)}', 1))
                     + 1 - {half}) AS BIGINT),
                {fragment_size}),
         '{_sq(rx)}', '<b>{_sq(term)}</b>', 'g') AS snippet
FROM {table}
WHERE regexp_matches(text, '{_sq(rx)}')
ORDER BY doc_id
""".strip()


def highlight_gradient(
    term: str, fragment_size: int = 100, table: str = "documents"
) -> str:
    """GradientFormatter twin over the rounded top-10 BM25 scores:
    bgcolor channels = getColorVal with min #FFFFFF / max #FF0000 (R
    fixed FF; G=B = floor(255 * min(max,score)/max)), zero-padded
    uppercase hex; snippet = the highlight fragment with the <font>
    wrapper."""
    import re as _re

    rx = f"(?i)\\b{_re.escape(term)}\\b"
    rx_prefix = f"(?is)^(.*?)\\b{_re.escape(term)}\\b"
    half = fragment_size // 2
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
top10 AS (
  SELECT doc_id, round(score, 4) AS score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT 10
),
maxs AS (SELECT max(score) AS m FROM top10),
colored AS (
  SELECT doc_id,
    '#FF'
      || printf('%02X', CAST(floor(255.0 *
           (least((SELECT m FROM maxs), score) / (SELECT m FROM maxs)))
           AS INT))
      || printf('%02X', CAST(floor(255.0 *
           (least((SELECT m FROM maxs), score) / (SELECT m FROM maxs)))
           AS INT)) AS bgcolor
  FROM top10
)
SELECT c.doc_id, c.bgcolor,
       regexp_replace(
         substr(d.text,
                CAST(greatest(1,
                     length(regexp_extract(d.text, '{_sq(rx_prefix)}', 1))
                     + 1 - {half}) AS BIGINT),
                {fragment_size}),
         '{_sq(rx)}',
         '<font bgcolor="' || c.bgcolor || '">{_sq(term)}</font>',
         'g') AS snippet
FROM colored c JOIN {table} d USING (doc_id)
WHERE regexp_matches(d.text, '{_sq(rx)}')
ORDER BY c.doc_id
""".strip()


def highlight_phrase(
    terms: list[str], fragment_size: int = 100, table: str = "documents"
) -> str:
    """Phrase-aware highlighter twin: only whole-phrase occurrences
    (raw-text adjacency) anchor and wrap, replacement normalized to
    the canonical '<b>w1 w2</b>' form."""
    import re as _re

    body = "[^A-Za-z0-9_]+".join(_re.escape(t) for t in terms)
    rx = f"(?i)\\b{body}\\b"
    rx_prefix = f"(?is)^(.*?)\\b{body}\\b"
    canon = " ".join(terms)
    half = fragment_size // 2
    return f"""
SELECT doc_id,
       regexp_replace(
         substr(text,
                CAST(greatest(1,
                     length(regexp_extract(text, '{_sq(rx_prefix)}', 1))
                     + 1 - {half}) AS BIGINT),
                {fragment_size}),
         '{_sq(rx)}', '<b>{_sq(canon)}</b>', 'g') AS snippet
FROM {table}
WHERE regexp_matches(text, '{_sq(rx)}')
ORDER BY doc_id
""".strip()


def spellcheck_collate(
    misspelled: str,
    good_term: str,
    max_edits: int = 2,
    table: str = "documents",
) -> str:
    """Collation twin: top suggestion for the absent term (dist asc,
    df desc, term asc; first-char prefix like DirectSpellChecker
    minPrefix=1) joined with the present term, plus the conjunction's
    hit count."""
    return f"""
WITH {tok_ctes(table)},
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
corr AS (
  SELECT term FROM dfs
  WHERE term <> '{_sq(misspelled)}'
    AND term LIKE '{_sq(misspelled[:1])}%'
    AND levenshtein(term, '{_sq(misspelled)}') <= {max_edits}
  ORDER BY levenshtein(term, '{_sq(misspelled)}') ASC, df DESC, term ASC
  LIMIT 1
),
hits AS (
  SELECT count(*) AS hits FROM (
    SELECT doc_id FROM tok WHERE term = (SELECT term FROM corr)
    INTERSECT
    SELECT doc_id FROM tok WHERE term = '{_sq(good_term)}'
  )
)
SELECT (SELECT term FROM corr) || ' {_sq(good_term)}' AS collation,
       (SELECT hits FROM hits) AS hits
""".strip()


def select_bf(term: str, k: int = 10, table: str = "documents") -> str:
    """bf additive boost twin: score + recip(n_chars,1,1000,1000) =
    score + 1000/(1*n_chars+1000), mirrored in funcquery arithmetic
    order (a / (m*x + b))."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
agg AS (SELECT doc_id, sum(score) AS score FROM scored GROUP BY doc_id),
boosted AS (
  SELECT a.doc_id,
         a.score + 1000.0 / (1.0 * CAST(d.n_chars AS DOUBLE) + 1000.0)
           AS score
  FROM agg a JOIN {table} d USING (doc_id)
)
{_topk('boosted', k)}
""".strip()


def external_boost(term: str, k: int = 10, table: str = "documents") -> str:
    """ExternalFileField twin: score + the externally-supplied float —
    the gate writes key=value lines derived as (doc_id %% 7) * 0.5,
    omitting doc_id %% 13 == 0 keys (default 0.0 fills them) and
    writing a stale duplicate first for doc_id %% 11 == 0 (last
    occurrence wins, so the final value is the normal one)."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
agg AS (SELECT doc_id, sum(score) AS score FROM scored GROUP BY doc_id),
boosted AS (
  SELECT a.doc_id,
         a.score + CASE WHEN a.doc_id % 13 = 0 THEN 0.0
                        ELSE (a.doc_id % 7) * 0.5 END AS score
  FROM agg a
)
{_topk('boosted', k)}
""".strip()


def sort_random(seed: str, term: str, k: int = 10, table: str = "documents") -> str:
    """RandomSortField twin: the md5-derived 60-bit key of seed:doc_id,
    ascending, over the term's match set."""
    return f"""
WITH {tok_ctes(table)}
SELECT DISTINCT doc_id,
  CAST(concat('0x', substr(md5('{seed}' || ':' ||
    CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS rkey
FROM tok WHERE term = '{_sq(term)}'
ORDER BY rkey ASC, doc_id ASC LIMIT {k}
""".strip()


def func_boost(term: str, k: int = 10, table: str = "documents") -> str:
    """BM25 * recip(n_chars,1,1000,1000) function query
    (ReciprocalFloatFunction semantics) — same arithmetic text as the
    Spark side."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
boosted AS (
  SELECT s.doc_id,
         s.score * (1000.0 / (1000.0 + d.n_chars)) AS score
  FROM scored s JOIN {table} d USING (doc_id)
)
{_topk('boosted', k)}
""".strip()


def knn_cosine_lsh(
    query_vec_id: int = 0,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    probe_hamming: int = 2,
) -> str:
    """Multi-table multi-probe LSH candidate generation + exact rerank,
    mirroring datapipe.similarity: plane weight = +1 iff
    md5('t|p|i') hex digit 15 is odd; per-table bucket = Σ 2^p over
    planes with positive projection; candidates = vectors within
    Hamming distance ``probe_hamming`` of the query bucket in ANY
    table."""
    digits = "('1','3','5','7','9','b','d','f')"

    def sig_terms(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN sum(CAST(v AS DOUBLE) * "
            f"(CASE WHEN substring(md5('{t}|{p}|' || CAST(i - 1 AS VARCHAR)), 15, 1) "
            f"IN {digits} THEN 1.0 ELSE -1.0 END)) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )

    sig_cols = ", ".join(
        f"{sig_terms(t)} AS s{t}" for t in range(n_tables)
    )
    probe_cond = " OR ".join(
        f"bit_count(xor(s{t}, (SELECT s{t} FROM qb))) <= {probe_hamming}"
        for t in range(n_tables)
    )
    return f"""
WITH e AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
sig AS (
  SELECT vec_id, {sig_cols} FROM e GROUP BY vec_id
),
qb AS (SELECT * FROM sig WHERE vec_id = {query_vec_id}),
cand AS (
  SELECT vec_id FROM sig
  WHERE {probe_cond}
),
q AS (
  SELECT unnest(embedding) AS qv, generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = {query_vec_id}
),
dots AS (
  SELECT e.vec_id,
         sum(CAST(e.v AS DOUBLE) * CAST(q.qv AS DOUBLE)) AS d,
         sum(CAST(e.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS nv
  FROM e JOIN q USING (i)
  WHERE e.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY e.vec_id
),
nq AS (SELECT sum(CAST(qv AS DOUBLE) * CAST(qv AS DOUBLE)) AS n FROM q)
SELECT vec_id,
       round(d / (sqrt(nv) * sqrt((SELECT n FROM nq))), 4) AS cos
FROM dots
ORDER BY round(d / (sqrt(nv) * sqrt((SELECT n FROM nq))), 4) DESC,
         vec_id ASC
LIMIT {k}
""".strip()


def cosine_neardup(
    threshold: float = 0.4,
    n_planes: int = 8,
    n_tables: int = 8,
) -> str:
    """Embedding-cosine near-dup pairs — mirrors
    datapipe.similarity.cosine_neardup_pairs: same md5-parity
    hyperplane signatures, same-bucket (any table) candidate pairs
    with id_a < id_b, exact double cosine >= threshold."""
    digits = "('1','3','5','7','9','b','d','f')"

    def sig_terms(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN sum(CAST(v AS DOUBLE) * "
            f"(CASE WHEN substring(md5('{t}|{p}|' || CAST(i - 1 AS VARCHAR)), 15, 1) "
            f"IN {digits} THEN 1.0 ELSE -1.0 END)) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )

    sig_cols = ", ".join(
        f"{sig_terms(t)} AS s{t}" for t in range(n_tables)
    )
    unions = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, s{t} AS sig FROM sig"
        for t in range(n_tables)
    )
    return f"""
WITH e AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
sig AS (
  SELECT vec_id, {sig_cols} FROM e GROUP BY vec_id
),
long AS ({unions}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM long a JOIN long b
    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
),
norms AS (
  SELECT vec_id, sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nv
  FROM e GROUP BY vec_id
),
dots AS (
  SELECT c.id_a, c.id_b,
         sum(CAST(ea.v AS DOUBLE) * CAST(eb.v AS DOUBLE)) AS d
  FROM cand c
  JOIN e ea ON ea.vec_id = c.id_a
  JOIN e eb ON eb.vec_id = c.id_b AND eb.i = ea.i
  GROUP BY c.id_a, c.id_b
),
scored AS (
  SELECT d.id_a, d.id_b,
         round(d.d / (sqrt(na.nv) * sqrt(nb.nv)), 4) AS cos
  FROM dots d
  JOIN norms na ON na.vec_id = d.id_a
  JOIN norms nb ON nb.vec_id = d.id_b
  WHERE d.d / (sqrt(na.nv) * sqrt(nb.nv)) >= {threshold!r}
)
SELECT id_a, id_b, cos FROM scored ORDER BY id_a, id_b
""".strip()


def span_first_docs(
    term: str, n: int, table: str = "documents"
) -> str:
    """SpanFirstQuery analogue: term occurs within the first n pre-stop
    positions (positions are 1-based in rawtok; engine positions are
    0-based -> pos < n maps to pos <= n here)."""
    return f"""
WITH rawtok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
         generate_subscripts(
           regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
  FROM {table}
)
SELECT DISTINCT doc_id FROM rawtok
WHERE term = '{_sq(term)}' AND pos <= {n}
ORDER BY doc_id
""".strip()


def suggest_lookup(
    prefix: str, num: int = 5, table: str = "documents"
) -> str:
    """Lookup.lookup analogue: prefix completions from the term
    dictionary by (exact-first, weight=ttf desc, key asc)."""
    return f"""
WITH {tok_ctes(table)}
SELECT term AS key, count(*) AS weight FROM tok
WHERE term LIKE '{_sq(prefix)}%'
GROUP BY term
ORDER BY (CASE WHEN term = '{_sq(prefix)}' THEN 1 ELSE 0 END) DESC,
         weight DESC, key ASC
LIMIT {num}
""".strip()


def fst_suggest_lookup(
    prefix: str,
    num: int = 5,
    buckets: int = 10,
    table: str = "documents",
) -> str:
    """FSTCompletionLookup twin: weights discretized into quantile
    buckets — bucket = (first line of the weight's run in the
    (weight asc) external sort) * buckets / inputLines, integer math
    (FSTCompletionLookup.java:171-206); lookup by (exact-first,
    bucket desc, key asc)."""
    return f"""
WITH {tok_ctes(table)},
sg AS (SELECT term AS key, count(*) AS weight FROM tok GROUP BY term),
n AS (SELECT count(*) AS n FROM sg),
wc AS (SELECT weight, count(*) AS c FROM sg GROUP BY weight),
cum AS (
  SELECT weight,
         coalesce(sum(c) OVER (ORDER BY weight
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS below
  FROM wc
)
SELECT key, weight,
       CAST((below * {buckets}) // n.n AS BIGINT) AS bucket
FROM sg JOIN cum USING (weight), n
WHERE key LIKE '{_sq(prefix)}%'
ORDER BY (CASE WHEN key = '{_sq(prefix)}' THEN 1 ELSE 0 END) DESC,
         bucket DESC, key ASC
LIMIT {num}
""".strip()


def score_histogram(
    term: str, width: float = 0.1, table: str = "documents"
) -> str:
    """ScoreHistogramCollector twin: bucket = floor(score/width)."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT CAST(floor(score / {width!r}) AS BIGINT) AS bucket,
       count(*) AS cnt
FROM scored GROUP BY 1 ORDER BY bucket
""".strip()


def term_vector(doc_id: int, table: str = "documents") -> str:
    """TermVectorComponent twin: (term, tf, df) of one doc."""
    return f"""
WITH {tok_ctes(table)},
tv AS (
  SELECT term, count(*) AS tf FROM tok
  WHERE doc_id = {doc_id} GROUP BY term
),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN (SELECT term FROM tv) GROUP BY term
)
SELECT tv.term, tv.tf, dfs.df FROM tv JOIN dfs USING (term)
ORDER BY term
""".strip()


def facet_query_counts(
    base_term: str, queries: dict[str, str], table: str = "documents"
) -> str:
    """facet.query twin: each named query is a term; count of base-term
    docs also containing it. Fielded entries use 'field=value' syntax."""
    parts = []
    for name in sorted(queries):
        qs = queries[name]
        if "=" in qs:
            fld, val = qs.split("=", 1)
            sub = (
                f"SELECT doc_id FROM {table} "
                f"WHERE CAST({fld} AS VARCHAR) = '{_sq(val)}'"
            )
        else:
            sub = f"SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(qs)}'"
        parts.append(
            f"SELECT '{_sq(name)}' AS name, count(*) AS cnt FROM base "
            f"WHERE doc_id IN ({sub})"
        )
    body = " UNION ALL ".join(parts)
    return f"""
WITH {tok_ctes(table)},
base AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(base_term)}')
SELECT * FROM ({body}) ORDER BY name
""".strip()


def events_window_counts(lo_ts: str, hi_ts: str) -> str:
    """DateMath-window event counts: [lo, hi) per event_type. The
    literals come from functions.datemath at SQL-build time — the same
    instants the engine's Catalyst predicate embeds."""
    return f"""
SELECT event_type, count(*) AS cnt
FROM events
WHERE ts >= TIMESTAMP '{lo_ts}' AND ts < TIMESTAMP '{hi_ts}'
GROUP BY event_type ORDER BY event_type
""".strip()


def regexp_docs(pattern: str, table: str = "documents") -> str:
    """RegexpQuery (RegexpQuery.java): whole-term regex match over the
    dictionary, constant-score doc set."""
    return f"""
WITH {tok_ctes(table)}
SELECT DISTINCT doc_id FROM tok
WHERE regexp_full_match(term, '{_sq(pattern)}')
ORDER BY doc_id
""".strip()


def select_edismax_boost_fielded(
    term: str,
    boost: float,
    field: str,
    fval: str,
    k: int = 10,
    table: str = "documents",
) -> str:
    """edismax '{term}^{boost} {field}:{fval}' — SHOULD sum of a
    boosted BM25 term clause and a constant-score fielded clause.
    Weight mirrors Searcher._term_weight_value: (boost*idf)*(1.2+1)."""
    return f"""
WITH {tok_ctes(table)},
qtf AS (
  SELECT doc_id, count(*) AS tf FROM tok
  WHERE term = '{_sq(term)}' GROUP BY doc_id
),
dfs AS (SELECT count(*) AS df FROM qtf),
parts AS (
  SELECT f.doc_id,
         ({boost!r} * ln(1 + ((SELECT max_doc FROM coll)
                              - (SELECT df FROM dfs) + 0.5)
                         / ((SELECT df FROM dfs) + 0.5)))
           * ({K1}+1) * f.tf
           / (f.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS score
  FROM qtf f
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
  UNION ALL
  SELECT doc_id, 1.0 AS score FROM {table}
  WHERE CAST({field} AS VARCHAR) = '{_sq(fval)}'
),
summed AS (SELECT doc_id, sum(score) AS score FROM parts GROUP BY doc_id)
{_topk('summed', k)}
""".strip()


def tfidf_or(terms: list[str], k: int = 10, table: str = "documents") -> str:
    """ClassicSimilarity (DefaultSimilarity.java:31-79) OR query —
    mirrors similarities.tfidf_search textually: partial =
    sqrt(tf) * idf^2 * 1/sqrt(qdl); score = (queryNorm * coord) * sum.
    2-term gates rely on IEEE addition commutativity (sum order-safe)."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    qn_terms = " + ".join(
        f"((SELECT idf FROM idfs WHERE term = '{_sq(t)}') * "
        f"(SELECT idf FROM idfs WHERE term = '{_sq(t)}'))"
        for t in sorted(set(terms))
    )
    maxo = len(set(terms))
    return f"""
WITH {tok_ctes(table)},
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({tl}) GROUP BY term
),
idfs AS (
  SELECT term,
         ln(CAST((SELECT max_doc FROM coll) AS DOUBLE) / (df + 1.0)) + 1
           AS idf
  FROM dfs
),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
partials AS (
  SELECT t.doc_id, t.term,
         sqrt(CAST(t.tf AS DOUBLE)) * (i.idf * i.idf) * (1.0 / sqrt(q.q))
           AS partial
  FROM tfs t
  JOIN idfs i USING (term)
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
),
scored AS (
  SELECT doc_id,
         ((1.0 / sqrt({qn_terms}))
          * (CAST(count(DISTINCT term) AS DOUBLE) / {maxo}.0))
         * sum(partial) AS score
  FROM partials GROUP BY doc_id
)
{_topk('scored', k)}
""".strip()


def lm_dirichlet_or(
    terms: list[str],
    k: int = 10,
    mu: float = 2000.0,
    table: str = "documents",
) -> str:
    """LMDirichletSimilarity OR query — mirrors
    similarities.lm_dirichlet_search textually: per-(term,doc)
    partial = greatest(0, ln(1 + tf/(mu*p_c)) + ln(mu/(qdl+mu))) with
    p_c = (ttf+1)/(sumTTF+1); score = sum(partial)."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return f"""
WITH {tok_ctes(table)},
sttf AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM tok),
ttfs AS (
  SELECT term, {mu!r} * ((count(*) + 1.0) / ((SELECT s FROM sttf) + 1.0))
           AS mu_pc
  FROM tok WHERE term IN ({tl}) GROUP BY term
),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
partials AS (
  SELECT t.doc_id,
         greatest(0.0,
           ln(1.0 + CAST(t.tf AS DOUBLE) / y.mu_pc)
           + ln({mu!r} / (q.q + {mu!r}))) AS partial
  FROM tfs t
  JOIN ttfs y USING (term)
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
),
scored AS (
  SELECT doc_id, sum(partial) AS score FROM partials GROUP BY doc_id
)
{_topk('scored', k)}
""".strip()


def dfr_inl2_or(
    terms: list[str],
    k: int = 10,
    c: float = 1.0,
    table: str = "documents",
) -> str:
    """DFR InL2 OR query — mirrors similarities.dfr_inl2_search
    textually: tfn = tf * ln(1 + c*avgdl/qdl) / ln(2);
    partial = (tfn/(1+tfn)) * ln((N+1)/(df+0.5))/ln(2);
    score = sum(partial)."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return f"""
WITH {tok_ctes(table)},
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({tl}) GROUP BY term
),
basics AS (
  SELECT term,
         ln((CAST((SELECT max_doc FROM coll) AS DOUBLE) + 1.0)
            / (df + 0.5)) / ln(2.0) AS basic
  FROM dfs
),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
tfns AS (
  SELECT t.doc_id, t.term,
         CAST(t.tf AS DOUBLE)
           * ln(1.0 + {c!r} * (SELECT avgdl FROM coll) / q.q)
           / ln(2.0) AS tfn
  FROM tfs t
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
),
partials AS (
  SELECT f.doc_id,
         (f.tfn / (1.0 + f.tfn)) * b.basic AS partial
  FROM tfns f
  JOIN basics b USING (term)
),
scored AS (
  SELECT doc_id, sum(partial) AS score FROM partials GROUP BY doc_id
)
{_topk('scored', k)}
""".strip()


def ib_ll_or(
    terms: list[str],
    k: int = 10,
    c: float = 1.0,
    table: str = "documents",
) -> str:
    """IB LL-D(F)-H2 OR query — mirrors similarities.ib_ll_search
    textually: tfn = tf * ln(1 + c*avgdl/qdl) / ln(2);
    lambda = (df+1)/(N+1); partial = ln((tfn+lambda)/lambda)."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return f"""
WITH {tok_ctes(table)},
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({tl}) GROUP BY term
),
lambdas AS (
  SELECT term,
         (df + 1.0)
           / (CAST((SELECT max_doc FROM coll) AS DOUBLE) + 1.0) AS lam
  FROM dfs
),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
tfns AS (
  SELECT t.doc_id, t.term,
         CAST(t.tf AS DOUBLE)
           * ln(1.0 + {c!r} * (SELECT avgdl FROM coll) / q.q)
           / ln(2.0) AS tfn
  FROM tfs t
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
),
partials AS (
  SELECT f.doc_id,
         ln((f.tfn + y.lam) / y.lam) AS partial
  FROM tfns f
  JOIN lambdas y USING (term)
),
scored AS (
  SELECT doc_id, sum(partial) AS score FROM partials GROUP BY doc_id
)
{_topk('scored', k)}
""".strip()


_RAWTOK_CTE = f"""
rawtok AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
    FROM TABLE_NAME
  )
)""".strip()


def _rawtok(table: str) -> str:
    return _RAWTOK_CTE.replace("TABLE_NAME", table)


def span_near_docs(
    terms: list[str],
    slop: int,
    in_order: bool = True,
    table: str = "documents",
) -> str:
    """SpanNearQuery doc set (NearSpansOrdered/-Unordered over term
    spans): ordered needs strictly increasing positions in clause order
    with (p_last - p_first) - (n-1) <= slop; unordered (any N, repeats
    allowed) needs a one-position-per-clause window with
    (max - min + 1) - n <= slop (NearSpansUnordered matchLength =
    maxEnd - minStart vs totalLength = n for length-1 term spans), and
    clauses sharing a term take strictly ascending (hence distinct)
    positions — the cell-overlap rule of NearSpansUnordered.java:157-176.
    Positions are raw pre-stop counters — differences are
    offset-invariant vs the engine's 0-based ones."""
    n = len(terms)
    p_ctes = [
        f"p{i} AS (SELECT doc_id, pos AS v{i} FROM rawtok "
        f"WHERE term = '{_sq(t)}')"
        for i, t in enumerate(terms)
    ]
    join = "p0"
    conds = []
    for i in range(1, n):
        join += f" JOIN p{i} USING (doc_id)"
        if in_order:
            conds.append(f"v{i} > v{i-1}")
    if not in_order:
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(terms):
            by_term.setdefault(t, []).append(i)
        for idxs in by_term.values():
            for prev, i in zip(idxs, idxs[1:]):
                conds.append(f"v{i} > v{prev}")
    vs = ", ".join(f"v{i}" for i in range(n))
    if in_order:
        conds.append(f"(v{n-1} - v0) - {n-1} <= {slop}")
    elif n == 2:
        conds.append(f"abs(v1 - v0) - 1 <= {slop}")
    else:
        conds.append(
            f"(greatest({vs}) - least({vs})) - {n - 1} <= {slop}"
        )
    return f"""
WITH {_rawtok(table)},
{', '.join(p_ctes)}
SELECT DISTINCT doc_id FROM {join}
WHERE {' AND '.join(conds)}
ORDER BY doc_id
""".strip()


def span_near_multi_docs(
    clauses: list, slop: int, table: str = "documents"
) -> str:
    """SpanMultiTermQueryWrapper-in-SpanNearQuery twin: a clause is a
    literal term or ('prefix', p) matched with LIKE against the
    POST-STOP dictionary (the wrapper expands against the index's
    terms, which exclude stopwords)."""
    n = len(clauses)
    p_ctes = []
    for i, c in enumerate(clauses):
        if isinstance(c, str):
            cond = f"term = '{_sq(c)}'"
        else:
            kind, pat = c
            if kind != "prefix":
                raise ValueError("oracle supports literal/prefix only")
            cond = (
                f"term LIKE '{_sq(pat)}%' AND term NOT IN ({STOP_LIST})"
            )
        p_ctes.append(
            f"p{i} AS (SELECT DISTINCT doc_id, pos AS v{i} FROM rawtok "
            f"WHERE {cond})"
        )
    join = "p0"
    conds = []
    for i in range(1, n):
        join += f" JOIN p{i} USING (doc_id)"
        conds.append(f"v{i} > v{i-1}")
    conds.append(f"(v{n-1} - v0) - {n-1} <= {slop}")
    return f"""
WITH {_rawtok(table)},
{', '.join(p_ctes)}
SELECT DISTINCT doc_id FROM {join}
WHERE {' AND '.join(conds)}
ORDER BY doc_id
""".strip()


def span_not_docs(
    include: str, exclude: str, table: str = "documents"
) -> str:
    """SpanNotQuery doc set: at least one include-term span whose
    position is not an exclude-term position (term spans length 1)."""
    return f"""
WITH {_rawtok(table)}
SELECT DISTINCT doc_id FROM rawtok i
WHERE i.term = '{_sq(include)}'
  AND NOT EXISTS (
    SELECT 1 FROM rawtok e
    WHERE e.doc_id = i.doc_id AND e.term = '{_sq(exclude)}'
      AND e.pos = i.pos
  )
ORDER BY doc_id
""".strip()


def stats_by_facet(
    term: str, facet: str, table: str = "documents"
) -> str:
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}')
SELECT d.{facet},
       count(*) AS cnt,
       min(d.n_chars) AS min_v,
       max(d.n_chars) AS max_v,
       round(avg(d.n_chars), 4) AS mean_v
FROM {table} d JOIN matched USING (doc_id)
GROUP BY d.{facet} ORDER BY d.{facet}
""".strip()


# ---------------- round-4 oracles ----------------

def func_ms_recency(now_ms: int) -> str:
    """recip(ms(<anchor>,ts),3.16e-11,1,1) over events — the canonical
    Solr recency boost (ValueSourceParser.java:561 'ms' +
    ReciprocalFloatFunction). Arithmetic order mirrors funcquery's
    a/(m*x+b) with x = anchor_ms - epoch_ms(ts), all doubles."""
    return (
        "SELECT event_id, "
        f"round(1.0 / (3.16e-11 * (CAST({now_ms} AS DOUBLE) "
        "- CAST(epoch_ms(ts) AS DOUBLE)) + 1.0), 4) AS boost "
        "FROM events ORDER BY event_id"
    )


def func_if_def(table: str = "documents") -> str:
    """sum(def(opt,-1), if(linear(n_chars,1,-300),1,2)) where opt =
    n_chars when doc_id%3=0 else NULL — twin of the engine's
    DefFunction (coalesce) + IfFunction (numeric false iff 0/NULL)."""
    return (
        "SELECT doc_id, round("
        "coalesce(CASE WHEN doc_id % 3 = 0 "
        "THEN CAST(n_chars AS DOUBLE) END, -1.0) "
        "+ (CASE WHEN coalesce(1.0 * CAST(n_chars AS DOUBLE) "
        "+ (-300.0), 0.0) <> 0.0 THEN 1.0 ELSE 2.0 END), 4) AS val "
        f"FROM {table} ORDER BY doc_id"
    )


def func_scale(table: str = "documents") -> str:
    """scale(n_chars,0,1) — ScaleFloatFunction's
    (x - minS) * ((u - l)/(maxS - minS)) + l with min/max over ALL docs,
    the same op order funcquery compiles."""
    return (
        "WITH mm AS (SELECT min(CAST(n_chars AS DOUBLE)) AS mn, "
        f"max(CAST(n_chars AS DOUBLE)) AS mx FROM {table}) "
        "SELECT doc_id, round((CAST(n_chars AS DOUBLE) - mn) "
        "* ((1.0 - 0.0) / (mx - mn)) + 0.0, 4) AS scaled "
        f"FROM {table}, mm ORDER BY doc_id"
    )


def func_bool(table: str = "documents") -> str:
    """Twin of the engine's exists/not/and/or/xor bool sources over
    opt = n_chars when doc_id%3=0 else NULL: each emitted as 1.0/0.0
    with truthiness coalesce(x,0)<>0, composed exactly as q_func_bool."""
    return (
        "WITH b AS (SELECT doc_id, "
        "CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0.0 END AS e, "
        "CASE WHEN coalesce(CAST(n_chars AS DOUBLE), 0.0) <> 0.0 "
        "THEN 1.0 ELSE 0.0 END AS tn, "
        "CASE WHEN coalesce(1.0 * CAST(n_chars AS DOUBLE) - 300.0, 0.0) "
        f"<> 0.0 THEN 0.0 ELSE 1.0 END AS nlin FROM {table}) "
        "SELECT doc_id, round(e * 2.0 + tn "
        "+ (CASE WHEN nlin <> 0.0 THEN 1.0 ELSE 0.0 END) "
        "+ (CASE WHEN (e <> 0.0) <> TRUE THEN 1.0 ELSE 0.0 END), "
        "4) AS val FROM b ORDER BY doc_id"
    )


def func_termfreq(term: str, table: str = "documents") -> str:
    """termfreq/tf twin: per-doc post-stop token count of the term via
    the shared tokenizer CTE, left-joined so non-matches read 0;
    tf = sqrt(freq) (classic DefaultSimilarity)."""
    return f"""
WITH {tok_ctes(table)},
tfq AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS c FROM tok
  WHERE term = '{_sq(term)}' GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(c, 0.0) AS freq,
       round(sqrt(coalesce(c, 0.0)), 4) AS tfv
FROM {table} d LEFT JOIN tfq USING (doc_id)
ORDER BY d.doc_id
""".strip()


def func_strdist(lit: str, table: str = "documents") -> str:
    """strdist(lang,'lit','edit') twin: 1 - levenshtein/maxLen with the
    both-empty guard emitting 1.0."""
    return (
        "SELECT doc_id, round(CASE WHEN greatest(length(lang), "
        f"length('{_sq(lit)}')) = 0 THEN 1.0 ELSE "
        f"1.0 - CAST(levenshtein(lang, '{_sq(lit)}') AS DOUBLE) "
        f"/ greatest(length(lang), length('{_sq(lit)}')) END, 4) AS sim "
        f"FROM {table} ORDER BY doc_id"
    )


def func_geodist(lat: float, lon: float, table: str = "documents") -> str:
    """geodist twin: same synthetic doc_id-derived coordinates and the
    same haversine op order as geofilt_docs, distance for every doc."""
    r = 6371.0087714
    return f"""
WITH pts AS (
  SELECT doc_id,
         ((doc_id * 37) % 1800) / 10.0 - 90.0 AS lat,
         ((doc_id * 73) % 3600) / 10.0 - 180.0 AS lon
  FROM {table}
)
SELECT doc_id,
       round((2.0 * {r!r}) * atan2(
         sqrt(  sin(radians(lat - {lat!r}) / 2) * sin(radians(lat - {lat!r}) / 2)
              + cos(radians({lat!r})) * cos(radians(lat))
                * sin(radians(lon - {lon!r}) / 2) * sin(radians(lon - {lon!r}) / 2)),
         sqrt(1.0 - (sin(radians(lat - {lat!r}) / 2) * sin(radians(lat - {lat!r}) / 2)
              + cos(radians({lat!r})) * cos(radians(lat))
                * sin(radians(lon - {lon!r}) / 2) * sin(radians(lon - {lon!r}) / 2)))
       ), 4) AS dist_km
FROM pts ORDER BY doc_id
""".strip()


def sort_by_func(term: str, k: int = 10, table: str = "documents") -> str:
    """sort=recip(n_chars,1,1000,1000) asc — Solr sort-by-function:
    BM25 membership and scores unchanged, ordering by the ValueSource."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT s.doc_id, round(s.score, 4) AS score
FROM scored s JOIN {table} d USING (doc_id)
ORDER BY 1000.0 / (1.0 * CAST(d.n_chars AS DOUBLE) + 1000.0) ASC,
         s.doc_id ASC
LIMIT {k}
""".strip()


def join_scored_customers(
    min_total: float = 300000.0, mode: str = "avg"
) -> str:
    """JoinUtil score-mode twin: from = qualifying orders scored
    o_totalprice/100000, grouped per custkey with the mode aggregate,
    joined onto customers (JoinUtil.java:47-51)."""
    agg = {"avg": "avg", "max": "max", "total": "sum"}[mode]
    return f"""
WITH per_key AS (
  SELECT o_custkey AS c_custkey,
         {agg}(o_totalprice / 100000.0) AS score
  FROM orders WHERE o_totalprice > {min_total!r} GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, round(p.score, 4) AS score
FROM customer c JOIN per_key p USING (c_custkey)
ORDER BY c.c_custkey
""".strip()


def block_join_scored(
    term: str = "scan", mode: str = "max", table: str = "documents"
) -> str:
    """Scored ToParentBlockJoin twin: child = documents scored by BM25,
    parent = source, parent score = mode-aggregate of child scores."""
    agg = {"avg": "avg", "max": "max", "total": "sum"}[mode]
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT d.source AS source, round({agg}(s.score), 4) AS score
FROM scored s JOIN {table} d USING (doc_id)
GROUP BY d.source ORDER BY source
""".strip()


def group_topk_ngroups(
    term: str, field: str, per_group: int = 2, table: str = "documents"
) -> str:
    """group_topk page + group.ngroups total (Grouping.java:581)."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
j AS (SELECT d.{field} AS {field}, s.doc_id, s.score
      FROM scored s JOIN {table} d USING (doc_id)),
ng AS (SELECT CAST(count(DISTINCT {field}) AS BIGINT) AS ngroups FROM j)
SELECT {field}, doc_id, round(score, 4) AS score, ng.ngroups
FROM (
  SELECT {field}, doc_id, score,
         row_number() OVER (
           PARTITION BY {field} ORDER BY score DESC, doc_id ASC
         ) AS rn
  FROM j
) t, ng WHERE rn <= {per_group} ORDER BY {field}, score DESC, doc_id
""".strip()


def group_facet_counts(
    term: str,
    group_field: str,
    facet_field: str,
    table: str = "documents",
) -> str:
    """group.facet=true twin: count of DISTINCT groups per facet value
    among the query matches."""
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}')
SELECT d.{facet_field} AS {facet_field},
       CAST(count(DISTINCT d.{group_field}) AS BIGINT) AS cnt
FROM {table} d JOIN matched USING (doc_id)
GROUP BY d.{facet_field} ORDER BY {facet_field}
""".strip()


def group_truncate_facet(
    term: str,
    group_field: str,
    facet_field: str,
    table: str = "documents",
) -> str:
    """group.truncate=true twin: facet counts over the per-group head
    doc (score desc, doc_id asc within group) of the match set."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
heads AS (
  SELECT doc_id FROM (
    SELECT s.doc_id,
           row_number() OVER (
             PARTITION BY d.{group_field}
             ORDER BY s.score DESC, s.doc_id ASC
           ) AS rn
    FROM scored s JOIN {table} d USING (doc_id)
  ) WHERE rn = 1
)
SELECT d.{facet_field} AS {facet_field},
       CAST(count(*) AS BIGINT) AS cnt
FROM {table} d JOIN heads USING (doc_id)
GROUP BY d.{facet_field} ORDER BY {facet_field}
""".strip()


# --- round-4b ValueSource twins (dist/ord/hsin/geohash/const/boost) ---

_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_AXIS_BITS = 30
_PTS_CTE = """pts AS (
  SELECT doc_id,
         ((doc_id * 37) % 1800) / 10.0 - 90.0 AS lat,
         ((doc_id * 73) % 3600) / 10.0 - 180.0 AS lon
  FROM {table}
)"""


def func_dist(table: str = "documents") -> str:
    """sqedist/dist twin: plain Minkowski arithmetic between the point
    (n_chars, doc_id) and (500, 50), mirroring the engine's op order
    (per-dim |a-b|^p summed, then the 1/p root)."""
    a = "(CAST(n_chars AS DOUBLE) - 500.0)"
    b = "(CAST(doc_id AS DOUBLE) - 50.0)"
    third = repr(1.0 / 3.0)
    return f"""
SELECT doc_id,
       round({a}*{a} + {b}*{b}, 4) AS sq,
       round(abs({a}) + abs({b}), 4) AS d1,
       round(sqrt({a}*{a} + {b}*{b}), 4) AS d2,
       (CASE WHEN CAST(n_chars AS DOUBLE) <> 500.0 THEN 1.0 ELSE 0.0 END
        + CASE WHEN CAST(doc_id AS DOUBLE) <> 50.0 THEN 1.0 ELSE 0.0 END)
         AS d0,
       round(pow(pow(abs({a}), 3.0) + pow(abs({b}), 3.0), {third}), 4)
         AS d3
FROM {table} ORDER BY doc_id
""".strip()


def func_ord(table: str = "documents") -> str:
    """ord/rord twin: dense_rank over the distinct lang values (the
    sorted terms index), 0 for missing; rord = (#terms + 1) - ord."""
    return f"""
WITH vals AS (
  SELECT DISTINCT lang AS v FROM {table} WHERE lang IS NOT NULL
),
ranked AS (
  SELECT v, CAST(dense_rank() OVER (ORDER BY v) AS DOUBLE) AS r FROM vals
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM vals)
SELECT d.doc_id,
       coalesce(r, 0.0) AS ordv,
       ((SELECT c FROM n) + 1.0) - coalesce(r, 0.0) AS rordv
FROM {table} d LEFT JOIN ranked ON d.lang = ranked.v
ORDER BY d.doc_id
""".strip()


def _hsin_sql(y1: str, x1: str, y2: str, x2: str, radius: float) -> str:
    """haversine_units textual twin: radians FIRST then the half-angle
    difference (spatial4j distHaversineRAD via HaversineFunction.java:
    81-92 — note this differs from func_geodist's radians-of-difference
    order, mirroring each engine path exactly)."""
    hy = f"sin((radians({y1}) - radians({y2})) * 0.5)"
    hx = f"sin((radians({x1}) - radians({x2})) * 0.5)"
    h = f"({hy} * {hy} + cos(radians({y1})) * cos(radians({y2})) * {hx} * {hx})"
    return f"{2.0 * radius!r} * atan2(sqrt({h}), sqrt(1.0 - {h}))"


def func_hsin(
    y2: float, x2: float, radius: float, table: str = "documents"
) -> str:
    """hsin(radius,true,lat,lon,y2,x2) twin over the synthetic
    coordinates."""
    return f"""
WITH {_PTS_CTE.format(table=table)}
SELECT doc_id,
       round({_hsin_sql('lat', 'lon', repr(y2), repr(x2), radius)}, 4)
         AS dist_mi
FROM pts ORDER BY doc_id
""".strip()


def _gh_cell_sql(coord: str, offset: float, span: float) -> str:
    """Closed-form axis cell index — identical double arithmetic to
    spatial.geohash_encode's _gh_cell."""
    top = 2**_GH_AXIS_BITS - 1
    return (
        f"greatest(CAST(0 AS BIGINT), least(CAST(floor((({coord} + {offset!r})"
        f" / {span!r}) * {float(2 ** _GH_AXIS_BITS)!r}) AS BIGINT), {top}))"
    )


def _gh_string_sql(lat_i: str, lon_i: str) -> str:
    """The 12-char base-32 interleaved geohash from the two axis cell
    indexes, as pure bit arithmetic (lon takes even global bits)."""
    chars = []
    for c in range(12):
        terms = []
        for j in range(5):
            g = 5 * c + j
            axis = lon_i if g % 2 == 0 else lat_i
            shift = _GH_AXIS_BITS - 1 - g // 2
            terms.append(f"(({axis} >> {shift}) & 1) * {1 << (4 - j)}")
        idx = " + ".join(terms)
        chars.append(
            f"substr('{_GH_ALPHABET}', CAST({idx} AS INTEGER) + 1, 1)"
        )
    return " || ".join(chars)


def func_geohash(
    y2: float, x2: float, radius: float, table: str = "documents"
) -> str:
    """geohash + ghhsin twin: the same closed-form cell indexes drive
    both the base-32 string and the cell-center haversine; the constant
    point's center is folded in Python with identical double ops."""
    import math

    def center(coord: float, offset: float, span: float) -> float:
        raw = math.floor((coord + offset) / span * float(2**_GH_AXIS_BITS))
        i = max(0, min(int(raw), 2**_GH_AXIS_BITS - 1))
        return -offset + (i + 0.5) * (span / float(2**_GH_AXIS_BITS))

    cy2, cx2 = center(y2, 90.0, 180.0), center(x2, 180.0, 360.0)
    scale_lat = repr(180.0 / float(2**_GH_AXIS_BITS))
    scale_lon = repr(360.0 / float(2**_GH_AXIS_BITS))
    return f"""
WITH {_PTS_CTE.format(table=table)},
cells AS (
  SELECT doc_id,
         {_gh_cell_sql('lat', 90.0, 180.0)} AS lat_i,
         {_gh_cell_sql('lon', 180.0, 360.0)} AS lon_i
  FROM pts
),
centers AS (
  SELECT doc_id, lat_i, lon_i,
         -90.0 + ((lat_i + 0.5) * {scale_lat}) AS cy,
         -180.0 + ((lon_i + 0.5) * {scale_lon}) AS cx
  FROM cells
)
SELECT doc_id,
       {_gh_string_sql('lat_i', 'lon_i')} AS gh,
       round({_hsin_sql('cy', 'cx', repr(cy2), repr(cx2), radius)}, 4)
         AS ghd
FROM centers ORDER BY doc_id
""".strip()


def func_const(table: str = "documents") -> str:
    """pi/e/true/false/top/literal twin — constants fold, top() is the
    identity, literal composes into strdist."""
    import math

    return f"""
SELECT doc_id,
       round(pi() + {math.e!r}, 4) AS pe,
       1.0 AS tv,
       0.0 AS fv,
       round(1000.0 / (1.0 * CAST(n_chars AS DOUBLE) + 1000.0), 4) AS topv,
       round(CASE WHEN greatest(length('en'), length(lang)) = 0 THEN 1.0
             ELSE 1.0 - CAST(levenshtein('en', lang) AS DOUBLE)
                  / greatest(length('en'), length(lang)) END, 4) AS lit_sim
FROM {table} ORDER BY doc_id
""".strip()


def func_boost_vs(term: str, table: str = "documents") -> str:
    """boost('q',f) twin: the BM25 score of the embedded query (0 for
    non-matches) times recip(n_chars,1,1000,1000)."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT d.doc_id,
       round(coalesce(s.score, 0.0)
             * (1000.0 / (1.0 * CAST(d.n_chars AS DOUBLE) + 1000.0)), 4)
         AS boosted
FROM {table} d LEFT JOIN scored s USING (doc_id)
ORDER BY d.doc_id
""".strip()


def func_joindf(table: str = "documents") -> str:
    """joindf twin: per-term docFreq from the shared tokenizer CTE,
    left-joined on the doc's first text token; 0 for absent (incl.
    stopped) terms."""
    return f"""
WITH {tok_ctes(table)},
dfs AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
  FROM tok GROUP BY term
)
SELECT d.doc_id, coalesce(dfs.df, 0.0) AS jdf
FROM {table} d
LEFT JOIN dfs ON regexp_extract(lower(d.text), '[a-z0-9]+', 0) = dfs.term
ORDER BY d.doc_id
""".strip()


def facet_missing(
    term: str, sentinel: str = "zh", table: str = "documents"
) -> str:
    """facet.missing twin: group matched docs by nullif(lang, sentinel)
    — the null group IS the missing bucket, value buckets unchanged."""
    return f"""
WITH {tok_ctes(table)},
matched AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(term)}')
SELECT nullif(d.lang, '{_sq(sentinel)}') AS lang_n, count(*) AS cnt
FROM {table} d JOIN matched USING (doc_id)
GROUP BY nullif(d.lang, '{_sq(sentinel)}')
ORDER BY lang_n NULLS LAST
""".strip()


def bbox_docs(
    lat: float, lon: float, d_km: float, table: str = "documents"
) -> str:
    """{!bbox} twin: the identical box bounds (degree half-widths
    computed with the same double math the engine uses), no distance
    test."""
    import math

    r = 6371.0087714
    dlat = math.degrees(d_km / r)
    coslat = math.cos(math.radians(lat))
    dlon = 180.0 if coslat <= 1e-9 else math.degrees(d_km / (r * coslat))
    return f"""
WITH pts AS (
  SELECT doc_id,
         ((doc_id * 37) % 1800) / 10.0 - 90.0 AS lat,
         ((doc_id * 73) % 3600) / 10.0 - 180.0 AS lon
  FROM {table}
)
SELECT doc_id FROM pts
WHERE lat BETWEEN {lat - dlat!r} AND {lat + dlat!r}
  AND lon BETWEEN {lon - dlon!r} AND {lon + dlon!r}
ORDER BY doc_id
""".strip()


def group_sort_topk(
    term: str,
    field: str,
    sort_field: str,
    per_group: int = 2,
    table: str = "documents",
) -> str:
    """group.sort twin: row_number partitioned by group ordered by the
    sort field asc with doc_id tiebreak."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT {field}, doc_id, round(score, 4) AS score FROM (
  SELECT d.{field} AS {field}, s.doc_id, s.score,
         row_number() OVER (
           PARTITION BY d.{field}
           ORDER BY d.{sort_field} ASC, s.doc_id ASC
         ) AS rn
  FROM scored s JOIN {table} d USING (doc_id)
) WHERE rn <= {per_group} ORDER BY {field}, doc_id
""".strip()


def explain_rows(terms: list[str], table: str = "documents") -> str:
    """explain() twin: the BM25 explanation leaves per (doc, term) —
    idf, freq, quantized fieldLength, tfNorm, and the clause score in
    the engine's multiplication order (idf * tfNorm)."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return f"""
WITH {tok_ctes(table)},
qtf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
ex AS (
  SELECT f.doc_id, f.term,
         ln(1 + ((SELECT max_doc FROM coll) - d.df + 0.5) / (d.df + 0.5))
           AS idf,
         CAST(f.tf AS DOUBLE) AS freq,
         CAST(q.q AS DOUBLE) AS field_length,
         ({K1}+1) * f.tf
           / (f.tf + {K1}*((1-{B}) + {B}*q.q/(SELECT avgdl FROM coll)))
           AS tf_norm
  FROM qtf f
  JOIN dfs d USING (term)
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
)
SELECT doc_id, term, round(idf, 4) AS idf, freq,
       round(field_length, 4) AS field_length,
       round(tf_norm, 4) AS tf_norm,
       round(idf * tf_norm, 4) AS score_part
FROM ex ORDER BY doc_id, term
""".strip()


def terms_enum_bounds(
    lower: str, upper: str, regex: str, k: int = 30,
    table: str = "documents",
) -> str:
    """TermsComponent lower/upper/regex/sort=index twin."""
    return f"""
WITH {tok_ctes(table)}
SELECT term, count(DISTINCT doc_id) AS df FROM tok
WHERE term >= '{_sq(lower)}' AND term < '{_sq(upper)}'
  AND regexp_matches(term, '{regex}')
GROUP BY term ORDER BY term LIMIT {k}
""".strip()


def pii_redact(table: str = "documents") -> str:
    """PII redaction twin: identical deterministic augmentation, the
    same email-then-URL replace chain ('g' = Spark's replace-all), and
    the span count from regexp_extract_all lengths."""
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    url = "https?://[^\\s]+"
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com'
              WHEN doc_id % 3 = 1
              THEN text || ' see https://ex.org/d/'
                   || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM {table}
)
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                      '{url}', '<URL>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{email}'))
            + len(regexp_extract_all(text, '{url}')) AS BIGINT)
         AS n_redacted
FROM aug ORDER BY doc_id
""".strip()


def rep_ratio(table: str = "documents") -> str:
    """Duplicate-trigram fraction twin: same [a-z0-9]+ tokens, same
    1 - distinct/total over joined trigrams, 0.0 under 3 tokens."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
  FROM {table}
),
tg AS (
  SELECT doc_id, len(l) AS sz,
         list_transform(generate_series(1, len(l)-2),
                        i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS g
  FROM toks
)
SELECT doc_id,
       CASE WHEN sz < 3 THEN 0.0
            ELSE round(1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                 / len(g), 4) END AS rep_ratio
FROM tg ORDER BY doc_id
""".strip()


def bm25_no_norms(terms: list[str], k: int = 10, table: str = "documents") -> str:
    """omitNorms BM25 twin: b=0 — idf*(k1+1)*tf/(tf+k1) summed."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    return f"""
WITH {tok_ctes(table)},
qtf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
agg AS (
  SELECT f.doc_id,
         sum(ln(1 + ((SELECT max_doc FROM coll) - d.df + 0.5)
                 / (d.df + 0.5)) * ({K1}+1) * f.tf / (f.tf + {K1}))
           AS score
  FROM qtf f JOIN dfs d USING (term) GROUP BY f.doc_id
)
{_topk('agg', k)}
""".strip()


# ---------------------------------------------------------------------------
# training-pipeline operators (datapipe/training.py twins)
# ---------------------------------------------------------------------------


def decontaminate(
    n: int = 8, eval_mod: int = 23, table: str = "documents"
) -> str:
    """Benchmark-decontamination twin: same [a-z0-9]+ tokens, same
    space-joined n-grams (distinct per doc), eval set = doc_id %
    eval_mod == 0, corpus = the rest; n_hits = distinct contaminated
    n-grams per corpus doc."""
    gram = " || ' ' || ".join(f"l[i+{j}]" for j in range(n))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
  FROM {table}
),
gr AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(l) - {n - 1}), i -> {gram}))) AS gram
  FROM toks WHERE len(l) >= {n}
),
ev AS (SELECT DISTINCT gram FROM gr WHERE doc_id % {eval_mod} = 0)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM gr g JOIN ev USING (gram)
WHERE g.doc_id % {eval_mod} <> 0
GROUP BY g.doc_id ORDER BY g.doc_id
""".strip()


def terms_regex(
    pattern: str, mincount: int, maxcount: int, k: int = 20,
    table: str = "documents",
) -> str:
    """TermsComponent terms.regex twin: dictionary terms matching the
    pattern with df in [mincount, maxcount], index (term) order."""
    return f"""
WITH {tok_ctes(table)},
tdict AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
)
SELECT term, CAST(df AS BIGINT) AS df FROM tdict
WHERE regexp_matches(term, '{_sq(pattern)}')
  AND df BETWEEN {mincount} AND {maxcount}
ORDER BY term ASC LIMIT {k}
""".strip()


def pipeline_funnel(
    quality_min: float = 0.5,
    n: int = 4,
    eval_mod: int = 23,
    train_pct: int = 80,
    val_pct: int = 10,
    table: str = "documents",
) -> str:
    """Funnel twin: exact-dedup first-wins -> quality >= min ->
    decontaminated (no shared token n-gram with the eval slice, eval
    excluded) -> md5-bucket split counts. Every stage reuses the exact
    arithmetic of its standalone twin."""
    raw = f"regexp_extract_all(lower(text), {PATTERN_LIT})"
    toks255 = f"list_filter({raw}, x -> length(x) <= 255)"
    gram = " || ' ' || ".join(f"l[i+{j}]" for j in range(n))
    hi = train_pct + val_pct
    return f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
           list_filter({raw}, x -> length(x) <= 255
                       AND x NOT IN ({STOP_LIST})))), ' '))
           AS fingerprint
  FROM {table}
),
first AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fingerprint),
feats AS (
  SELECT d.doc_id,
    length(text) AS n_chars,
    len({toks255}) AS n_tokens,
    len(list_filter({raw},
        x -> length(x) <= 255 AND x IN ({STOP_LIST}))) AS n_stop,
    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum
  FROM {table} d JOIN first USING (doc_id)
),
q AS (
  SELECT doc_id FROM (
    SELECT doc_id,
      round(0.4 * (CASE WHEN n_chars > 0
                        THEN CAST(alnum AS DOUBLE) / n_chars
                        ELSE 0.0 END)
          + 0.3 * least(n_tokens / 100.0, 1.0)
          + 0.3 * (1.0 - abs((CASE WHEN n_tokens > 0
                   THEN CAST(n_stop AS DOUBLE) / n_tokens
                   ELSE 0.0 END) - 0.4)), 4) AS quality
    FROM feats
  ) WHERE quality >= {quality_min}
),
gtok AS (
  SELECT doc_id, {raw} AS l FROM {table}
),
gr AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(l) - {n - 1}), i -> {gram}))) AS gram
  FROM gtok WHERE len(l) >= {n}
),
ev AS (SELECT DISTINCT gram FROM gr WHERE doc_id % {eval_mod} = 0),
contaminated AS (
  SELECT DISTINCT g.doc_id FROM gr g JOIN ev USING (gram)
  WHERE g.doc_id % {eval_mod} <> 0
),
clean AS (
  SELECT doc_id FROM q
  WHERE doc_id % {eval_mod} <> 0
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
b AS (
  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) % 100 AS bucket
  FROM clean
)
SELECT CASE WHEN bucket < {train_pct} THEN 'train'
            WHEN bucket < {hi} THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY 1 ORDER BY split
""".strip()


def chunk_dedup(chunk_tokens: int = 10, table: str = "documents") -> str:
    """Chunk-level (paragraph) dedup twin: same fixed non-overlapping
    token windows incl. the ragged tail, same md5 chunk hash."""
    ct = chunk_tokens
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
  FROM {table}
),
ch AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(0, CAST(ceil(len(l) / {ct}.0) AS INT) - 1),
           c -> array_to_string(list_slice(l, c*{ct}+1, c*{ct}+{ct}), ' ')
         )) AS chunk
  FROM toks WHERE len(l) > 0
)
SELECT md5(chunk) AS chunk_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       min(doc_id) AS min_doc_id
FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
ORDER BY chunk_hash
""".strip()


def sample_stratified(
    rates: dict[str, float],
    default_rate: float = 0.05,
    stratum_col: str = "lang",
    table: str = "documents",
) -> str:
    """Deterministic stratified-sampling twin: same md5(doc_id)-mod-
    10000 threshold per stratum."""
    cases = " ".join(
        f"WHEN '{_sq(k)}' THEN CAST({v} * 10000 AS BIGINT)"
        for k, v in rates.items()
    )
    h = _hash60_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, {stratum_col} AS stratum
FROM {table}
WHERE {h} % 10000 <
      (CASE {stratum_col} {cases}
        ELSE CAST({default_rate} * 10000 AS BIGINT) END)
ORDER BY doc_id
""".strip()


def quota_sample(
    quota: int = 12,
    domain_col: str = "source",
    table: str = "documents",
) -> str:
    """Domain-balanced quota-sampling twin: the ``quota`` lowest
    md5-mod-10000 buckets per domain (ties by doc_id) — the same
    deterministic order the Spark two-phase path selects."""
    h = _hash60_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, domain
FROM (
  SELECT doc_id, {domain_col} AS domain,
         row_number() OVER (
           PARTITION BY {domain_col}
           ORDER BY {h} % 10000, doc_id
         ) AS rn
  FROM {table}
)
WHERE rn <= {quota}
ORDER BY domain, doc_id
""".strip()


def pack_next_fit(
    budget: int = 256, n_buckets: int = 32, table: str = "documents"
) -> str:
    """Next-fit packing twin: per-bucket sequential walk as a recursive
    CTE (row n+1's bin from row n's fill) — bit-identical greedy rule:
    open a new bin when the running fill is non-zero and would exceed
    the budget."""
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, CAST(doc_id % {n_buckets} AS INT) AS bucket,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
           AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {n_buckets}
                            ORDER BY doc_id) AS rn
  FROM {table}
),
rec AS (
  SELECT bucket, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN rec.fill > 0 AND rec.fill + t.n_tokens > {budget}
              THEN rec.bin_idx + 1 ELSE rec.bin_idx END,
         CASE WHEN rec.fill > 0 AND rec.fill + t.n_tokens > {budget}
              THEN t.n_tokens ELSE rec.fill + t.n_tokens END
  FROM rec JOIN t ON t.bucket = rec.bucket AND t.rn = rec.rn + 1
)
SELECT doc_id, bucket, n_tokens, bin_idx FROM rec ORDER BY doc_id
""".strip()


def facet_date_counts(
    bounds: list[str],
    other: bool = False,
    mincount: int = 0,
    table: str = "events",
    field: str = "ts",
) -> str:
    """facet.date twin: explicit resolved boundary list (lo_0..lo_k,
    extended_end) — every [lo_i, lo_i+1) bucket counted incl. zeros,
    'before'/'after' rows when other."""
    pairs = ", ".join(
        f"(TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
        for lo, hi in zip(bounds[:-1], bounds[1:])
    )
    inside = f"""
  SELECT 1 AS ord, b.lo AS lo,
         strftime(b.lo, '%Y-%m-%d %H:%M:%S') AS bucket,
         CAST(count({field}) AS BIGINT) AS cnt
  FROM (VALUES {pairs}) AS b(lo, hi)
  LEFT JOIN {table} e ON e.{field} >= b.lo AND e.{field} < b.hi
  GROUP BY b.lo"""
    if not other:
        return f"""
SELECT bucket, cnt FROM ({inside.strip()})
WHERE cnt >= {mincount} ORDER BY lo
""".strip()
    return f"""
WITH i AS ({inside.strip()})
SELECT bucket, cnt FROM (
  SELECT * FROM i WHERE cnt >= {mincount}
  UNION ALL
  SELECT 0, NULL, 'before', CAST(count(*) AS BIGINT)
  FROM {table} WHERE {field} < TIMESTAMP '{bounds[0]}'
  UNION ALL
  SELECT 2, NULL, 'after', CAST(count(*) AS BIGINT)
  FROM {table} WHERE {field} >= TIMESTAMP '{bounds[-1]}'
) ORDER BY ord, lo
""".strip()


def signature_dedup(table: str = "documents") -> str:
    """SignatureUpdateProcessor twin: last-wins per content signature
    (the fingerprint md5 over sorted distinct analyzed tokens) — the
    live set after an overwriteDupes=true ingest in id order."""
    raw = f"regexp_extract_all(lower(text), {PATTERN_LIT})"
    toks = (
        f"list_filter({raw}, x -> length(x) <= 255"
        f" AND x NOT IN ({STOP_LIST}))"
    )
    return f"""
WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({toks})), ' '))
           AS fingerprint
  FROM {table}
)
SELECT max(doc_id) AS doc_id, fingerprint
FROM fp GROUP BY fingerprint ORDER BY doc_id
""".strip()


def stream_dedup(table: str = "documents") -> str:
    """Streaming-dedup batch twin: over the duplicate-injected corpus
    (every doc_id %% 3 == 0 re-arrives 5 minutes later as id+1000 with
    punctuation appended — same content signature), keep the EARLIEST
    (ts, doc_id) arrival per signature — what an in-order watermarked
    stream emits."""
    raw = f"regexp_extract_all(lower(text), {PATTERN_LIT})"
    toks = (
        f"list_filter({raw}, x -> length(x) <= 255"
        f" AND x NOT IN ({STOP_LIST}))"
    )
    return f"""
WITH aug AS (
  SELECT doc_id, text,
         1700000000 + doc_id * 60 AS ts_s
  FROM {table}
  UNION ALL
  SELECT doc_id + 1000, text || '  !!',
         1700000000 + doc_id * 60 + 300
  FROM {table} WHERE doc_id % 3 = 0
),
fp AS (
  SELECT doc_id, ts_s,
         md5(array_to_string(list_sort(list_distinct({toks})), ' '))
           AS fingerprint
  FROM aug
),
first AS (
  SELECT fingerprint, min(ts_s * 100000 + doc_id) AS k
  FROM fp GROUP BY fingerprint
)
SELECT CAST(f.doc_id AS BIGINT) AS doc_id, f.fingerprint
FROM fp f JOIN first USING (fingerprint)
WHERE f.ts_s * 100000 + f.doc_id = first.k
ORDER BY doc_id
""".strip()


def signature_textprofile(table: str = "documents") -> str:
    """TextProfileSignature twin (TextProfileSignature.java:68-140, the
    Nutch quantized token-frequency profile): tokens are letter/digit
    runs of the lowercased text strictly longer than minTokenLen=2;
    QUANT = round(maxFreq*0.01) floored at 2 when maxFreq>1 else 1;
    counts round down to a QUANT multiple, sub-QUANT tokens drop;
    profile lines "tok cnt" ordered cnt desc / tok asc (the engine's
    deterministic tie-break) joined with newline, md5-hashed. Dedup =
    last-wins (max doc_id) per signature, as an overwriteDupes ingest
    leaves it."""
    return f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM {table}, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)
  WHERE length(t.tok) > 2
),
freqs AS (
  SELECT doc_id, tok, CAST(count(*) AS INT) AS cnt FROM toks GROUP BY 1, 2
),
q AS (
  SELECT doc_id,
         CASE WHEN floor(max(cnt) * 0.01 + 0.5) >= 2
              THEN CAST(floor(max(cnt) * 0.01 + 0.5) AS INT)
              WHEN max(cnt) > 1 THEN 2 ELSE 1 END AS quant
  FROM freqs GROUP BY doc_id
),
prof AS (
  SELECT f.doc_id,
         string_agg(f.tok || ' ' || (f.cnt // q.quant) * q.quant, chr(10)
                    ORDER BY (f.cnt // q.quant) * q.quant DESC, f.tok) AS profile
  FROM freqs f JOIN q USING (doc_id)
  WHERE (f.cnt // q.quant) * q.quant >= q.quant
  GROUP BY f.doc_id
),
sig AS (
  SELECT d.doc_id, md5(coalesce(p.profile, '')) AS signature
  FROM {table} d LEFT JOIN prof p USING (doc_id)
)
SELECT max(doc_id) AS doc_id, signature,
       CAST(count(*) AS BIGINT) AS n_docs
FROM sig GROUP BY signature ORDER BY doc_id
""".strip()


def sorted_topk(
    sort_col: str, lang: str, k: int, table: str = "documents"
) -> str:
    """Early-terminating sorted-store top-k twin: the engine must be
    rank-identical to the plain full sort (sort desc, doc_id asc)."""
    return f"""
SELECT doc_id, {sort_col}, lang FROM {table}
WHERE lang = '{lang}'
ORDER BY {sort_col} DESC, doc_id LIMIT {k}
""".strip()



def _synth_url_sql(table: str) -> str:
    """The deterministic URL synthesized for the url_classify gate —
    must stay textually in lock-step with __spark_entry__._synth_url."""
    return f"""
  SELECT doc_id,
    'https://' || source || '.example.com' ||
    CASE CAST(doc_id % 5 AS INT)
      WHEN 0 THEN '/'
      WHEN 1 THEN '/' || lang || '/docs/index.html'
      WHEN 2 THEN '/' || lang || '/page.html?q=' || CAST(doc_id % 7 AS VARCHAR)
      WHEN 3 THEN '/a/b/welcome.php/'
      ELSE '/x/' || source || '/data'
    END AS url
  FROM {table}
""".rstrip()


def url_classify(table: str = "documents") -> str:
    """URLClassifyProcessor twin (URLClassifyProcessor.java:95-230)
    over the synthesized URL: length / path levels / toplevel /
    landingpage / domain / canonical. The landing suffix is the FIRST
    entry of landingPageSuffixes the path ends with ("/" outranks
    index.*/welcome.*); levels strip the suffix then trailing slashes
    and count '/'; canonical collapses a trailing "/"+suffix to "/"."""
    suffixes = ["index." + e for e in
                ("html", "htm", "phtml", "shtml", "xml", "php", "asp", "aspx")]
    suffixes += ["welcome." + e for e in
                 ("html", "htm", "phtml", "shtml", "xml", "php", "asp", "aspx")]
    when_sfx = "\n    ".join(
        f"WHEN ends_with(path, '{s}') THEN '{s}'" for s in suffixes
    )
    return f"""
WITH u AS (
{_synth_url_sql(table)}
),
parts AS (
  SELECT doc_id, url,
    regexp_extract(url, '^https://([^/?#]*)', 1) AS host,
    regexp_extract(url, '^https://[^/?#]*([^?#]*)', 1) AS path,
    (url LIKE '%?%') AS has_q
  FROM u
),
sfx AS (
  SELECT *, CASE
    WHEN path LIKE '%/' THEN '/'
    {when_sfx}
    ELSE '' END AS suf
  FROM parts
),
strip AS (
  SELECT *, regexp_replace(
    CASE WHEN suf <> '' THEN substr(path, 1, length(path) - length(suf))
         ELSE path END, '/+$', '') AS sp
  FROM sfx
)
SELECT doc_id,
  CAST(length(url) AS INT) AS url_length,
  CAST(length(sp) - length(replace(sp, '/', '')) AS INT) AS url_levels,
  CAST(CASE WHEN length(sp) = 0 AND NOT has_q THEN 1 ELSE 0 END AS INT)
    AS url_toplevel,
  CAST(CASE WHEN NOT has_q AND suf <> '' THEN 1 ELSE 0 END AS INT)
    AS url_landingpage,
  host AS url_domain,
  CASE WHEN suf NOT IN ('', '/') AND ends_with(url, '/' || suf)
       THEN substr(url, 1, length(url) - length(suf) - 1) || '/'
       ELSE url END AS url_canonical
FROM strip ORDER BY doc_id
""".strip()


def dedup_url(table: str = "documents") -> str:
    """Canonical-URL dedup twin: same synthesized URL + the
    URLClassifyProcessor canonical collapse (trailing '/'+suffix ->
    '/'), one group per canonical URL, min doc_id survivor."""
    suffixes = ["index." + e for e in
                ("html", "htm", "phtml", "shtml", "xml", "php", "asp",
                 "aspx")]
    suffixes += ["welcome." + e for e in
                 ("html", "htm", "phtml", "shtml", "xml", "php", "asp",
                  "aspx")]
    when_sfx = "\n    ".join(
        f"WHEN ends_with(path, '{s}') THEN '{s}'" for s in suffixes
    )
    return f"""
WITH u AS (
{_synth_url_sql(table)}
),
parts AS (
  SELECT doc_id, url,
    regexp_extract(url, '^https://[^/?#]*([^?#]*)', 1) AS path
  FROM u
),
sfx AS (
  SELECT *, CASE
    WHEN path LIKE '%/' THEN '/'
    {when_sfx}
    ELSE '' END AS suf
  FROM parts
),
canon AS (
  SELECT doc_id,
    CASE WHEN suf NOT IN ('', '/') AND ends_with(url, '/' || suf)
         THEN substr(url, 1, length(url) - length(suf) - 1) || '/'
         ELSE url END AS url_canonical
  FROM sfx
)
SELECT url_canonical, min(doc_id) AS keep_doc,
       CAST(count(*) AS BIGINT) AS n_docs
FROM canon GROUP BY url_canonical ORDER BY url_canonical
""".strip()


def currency_range(lower: float, upper: float, table: str = "documents") -> str:
    """CurrencyField twin: same synthesized 'n_chars.5,CODE' values,
    minor units = round-half-up(amount * 10^digits) per Math.round in
    CurrencyValue.parse, converted to USD as floor((minor * rate) *
    10^(2 - srcDigits)) (convertTo's (long) truncation), filtered on
    USD minor bounds. Rates: EUR->USD 1.08, JPY->USD 0.0067 (JPY has
    0 fraction digits)."""
    lo = int(lower * 100)
    hi = int(upper * 100)
    return f"""
WITH c AS (
  SELECT doc_id,
         CAST(n_chars AS DOUBLE) + 0.5 AS amt,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'JPY' END AS code
  FROM {table}
),
m AS (
  SELECT doc_id, code,
         CASE WHEN code = 'JPY'
              THEN CAST(floor(amt + 0.5) AS BIGINT)
              ELSE CAST(floor(amt * 100.0 + 0.5) AS BIGINT) END AS minor
  FROM c
),
conv AS (
  SELECT doc_id,
         CASE code
           WHEN 'USD' THEN minor
           WHEN 'EUR' THEN CAST(floor((CAST(minor AS DOUBLE) * 1.08)
                                      * 1.0) AS BIGINT)
           ELSE CAST(floor((CAST(minor AS DOUBLE) * 0.0067)
                           * 100.0) AS BIGINT) END AS converted_minor
  FROM m
)
SELECT doc_id, converted_minor FROM conv
WHERE converted_minor BETWEEN {lo} AND {hi} ORDER BY doc_id
""".strip()


def dih_transform(table: str = "documents") -> str:
    """DIH transformer-chain twin: regex group extraction and
    replaceWith are NULL on no match (RegexTransformer.java:92,
    readfromRegExp returning null), splitBy mirrors String.split's
    trailing-empty removal, template is plain concat."""
    return f"""
SELECT doc_id,
  CASE WHEN regexp_matches(source, 'src(\\d+)')
       THEN regexp_extract(source, 'src(\\d+)', 1) END AS src_num,
  CASE WHEN regexp_matches(source, '(src)(\\d+)')
       THEN regexp_extract(source, '(src)(\\d+)', 1) END AS src_tag,
  CASE WHEN regexp_matches(source, '(src)(\\d+)')
       THEN regexp_extract(source, '(src)(\\d+)', 2) END AS src_id,
  CASE WHEN regexp_matches(lang, 'en')
       THEN regexp_replace(lang, 'en', 'english', 'g') END AS lang_en,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  string_split(text, ' ')[1] AS word0,
  source || '/' || lang AS tpl
FROM {table} ORDER BY doc_id
""".strip()


def domain_mix(
    weights: dict[str, float], table: str = "documents"
) -> str:
    """domain_mix twin: same rate arithmetic in IEEE doubles —
    rate_d = (w_d / sum(w)) / (domain_tokens / total_tokens); copies =
    floor(rate) + (md5(doc_id) mod 10000 < floor(frac(rate)*10000)).
    The engine truncates the threshold (Spark cast long), so the twin
    floors explicitly (DuckDB CAST rounds)."""
    wsum = 0.0
    for w in weights.values():
        wsum += w  # same left-to-right float accumulation as python sum()
    cases = " ".join(
        f"WHEN '{_sq(k)}' THEN CAST({v!r} AS DOUBLE)"
        for k, v in weights.items()
    )
    h = _hash60_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS BIGINT) AS n_tokens
  FROM {table}
),
dom AS (SELECT source, SUM(n_tokens) AS dtoks FROM toks GROUP BY source),
tot AS (SELECT CAST(SUM(dtoks) AS DOUBLE) AS t FROM dom),
rates AS (
  SELECT source,
    ((CASE source {cases} ELSE 0.0 END) / CAST({wsum!r} AS DOUBLE))
      / (CAST(dtoks AS DOUBLE) / (SELECT t FROM tot)) * 1.0 AS rate
  FROM dom
),
perdoc AS (
  SELECT t.source, t.n_tokens,
    CAST(floor(r.rate) AS BIGINT)
      + CASE WHEN {h} % 10000 <
             CAST(floor((r.rate - floor(r.rate)) * 10000) AS BIGINT)
        THEN 1 ELSE 0 END AS n_copies
  FROM toks t JOIN rates r USING (source)
)
SELECT source, CAST(SUM(n_copies) AS BIGINT) AS n_rows,
       CAST(SUM(n_tokens * n_copies) AS BIGINT) AS toks
FROM perdoc WHERE n_copies > 0
GROUP BY source ORDER BY source
""".strip()


def per_field_analyzer(table: str = "documents") -> str:
    """PerFieldAnalyzerWrapper twin: 'src' terms are whole source
    values (KeywordAnalyzer — no lowercase, no stop), 'body' terms are
    the standard chain's; top-5 per field by (df desc, term asc)."""
    return f"""
WITH {tok_ctes(table)},
body_df AS (
  SELECT 'body' AS field, term, CAST(count(DISTINCT doc_id) AS BIGINT)
         AS df
  FROM tok GROUP BY term
),
src_df AS (
  SELECT 'src' AS field, source AS term,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM {table} GROUP BY source
),
unioned AS (SELECT * FROM body_df UNION ALL SELECT * FROM src_df),
ranked AS (
  SELECT field, term, df,
         row_number() OVER (PARTITION BY field
                            ORDER BY df DESC, term ASC) AS rk
  FROM unioned
)
SELECT field, term, df FROM ranked WHERE rk <= 5
ORDER BY field, df DESC, term
""".strip()


def dih_entity() -> str:
    """Nested-entity twin: per-nation multivalued customer names,
    sorted for determinism (engine sort_array == ORDER BY c_name)."""
    return """
SELECT n.n_nationkey, n.n_name,
       CAST(count(c.c_name) AS BIGINT) AS n_custs,
       coalesce(string_agg(c.c_name, ',' ORDER BY c.c_name), '')
         AS cust_names
FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_nationkey, n.n_name
ORDER BY n.n_nationkey
""".strip()


def simpletext_dump(terms: list[str], table: str = "documents") -> str:
    """SimpleTextFieldsWriter twin: same line vocabulary built in SQL.
    Index positions are 0-based pre-stop token indexes, so rawtok's
    1-based generate_subscripts shifts by one."""
    tl = ", ".join(f"'{_sq(t)}'" for t in sorted(terms))
    return f"""
WITH rawtok AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
    FROM {table}
  )
),
sel AS (
  SELECT doc_id, term, pos - 1 AS pos FROM rawtok WHERE term IN ({tl})
),
per_doc AS (
  SELECT term, doc_id, count(*) AS tf,
         list(pos ORDER BY pos) AS poss
  FROM sel GROUP BY term, doc_id
),
with_lines AS (
  SELECT term, doc_id,
    CASE WHEN row_number() OVER (PARTITION BY term ORDER BY doc_id) = 1
         THEN ['  term ' || term] ELSE [] END
    || ['    doc ' || doc_id, '      freq ' || tf]
    || list_transform(poss, p -> '      pos ' || p) AS lines
  FROM per_doc
),
exploded AS (
  SELECT 1 AS sect, term, doc_id,
         generate_subscripts(lines, 1) AS idx, unnest(lines) AS line
  FROM with_lines
),
everything AS (
  SELECT 0 AS sect, '' AS term, -1 AS doc_id, 0 AS idx,
         'field text' AS line
  UNION ALL SELECT sect, term, doc_id, idx, line FROM exploded
  UNION ALL SELECT 2, '', -1, 0, 'END'
)
SELECT CAST(row_number() OVER (ORDER BY sect, term, doc_id, idx)
            AS BIGINT) AS line_no, line
FROM everything
""".strip()


def chain_mutate(table: str = "documents") -> str:
    """UpdateRequestProcessorChain twin: trim / clone+truncate /
    field-length / first+last value / uniq / count-values / name-based
    UUID, all as the chain's composed projection would leave them."""
    return f"""
WITH t AS (
  SELECT doc_id,
         trim('  ' || source || '  ') AS src_trim,
         substr(text, 1, 40) AS text40,
         CAST(length(text) AS INT) AS text_len,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM {table}
)
SELECT doc_id, src_trim, text40, text_len,
  CAST(len(toks) AS INT) AS n_toks,
  toks[1] AS tok_first,
  toks[-1] AS tok_last,
  CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
  substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' || substr(h, 14, 3)
    || '-' || translate(substr(h, 17, 1),
                        '0123456789abcdef', '89ab89ab89ab89ab')
    || substr(h, 18, 3) || '-' || substr(h, 21, 12) AS uuid
FROM t ORDER BY doc_id
""".strip()


def mlt_interesting_terms(
    doc_id: int,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    table: str = "documents",
) -> str:
    """mlt.interestingTerms=details twin: the selected terms with their
    tf * (ln(N/(df+1))+1) boosts."""
    return f"""
WITH {tok_ctes(table)},
tdict AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
srcterms AS (
  SELECT term, count(*) AS tf FROM tok WHERE doc_id = {doc_id} GROUP BY term
)
SELECT s.term,
       round(s.tf * (ln(CAST((SELECT max_doc FROM coll) AS DOUBLE)
                        / (d.df + 1.0)) + 1.0), 4) AS score
FROM srcterms s JOIN tdict d USING (term)
WHERE s.tf >= {min_term_freq} AND d.df >= {min_doc_freq}
ORDER BY s.tf * (ln(CAST((SELECT max_doc FROM coll) AS DOUBLE)
                    / (d.df + 1.0)) + 1.0) DESC, s.term ASC
LIMIT {max_query_terms}
""".strip()


def cjk_bigram_freq(k: int = 30, table: str = "documents") -> str:
    """CJKAnalyzer chain twin (StandardTokenizer + CJKBigramFilter +
    StopFilter): zh docs augmented with a Han phrase derived from
    doc_id; each contiguous CJK run folds to sliding character bigrams
    (a lone char stays a unigram — runs break at whitespace, the
    offset-alignment rule of CJKBigramFilter.java:180); ASCII tokens
    are stop-filtered. CJK-gram frequency top-k."""
    from lucene_solr_spark.analysis.tokenizer import (
        CJK_RANGES,
        TOKEN_PATTERN,
    )

    pat = "'" + _sq(f"{TOKEN_PATTERN}|[{CJK_RANGES}]+") + "'"
    cjkrun = "'" + _sq(f"^[{CJK_RANGES}]+$") + "'"
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN lang = 'zh'
              THEN text || ' ' ||
                   translate(CAST(doc_id AS VARCHAR),
                             '0123456789', '零一二三四五六七八九')
              ELSE text END AS text
  FROM {table}
),
tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), {pat})) AS t
  FROM aug
),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN length(t) = 1 THEN [t]
                ELSE list_transform(generate_series(1, length(t) - 1),
                                    i -> substr(t, i, 2)) END) AS term
  FROM tok WHERE regexp_matches(t, {cjkrun})
)
SELECT term AS gram, CAST(count(*) AS BIGINT) AS cnt
FROM grams GROUP BY 1 ORDER BY cnt DESC, gram ASC LIMIT {k}
""".strip()


def luke_index_stats(table: str = "documents") -> str:
    """Luke index overview twin: maxDoc, distinct term count, total
    term freq, avgdl from the same analyzed token stream."""
    return f"""
WITH {tok_ctes(table)}
SELECT (SELECT max_doc FROM coll) AS max_doc,
       CAST((SELECT count(DISTINCT term) FROM tok) AS BIGINT) AS n_terms,
       CAST((SELECT count(*) FROM tok) AS BIGINT) AS sum_ttf,
       round((SELECT CAST(count(*) AS DOUBLE) FROM tok)
             / (SELECT max_doc FROM coll), 4) AS avgdl
""".strip()


def luke_top_terms(k: int = 10, table: str = "documents") -> str:
    """Luke topTerms twin: k highest-docFreq terms with df/ttf."""
    return f"""
WITH {tok_ctes(table)}
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM tok GROUP BY term ORDER BY df DESC, term ASC LIMIT {k}
""".strip()


def analysis_stages(doc_id: int, table: str = "documents") -> str:
    """/analysis/field twin: per-stage token streams for one doc —
    'tokenize' (all tokens, 0-based positions) then 'stop'
    (stop-filtered, original positions kept as gaps)."""
    return f"""
WITH raw AS (
  SELECT unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
         generate_subscripts(
           regexp_extract_all(lower(text), {PATTERN_LIT}), 1) - 1 AS pos
  FROM {table} WHERE doc_id = {doc_id}
),
ok AS (SELECT term, pos FROM raw WHERE length(term) <= 255)
SELECT 'tokenize' AS stage, CAST(pos AS BIGINT) AS pos, term FROM ok
UNION ALL
SELECT 'stop', CAST(pos AS BIGINT), term FROM ok
WHERE term NOT IN ({STOP_LIST})
ORDER BY stage, pos
""".strip()


def analysis_document(
    doc_id: int, qterms: list[str], table: str = "documents"
) -> str:
    """/analysis/document twin: the field stages with the query-match
    flag (token equals an analyzed query term)."""
    ql = ", ".join(f"'{_sq(t)}'" for t in qterms)
    return f"""
WITH raw AS (
  SELECT unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
         generate_subscripts(
           regexp_extract_all(lower(text), {PATTERN_LIT}), 1) - 1 AS pos
  FROM {table} WHERE doc_id = {doc_id}
),
ok AS (SELECT term, pos FROM raw WHERE length(term) <= 255)
SELECT 'tokenize' AS stage, CAST(pos AS BIGINT) AS pos, term,
       term IN ({ql}) AS match FROM ok
UNION ALL
SELECT 'stop', CAST(pos AS BIGINT), term, term IN ({ql}) FROM ok
WHERE term NOT IN ({STOP_LIST})
ORDER BY stage, pos
""".strip()


def _wdf_chain_sql(expr: str) -> str:
    """The WordDelimiterFilter boundary-marking replace chain
    (tokenizer._WDF_RULES) as nested DuckDB regexp_replace calls."""
    out = expr
    for pat, rep in (
        ("'[sS]($|[^A-Za-z0-9])", "\\1"),
        ("([a-z])([A-Z])", "\\1 \\2"),
        ("([A-Z]+)([A-Z][a-z])", "\\1 \\2"),
        ("([A-Za-z])([0-9])", "\\1 \\2"),
        ("([0-9])([A-Za-z])", "\\1 \\2"),
    ):
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    return out


def wdf_freq(k: int = 30, table: str = "documents") -> str:
    """WordDelimiterFilter chain twin: docs augmented with
    case/digit/possessive compounds derived from doc_id, the identical
    split-rule replace chain applied, parts lowercased and
    stop-filtered, token frequency top-k."""
    aug = (
        "text || ' WiFi' || CAST(doc_id AS VARCHAR) || \"Max\" "
        "|| ' O' || chr(39) || 'Neil' || chr(39) || 's v' "
        "|| CAST(doc_id AS VARCHAR) || 'beta'"
    ).replace('"Max"', "'Max'")
    return f"""
WITH aug AS (SELECT doc_id, {aug} AS text FROM {table}),
tok AS (
  SELECT unnest(regexp_extract_all(
           lower({_wdf_chain_sql('text')}), '[a-z]+|[0-9]+')) AS term
  FROM aug
)
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM tok
WHERE length(term) <= 255 AND term NOT IN ({STOP_LIST})
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def common_grams_freq(k: int = 30, table: str = "documents") -> str:
    """CommonGramsFilter twin: adjacent raw-token pairs where either
    side is a common (stop) word -> 'first_second' gram counts."""
    return f"""
WITH raw AS (
  SELECT doc_id, t AS term, i AS pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS t,
           generate_subscripts(
             regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS i
    FROM {table}
  ) WHERE length(t) <= 255
),
pairs AS (
  SELECT a.term || '_' || b.term AS gram
  FROM raw a JOIN raw b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term IN ({STOP_LIST}) OR b.term IN ({STOP_LIST})
)
SELECT gram, CAST(count(*) AS BIGINT) AS cnt
FROM pairs GROUP BY gram ORDER BY cnt DESC, gram ASC LIMIT {k}
""".strip()


def surround_or_near(
    or_terms: list[str],
    term: str,
    dist: int,
    ordered: bool = True,
    table: str = "documents",
) -> str:
    """Surround ``(t1 OR t2 ...) <dist>W/N term`` twin: an OR clause is
    the union of its terms' length-1 spans
    (surround/query/OrQuery.java via SpanNearClauseFactory ->
    SpanOrQuery); SpanNear slop = dist - 1 (DistanceQuery.java:100)."""
    slop = dist - 1
    in_list = ", ".join(f"'{_sq(t)}'" for t in or_terms)
    if ordered:
        cond = f"b.pos > a.pos AND (b.pos - a.pos - 1) <= {slop}"
    else:
        cond = f"a.pos <> b.pos AND abs(b.pos - a.pos) - 1 <= {slop}"
    return f"""
WITH {_rawtok(table)},
a AS (SELECT doc_id, pos FROM rawtok WHERE term IN ({in_list})),
b AS (SELECT doc_id, pos FROM rawtok WHERE term = '{_sq(term)}')
SELECT DISTINCT a.doc_id AS doc_id
FROM a JOIN b ON b.doc_id = a.doc_id
WHERE {cond}
ORDER BY doc_id
""".strip()


def surround_prefix_near(
    prefix: str, term: str, dist: int, table: str = "documents"
) -> str:
    """Surround ``pre* W term`` twin: trailing-* prefix expansion
    (SrndPrefixQuery) unioned into one span clause, then ordered
    distance. The prefix filter excludes stopwords — the engine expands
    against the terms dictionary, which never contains them."""
    slop = dist - 1
    return f"""
WITH {_rawtok(table)},
a AS (SELECT doc_id, pos FROM rawtok
      WHERE starts_with(term, '{_sq(prefix)}')
        AND term NOT IN ({STOP_LIST})),
b AS (SELECT doc_id, pos FROM rawtok WHERE term = '{_sq(term)}')
SELECT DISTINCT a.doc_id AS doc_id
FROM a JOIN b ON b.doc_id = a.doc_id
WHERE b.pos > a.pos AND (b.pos - a.pos - 1) <= {slop}
ORDER BY doc_id
""".strip()


def surround_nested(
    t1: str,
    t2: str,
    term: str,
    outer_dist: int,
    table: str = "documents",
) -> str:
    """Surround ``(t1 W t2) <outer>N term`` twin: the inner adjacent
    ordered pair composes to span (p1, p2+1); the outer unordered
    window rule is (max_end - min_start) - sum(lengths) <= slop with
    lengths 2 + 1 (NearSpansUnordered.java:124-176)."""
    slop = outer_dist - 1
    return f"""
WITH {_rawtok(table)},
ab AS (
  SELECT a.doc_id AS doc_id, a.pos AS s, b.pos + 1 AS e
  FROM rawtok a JOIN rawtok b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{_sq(t1)}' AND b.term = '{_sq(t2)}'
),
k AS (SELECT doc_id, pos FROM rawtok WHERE term = '{_sq(term)}')
SELECT DISTINCT ab.doc_id AS doc_id
FROM ab JOIN k ON k.doc_id = ab.doc_id
WHERE greatest(ab.e, k.pos + 1) - least(ab.s, k.pos) - 3 <= {slop}
ORDER BY doc_id
""".strip()


def surround_bool(
    must: str,
    or_terms: list[str],
    not_term: str,
    table: str = "documents",
) -> str:
    """Surround ``must AND ((x OR y) NOT z)`` twin — doc-level boolean
    algebra (AndQuery/OrQuery/NotQuery make BooleanQuery clauses,
    surround/query/SrndBooleanQuery.java)."""
    in_list = ", ".join(f"'{_sq(t)}'" for t in or_terms)
    return f"""
WITH {_rawtok(table)}
SELECT DISTINCT doc_id FROM rawtok WHERE term = '{_sq(must)}'
INTERSECT
(SELECT DISTINCT doc_id FROM rawtok WHERE term IN ({in_list})
 EXCEPT
 SELECT DISTINCT doc_id FROM rawtok WHERE term = '{_sq(not_term)}')
ORDER BY doc_id
""".strip()


def phrase_docs(terms: list[str], table: str = "documents") -> str:
    """Exact-phrase doc set (PhraseQuery slop=0 membership): clause
    positions strictly consecutive. Twin of the {!field} multi-token
    dispatch (FieldQParserPlugin.java:40-55)."""
    n = len(terms)
    joins = []
    conds = [f"a0.term = '{_sq(terms[0])}'"]
    for i in range(1, n):
        joins.append(
            f"JOIN rawtok a{i} ON a{i}.doc_id = a0.doc_id "
            f"AND a{i}.pos = a0.pos + {i}"
        )
        conds.append(f"a{i}.term = '{_sq(terms[i])}'")
    return f"""
WITH {_rawtok(table)}
SELECT DISTINCT a0.doc_id AS doc_id
FROM rawtok a0 {' '.join(joins)}
WHERE {' AND '.join(conds)}
ORDER BY doc_id
""".strip()


def join_fq_filter(
    q_term: str,
    join_term: str,
    field: str = "source",
    k: int = 10,
    table: str = "documents",
) -> str:
    """{!join from=field to=field}join_term fq twin: BM25 top-k of
    q_term restricted to docs whose `field` value equals the `field`
    of any doc matching join_term (JoinQParserPlugin.java:55-90)."""
    return bm25_bool(
        must=[q_term],
        k=k,
        table=table,
        fq=(
            f"d.{field} IN (SELECT DISTINCT d2.{field} FROM {table} d2 "
            f"JOIN (SELECT DISTINCT doc_id FROM tok WHERE term = "
            f"'{_sq(join_term)}') m ON d2.doc_id = m.doc_id)"
        ),
    )


def group_query_topk(
    term: str,
    groups: dict,
    per_group: int = 3,
    table: str = "documents",
) -> str:
    """group.query twin (Grouping.java CommandQuery): per named group
    query, the main query's top-k docs among that group's matches."""
    ctes = [tok_ctes(table), _scored_cte([term], table)]
    selects = []
    for i, (name, gterm) in enumerate(sorted(groups.items())):
        ctes.append(
            f"g{i} AS (SELECT '{_sq(name)}' AS group_q, doc_id, "
            f"round(score, 4) AS score FROM scored WHERE doc_id IN "
            f"(SELECT doc_id FROM tok WHERE term = '{_sq(gterm)}') "
            f"ORDER BY score DESC, doc_id ASC LIMIT {per_group})"
        )
        selects.append(f"SELECT * FROM g{i}")
    return (
        "WITH "
        + ", ".join(ctes)
        + " "
        + " UNION ALL ".join(selects)
        + " ORDER BY group_q, doc_id"
    )


def group_func_topk(
    term: str,
    func_sql: str,
    per_group: int = 2,
    table: str = "documents",
) -> str:
    """group.func twin (Grouping.java CommandFunc): group key is a
    function of doc columns; top-k per key by (score desc, doc_id)."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT group_f, doc_id, round(score, 4) AS score FROM (
  SELECT CAST({func_sql} AS DOUBLE) AS group_f, s.doc_id, s.score,
         row_number() OVER (
           PARTITION BY CAST({func_sql} AS DOUBLE)
           ORDER BY s.score DESC, s.doc_id ASC
         ) AS rn
  FROM scored s JOIN {table} d USING (doc_id)
) WHERE rn <= {per_group} ORDER BY group_f, doc_id
""".strip()


def terms_filter_docs(terms: list[str], table: str = "documents") -> str:
    """TermsFilter twin: union of the exact terms' doc sets."""
    in_list = ", ".join(f"'{_sq(t)}'" for t in terms)
    return (
        f"WITH {tok_ctes(table)} SELECT DISTINCT doc_id FROM tok "
        f"WHERE term IN ({in_list}) ORDER BY doc_id"
    )


def boolean_filter_docs(
    must: list[str],
    should: list[str],
    must_not: list[str],
    table: str = "documents",
) -> str:
    """BooleanFilter twin: all MUST, >=1 SHOULD, no MUST_NOT."""
    parts = [tok_ctes(table)]
    exprs = []
    if should:
        sl = ", ".join(f"'{_sq(t)}'" for t in should)
        exprs.append(
            f"(SELECT DISTINCT doc_id FROM tok WHERE term IN ({sl}))"
        )
    for t in must:
        exprs.append(
            f"(SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(t)}')"
        )
    body = " INTERSECT ".join(exprs)
    if must_not:
        ml = ", ".join(f"'{_sq(t)}'" for t in must_not)
        body = (
            f"({body}) EXCEPT "
            f"(SELECT DISTINCT doc_id FROM tok WHERE term IN ({ml}))"
        )
    return f"WITH {', '.join(parts)} SELECT doc_id FROM ({body}) ORDER BY doc_id"


def chained_filter_docs(
    t1: str, t2: str, t3: str, table: str = "documents"
) -> str:
    """ChainedFilter twin for logicArray [OR, ANDNOT, XOR] over three
    term filters: ((t1) ANDNOT t2) XOR t3 (ChainedFilter.java doChain,
    initial OR fold from the empty set == the first filter)."""
    return f"""
WITH {tok_ctes(table)},
a AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(t1)}'),
b AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(t2)}'),
c AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{_sq(t3)}'),
s2 AS (SELECT doc_id FROM a EXCEPT SELECT doc_id FROM b)
SELECT doc_id FROM (
  (SELECT doc_id FROM s2 UNION SELECT doc_id FROM c)
  EXCEPT
  (SELECT doc_id FROM s2 INTERSECT SELECT doc_id FROM c)
) ORDER BY doc_id
""".strip()


def duplicate_filter_docs(
    field: str, keep_mode: str = "first", table: str = "documents"
) -> str:
    """DuplicateFilter twin: one doc per field value (min/max doc_id)."""
    agg = "min" if keep_mode == "first" else "max"
    return (
        f"SELECT {agg}(doc_id) AS doc_id FROM {table} "
        f"WHERE {field} IS NOT NULL GROUP BY {field} ORDER BY doc_id"
    )


def fuzzy_like_this(
    sources: list[str],
    min_sim: float = 0.5,
    k: int = 10,
    table: str = "documents",
) -> str:
    """FuzzyLikeThisQuery twin (ignoreTF): per source token, variants
    with 1 - lev/min(len) > minSim get boost = (sim-minSim)/(1-minSim);
    clause weight = boost^2 * (ln(N/(df+1))+1) with df = source term's
    df or the INT-AVERAGE of variant dfs when absent
    (FuzzyLikeThisQuery.java:191-318, SlowFuzzyTermsEnum.java:234).
    Doc score = sum of matched clause weights (tf ignored). Caps
    (50 variants/term, maxNumTerms) assumed non-binding at test scale."""
    scale = 1.0 / (1.0 - min_sim)
    parts = [
        tok_ctes(table),
        "ts AS (SELECT term, count(DISTINCT doc_id) AS df "
        "FROM tok GROUP BY term)",
        f"nd AS (SELECT count(*) AS c FROM {table})",
    ]
    w_sel = []
    for i, s in enumerate(set(sources)):
        sl = _sq(s)
        n = len(s)
        parts.append(
            f"v{i} AS (SELECT term, df, "
            f"(1.0 - CAST(levenshtein(term, '{sl}') AS DOUBLE) "
            f"/ least(CAST(length(term) AS DOUBLE), {float(n)!r})) AS sim "
            f"FROM ts) "
        )
        parts.append(
            f"b{i} AS (SELECT term, df, (sim - {min_sim!r}) * {scale!r} "
            f"AS boost FROM v{i} WHERE sim > {min_sim!r})"
        )
        parts.append(
            f"d{i} AS (SELECT coalesce("
            f"(SELECT df FROM b{i} WHERE term = '{sl}'), "
            f"(SELECT CAST(sum(df) // count(*) AS BIGINT) FROM b{i})"
            f") AS df)"
        )
        w_sel.append(
            f"SELECT term, boost * boost * "
            f"(ln((SELECT c FROM nd) / ((SELECT df FROM d{i}) + 1.0)) "
            f"+ 1.0) AS w FROM b{i}"
        )
    parts.append(
        "weights AS (SELECT term, sum(w) AS w FROM ("
        + " UNION ALL ".join(w_sel)
        + ") GROUP BY term)"
    )
    return (
        "WITH "
        + ", ".join(parts)
        + " SELECT doc_id, round(sum(w), 4) AS score FROM "
        "(SELECT DISTINCT doc_id, term FROM tok) t "
        "JOIN weights USING (term) GROUP BY doc_id "
        f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def complex_phrase_docs(
    slots: list[dict],
    slop: int = 0,
    table: str = "documents",
) -> str:
    """ComplexPhraseQueryParser twin: ordered span-near over expanded
    slots (ComplexPhraseQueryParser.java:197-283, slop = SpanNear slop
    directly). Each slot dict is one of {'term': t}, {'prefix': p},
    {'fuzzy': (word, edits)} — expansions exclude stopwords (the terms
    dictionary never holds them)."""
    ctes = [_rawtok(table)]
    conds = []
    join = ""
    for i, slot in enumerate(slots):
        if "term" in slot:
            pred = f"term = '{_sq(slot['term'])}'"
        elif "prefix" in slot:
            pred = (
                f"starts_with(term, '{_sq(slot['prefix'])}') "
                f"AND term NOT IN ({STOP_LIST})"
            )
        elif "pattern" in slot:
            pred = (
                f"regexp_matches(term, '^{_sq(slot['pattern'])}$') "
                f"AND term NOT IN ({STOP_LIST})"
            )
        else:
            w, ed = slot["fuzzy"]
            pred = (
                f"levenshtein(term, '{_sq(w)}') <= {int(ed)} "
                f"AND term NOT IN ({STOP_LIST})"
            )
        ctes.append(
            f"p{i} AS (SELECT doc_id, pos AS v{i} FROM rawtok "
            f"WHERE {pred})"
        )
        if i == 0:
            join = "p0"
        else:
            join += f" JOIN p{i} USING (doc_id)"
            conds.append(f"v{i} > v{i-1}")
    gaps = " + ".join(
        f"greatest(0, v{i} - v{i-1} - 1)" for i in range(1, len(slots))
    )
    conds.append(f"({gaps}) <= {slop}")
    return f"""
WITH {', '.join(ctes)}
SELECT DISTINCT doc_id FROM {join}
WHERE {' AND '.join(conds)}
ORDER BY doc_id
""".strip()


def length_filter_freq(
    min_len: int, max_len: int, k: int = 20, table: str = "documents"
) -> str:
    """LengthFilter twin: post-stop terms with length in [min,max]."""
    return f"""
WITH {tok_ctes(table)}
SELECT term, count(*) AS cnt FROM tok
WHERE length(term) BETWEEN {min_len} AND {max_len}
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def mapping_charfilter_freq(k: int = 20, table: str = "documents") -> str:
    """MappingCharFilter twin: greedy longest-match {'scan'->'skip',
    'sc'->'sk'} on the raw text before tokenization. Nested replace()
    (longest key first) is equivalent because the replacements create
    no new matches for either key."""
    src = (
        f"(SELECT doc_id, replace(replace(text, 'scan', 'skip'), "
        f"'sc', 'sk') AS text FROM {table})"
    )
    return f"""
WITH {tok_ctes(src)}
SELECT term, count(*) AS cnt FROM tok
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def snowball_freq(table: str = "documents") -> str:
    """Porter2 twin over the corpus's CLOSED vocabulary: each of the 31
    generator words was stemmed BY HAND through the published Porter2
    spec (regions/steps traced in tests/test_snowball.py); the CASE
    mapping below is that trace, so the oracle is independent of the
    engine's stemmer code."""
    return f"""
WITH {tok_ctes(table)}
SELECT CASE term
         WHEN 'customer' THEN 'custom'
         WHEN 'merge' THEN 'merg'
         WHEN 'query' THEN 'queri'
         WHEN 'table' THEN 'tabl'
         WHEN 'value' THEN 'valu'
         ELSE term END AS term,
       count(*) AS cnt
FROM tok
GROUP BY 1 ORDER BY cnt DESC, term ASC
""".strip()


def stemmer_override_freq(table: str = "documents") -> str:
    """StemmerOverrideFilter twin over the same closed-vocabulary
    Porter2 trace as snowball_freq, with the gate's two dictionary
    overrides applied FIRST (a dictionary hit bypasses the stemmer —
    StemmerOverrideFilter.java:54-65): merge->combine, query->query."""
    return f"""
WITH {tok_ctes(table)}
SELECT CASE term
         WHEN 'merge' THEN 'combine'
         WHEN 'query' THEN 'query'
         WHEN 'customer' THEN 'custom'
         WHEN 'table' THEN 'tabl'
         WHEN 'value' THEN 'valu'
         ELSE term END AS term,
       count(*) AS cnt
FROM tok
GROUP BY 1 ORDER BY cnt DESC, term ASC
""".strip()


def keep_word_freq(words: tuple, table: str = "documents") -> str:
    """KeepWordFilter twin: only whitelist terms survive."""
    lst = ", ".join(f"'{_sq(w)}'" for w in words)
    return f"""
WITH {tok_ctes(table)}
SELECT term, count(*) AS cnt FROM tok
WHERE term IN ({lst})
GROUP BY term ORDER BY cnt DESC, term ASC
""".strip()


def whitespace_freq(k: int = 20, table: str = "documents") -> str:
    """WhitespaceTokenizer twin: lowercased maximal non-whitespace
    runs, no stop filter."""
    return f"""
SELECT t.term, count(*) AS cnt
FROM {table},
     unnest(regexp_split_to_array(lower(text), '\\s+')) AS t(term)
WHERE t.term <> ''
GROUP BY t.term ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def path_hierarchy_freq(k: int = 20, table: str = "documents") -> str:
    """PathHierarchyTokenizer twin over the synthesized path
    '/<lang>/<source>/d<doc_id%10>': each doc emits its 3 cumulative
    prefixes; count and rank."""
    return f"""
WITH p AS (
  SELECT '/' || lang AS p1,
         '/' || lang || '/' || source AS p2,
         '/' || lang || '/' || source || '/d'
           || CAST(doc_id % 10 AS VARCHAR) AS p3
  FROM {table}
),
toks AS (
  SELECT p1 AS term FROM p
  UNION ALL SELECT p2 FROM p
  UNION ALL SELECT p3 FROM p
)
SELECT term, count(*) AS cnt FROM toks
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def minimal_stem_freq(k: int = 20, table: str = "documents") -> str:
    """EnglishMinimalStemFilter twin (EnglishMinimalStemmer.java:25-46,
    the S-stemmer): plural stripping over the post-stop stream."""
    stem = """CASE
  WHEN length(term) < 3 OR substr(term, -1, 1) <> 's' THEN term
  WHEN substr(term, -2, 1) IN ('u', 's') THEN term
  WHEN substr(term, -2, 1) = 'e' THEN
    CASE WHEN length(term) > 3 AND substr(term, -3, 1) = 'i'
              AND substr(term, -4, 1) NOT IN ('a', 'e')
         THEN substr(term, 1, length(term) - 3) || 'y'
         WHEN substr(term, -3, 1) IN ('i', 'a', 'o', 'e') THEN term
         ELSE substr(term, 1, length(term) - 1) END
  ELSE substr(term, 1, length(term) - 1)
END"""
    return f"""
WITH {tok_ctes(table)}
SELECT {stem} AS term, count(*) AS cnt
FROM tok GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def auto_stopword_freq(
    max_percent_docs: float, k: int = 20, table: str = "documents"
) -> str:
    """QueryAutoStopWordAnalyzer twin: terms with df > pct * numDocs
    join the stop set; rank the survivors."""
    return f"""
WITH {tok_ctes(table)},
docfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
auto AS (
  SELECT term FROM docfreq
  WHERE df > {max_percent_docs} * (SELECT count(*) FROM {table})
)
SELECT term, count(*) AS cnt FROM tok
WHERE term NOT IN (SELECT term FROM auto)
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def phonetic_freq(k: int = 20, table: str = "documents") -> str:
    """PhoneticFilter(Soundex, inject=false) twin: the exact engine
    pipeline — strip non-letters, H/W transparency after the first
    letter, letter->digit translate, adjacent collapse (incl. the
    first letter's code), vowel-zero strip, pad to 3 digits. Tokens
    with no letters keep their original form, as the filter does."""
    return f"""
WITH {tok_ctes(table)},
c1 AS (
  SELECT term,
         regexp_replace(upper(term), '[^A-Z]', '', 'g') AS clean
  FROM tok
),
c2 AS (
  SELECT term, clean, substr(clean, 1, 1) AS head,
         substr(clean, 1, 1)
           || regexp_replace(substr(clean, 2), '[HW]', '', 'g') AS full2
  FROM c1
),
c3 AS (
  SELECT term, clean, head,
         regexp_extract_all(
           translate(full2, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                     '01230120022455012623010202'), '.') AS ch
  FROM c2
),
c4 AS (
  SELECT term, clean, head,
         array_to_string(
           list_filter(ch, (x, i) -> i = 1 OR x <> ch[i-1]), '')
           AS collapsed
  FROM c3
)
SELECT CASE WHEN clean = '' THEN term
            ELSE head || substr(replace(substr(collapsed, 2), '0', '')
                                  || '000', 1, 3) END AS term,
       count(*) AS cnt
FROM c4 GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def index_split_df(k: int = 20, table: str = "documents") -> str:
    """PKIndexSplitter twin: per-term df on each side of the maxDoc/2
    boundary — the split halves' re-aggregated stats must equal the
    corpus-side counts exactly."""
    return f"""
WITH {tok_ctes(table)},
mid AS (SELECT count(*) // 2 AS m FROM {table}),
sides AS (
  SELECT term,
    count(DISTINCT CASE WHEN doc_id < (SELECT m FROM mid)
                        THEN doc_id END) AS df_lo,
    count(DISTINCT CASE WHEN doc_id >= (SELECT m FROM mid)
                        THEN doc_id END) AS df_hi
  FROM tok GROUP BY term
)
SELECT term, CAST(df_lo AS BIGINT) AS df_lo,
       CAST(df_hi AS BIGINT) AS df_hi
FROM sides ORDER BY df_lo + df_hi DESC, term ASC LIMIT {k}
""".strip()


def compound_freq(k: int = 20, table: str = "documents") -> str:
    """DictionaryCompoundWordTokenFilter twin over synthesized
    compounds (lang||'scan', source||'merge'): originals pass through;
    every dictionary word found at ANY offset (overlapping included,
    via generate_series position scan) joins the stream."""
    dict_words = ["scan", "merge", "en", "es", "de", "fr", "zh", "src"]
    wl = ", ".join(f"('{w}')" for w in dict_words)
    return f"""
WITH toks AS (
  SELECT lang || 'scan' AS tok FROM {table}
  UNION ALL SELECT source || 'merge' FROM {table}
),
dict(w) AS (VALUES {wl}),
subs AS (
  SELECT unnest(list_filter(
           list_transform(
             generate_series(1, length(t.tok) - length(d.w) + 1),
             i -> substr(t.tok, i, length(d.w))),
           s -> s = d.w)) AS term
  FROM toks t CROSS JOIN dict d
  WHERE length(t.tok) >= 5 AND length(d.w) BETWEEN 2 AND 15
),
allt AS (
  SELECT tok AS term FROM toks UNION ALL SELECT term FROM subs
)
SELECT term, count(*) AS cnt FROM allt
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def hyphenation_compound_freq(k: int = 20, table: str = "documents") -> str:
    """HyphenationCompoundWordTokenFilter twin over synthesized
    compounds (lang||'scan', source||'merge', lang||'sscan') with Liang
    patterns '1scan'/'1merge': a single break lands before the first
    embedded pattern word when the token is all letters (a digit makes
    the hyphenator return null — source tokens pass undecomposed).
    Each point pair emits its substring when the dictionary holds it,
    or the substring one char shorter (the genitive-s branch). 'zh' is
    excluded from the dictionary."""
    dict_words = ["en", "es", "de", "fr", "scan", "merge"]
    wl = ", ".join(f"('{w}')" for w in dict_words)
    return f"""
WITH toks AS (
  SELECT lang || 'scan' AS tok FROM {table}
  UNION ALL SELECT source || 'merge' FROM {table}
  UNION ALL SELECT lang || 'sscan' FROM {table}
),
dict(w) AS (VALUES {wl}),
parts AS (
  SELECT tok,
         CASE
           WHEN NOT regexp_matches(tok, '^[a-z]+$') THEN NULL
           WHEN strpos(tok, 'scan') > 1 THEN strpos(tok, 'scan') - 1
           WHEN strpos(tok, 'merge') > 1 THEN strpos(tok, 'merge') - 1
           ELSE NULL
         END AS brk
  FROM toks
),
subs AS (
  -- point pair (0, brk): head, else head one char shorter
  SELECT CASE
           WHEN substr(tok, 1, brk) IN (SELECT w FROM dict)
           THEN substr(tok, 1, brk)
           WHEN substr(tok, 1, brk - 1) IN (SELECT w FROM dict)
           THEN substr(tok, 1, brk - 1)
         END AS term
  FROM parts WHERE brk IS NOT NULL AND brk >= 2
  UNION ALL
  -- point pair (0, len): whole word (never in dict here, kept for
  -- semantic faithfulness)
  SELECT CASE
           WHEN tok IN (SELECT w FROM dict) THEN tok
           WHEN substr(tok, 1, length(tok) - 1) IN (SELECT w FROM dict)
           THEN substr(tok, 1, length(tok) - 1)
         END
  FROM parts WHERE brk IS NOT NULL
  UNION ALL
  -- point pair (brk, len): tail, else tail one char shorter
  SELECT CASE
           WHEN substr(tok, brk + 1) IN (SELECT w FROM dict)
           THEN substr(tok, brk + 1)
           WHEN substr(tok, brk + 1, length(tok) - brk - 1)
                IN (SELECT w FROM dict)
           THEN substr(tok, brk + 1, length(tok) - brk - 1)
         END
  FROM parts WHERE brk IS NOT NULL AND length(tok) - brk >= 2
),
allt AS (
  SELECT tok AS term FROM toks
  UNION ALL SELECT term FROM subs WHERE term IS NOT NULL
)
SELECT term, count(*) AS cnt FROM allt
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def analyzing_wildcard(table: str = "documents") -> str:
    """AnalyzingQueryParser twin: 'tables*' S-stems its fragment to
    'table', so the match set is every doc (after the doc_id%7
    'tables' augmentation) holding a token whose S-stem starts with
    'table'. The CASE replicates EnglishMinimalStemmer.java:25-46:
    keep -us/-ss; 'ies'->'y' unless preceded by a/e; keep -es after
    i/a/o/e; else drop the final s."""
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' tables' ELSE text END
           AS t
  FROM {table}
)
SELECT DISTINCT doc_id FROM aug d
WHERE EXISTS (
  SELECT 1 FROM unnest(string_split(d.t, ' ')) AS u(tok)
  WHERE (CASE
          WHEN length(tok) >= 3 AND tok LIKE '%s'
               AND substr(tok, length(tok) - 1, 1) NOT IN ('u', 's')
          THEN CASE
                 WHEN substr(tok, length(tok) - 1, 1) = 'e'
                 THEN CASE
                        WHEN length(tok) > 3
                             AND substr(tok, length(tok) - 2, 1) = 'i'
                             AND substr(tok, length(tok) - 3, 1)
                                 NOT IN ('a', 'e')
                        THEN substr(tok, 1, length(tok) - 3) || 'y'
                        WHEN substr(tok, length(tok) - 2, 1)
                             IN ('i', 'a', 'o', 'e')
                        THEN tok
                        ELSE substr(tok, 1, length(tok) - 1)
                      END
                 ELSE substr(tok, 1, length(tok) - 1)
               END
          ELSE tok
        END) LIKE 'table%'
)
""".strip()


def pattern_replace_freq(
    pattern: str, repl: str, k: int = 20, table: str = "documents"
) -> str:
    """PatternReplaceFilter (replaceAll) twin: rewrite each post-stop
    term, then count."""
    return f"""
WITH {tok_ctes(table)}
SELECT regexp_replace(term, '{_sq(pattern)}', '{_sq(repl)}', 'g')
         AS term,
       count(*) AS cnt
FROM tok
GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def span_position_range_docs(
    term: str, start: int, end: int, table: str = "documents"
) -> str:
    """SpanPositionRangeQuery twin: engine positions are 0-based,
    rawtok's are 1-based -> p >= start maps to pos >= start+1 and
    p+1 <= end maps to pos <= end."""
    return f"""
WITH {_rawtok(table)}
SELECT DISTINCT doc_id FROM rawtok
WHERE term = '{_sq(term)}'
  AND pos >= {int(start) + 1} AND pos <= {int(end)}
ORDER BY doc_id
""".strip()


def sweetspot_or(
    terms: list[str],
    ln_min: int,
    ln_max: int,
    steepness: float = 0.5,
    k: int = 10,
    table: str = "documents",
) -> str:
    """SweetSpotSimilarity twin (SweetSpotSimilarity.java:125-190,
    default tf factors base=min=0 -> sqrt(tf)): plateau length norm
    over the quantized dl, classic idf/queryNorm/coord."""
    tl = ", ".join(f"'{_sq(t)}'" for t in terms)
    qn_terms = " + ".join(
        f"((SELECT idf FROM idfs WHERE term = '{_sq(t)}') * "
        f"(SELECT idf FROM idfs WHERE term = '{_sq(t)}'))"
        for t in sorted(set(terms))
    )
    maxo = len(set(terms))
    lo, hi, st = float(ln_min), float(ln_max), float(steepness)
    lnorm = (
        f"(1.0 / sqrt({st!r} * (abs(q.q - {lo!r}) + abs(q.q - {hi!r}) "
        f"- ({hi!r} - {lo!r})) + 1.0))"
    )
    return f"""
WITH {tok_ctes(table)},
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok
  WHERE term IN ({tl}) GROUP BY term
),
idfs AS (
  SELECT term,
         ln(CAST((SELECT max_doc FROM coll) AS DOUBLE) / (df + 1.0)) + 1
           AS idf
  FROM dfs
),
tfs AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
partials AS (
  SELECT t.doc_id, t.term,
         sqrt(CAST(t.tf AS DOUBLE)) * (i.idf * i.idf) * {lnorm}
           AS partial
  FROM tfs t
  JOIN idfs i USING (term)
  JOIN dls l USING (doc_id)
  JOIN qdl q ON l.dl BETWEEN q.lo AND q.hi
),
scored AS (
  SELECT doc_id,
         ((1.0 / sqrt({qn_terms}))
          * (CAST(count(DISTINCT term) AS DOUBLE) / {maxo}.0))
         * sum(partial) AS score
  FROM partials GROUP BY doc_id
)
{_topk('scored', k)}
""".strip()


def field_masking_span_docs(
    title_term: str,
    body_term: str,
    slop: int,
    title_chars: int = 80,
    table: str = "documents",
) -> str:
    """FieldMaskingSpanQuery twin: the 'title' field is
    substr(text, 1, title_chars) (the gate's fielded corpus), the
    'body' field the full text; ordered near with cross-field raw
    positions (FieldMaskingSpanQuery.java:30-70). Both sides 1-based,
    so position differences match the engine's 0-based counters."""
    return f"""
WITH t AS (
  SELECT doc_id,
         unnest(regexp_extract_all(
           lower(substr(text, 1, {title_chars})), {PATTERN_LIT})) AS term,
         generate_subscripts(regexp_extract_all(
           lower(substr(text, 1, {title_chars})), {PATTERN_LIT}), 1) AS pos
  FROM {table}
),
b AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term,
         generate_subscripts(
           regexp_extract_all(lower(text), {PATTERN_LIT}), 1) AS pos
  FROM {table}
)
SELECT DISTINCT t.doc_id AS doc_id
FROM t JOIN b ON b.doc_id = t.doc_id
WHERE t.term = '{_sq(title_term)}' AND b.term = '{_sq(body_term)}'
  AND b.pos > t.pos AND (b.pos - t.pos - 1) <= {slop}
ORDER BY doc_id
""".strip()


def spellcheck_jw(
    word: str,
    accuracy: float = 0.7,
    k: int = 5,
    min_prefix: int = 1,
    table: str = "documents",
) -> str:
    """JaroWinkler spellcheck twin — DuckDB's jaro_winkler_similarity
    is bit-equal to JaroWinklerDistance.java (3k-pair fuzz check)."""
    pre = (
        f"AND starts_with(term, '{_sq(word[:min_prefix])}') "
        if min_prefix > 0
        else ""
    )
    return f"""
WITH {tok_ctes(table)},
ts AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df,
       round(jaro_winkler_similarity(term, '{_sq(word)}'), 6) AS sim
FROM ts
WHERE term <> '{_sq(word)}' {pre}
  AND jaro_winkler_similarity(term, '{_sq(word)}') >= {float(accuracy)!r}
ORDER BY sim DESC, df DESC, term ASC LIMIT {k}
""".strip()


def select_fl_func(term: str, k: int = 10, table: str = "documents") -> str:
    """ReturnFields pseudo-field twin: top-k BM25 plus a stored field
    and an aliased function column."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)},
topk AS (
  SELECT doc_id, round(score, 4) AS score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT t.doc_id, t.score, d.lang,
       round(CAST(d.n_chars AS DOUBLE) / 2.0, 4) AS half
FROM topk t JOIN {table} d USING (doc_id)
ORDER BY t.score DESC, t.doc_id
""".strip()


def spellcheck_hf(
    word: str,
    max_edits: int = 2,
    threshold: float = 0.1,
    k: int = 5,
    table: str = "documents",
) -> str:
    """HighFrequencyDictionary-thresholded spellcheck twin: candidates
    need df >= thresh * numDocs (HighFrequencyDictionary.java:35-60)."""
    return f"""
WITH {tok_ctes(table)},
ts AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term)
SELECT term, CAST(df AS BIGINT) AS df,
       levenshtein(term, '{_sq(word)}') AS dist
FROM ts
WHERE term <> '{_sq(word)}'
  AND starts_with(term, '{_sq(word[:1])}')
  AND levenshtein(term, '{_sq(word)}') <= {int(max_edits)}
  AND df >= {float(threshold)!r} * (SELECT max_doc FROM coll)
ORDER BY dist ASC, df DESC, term ASC LIMIT {k}
""".strip()


def leading_wildcard_docs(suffixish: str, table: str = "documents") -> str:
    """Leading-wildcard twin: docs with any term matching the pattern
    (ReversedWildcardFilter semantics are pure query-plan — results
    equal the naive dictionary scan)."""
    rx = "^" + suffixish.replace("*", ".*").replace("?", ".") + "$"
    return (
        f"WITH {tok_ctes(table)} SELECT DISTINCT doc_id FROM tok "
        f"WHERE regexp_matches(term, '{_sq(rx)}') ORDER BY doc_id"
    )


def events_sliding(table: str = "events") -> str:
    """Sliding-window twin: every event belongs to the 3 ten-minute-
    aligned windows of width 30 min covering it (Spark window()
    epoch-aligned semantics)."""
    return f"""
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS b
  FROM {table}
),
w AS (
  SELECT event_type,
         strftime(to_timestamp(b - (k * 600)), '%Y-%m-%d %H:%M:%S')
           AS win_start
  FROM base CROSS JOIN (SELECT unnest(range(3)) AS k)
)
SELECT win_start, event_type, count(*) AS cnt
FROM w GROUP BY win_start, event_type
ORDER BY win_start, event_type
""".strip()


def events_props_json(table: str = "events") -> str:
    """JSON props twin: json_extract + bucket aggregate."""
    return f"""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
         AS k_bucket,
       count(*) AS cnt,
       round(avg(value), 4) AS avg_value
FROM {table}
GROUP BY 1 ORDER BY k_bucket
""".strip()


def func_strdist_jw(lit: str, table: str = "documents") -> str:
    """strdist(lit,source,jw) twin — DuckDB jaro_winkler_similarity is
    bit-equal to JaroWinklerDistance.java (3k-pair fuzz)."""
    return (
        "SELECT doc_id, "
        f"round(jaro_winkler_similarity(source, '{_sq(lit)}'), 6) AS sim "
        f"FROM {table} ORDER BY doc_id"
    )


def highlight_multi_snippets(
    term: str,
    n: int = 3,
    window: int = 3,
    table: str = "documents",
) -> str:
    """hl.snippets twin: token-window fragments per occurrence (1-based
    lambda indices on both engines)."""
    t = _sq(term)
    return f"""
WITH tokd AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), {PATTERN_LIT}) AS toks
  FROM {table}
),
occs AS (
  SELECT doc_id, toks,
         list_slice(
           list_filter(
             list_transform(toks,
               (x, i) -> CASE WHEN x = '{t}' THEN i ELSE 0 END),
             p -> p > 0),
           1, {n}) AS ol
  FROM tokd
  WHERE list_contains(toks, '{t}')
),
ex AS (
  SELECT doc_id, toks,
         generate_subscripts(ol, 1) AS snippet_no,
         unnest(ol) AS pos
  FROM occs
)
SELECT doc_id, snippet_no,
       regexp_replace(
         array_to_string(
           list_slice(toks,
             greatest(1, pos - {window}),
             least(len(toks), pos + {window})),
           ' '),
         '\\b{t}\\b', '<b>{t}</b>', 'g') AS snippet
FROM ex ORDER BY doc_id, snippet_no
""".strip()


def group_topk_offset(
    term: str,
    field: str,
    per_group: int = 2,
    offset: int = 1,
    table: str = "documents",
) -> str:
    """group.offset twin: skip the first N docs inside each group."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([term], table)}
SELECT {field}, doc_id, round(score, 4) AS score FROM (
  SELECT d.{field} AS {field}, s.doc_id, s.score,
         row_number() OVER (
           PARTITION BY d.{field} ORDER BY s.score DESC, s.doc_id ASC
         ) AS rn
  FROM scored s JOIN {table} d USING (doc_id)
) WHERE rn > {offset} AND rn <= {offset + per_group}
ORDER BY {field}, score DESC, doc_id
""".strip()


def select_bq(
    main: str, boost_term: str, k: int = 10, table: str = "documents"
) -> str:
    """DisMax bq twin: membership = main term's matches; score adds the
    boost query's BM25 where it matches (DisMaxQParser.java:92-150)."""
    return f"""
WITH {tok_ctes(table)}, {_scored_cte([main, boost_term], table)},
base AS (SELECT doc_id, score FROM scored WHERE term = '{_sq(main)}'),
bqs AS (SELECT doc_id, score FROM scored
        WHERE term = '{_sq(boost_term)}')
SELECT b.doc_id,
       round(b.score + coalesce(q.score, 0.0), 4) AS score
FROM base b LEFT JOIN bqs q ON q.doc_id = b.doc_id
ORDER BY score DESC, b.doc_id ASC LIMIT {k}
""".strip()


def highlight_alternate(
    term: str,
    max_alt: int = 60,
    fragment_size: int = 100,
    table: str = "documents",
) -> str:
    """hl.alternateField twin: matched docs reuse the highlight
    fragment expression; unmatched docs emit the alternate-field
    prefix with is_alternate=1."""
    import re as _re

    rx = f"(?i)\\b{_re.escape(term)}\\b"
    rx_prefix = f"(?is)^(.*?)\\b{_re.escape(term)}\\b"
    half = fragment_size // 2
    return f"""
SELECT doc_id,
       regexp_replace(
         substr(text,
                CAST(greatest(1,
                     length(regexp_extract(text, '{_sq(rx_prefix)}', 1))
                     + 1 - {half}) AS BIGINT),
                {fragment_size}),
         '{_sq(rx)}', '<b>{_sq(term)}</b>', 'g') AS snippet,
       0 AS is_alternate
FROM {table}
WHERE regexp_matches(text, '{_sq(rx)}')
UNION ALL
SELECT doc_id, substr(text, 1, {max_alt}) AS snippet, 1 AS is_alternate
FROM {table}
WHERE NOT regexp_matches(text, '{_sq(rx)}')
ORDER BY doc_id
""".strip()


def semantic_dedup(
    threshold: float = 0.42,
    n_centroids: int = 16,
    anchor_cap: int = 4096,
) -> str:
    """SemDeDup twin of datapipe.similarity.semantic_dedup: centroid
    seeds = vec_ids < n_centroids, argmax-cosine assignment (ties to
    lower centroid id), then a vector is a duplicate iff a LOWER-id
    same-cluster vector within the anchor cap has exact double cosine
    >= threshold."""
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  WHERE vec_id < {n_centroids}
),
ce AS (
  SELECT cid, unnest(cv) AS c, generate_subscripts(cv, 1) AS i FROM cent
),
e AS (
  SELECT vec_id, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
dots AS (
  SELECT vec_id, cid,
         sum(CAST(v AS DOUBLE) * CAST(c AS DOUBLE)) AS d,
         sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nv,
         sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS nc
  FROM e JOIN ce USING (i) GROUP BY vec_id, cid
),
asg AS (
  SELECT vec_id, cid AS centroid_id FROM (
    SELECT vec_id, cid,
           row_number() OVER (
             PARTITION BY vec_id
             ORDER BY d / (sqrt(nv) * sqrt(nc)) DESC, cid ASC) AS rn
    FROM dots
  ) WHERE rn = 1
),
ranked AS (
  SELECT vec_id, centroid_id,
         row_number() OVER (
           PARTITION BY centroid_id ORDER BY vec_id ASC) AS r
  FROM asg
),
norms AS (
  SELECT vec_id, sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nv
  FROM e GROUP BY vec_id
),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM ranked a JOIN ranked b
    ON a.centroid_id = b.centroid_id
   AND a.vec_id < b.vec_id
   AND a.r <= {anchor_cap}
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
  JOIN norms na ON na.vec_id = a.vec_id
  JOIN norms nb ON nb.vec_id = b.vec_id
  GROUP BY b.vec_id, a.vec_id, na.nv, nb.nv
  HAVING sum(CAST(ea.v AS DOUBLE) * CAST(eb.v AS DOUBLE))
         / (sqrt(na.nv) * sqrt(nb.nv)) >= {float(threshold)}
),
out AS (
  SELECT g.vec_id, g.centroid_id,
         (d.vec_id IS NOT NULL) AS is_dup
  FROM asg g LEFT JOIN dup d USING (vec_id)
)
SELECT vec_id, centroid_id, is_dup FROM out ORDER BY vec_id
""".strip()


def elision_freq(k: int = 20, table: str = "documents") -> str:
    """ElisionFilter twin (ElisionFilter.java:52-74 + FrenchAnalyzer
    DEFAULT_ARTICLES): the gate prepends an elidable ``l'<first-word>``
    and ``qu'<second-word>`` to each doc (the corpus itself has no
    apostrophes), tokenizes, strips the article prefix at the first
    apostrophe, THEN applies the stop filter (reference chain order
    Elision -> LowerCase -> Stop, FrenchAnalyzer.java:194-196)."""
    return f"""
WITH src AS (
  SELECT doc_id,
         concat('l''', list_extract(regexp_extract_all(lower(text),
                    '[a-z0-9_]+'), 1), ' ',
                'qu''', list_extract(regexp_extract_all(lower(text),
                    '[a-z0-9_]+'), 2), ' ',
                text) AS text
  FROM {table}
),
raw AS (
  SELECT unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term
  FROM src
),
elided AS (
  SELECT regexp_replace(term, '^(l|m|t|qu|n|s|j)''', '') AS term
  FROM raw WHERE length(term) <= 255
)
SELECT term, count(*) AS cnt FROM elided
WHERE term NOT IN ({STOP_LIST})
GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def type_token_freq(k: int = 20, table: str = "documents") -> str:
    """TypeTokenFilter whitelist twin (TypeTokenFilter.java:30-55,
    useWhiteList=true, types={{<NUM>}}): the gate appends
    ``<doc_id mod 10>`` and (every third doc) ``3.5`` to each doc's
    text — the corpus has no digits — and keeps only tokens the
    StandardTokenizer types as <NUM> (all-digit runs optionally joined
    by . or ')."""
    return f"""
WITH src AS (
  SELECT doc_id,
         concat(text, ' ', CAST(doc_id % 10 AS VARCHAR),
                CASE WHEN doc_id % 3 = 0 THEN ' 3.5' ELSE '' END) AS text
  FROM {table}
),
raw AS (
  SELECT unnest(regexp_extract_all(lower(text), {PATTERN_LIT})) AS term
  FROM src
)
SELECT term, count(*) AS cnt FROM raw
WHERE length(term) <= 255
  AND regexp_full_match(term, '[0-9]+([.''][0-9]+)*')
GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def lm_perplexity(
    k: int = 20, alpha: float = 0.5, table: str = "documents"
) -> str:
    """Bigram-LM perplexity twin (datapipe/lm.py): add-alpha smoothed
    unigram/bigram model trained on the same corpus; per-doc
    logppl = -(sum log p)/N with the identical operator order."""
    a = repr(float(alpha))
    return f"""
WITH src AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS arr
  FROM {table}
),
src1 AS (SELECT * FROM src WHERE len(arr) > 0),
tok AS (SELECT doc_id, unnest(arr) AS term FROM src1),
uni AS (SELECT term, count(*) AS c1 FROM tok GROUP BY 1),
stats AS (SELECT count(*) AS v, sum(c1) AS t FROM uni),
bg AS (
  SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
  FROM src1, LATERAL unnest(generate_series(1, len(arr) - 1)) AS u(i)
),
bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
firsts AS (
  SELECT s.doc_id,
         ln((coalesce(u.c1, 0) + {a})
            / (st.t + {a} * st.v)) AS lp
  FROM (SELECT doc_id, arr[1] AS term FROM src1) s
  CROSS JOIN stats st
  LEFT JOIN uni u USING (term)
),
rests AS (
  SELECT b.doc_id,
         ln((coalesce(bb.c2, 0) + {a})
            / (coalesce(u.c1, 0) + {a} * st.v)) AS lp
  FROM bg b
  CROSS JOIN stats st
  LEFT JOIN bi bb ON bb.w1 = b.w1 AND bb.w2 = b.w2
  LEFT JOIN uni u ON u.term = b.w1
)
SELECT doc_id, count(*) AS n_tokens,
       -sum(lp) / count(*) AS logppl
FROM (SELECT * FROM firsts UNION ALL SELECT * FROM rests)
GROUP BY 1 ORDER BY logppl DESC, doc_id ASC LIMIT {k}
""".strip()


def dsir_weights(
    k: int = 20,
    num_buckets: int = 4096,
    alpha: float = 0.5,
    target_lang: str = "en",
    table: str = "documents",
) -> str:
    """DSIR hashed-unigram importance-weight twin (datapipe/lm.py):
    target = ``lang = '{target_lang}'`` docs, source = full corpus;
    w(doc) = sum log((ct+a)/(Tt+a*B) / ((cs+a)/(Ts+a*B))) over
    md5-mod-{num_buckets} buckets."""
    a = repr(float(alpha))
    h = _hash60_sql("term") + f" % {num_buckets}"
    return f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM {table}
),
bt AS (SELECT doc_id, lang, {h} AS bucket FROM tok),
srcd AS (SELECT bucket, count(*) AS cs FROM bt GROUP BY 1),
tgtd AS (
  SELECT bucket, count(*) AS ct FROM bt
  WHERE lang = '{target_lang}' GROUP BY 1
),
tots AS (
  SELECT (SELECT sum(cs) FROM srcd) AS ts,
         (SELECT coalesce(sum(ct), 0) FROM tgtd) AS tt
),
ratio AS (
  SELECT coalesce(s.bucket, g.bucket) AS bucket,
         ln(((coalesce(g.ct, 0) + {a}) / (t.tt + {a} * {num_buckets}))
            / ((coalesce(s.cs, 0) + {a})
               / (t.ts + {a} * {num_buckets}))) AS lr
  FROM srcd s FULL OUTER JOIN tgtd g ON s.bucket = g.bucket
  CROSS JOIN tots t
)
SELECT b.doc_id, count(*) AS n_tokens, sum(r.lr) AS logweight
FROM bt b JOIN ratio r ON r.bucket = b.bucket
GROUP BY 1 ORDER BY logweight DESC, doc_id ASC LIMIT {k}
""".strip()


def hunspell_freq(k: int = 20, table: str = "documents") -> str:
    """HunspellStemFilter twin (HunspellStemmer.java:114-167,
    HunspellStemFilter.java:75-108). Gate setup: dictionary = the
    corpus's own distinct raw tokens, every entry flagged A+U; rules
    (crossProduct N, so no recursion):
      SFX A 0 s [^s]   — strip trailing s when the stem doesn't end s
      PFX U 0 un .     — strip leading un
    The gate appends ``<w1>s`` and ``un<w2>`` to each doc so the rules
    actually fire.  Emissions per surviving token: itself if in the
    dictionary, each affix-derived stem whose base is in the
    dictionary, or the token unchanged when no emission fired."""
    return f"""
WITH low AS (SELECT lower(text) AS t FROM {table}),
arrs AS (
  SELECT t, regexp_extract_all(t, '[a-z0-9_]+') AS arr FROM low
),
dic AS (
  SELECT DISTINCT term FROM (
    SELECT unnest(regexp_extract_all(t, {PATTERN_LIT})) AS term FROM low
  ) WHERE length(term) <= 255
),
derived AS (
  SELECT concat(t, ' ', coalesce(arr[1], ''), 's un',
                coalesce(arr[2], '')) AS text
  FROM arrs
),
tok AS (
  SELECT term FROM (
    SELECT unnest(regexp_extract_all(text, {PATTERN_LIT})) AS term
    FROM derived
  ) WHERE length(term) <= 255 AND term NOT IN ({STOP_LIST})
),
flagged AS (
  SELECT term,
         (term IN (SELECT term FROM dic)) AS in_dic,
         (term LIKE '%s' AND length(term) > 1
          AND substr(term, length(term) - 1, 1) <> 's'
          AND substr(term, 1, length(term) - 1)
              IN (SELECT term FROM dic)) AS sfx_ok,
         (term LIKE 'un%' AND length(term) >= 3
          AND substr(term, 3) IN (SELECT term FROM dic)) AS pfx_ok
  FROM tok
),
emit AS (
  SELECT term AS out FROM flagged WHERE in_dic
  UNION ALL
  SELECT substr(term, 1, length(term) - 1) FROM flagged WHERE sfx_ok
  UNION ALL
  SELECT substr(term, 3) FROM flagged WHERE pfx_ok
  UNION ALL
  SELECT term FROM flagged
  WHERE NOT in_dic AND NOT sfx_ok AND NOT pfx_ok
)
SELECT out AS term, count(*) AS cnt FROM emit
GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def line_dedup(
    min_docs: int = 3, table: str = "documents"
) -> str:
    """boilerplate_line_dedup twin: the gate builds 3-line docs
    (full text / a shared footer / a per-doc unique line); lines in
    >= min_docs distinct docs are dropped, text reassembled in order."""
    return f"""
WITH src AS (
  SELECT doc_id,
         concat(text, chr(10), 'subscribe to the newsletter', chr(10),
                list_extract(regexp_extract_all(lower(text),
                    '[a-z0-9_]+'), 1),
                ' unique ', CAST(doc_id AS VARCHAR)) AS text
  FROM {table}
),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM src
),
boiler AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS ldf FROM lines GROUP BY 1
  ) WHERE ldf >= {min_docs}
),
kept AS (
  SELECT * FROM lines
  WHERE line NOT IN (SELECT line FROM boiler)
),
agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY 1
)
SELECT d.doc_id, coalesce(a.text, '') AS text
FROM (SELECT DISTINCT doc_id FROM lines) d
LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
""".strip()


def span_dedup(k: int = 8, table: str = "documents") -> str:
    """duplicate_span_removal twin (ExactSubstr, Lee et al. 2022):
    the gate plants a 10-token slogan on even doc_ids; every token
    covered by a k-shingle occurring >1 time in the corpus is removed
    and the survivors space-joined in order."""
    slogan = "zeta eta theta iota kappa lambda mu nu xi omicron"
    return f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN concat(text, ' ', '{slogan}') ELSE text END AS text
  FROM {table}
),
src AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z0-9_]+') AS arr
  FROM planted
),
sh AS (
  SELECT doc_id, i - 1 AS start,
         array_to_string(list_slice(arr, i, i + {k} - 1), ' ') AS s
  FROM src, LATERAL unnest(generate_series(1, len(arr) - {k} + 1))
       AS u(i)
  WHERE len(arr) >= {k}
),
dup AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) > 1
),
cov AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT sh.doc_id,
           unnest(generate_series(sh.start, sh.start + {k} - 1)) AS p
    FROM sh JOIN dup USING (s)
  )
),
tok AS (
  SELECT doc_id, unnest(arr) AS term,
         generate_subscripts(arr, 1) - 1 AS pos
  FROM src
),
kept AS (
  SELECT t.doc_id, t.term, t.pos FROM tok t
  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.pos
  WHERE c.doc_id IS NULL
),
agg AS (
  SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS text
  FROM kept GROUP BY 1
)
SELECT s.doc_id, coalesce(a.text, '') AS text
FROM src s LEFT JOIN agg a USING (doc_id)
ORDER BY s.doc_id
""".strip()


def wikipedia_freq(k: int = 20, table: str = "documents") -> str:
    """WikipediaTokenizer twin: the gate wraps each doc in synthesized
    markup — ``== <source> == [[<w1>]] '''<w2>'''
    [http://example.com/<source> <w3>] [[Category:<lang>]] <text>`` —
    so the twin can enumerate the typed emissions directly from the
    columns: heading=source(h), link=w1(il), bold=w2(b), URL(elu),
    label=w3(el), category=lang(c), plus the body tokens (ALPHANUM)."""
    return f"""
WITH arrs AS (
  SELECT doc_id, lang, source, lower(text) AS t,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
  FROM {table}
),
emit AS (
  SELECT 'h' AS type, lower(source) AS term FROM arrs
  UNION ALL
  SELECT 'il', list_extract(arr, 1) FROM arrs
  WHERE list_extract(arr, 1) IS NOT NULL
  UNION ALL
  SELECT 'b', list_extract(arr, 2) FROM arrs
  WHERE list_extract(arr, 2) IS NOT NULL
  UNION ALL
  SELECT 'elu', concat('http://example.com/', lower(source))
  FROM arrs
  UNION ALL
  SELECT 'el', list_extract(arr, 3) FROM arrs
  WHERE list_extract(arr, 3) IS NOT NULL
  UNION ALL
  SELECT 'c', lower(lang) FROM arrs
  UNION ALL
  SELECT '<ALPHANUM>', unnest(arr) FROM arrs
)
SELECT type, term, count(*) AS cnt FROM emit
GROUP BY 1, 2 ORDER BY cnt DESC, type ASC, term ASC LIMIT {k}
""".strip()


def url_email_freq(k: int = 20, table: str = "documents") -> str:
    """UAX29URLEmailTokenizer twin: the gate appends
    ``<w1>@example.com https://example.org/<w2>`` to each doc; URLs and
    emails emit whole with their types, body tokens are <ALPHANUM>."""
    return f"""
WITH arrs AS (
  SELECT doc_id, lower(text) AS t,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
  FROM {table}
),
emit AS (
  SELECT '<EMAIL>' AS type,
         concat(list_extract(arr, 1), '@example.com') AS term
  FROM arrs WHERE list_extract(arr, 1) IS NOT NULL
  UNION ALL
  SELECT '<URL>',
         concat('https://example.org/', list_extract(arr, 2))
  FROM arrs WHERE list_extract(arr, 2) IS NOT NULL
  UNION ALL
  SELECT '<ALPHANUM>', unnest(regexp_extract_all(t, {PATTERN_LIT}))
  FROM arrs
)
SELECT type, term, count(*) AS cnt FROM emit
WHERE length(term) <= 255
GROUP BY 1, 2 ORDER BY cnt DESC, type ASC, term ASC LIMIT {k}
""".strip()


def gopher_rules(table: str = "documents") -> str:
    """with_gopher_rules twin (Rae et al. 2021 §A1.1): per-doc rule
    booleans + verdict, identical thresholds and counting."""
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    stop_sum = " + ".join(
        f"CASE WHEN regexp_matches(text, '(^|\\s){w}(\\s|$)') "
        "THEN 1 ELSE 0 END"
        for w in stops
    )
    return f"""
WITH base AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '[^\\s]+')) AS DOUBLE)
           AS nw,
         CAST(len(string_split(text, chr(10))) AS DOUBLE) AS nl,
         regexp_extract_all(text, '[^\\s]+') AS words,
         string_split(text, chr(10)) AS lines
  FROM {table}
),
feat AS (
  SELECT doc_id, nw, nl,
         length(regexp_replace(text, '\\s+', '', 'g'))
           / greatest(nw, 1.0) AS mean_len,
         CAST(length(text) - length(replace(text, '#', ''))
              AS DOUBLE) AS n_hash,
         CAST(len(regexp_extract_all(text, '\\.\\.\\.'))
              AS DOUBLE) AS n_ellipsis,
         CAST(len(list_filter(lines,
              x -> regexp_matches(x, '^\\s*([-*•])')))
              AS DOUBLE) AS n_bullet,
         ({stop_sum}) AS n_stops,
         CAST(len(list_filter(words,
              x -> regexp_matches(x, '[A-Za-z]')))
              AS DOUBLE) AS n_alpha
  FROM base
)
SELECT doc_id,
       nw >= 50 AND nw <= 100000 AS gr_word_count,
       mean_len >= 3.0 AND mean_len <= 10.0 AS gr_mean_word_len,
       n_hash / greatest(nw, 1.0) <= 0.1 AS gr_hash_ratio,
       n_ellipsis / greatest(nl, 1.0) <= 0.3 AS gr_ellipsis_ratio,
       n_bullet / greatest(nl, 1.0) <= 0.9 AS gr_bullet_ratio,
       n_stops >= 2 AS gr_stop_presence,
       n_alpha / greatest(nw, 1.0) >= 0.8 AS gr_alpha_ratio,
       (nw >= 50 AND nw <= 100000)
         AND (mean_len >= 3.0 AND mean_len <= 10.0)
         AND (n_hash / greatest(nw, 1.0) <= 0.1)
         AND (n_ellipsis / greatest(nl, 1.0) <= 0.3)
         AND (n_bullet / greatest(nl, 1.0) <= 0.9)
         AND (n_stops >= 2)
         AND (n_alpha / greatest(nw, 1.0) >= 0.8) AS gopher_pass
FROM feat ORDER BY doc_id
""".strip()


def c4_filters(table: str = "documents") -> str:
    """with_c4_filters twin (Raffel et al. 2020 §2.2): the gate gives
    every third doc a sentence-punctuated tail so the line/sentence
    rules discriminate."""
    return f"""
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN concat(text, '. done. yes. ok.')
              ELSE text END AS text
  FROM {table}
),
feat AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '[^\\s]+')) AS nw,
         CAST(len(string_split(text, chr(10))) AS DOUBLE) AS nl,
         CAST(len(list_filter(string_split(text, chr(10)),
              x -> regexp_matches(x, '[.!?"'']\\s*$')))
              AS DOUBLE) AS n_good,
         len(regexp_extract_all(text, '[.!?]+')) AS n_sent
  FROM src
)
SELECT doc_id,
       nw >= 5 AS c4_min_words,
       NOT contains(lower(text), 'lorem ipsum') AS c4_no_lorem,
       NOT contains(text, '{{') AS c4_no_braces,
       n_good / greatest(nl, 1.0) >= 0.5 AS c4_no_badlines,
       n_sent >= 3 AS c4_min_sentences,
       (nw >= 5) AND NOT contains(lower(text), 'lorem ipsum')
         AND NOT contains(text, '{{')
         AND (n_good / greatest(nl, 1.0) >= 0.5)
         AND (n_sent >= 3) AS c4_pass
FROM feat ORDER BY doc_id
""".strip()


def reversed_freq(k: int = 20, table: str = "documents") -> str:
    """ReverseStringFilter twin: reverse() over the post-stop stream."""
    return f"""
WITH {tok_ctes(table)}
SELECT reverse(term) AS term, count(*) AS cnt
FROM tok GROUP BY 1 ORDER BY cnt DESC, term ASC LIMIT {k}
""".strip()


def gopher_repetition(table: str = "documents") -> str:
    """with_gopher_repetition twin (Rae et al. 2021 §A1.2): the gate
    appends a duplicated ``<w1> <w2> <w1> <w2>`` line twice on every
    fourth doc; identical per-doc list arithmetic."""
    return f"""
WITH arr0 AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS a0
  FROM {table}
),
src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN
           concat(text, chr(10),
                  a0[1], ' ', a0[2], ' ', a0[1], ' ', a0[2], chr(10),
                  a0[1], ' ', a0[2], ' ', a0[1], ' ', a0[2])
         ELSE text END AS text
  FROM arr0
),
base AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM src
),
grams AS (
  SELECT doc_id, lines, toks,
         CASE WHEN len(toks) >= 2 THEN
           list_transform(generate_series(1, len(toks) - 1),
             i -> concat(toks[i], ' ', toks[i + 1]))
         ELSE [] END AS g2,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
             i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))
         ELSE [] END AS g3
  FROM base
),
feat AS (
  SELECT doc_id,
         CAST(len(lines) AS DOUBLE) AS nl,
         CAST(len(list_distinct(lines)) AS DOUBLE) AS nld,
         CAST(list_sum(list_transform(lines, x -> length(x)))
              AS DOUBLE) AS line_chars,
         CAST(coalesce(list_sum(list_transform(lines,
              l -> CASE WHEN len(list_filter(lines, x -> x = l)) > 1
                        THEN length(l) ELSE 0 END)), 0)
              AS DOUBLE) AS dup_line_chars,
         CAST(coalesce(list_sum(list_transform(toks,
              x -> length(x))), 0) AS DOUBLE) AS tok_chars,
         g2, g3
  FROM grams
),
tops AS (
  SELECT doc_id, nl, nld, line_chars, dup_line_chars, tok_chars, g2,
         g3,
         CASE WHEN len(g2) > 0 THEN
           list_max(list_transform(list_distinct(g2),
             g -> len(list_filter(g2, x -> x = g))))
         ELSE 0 END AS top2_cnt
  FROM feat
)
SELECT doc_id,
       CASE WHEN nl <= 0 THEN 0.0 ELSE 1.0 - nld / nl END
         AS rep_dup_line_frac,
       CASE WHEN line_chars <= 0 THEN 0.0
            ELSE dup_line_chars / line_chars END
         AS rep_dup_line_char_frac,
       CASE WHEN len(g2) <= 0 OR tok_chars <= 0 THEN 0.0
            ELSE CAST(top2_cnt AS DOUBLE)
                 * (length(list_max(list_filter(list_distinct(g2),
                     g -> len(list_filter(g2, x -> x = g))
                          = top2_cnt))) - 1)
                 / tok_chars END
         AS rep_top2gram_char_frac,
       CASE WHEN coalesce(list_sum(list_transform(g3,
                 x -> length(x) - 2)), 0) <= 0 THEN 0.0
            ELSE CAST(coalesce(list_sum(list_transform(g3,
                 g -> CASE WHEN len(list_filter(g3, x -> x = g)) > 1
                      THEN length(g) - 2 ELSE 0 END)), 0) AS DOUBLE)
                 / list_sum(list_transform(g3, x -> length(x) - 2))
            END
         AS rep_dup3gram_char_frac
FROM tops ORDER BY doc_id
""".strip()


def collocations_pmi(
    min_count: int = 5, k: int = 20, table: str = "documents"
) -> str:
    """pmi_collocations twin: identical count model + PMI arithmetic."""
    return f"""
WITH src AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS arr
  FROM {table}
),
tok AS (SELECT unnest(arr) AS term FROM src),
uni AS (SELECT term, count(*) AS c1 FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS t FROM uni),
bg AS (
  SELECT arr[i] AS w1, arr[i + 1] AS w2
  FROM src, LATERAL unnest(generate_series(1, len(arr) - 1)) AS u(i)
),
bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
t2 AS (SELECT CAST(sum(c2) AS DOUBLE) AS t2 FROM bi)
SELECT b.w1, b.w2, b.c2,
       ln((b.c2 / t2.t2)
          / ((ua.c1 / tot.t) * (ub.c1 / tot.t))) AS pmi
FROM bi b
JOIN uni ua ON ua.term = b.w1
JOIN uni ub ON ub.term = b.w2
CROSS JOIN tot CROSS JOIN t2
WHERE b.c2 >= {min_count}
ORDER BY pmi DESC, b.w1 ASC, b.w2 ASC LIMIT {k}
""".strip()


def keywords_tfidf(
    top_k: int = 3, table: str = "documents", limit_docs: int = 50
) -> str:
    """tfidf_keywords twin over the first ``limit_docs`` doc_ids:
    score = tf * ln(N/df), row_number per doc by (score desc, term)."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+'))
           AS term
  FROM {table}
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}),
scored AS (
  SELECT t.doc_id, t.term,
         t.tf * ln(n.n / d.df) AS score
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, score FROM ranked
WHERE rank <= {top_k} AND doc_id < {limit_docs}
ORDER BY doc_id, rank
""".strip()


def conv_windows(budget: int = 64, table: str = "documents") -> str:
    """pack_conversation_windows twin over the derived transcript
    frame (conv_id = 'c' || doc_id // 10, turn_idx = doc_id % 10):
    greedy in-order window walk as a recursive CTE."""
    return f"""
WITH RECURSIVE t AS (
  SELECT concat('c', CAST(doc_id // 10 AS VARCHAR)) AS conv_id,
         CAST(doc_id % 10 AS BIGINT) AS turn_idx,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id // 10
                            ORDER BY doc_id % 10) AS rn
  FROM {table}
),
rec AS (
  SELECT conv_id, rn, turn_idx, n_tokens,
         CAST(0 AS BIGINT) AS window_idx, n_tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.conv_id, t.rn, t.turn_idx, t.n_tokens,
         CASE WHEN rec.fill > 0 AND rec.fill + t.n_tokens > {budget}
              THEN rec.window_idx + 1 ELSE rec.window_idx END,
         CASE WHEN rec.fill > 0 AND rec.fill + t.n_tokens > {budget}
              THEN t.n_tokens ELSE rec.fill + t.n_tokens END
  FROM rec JOIN t ON t.conv_id = rec.conv_id AND t.rn = rec.rn + 1
)
SELECT conv_id, turn_idx, n_tokens, window_idx FROM rec
ORDER BY conv_id, turn_idx
""".strip()


def role_stats(table: str = "documents") -> str:
    """Role-conditioned transcript stats twin over the same derived
    frame (role = user/assistant by turn parity)."""
    return f"""
SELECT CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END
         AS role,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
            AS BIGINT) AS n_tokens,
       CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
            AS DOUBLE) / count(*) AS avg_tokens
FROM {table} GROUP BY 1 ORDER BY role
""".strip()


def tool_bigrams(table: str = "documents", top_k: int = 12) -> str:
    """Tool-sequence mining twin over the same derived transcript
    frame (assistant turns pick search/code/browse/none by
    ((doc_id//2)^2 + doc_id//10) %% 4): consecutive non-'none' tool
    pairs per conversation via lead()."""
    return f"""
WITH t AS (
  SELECT concat('c', CAST(doc_id // 10 AS VARCHAR)) AS conv_id,
         doc_id % 10 AS turn_idx,
         CASE WHEN doc_id % 2 = 1 THEN
           CASE CAST(((doc_id // 2) * (doc_id // 2) + doc_id // 10) % 4
                     AS INTEGER)
             WHEN 0 THEN 'search' WHEN 1 THEN 'code'
             WHEN 2 THEN 'browse' WHEN 3 THEN 'none' END
         END AS tool
  FROM {table}
), p AS (
  SELECT tool AS first_tool,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS next_tool
  FROM t WHERE tool IS NOT NULL AND tool <> 'none'
)
SELECT first_tool, next_tool, CAST(count(*) AS BIGINT) AS n_pairs
FROM p WHERE next_tool IS NOT NULL
GROUP BY 1, 2
ORDER BY n_pairs DESC, first_tool, next_tool
LIMIT {top_k}
""".strip()


def turn_latency(table: str = "documents") -> str:
    """Per-tool assistant response-latency twin over the same derived
    transcript frame (ts = 1700000000 + doc_id*60 + doc_id^2 %% 37
    epoch seconds): lag() gap per conversation, stats per tool."""
    return f"""
WITH t AS (
  SELECT concat('c', CAST(doc_id // 10 AS VARCHAR)) AS conv_id,
         doc_id % 10 AS turn_idx,
         CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END
           AS role,
         CASE WHEN doc_id % 2 = 1 THEN
           CASE CAST(((doc_id // 2) * (doc_id // 2) + doc_id // 10) % 4
                     AS INTEGER)
             WHEN 0 THEN 'search' WHEN 1 THEN 'code'
             WHEN 2 THEN 'browse' WHEN 3 THEN 'none' END
         END AS tool,
         1700000000 + doc_id * 60 + (doc_id * doc_id) % 37 AS ts_s
  FROM {table}
), l AS (
  SELECT role, tool,
         ts_s - lag(ts_s) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS lat
  FROM t
)
SELECT coalesce(tool, '(none)') AS tool,
       CAST(count(*) AS BIGINT) AS n_turns,
       round(avg(lat), 4) AS avg_latency_sec,
       CAST(max(lat) AS BIGINT) AS max_latency_sec
FROM l WHERE role = 'assistant' AND lat IS NOT NULL
GROUP BY 1 ORDER BY tool
""".strip()


def conv_dedup(table: str = "documents") -> str:
    """Conversation-level exact dedup twin: md5 over the turn texts
    concatenated in turn order; groups with >1 conversation.  The gate
    doubles the conversations so collisions exist."""
    return f"""
WITH t AS (
  SELECT concat('c', CAST(doc_id // 10 AS VARCHAR)) AS conv_id,
         doc_id % 10 AS turn_idx, text
  FROM {table}
  UNION ALL
  SELECT concat('d', CAST(doc_id // 10 AS VARCHAR)),
         doc_id % 10, text
  FROM {table}
),
sig AS (
  SELECT conv_id,
         md5(string_agg(text, chr(30) ORDER BY turn_idx)) AS conv_sig
  FROM t GROUP BY 1
)
SELECT conv_sig, CAST(count(*) AS BIGINT) AS n_dups,
       min(conv_id) AS keep_conv
FROM sig GROUP BY 1 HAVING count(*) > 1
ORDER BY conv_sig
""".strip()


def lm_backoff(
    k: int = 20, alpha: float = 0.4, table: str = "documents"
) -> str:
    """score_stupid_backoff twin (Brants et al. 2007): identical
    count model, CASE cascade, and floor."""
    a = repr(float(alpha))
    return f"""
WITH src AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS arr
  FROM {table}
),
tok AS (SELECT unnest(arr) AS term FROM src),
uni AS (SELECT term, count(*) AS c1 FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS t FROM uni),
bg AS (
  SELECT arr[i] AS w1, arr[i + 1] AS w2
  FROM src, LATERAL unnest(generate_series(1, len(arr) - 1)) AS u(i)
),
bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
tg AS (
  SELECT arr[i] AS w1, arr[i + 1] AS w2, arr[i + 2] AS w3
  FROM src, LATERAL unnest(generate_series(1, len(arr) - 2)) AS u(i)
  WHERE len(arr) >= 3
),
tri AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg GROUP BY 1, 2, 3),
trips AS (
  SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2, arr[i + 2] AS w3
  FROM src, LATERAL unnest(generate_series(1, len(arr) - 2)) AS u(i)
  WHERE len(arr) >= 3
),
scored AS (
  SELECT p.doc_id,
         ln(CASE
              WHEN tr.c3 IS NOT NULL
                THEN tr.c3 / bctx.c2
              WHEN bhi.c2 IS NOT NULL
                THEN {a} * bhi.c2 / umid.c1
              WHEN ulast.c1 IS NOT NULL
                THEN {a} * {a} * ulast.c1 / tot.t
              ELSE {a} * {a} / tot.t
            END) AS ls
  FROM trips p
  CROSS JOIN tot
  LEFT JOIN tri tr ON tr.w1 = p.w1 AND tr.w2 = p.w2 AND tr.w3 = p.w3
  LEFT JOIN bi bctx ON bctx.w1 = p.w1 AND bctx.w2 = p.w2
  LEFT JOIN bi bhi ON bhi.w1 = p.w2 AND bhi.w2 = p.w3
  LEFT JOIN uni umid ON umid.term = p.w2
  LEFT JOIN uni ulast ON ulast.term = p.w3
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
       sum(ls) / count(*) AS logscore
FROM scored GROUP BY 1
ORDER BY logscore ASC, doc_id ASC LIMIT {k}
""".strip()


def embed_outliers(k: int = 20, table: str = "embeddings") -> str:
    """embedding_outliers twin: identical per-(label, dim) centroid +
    squared-distance arithmetic (embedding FLOAT[] cast to DOUBLE at
    the unnest, matching Spark's float->double promotion in avg/sum)."""
    return f"""
WITH dims AS (
  SELECT vec_id, label AS grp,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM {table}
),
cent AS (
  SELECT grp, dim, avg(val) AS mu FROM dims GROUP BY 1, 2
)
SELECT d.vec_id, d.grp, sum((d.val - c.mu) * (d.val - c.mu)) AS dist2
FROM dims d JOIN cent c ON c.grp = d.grp AND c.dim = d.dim
GROUP BY 1, 2 ORDER BY dist2 DESC, d.vec_id ASC LIMIT {k}
""".strip()
