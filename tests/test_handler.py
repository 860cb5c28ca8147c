"""Select-handler tests: cursorMark deep paging and facet options
(mincount / prefix / offset / sort=index, SimpleFacets.java:205-423)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.handler import select


@pytest.fixture(scope="module")
def searcher(tiny_index):
    return Searcher(tiny_index)


def _rows(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 6)) for r in df.collect()]


def test_cursor_pages_equal_offset_pages(searcher):
    """Three cursorMark pages must equal the offset-windowed pages, and
    each cursor page collects exactly `rows` rows (searchAfter keyset
    predicate — O(rows) per page at any depth)."""
    rows = 4
    n_pages = 3
    offset_pages = []
    for p in range(n_pages):
        out = select(searcher, q="error", start=p * rows, rows=rows)
        offset_pages.append(_rows(out["response"]))
    cursor_pages = []
    mark = "*"
    for _ in range(n_pages):
        out = select(searcher, q="error", rows=rows, cursor_mark=mark)
        cursor_pages.append(_rows(out["response"]))
        mark = out["next_cursor_mark"]
        assert mark is not None
    assert cursor_pages == offset_pages
    assert len(cursor_pages[0]) == rows, "fixture must fill page one"


def test_start_offset_is_plan_side(searcher):
    """start=N must window inside the plan (DataFrame.offset), matching
    a full-order slice — no Python-side collect of start+rows rows."""
    full = _rows(select(searcher, q="error", rows=100)["response"])
    page = _rows(select(searcher, q="error", start=10, rows=5)["response"])
    assert page == full[10:15]


def test_cursor_requires_score_sort(searcher):
    with pytest.raises(ValueError):
        select(searcher, q="error", sort="n_chars desc", cursor_mark="*")
    with pytest.raises(ValueError):
        select(searcher, q="error", start=5, cursor_mark="*")


def _facet(searcher, **kw):
    out = select(searcher, q="error", facet_field=["role"], **kw)
    return [(r["role"], int(r["cnt"])) for r in out["facets"]["role"].collect()]


def test_facet_options(searcher):
    base = dict(_facet(searcher, facet_limit=100))
    assert len(base) >= 2
    counts = sorted(base.values())
    floor = counts[-1]  # keep only the top bucket(s)
    got = _facet(searcher, facet_limit=100, facet_mincount=floor)
    assert got and all(c >= floor for _, c in got)
    assert dict(got) == {v: c for v, c in base.items() if c >= floor}
    # sort=index: lexicographic by value regardless of count
    idx = _facet(searcher, facet_limit=100, facet_sort="index")
    assert [v for v, _ in idx] == sorted(base.keys())
    # offset pages into the index-sorted buckets
    off = _facet(
        searcher, facet_limit=2, facet_offset=1, facet_sort="index"
    )
    assert off == idx[1:3]
    # prefix keeps only matching values
    pfx = sorted(base.keys())[0][0]  # first char of first value
    got_p = _facet(searcher, facet_limit=100, facet_prefix=pfx)
    assert got_p == [(v, c) for v, c in _facet(searcher, facet_limit=100)
                     if str(v).startswith(pfx)]


def test_pivot_facets_tree(searcher):
    """pivot_facets: level-k node counts must roll up — each level-2
    node's count sums to its level-1 parent's count."""
    from lucene_solr_spark.search.handler import pivot_facets

    out = pivot_facets(searcher, "error", ["role", "tool"])
    rows = [(r["level"], r["path"], int(r["cnt"])) for r in out.collect()]
    l1 = {p: c for lvl, p, c in rows if lvl == 1}
    l2 = {p: c for lvl, p, c in rows if lvl == 2}
    assert l1 and l2
    # children sum to parents (every match has role and tool columns)
    import collections

    child_sums = collections.Counter()
    for p, c in l2.items():
        child_sums[p.rsplit("/", 1)[0]] += c
    assert dict(child_sums) == l1


def test_facet_range_fractional_gap_and_order(searcher):
    """Fractional start/gap must keep distinct buckets (the r4 advice
    fix: grouping on the numeric bound, not a long-cast label) and
    rows come back in range order: before, buckets ascending, after."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.handler import facet_range

    s = searcher
    docs = s.index.docs
    # derive a fractional column both buckets land on: dl/2 offsets
    s.index.docs = docs.withColumn(
        "frac", (F.col("doc_id") % 4).cast("double") / 2.0
    )
    try:
        out = facet_range(
            s, "error", "frac", start=0.0, end=2.0, gap=0.5, other=True
        ).collect()
    finally:
        s.index.docs = docs
    buckets = [r["bucket"] for r in out]
    # 0.5-wide buckets stay distinct ('0', '0.5', '1', '1.5'), never
    # merged into '0'/'1'; structural order: before first, after last
    assert buckets[0] == "before" and buckets[-1] == "after"
    inner = buckets[1:-1]
    assert "0.5" in inner and "1.5" in inner, buckets
    assert inner == sorted(inner, key=float)


def test_sort_spec_splits_outside_parens():
    from lucene_solr_spark.search.handler import _split_sort_spec

    assert _split_sort_spec(
        "recip(n_chars,1,1000,1000) asc, n_chars desc"
    ) == ["recip(n_chars,1,1000,1000) asc", "n_chars desc"]
    assert _split_sort_spec("score desc") == ["score desc"]


def test_facet_missing_and_unlimited(spark, searcher):
    """facet.missing appends the NULL count exempt from limit/mincount;
    NULL values never form a value bucket; facet.limit=-1 = unlimited."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.handler import select

    fd = searcher.index.docs.select(
        "doc_id", F.expr("nullif(role, 'user')").alias("role_n")
    )
    out = select(
        searcher,
        q="error",
        facet_field=["role_n"],
        facet_limit=-1,
        facet_missing=True,
        facet_docs=fd,
        facet_mincount=10**9,  # kills every VALUE bucket
    )
    rows = out["facets"]["role_n"].collect()
    # only the missing row survives mincount, and it has a null key
    assert len(rows) == 1 and rows[0]["role_n"] is None
    assert rows[0]["cnt"] > 0


def test_fq_local_params_dispatch(searcher):
    """{!frange}/{!lucene} fq entries route through the QParserPlugin
    dispatch and compose with plain SQL fq; parse_local_params handles
    quoted values and plain SQL passthrough."""
    from lucene_solr_spark.search.handler import (
        parse_local_params,
        select,
    )

    assert parse_local_params("lang = 'en'") is None
    t, p, b = parse_local_params("{!frange l='0.5' u=2}sum(n_chars,1)")
    assert (t, p["l"], p["u"], b) == (
        "frange", "0.5", "2", "sum(n_chars,1)"
    )

    base = select(searcher, q="error", rows=50)["response"].collect()
    out = select(
        searcher,
        q="error",
        fq=["{!frange l=1}turn_idx", "{!lucene}retry"],
        rows=50,
    )["response"].collect()
    assert out, "filtered result must be non-empty for a common pair"
    assert len(out) <= len(base)
    base_scores = {r["doc_id"]: r["score"] for r in base}
    surviving = {r["doc_id"] for r in out}
    for r in out:
        # non-scoring filters: scores unchanged where doc survives
        if r["doc_id"] in base_scores:
            assert r["score"] == base_scores[r["doc_id"]]
    # the frange filter really applied
    kept_turns = {
        r["doc_id"]: r["turn_idx"]
        for r in searcher.index.docs.select(
            "doc_id", "turn_idx"
        ).collect()
        if r["doc_id"] in surviving
    }
    assert all(v >= 1 for v in kept_turns.values())


def test_explain_self_consistent(searcher):
    """CheckHits.verifyExplanation's core property: the per-doc sum of
    clause explanations equals the ranking score; the nested
    explain_doc tree totals the same."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.explain import explain, explain_doc
    from lucene_solr_spark.search.query import BooleanClause, BooleanQuery, TermQuery

    terms = ["error", "retry"]
    e = explain(searcher, terms)
    summed = {
        r["doc_id"]: r["s"]
        for r in e.groupBy("doc_id")
        .agg(F.sum("score_part").alias("s"))
        .collect()
    }
    q = BooleanQuery([BooleanClause(TermQuery(t), "SHOULD") for t in terms])
    scores = {
        r["doc_id"]: r["score"] for r in searcher.score(q)
        .groupBy("doc_id").agg(F.sum("score").alias("score")).collect()
    }
    assert summed and set(summed) == set(scores)
    for d, s in summed.items():
        assert abs(s - scores[d]) <= 1e-9 * max(1.0, abs(scores[d]))
    # nested single-hit tree mirrors the flat rows
    some_doc = next(iter(summed))
    tree = explain_doc(searcher, terms, some_doc)
    assert abs(tree["value"] - summed[some_doc]) <= 1e-12
    leaf = tree["details"][0]["details"][1]["details"]
    assert [d["description"] for d in leaf] == [
        "freq", "parameter k1", "parameter b",
        "avgFieldLength", "fieldLength",
    ]


def test_qparser_plugin_registry_dispatch(searcher, tiny_pdf):
    """{!field}/{!prefix}/{!raw}/{!query}/{!join} route through the
    QParserPlugin registry analogue (FieldQParserPlugin.java,
    PrefixQParserPlugin.java, RawQParserPlugin.java,
    NestedQParserPlugin.java, JoinQParserPlugin.java)."""
    from lucene_solr_spark.search.handler import _fq_doc_ids, select

    def brute(pred):
        from lucene_solr_spark.analysis.tokenizer import analyze

        return sorted(
            int(d)
            for d, t in zip(tiny_pdf["doc_id"], tiny_pdf["text"])
            if pred(analyze(t)[0])
        )

    def got(expr):
        return sorted(
            r["doc_id"] for r in _fq_doc_ids(searcher, expr).collect()
        )

    # {!field} single token == analyzed term query
    assert got("{!field f=text}Merge") == brute(lambda ts: "merge" in ts)
    # {!field} on a non-text column = exact value, no analysis
    roles = set(tiny_pdf["role"])
    some_role = sorted(roles)[0]
    assert got("{!field f=role}" + some_role) == sorted(
        int(d)
        for d, r in zip(tiny_pdf["doc_id"], tiny_pdf["role"])
        if r == some_role
    )
    # {!prefix} — no analysis of the body
    assert got("{!prefix f=text}shar") == brute(
        lambda ts: any(t.startswith("shar") for t in ts)
    )
    # {!raw} — exact term, never analyzed: uppercase matches nothing
    assert got("{!raw f=text}Merge") == []
    assert got("{!raw f=text}merge") == brute(lambda ts: "merge" in ts)
    # {!term} — readableToIndexed: numeric columns compare as their
    # native type (TermQParserPlugin.java:40-62), text like {!raw}
    assert got("{!term f=turn_idx}2") == sorted(
        int(d)
        for d, t in zip(tiny_pdf["doc_id"], tiny_pdf["turn_idx"])
        if int(t) == 2
    )
    assert got("{!term f=text}Merge") == []
    assert got("{!term f=text}merge") == brute(lambda ts: "merge" in ts)
    # {!query v=...} re-enters the registry
    assert got("{!query v='{!prefix f=text}shar'}") == got(
        "{!prefix f=text}shar"
    )
    # {!join}: docs sharing conv_id with any 'error' match
    convs = {
        c
        for c, t in zip(tiny_pdf["conv_id"], tiny_pdf["text"])
        if "error" in __import__(
            "lucene_solr_spark.analysis.tokenizer",
            fromlist=["analyze"],
        ).analyze(t)[0]
    }
    want = sorted(
        int(d)
        for d, c in zip(tiny_pdf["doc_id"], tiny_pdf["conv_id"])
        if c in convs
    )
    assert got("{!join from=conv_id to=conv_id}error") == want
    # q-side {!boost}: same membership as the bare query, scaled scores
    base = select(searcher, q="error", rows=50)["response"].collect()
    boosted = select(
        searcher,
        q="{!boost b=recip(turn_idx,1,1000,1000)}error",
        rows=50,
    )["response"].collect()
    bs = {r["doc_id"]: r["score"] for r in base}
    assert {r["doc_id"] for r in boosted} == set(bs)


def test_sort_missing_first_last(spark):
    """sortMissingLast/sortMissingFirst placement
    (MissingStringLastComparatorSource.java; default = missing sorts
    lowest, like Lucene's string ords)."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.handler import _sort_cols

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id long, v string"
    )

    def order(missing):
        cols = _sort_cols("v asc", missing=missing)
        return [
            r["doc_id"]
            for r in df.orderBy(*cols, F.asc("doc_id")).collect()
        ]

    assert order(None) == [2, 1, 3]  # default: missing lowest
    assert order("last") == [1, 3, 2]
    assert order("first") == [2, 1, 3]
    cols = _sort_cols("v desc", missing="first")
    assert [
        r["doc_id"] for r in df.orderBy(*cols, F.asc("doc_id")).collect()
    ] == [2, 3, 1]


def test_filter_cache_lru(searcher):
    """filterCache (SolrIndexSearcher.getDocSet + LRUCache): repeated
    fq strings hit the persisted doc set; capacity evicts LRU-wise;
    results identical with and without the cache."""
    from lucene_solr_spark.search.filtercache import FilterCache
    from lucene_solr_spark.search.handler import select

    fc = FilterCache(max_size=2)
    plain = select(searcher, q="error", fq=["turn_idx >= 1"], rows=20)[
        "response"
    ].collect()
    cached = select(
        searcher,
        q="error",
        fq=["turn_idx >= 1"],
        rows=20,
        filter_cache=fc,
    )["response"].collect()
    assert sorted(map(tuple, cached)) == sorted(map(tuple, plain))
    assert fc.stats() == {
        "size": 1, "hits": 0, "misses": 1, "evictions": 0
    }
    select(
        searcher, q="error", fq=["turn_idx >= 1"], rows=5,
        filter_cache=fc,
    )["response"].collect()
    assert fc.stats()["hits"] == 1
    # two more distinct filters -> capacity 2 evicts the oldest
    for e in ("turn_idx >= 2", "turn_idx >= 3"):
        select(
            searcher, q="error", fq=[e], rows=5, filter_cache=fc
        )["response"].collect()
    s = fc.stats()
    assert s["size"] == 2 and s["evictions"] == 1
    fc.clear()
    assert fc.stats()["size"] == 0


def test_response_writers(searcher):
    """QueryResponseWriters (JSONResponseWriter/XMLResponseWriter/
    CSVResponseWriter wire shapes) over one select page."""
    import json

    from lucene_solr_spark.search.handler import select
    from lucene_solr_spark.search.response import (
        write_csv,
        write_json,
        write_xml,
    )

    res = select(searcher, q="error", rows=3)
    body = json.loads(
        write_json(res, params={"q": "error", "rows": 3}, qtime_ms=7)
    )
    assert body["responseHeader"]["status"] == 0
    assert body["responseHeader"]["QTime"] == 7
    assert body["responseHeader"]["params"]["q"] == "error"
    docs = body["response"]["docs"]
    assert body["response"]["numFound"] == len(docs) > 0
    assert all("doc_id" in d and "score" in d for d in docs)

    xml = write_xml(res, params={"q": "error"})
    assert xml.startswith('<?xml version="1.0" encoding="UTF-8"?>')
    assert '<result name="response" numFound=' in xml
    assert xml.count("<doc>") == len(docs)
    assert '<str name="q">error</str>' in xml

    csv_out = write_csv(res, fl=["doc_id", "score"])
    lines = csv_out.split("\n")
    assert lines[0] == "doc_id,score"
    assert len(lines) == len(docs) + 1
    # CSV quoting: separator inside a value forces double-quoting
    class FakeRow:
        def __init__(self, d):
            self._d = d
        def asDict(self, recursive=True):
            return self._d
    class FakeDF:
        def __init__(self, rows):
            self._r = rows
        def collect(self):
            return self._r
    fake = {"response": FakeDF([FakeRow({"a": 'x,"y', "b": [1, 2]})])}
    out = write_csv(fake)
    assert out.split("\n")[1] == '"x,""y",1|2'


def test_external_file_field(spark, tmp_path):
    """FileFloatSource parse rules: last '=' splits, bad lines and bad
    floats skipped, later lines overwrite, default fills missing,
    VersionedFile latest-name-wins."""
    from lucene_solr_spark.search.externalfile import (
        external_file_values,
        latest_external_file,
        with_external_field,
    )

    (tmp_path / "external_rank.v1").write_text("1=9.0\n")
    (tmp_path / "external_rank.v2").write_text(
        "no delimiter here\n"
        "1=0.5\n"
        "2=notafloat\n"
        "a=b=2.5\n"
        "3=1.0\n"
        "3=7.5\n"
    )
    path = latest_external_file(str(tmp_path), "rank")
    assert path.endswith(".v2")
    vals = {
        r["key"]: r["value"]
        for r in external_file_values(spark, path, key_type="string").collect()
    }
    # 'a=b' key from the LAST '=' split; bad float line dropped
    assert vals == {"1": 0.5, "a=b": 2.5, "3": 7.5}
    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "doc_id int"
    )
    iv = external_file_values(spark, path, key_type="int")
    out = {
        r["doc_id"]: r["boost"]
        for r in with_external_field(
            docs, iv, "boost", default=0.25
        ).collect()
    }
    assert out == {1: 0.5, 2: 0.25, 3: 7.5, 4: 0.25}


def test_random_sort_field(searcher):
    """RandomSortField: repeatable per seed, different across seeds,
    and a permutation of the match set."""
    from lucene_solr_spark.search.handler import select

    def order(seed):
        return [
            r["doc_id"]
            for r in select(
                searcher, q="error", sort=f"random_{seed} asc", rows=50
            )["response"].collect()
        ]

    a1, a2, b = order("7"), order("7"), order("8")
    assert a1 == a2
    assert a1 != b
    assert sorted(a1) == sorted(b)


def test_fl_doc_transformers(searcher):
    """[docid] / [value v=] / [explain] DocTransformers
    (S/response/transform/ defaultFactories): computed per returned
    doc; the explanation parts sum to the returned score."""
    from lucene_solr_spark.search.handler import select

    out = select(
        searcher,
        q="error retry",
        fl=["role", "[docid]", "[value v=42]", "[explain]"],
        rows=5,
    )["response"].collect()
    assert out
    for r in out:
        assert r["docid"] == r["doc_id"]
        assert r["value"] == 42
        assert r["explain"].startswith("sum of: ")
        parts = dict(
            p.split("=") for p in r["explain"][len("sum of: "):].split("; ")
        )
        assert set(parts) <= {"error", "retry"}
        got = sum(float(v.replace(",", "")) for v in parts.values())
        assert abs(got - r["score"]) < 2e-3  # 4-decimal formatting


def test_q_alt_blank_query_fallback(searcher):
    """q.alt (DisMaxQParser.getAlternateUserQuery): blank q falls back
    to the alternate query through the standard parser — the fq-only
    request pattern (*:* + filters)."""
    from lucene_solr_spark.search.handler import select

    out = select(
        searcher, q="  ", q_alt="*:*", fq=["turn_idx >= 2"], rows=100,
        def_type="dismax",
    )["response"].collect()
    want = searcher.index.docs.where("turn_idx >= 2").count()
    assert len(out) == min(100, want) and want > 0
    # all constant-score (MatchAllDocsQuery semantics)
    assert len({r["score"] for r in out}) == 1
    # a non-blank q ignores q.alt
    a = select(searcher, q="error", q_alt="*:*", rows=100)["response"].count()
    b = select(searcher, q="error", rows=100)["response"].count()
    assert a == b


def test_eval_writers_goldens():
    """wt=python/ruby/php/phps wire shapes (PythonResponseWriter /
    RubyResponseWriter / PHPResponseWriter / PHPSerializedResponseWriter):
    literal syntax, escaping, NaN/Inf spellings, and phps byte-counted
    strings — pinned against hand-derived goldens and (for python)
    round-tripped through eval/ast.literal_eval-compatible parsing."""
    from lucene_solr_spark.search.response import (
        write_php,
        write_phps,
        write_python,
        write_ruby,
    )

    class FakeRow:
        def __init__(self, d):
            self._d = d

        def asDict(self, recursive=True):
            return self._d

    class FakeDF:
        def __init__(self, rows):
            self._r = rows

        def collect(self):
            return self._r

    res = {
        "response": FakeDF(
            [
                FakeRow(
                    {
                        "id": "d'1",
                        "n": 2,
                        "score": 1.5,
                        "ok": True,
                        "tags": ["a", "b"],
                        "gap": None,
                    }
                )
            ]
        )
    }
    py = write_python(res, params={"q": "x\ny"}, qtime_ms=3)
    # eval()-able, as PythonResponseWriter promises
    body = eval(py)  # noqa: S307 - the point of the format
    assert body["responseHeader"]["QTime"] == 3
    assert body["responseHeader"]["params"]["q"] == "x\ny"
    doc = body["response"]["docs"][0]
    assert doc["id"] == "d'1" and doc["tags"] == ["a", "b"]
    assert doc["gap"] is None and doc["ok"] is True
    # newline escaped, not literal (python eval chokes on raw newlines)
    assert "\n" not in py and "\\n" in py
    # non-ASCII forces the u'' unicode-string spelling
    res_u = {"response": FakeDF([FakeRow({"id": "café"})])}
    py_u = write_python(res_u)
    assert "u'caf\\u00e9'" in py_u

    rb = write_ruby(res, qtime_ms=3)
    assert "'QTime'=>3" in rb
    assert "'gap'=>nil" in rb
    assert "'ok'=>true" in rb
    assert "'id'=>'d\\'1'" in rb
    assert "'tags'=>['a','b']" in rb
    # NaN/Inf spellings per NaNFloatWriter subclasses
    res_nan = {"response": FakeDF([FakeRow({"v": float("nan")})])}
    res_inf = {"response": FakeDF([FakeRow({"v": float("inf")})])}
    assert "float('NaN')" in write_python(res_nan)
    assert "float('Inf')" in write_python(res_inf)
    assert "(0.0/0.0)" in write_ruby(res_nan)
    assert "(1.0/0.0)" in write_ruby(res_inf)

    php = write_php(res, qtime_ms=3)
    assert php.startswith("array(")
    assert "'QTime'=>3" in php
    assert "'gap'=>null" in php
    assert "'tags'=>array('a','b')" in php

    phps = write_phps({"response": FakeDF([FakeRow({"id": "café", "n": 2})])})
    # strings are BYTE-counted (café = 5 UTF-8 bytes), ints are i:v;
    assert 's:5:"café";' in phps
    assert 'i:2;' in phps
    # docs array is integer-keyed: a:1:{i:0;a:2:{...}}
    assert '"docs";a:1:{i:0;a:2:{' in phps


def test_fst_completion_bucketing(spark):
    """FSTCompletionLookup quantile bucketing: bucket = (int)(line *
    buckets / inputLines) over the (weight asc) sort, with equal
    weights sharing the run-head bucket (FSTCompletionLookup.java:
    190-197) — pinned against a literal transcription of that loop."""
    from lucene_solr_spark.search.suggest import (
        build_fst_completion,
        fst_lookup,
    )

    entries = [
        ("alpha", 1), ("beta", 1), ("gamma", 2), ("delta", 2),
        ("eps", 2), ("zeta", 5), ("eta", 7), ("theta", 7),
        ("iota", 9), ("kappa", 20),
    ]
    # literal transcription of the reference loop
    srt = sorted(entries, key=lambda kv: (kv[1], kv[0]))
    n = len(srt)
    buckets = 4
    expect = {}
    prev_score, prev_bucket = None, 0
    for line, (k, w) in enumerate(srt):
        if line > 0 and w == prev_score:
            b = prev_bucket
        else:
            b = line * buckets // n
        prev_score, prev_bucket = w, b
        expect[k] = b

    sg = spark.createDataFrame(entries, "key string, weight long")
    got = {
        r["key"]: r["bucket"]
        for r in build_fst_completion(sg, buckets=buckets).collect()
    }
    assert got == expect

    # higherWeightsFirst ordering: bucket desc, ALPHABETICAL within a
    # bucket — iota (w=9) and kappa (w=20) share bucket 3, so iota
    # sorts first despite the lower raw weight: the discretization IS
    # the semantic difference vs WFSTCompletionLookup's exact order
    assert expect["iota"] == expect["kappa"]
    comp = build_fst_completion(sg, buckets=buckets)
    keys = [r["key"] for r in fst_lookup(comp, "", 10, exact_first=False).collect()]
    assert keys[0] == "iota" and keys[1] == "kappa"
    assert keys.index("eta") < keys.index("theta")


def test_file_dictionary_suggester(spark):
    """FileDictionary format (entry [TAB weight], float weights
    truncated, weightless lines default to 1) through the Lookup path,
    including multi-word entries."""
    from lucene_solr_spark.search.suggest import (
        lookup,
        parse_file_dictionary,
        suggester_from_file,
    )

    txt = "wizard\t7\nwizard of oz\t100.9\nwitch\nwindow\t7\n"
    assert parse_file_dictionary(txt) == [
        ("wizard", 7),
        ("wizard of oz", 100),
        ("witch", 1),
        ("window", 7),
    ]
    sg = suggester_from_file(spark, txt)
    got = [
        (r["key"], r["weight"])
        for r in lookup(sg, "wi", 3, exact_first=False).collect()
    ]
    # weight desc, key asc on ties
    assert got == [("wizard of oz", 100), ("window", 7), ("wizard", 7)]


def test_phps_roundtrip_unserialize():
    """write_phps output must round-trip through a PHP unserialize()
    twin (string lengths are UTF-8 BYTE counts consumed verbatim —
    the part a naive char-count writer gets wrong on multi-byte text)."""
    from lucene_solr_spark.search.response import write_phps

    def unserialize(b: bytes, pos: int = 0):
        t = chr(b[pos])
        if t == "N":
            return None, pos + 2
        if t == "b":
            return b[pos + 2 : pos + 3] == b"1", pos + 4
        if t == "i":
            end = b.index(b";", pos)
            return int(b[pos + 2 : end]), end + 1
        if t == "d":
            end = b.index(b";", pos)
            return float(b[pos + 2 : end]), end + 1
        if t == "s":
            colon = b.index(b":", pos + 2)
            n = int(b[pos + 2 : colon])
            start = colon + 2  # skip :"
            val = b[start : start + n].decode("utf-8")
            assert b[start + n : start + n + 2] == b'";'
            return val, start + n + 2
        if t == "a":
            colon = b.index(b":", pos + 2)
            n = int(b[pos + 2 : colon])
            p = colon + 2  # skip :{
            out = {}
            for _ in range(n):
                k, p = unserialize(b, p)
                v, p = unserialize(b, p)
                out[k] = v
            assert b[p : p + 1] == b"}"
            return out, p + 1
        raise AssertionError(f"bad type {t!r} at {pos}")

    class FakeRow:
        def __init__(self, d):
            self._d = d

        def asDict(self, recursive=True):
            return self._d

    class FakeDF:
        def __init__(self, rows):
            self._r = rows

        def collect(self):
            return self._r

    res = {
        "response": FakeDF(
            [FakeRow({"id": "héllo wörld — 你好", "n": -3,
                      "f": 2.5, "ok": False, "gap": None,
                      "tags": ["ü", "v"]})]
        )
    }
    out = write_phps(res, params={"q": "café"}, qtime_ms=9).encode("utf-8")
    body, end = unserialize(out)
    assert end == len(out)
    assert body["responseHeader"]["QTime"] == 9
    assert body["responseHeader"]["params"]["q"] == "café"
    doc = body["response"]["docs"][0]
    assert doc["id"] == "héllo wörld — 你好"
    assert doc["n"] == -3 and doc["f"] == 2.5
    assert doc["ok"] is False and doc["gap"] is None
    # arrays serialize with integer keys (PHPSerializedWriter.writeArray)
    assert doc["tags"] == {0: "ü", 1: "v"}


def test_tag_ex_multiselect_faceting(spark):
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.handler import select

    docs = spark.createDataFrame(
        [
            (0, "scan data", "en", "a"),
            (1, "scan data", "de", "a"),
            (2, "scan data", "fr", "b"),
            (3, "other", "en", "a"),
        ],
        "doc_id long, text string, lang string, src string",
    )
    s = Searcher(build_index(spark, docs))
    out = select(
        s,
        "scan",
        fq=["{!tag=lg}lang = 'en'", "src = 'a'"],
        facet_field=["{!ex=lg}lang", "src"],
        facet_limit=-1,
    )
    # the page honors every fq
    assert [r["doc_id"] for r in out["response"].collect()] == [0]
    # the ex-tagged lang facet ignores the lang fq but keeps src='a'
    lang_counts = {
        r["lang"]: r["cnt"] for r in out["facets"]["lang"].collect()
    }
    assert lang_counts == {"en": 1, "de": 1}
    # the untagged src facet counts over the FULLY filtered set
    src_counts = {
        r["src"]: r["cnt"] for r in out["facets"]["src"].collect()
    }
    assert src_counts == {"a": 1}
