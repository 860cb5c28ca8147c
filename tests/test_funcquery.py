"""ValueSource expression parser tests (search/funcquery.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.search.funcquery import FuncParseError, parse_func


def _eval(spark, expr, n_chars=250):
    df = spark.createDataFrame([(n_chars,)], "n_chars long")
    return df.select(parse_func(expr).alias("v")).collect()[0]["v"]


def test_recip_linear_math(spark):
    assert _eval(spark, "recip(n_chars,1,1000,1000)") == pytest.approx(
        1000.0 / (250 + 1000.0)
    )
    assert _eval(spark, "linear(n_chars,2,5)") == pytest.approx(505.0)
    assert _eval(spark, "div(n_chars,10)") == pytest.approx(25.0)
    assert _eval(
        spark, "sum(n_chars, product(2, 3), 1)"
    ) == pytest.approx(257.0)
    assert _eval(spark, "log(n_chars)") == pytest.approx(2.39794, abs=1e-5)
    assert _eval(spark, "sqrt(pow(n_chars, 2))") == pytest.approx(250.0)
    assert _eval(spark, "abs(-3.5)") == pytest.approx(3.5)


def test_nested_and_constants(spark):
    v = _eval(spark, "recip(sum(n_chars, 50), 1, 600, 600)")
    assert v == pytest.approx(600.0 / (300 + 600.0))
    assert _eval(spark, "3.25") == pytest.approx(3.25)
    assert _eval(spark, "n_chars") == pytest.approx(250.0)


def test_parse_errors():
    for bad in ("recip(n_chars,1,1000)", "nope(1)", "sum(1,", "1 2"):
        with pytest.raises(FuncParseError):
            parse_func(bad)


def test_truncated_call_raises_funcparseerror():
    """A truncated call like 'sum(' must surface as FuncParseError,
    never a raw IndexError (r3 advice #3)."""
    for bad in ("sum(", "recip(", "if(1,", "ms(NOW,", "recip(n_chars"):
        with pytest.raises(FuncParseError):
            parse_func(bad)


def test_scientific_notation(spark):
    assert _eval(spark, "product(2.5e2, 1e-1)") == pytest.approx(25.0)
    assert _eval(spark, "linear(n_chars,3.16e-11,0)") == pytest.approx(
        250 * 3.16e-11
    )


def test_ms_datemath_vs_field(spark):
    """ms(NOW/DAY, tscol) = anchor epoch ms - column epoch ms
    (ValueSourceParser.java:561)."""
    df = spark.createDataFrame([("2024-01-20 00:00:00",)], "ts string")
    col = parse_func("ms(NOW/DAY,ts)", now="2024-01-25T13:11:00Z")
    v = df.select(col.alias("v")).collect()[0]["v"]
    assert v == pytest.approx(5 * 86400000.0)
    # ms() with no args = the anchor itself
    v0 = df.select(
        parse_func("ms()", now="1970-01-02T00:00:00Z").alias("v")
    ).collect()[0]["v"]
    assert v0 == pytest.approx(86400000.0)


def test_if_def_semantics(spark):
    """def() fills NULLs; if() treats numeric 0/NULL as false
    (ValueSourceParser.java:759,770)."""
    df = spark.createDataFrame(
        [(None, 7), (3, 8)], "opt int, x int"
    )
    rows = df.select(
        parse_func("def(opt,-1)").alias("d"),
        parse_func("if(linear(x,1,-7),5,6)").alias("i"),
    ).orderBy("x").collect()
    assert [r["d"] for r in rows] == [-1.0, 3.0]
    # x=7 -> cond 0 -> else branch; x=8 -> cond 1 -> then branch
    assert [r["i"] for r in rows] == [6.0, 5.0]


def test_scale_minmax_over_all_docs(spark):
    from lucene_solr_spark.search.funcquery import compile_func

    df = spark.createDataFrame([(10,), (20,), (30,)], "v long")
    col, att = compile_func("scale(v,0,100)", docs=df)
    assert att == []
    vals = sorted(r["s"] for r in df.select(col.alias("s")).collect())
    assert vals == [0.0, 50.0, 100.0]


def test_query_source_needs_context():
    with pytest.raises(FuncParseError):
        parse_func("query('merge')")
    with pytest.raises(FuncParseError):
        parse_func("scale(n_chars,0,1)")


def test_math_registry_breadth(spark):
    import math

    assert _eval(spark, "map(n_chars,200,300,1,0)") == 1.0
    assert _eval(spark, "map(n_chars,0,100,1)") == 250.0  # def=x
    assert _eval(spark, "sub(n_chars,50)") == 200.0
    assert _eval(spark, "mod(n_chars,7)") == pytest.approx(250 % 7)
    assert _eval(spark, "max(n_chars,300,1)") == 300.0
    assert _eval(spark, "min(n_chars,300,1)") == 1.0
    assert _eval(spark, "ln(n_chars)") == pytest.approx(math.log(250))
    assert _eval(spark, "exp(1)") == pytest.approx(math.e)
    assert _eval(spark, "floor(div(n_chars,3))") == 83.0
    assert _eval(spark, "ceil(div(n_chars,3))") == 84.0
    assert _eval(spark, "rint(div(n_chars,4))") == 62.0
    assert _eval(spark, "atan2(1,1)") == pytest.approx(math.pi / 4)
    assert _eval(spark, "hypot(3,4)") == 5.0
    assert _eval(spark, "cbrt(27)") == pytest.approx(3.0)


def test_index_stat_sources_need_searcher():
    for expr in ("docfreq(text,'scan')", "maxdoc()", "idf(text,'scan')"):
        with pytest.raises(FuncParseError):
            parse_func(expr)


def test_index_stat_sources_bind_literals(spark, tiny_index):
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.funcquery import compile_func

    s = Searcher(tiny_index)
    df = spark.range(1)
    col, att = compile_func("docfreq(text,'error')", searcher=s)
    got_df = df.select(col.alias("v")).collect()[0]["v"]
    assert got_df == float(s.index.term_stats(["error"])["error"][0])
    col2, _ = compile_func("maxdoc()", searcher=s)
    assert (
        df.select(col2.alias("v")).collect()[0]["v"]
        == float(s.index.stats.max_doc)
    )
    import math

    n = s.index.stats.max_doc
    dfreq = s.index.term_stats(["error"])["error"][0]
    col3, _ = compile_func("idf(text,'error')", searcher=s)
    assert df.select(col3.alias("v")).collect()[0]["v"] == pytest.approx(
        math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5)), rel=1e-12
    )


def test_termfreq_tf_norm_sources(spark, tiny_index):
    """termfreq/tf read the per-doc postings frequency (attachment
    frame, 0 for non-matches); norm decodes the floatToByte315 byte —
    cross-checked against the raw postings rows."""
    import math

    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.funcquery import compile_func

    s = Searcher(tiny_index)
    term = "error"
    posts = {
        int(r["doc_id"]): (int(r["tf"]), int(r["norm_byte"]))
        for r in s._postings_for([term])
        .select("doc_id", "tf", "norm_byte")
        .collect()
    }
    assert posts, "fixture must contain the probe term"
    base = tiny_index.docs.select("doc_id")
    col, att = compile_func(f"termfreq(text,'{term}')", searcher=s)
    joined = base
    for alias, frame in att:
        joined = joined.join(frame, "doc_id", "left")
    got = {
        int(r["doc_id"]): r["v"]
        for r in joined.select("doc_id", col.alias("v")).collect()
    }
    for d, v in got.items():
        assert v == pytest.approx(float(posts.get(d, (0, 0))[0]))
    col2, att2 = compile_func(f"tf(text,'{term}')", searcher=s)
    joined2 = base
    for alias, frame in att2:
        joined2 = joined2.join(frame, "doc_id", "left")
    got2 = {
        int(r["doc_id"]): r["v"]
        for r in joined2.select("doc_id", col2.alias("v")).collect()
    }
    some_doc = next(iter(posts))
    assert got2[some_doc] == pytest.approx(
        math.sqrt(float(posts[some_doc][0]))
    )
    # norm: decoded byte for a doc that has postings
    import numpy as np

    from lucene_solr_spark.index.norms import byte315_to_float

    col3, att3 = compile_func("norm(text)", searcher=s)
    joined3 = base
    for alias, frame in att3:
        joined3 = joined3.join(frame, "doc_id", "left")
    got3 = {
        int(r["doc_id"]): r["v"]
        for r in joined3.select("doc_id", col3.alias("v")).collect()
    }
    expect = float(
        byte315_to_float(np.array([posts[some_doc][1]], dtype=np.int64))[0]
    )
    assert got3[some_doc] == pytest.approx(expect, rel=1e-6)


def test_strdist_and_geodist(spark):
    df = spark.createDataFrame(
        [("kitten", 48.8566, 2.3522)], "w string, lat double, lon double"
    )
    v = df.select(
        parse_func("strdist(w,'sitting','edit')").alias("v")
    ).collect()[0]["v"]
    assert v == pytest.approx(1.0 - 3.0 / 7.0)
    # identical strings -> 1.0; empty-vs-empty guard -> 1.0
    df2 = spark.createDataFrame([("", "")], "a string, b string")
    assert df2.select(
        parse_func("strdist(a,b,'edit')").alias("v")
    ).collect()[0]["v"] == pytest.approx(1.0)
    # jw measure: JaroWinklerDistance kernel ('martha'/'marhta' is the
    # canonical Winkler example, jw = 0.9611...)
    df3 = spark.createDataFrame([("marhta",)], "w string")
    jw = df3.select(
        parse_func("strdist('martha',w,jw)").alias("v")
    ).collect()[0]["v"]
    assert jw == pytest.approx(0.9611, abs=1e-4)
    # ngram measure: identical -> 1.0
    ng = df3.select(
        parse_func("strdist('marhta',w,ngram)").alias("v")
    ).collect()[0]["v"]
    assert ng == pytest.approx(1.0)
    # unknown measures still loud-error
    with pytest.raises(FuncParseError):
        parse_func("strdist(w,'x','soundex')")
    # geodist: Paris -> London ~343.5 km
    d = df.select(
        parse_func("geodist(lat,lon,51.5074,-0.1278)").alias("d")
    ).collect()[0]["d"]
    assert d == pytest.approx(343.5, abs=1.0)


def test_attachment_aliases_unique_across_compiles(spark, tiny_index):
    """Attachments from two separate compile_func calls must join onto
    one frame without column collisions (handler.select combines bf +
    boost attachment lists)."""
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.funcquery import compile_func

    s = Searcher(tiny_index)
    c1, att1 = compile_func("termfreq(text,'error')", searcher=s)
    c2, att2 = compile_func("termfreq(text,'the')", searcher=s)
    aliases = [a for a, _ in att1 + att2]
    assert len(set(aliases)) == len(aliases)
    joined = tiny_index.docs.select("doc_id")
    for alias, frame in att1 + att2:
        joined = joined.join(frame, "doc_id", "left")
    # resolves without AMBIGUOUS_REFERENCE and computes both columns
    row = (
        joined.select(
            F.sum(c1).alias("a"), F.sum(c2).alias("b")
        ).collect()[0]
    )
    assert row["a"] is not None and row["b"] is not None


def test_bool_sources(spark):
    df = spark.createDataFrame([(None, 7), (3, 0)], "opt int, x int")
    rows = df.select(
        parse_func("exists(opt)").alias("e"),
        parse_func("not(x)").alias("n"),
        parse_func("and(x,1)").alias("a"),
        parse_func("or(x,0)").alias("o"),
        parse_func("xor(x,1)").alias("xr"),
        parse_func("if(exists(opt),def(opt,0),-1)").alias("c"),
    ).orderBy("n").collect()
    # row x=7 (truthy) sorts first on not(x)=0
    r7, r0 = rows
    assert (r7["e"], r7["n"], r7["a"], r7["o"], r7["xr"], r7["c"]) == (
        0.0, 0.0, 1.0, 1.0, 0.0, -1.0
    )
    assert (r0["e"], r0["n"], r0["a"], r0["o"], r0["xr"], r0["c"]) == (
        1.0, 1.0, 0.0, 0.0, 1.0, 3.0
    )


def test_dist_family(spark):
    """sqedist/dist Minkowski distances (SquaredEuclideanFunction /
    VectorDistanceFunction): powers 0/1/2/3, vector() and flat forms."""
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    row = df.select(
        parse_func("sqedist(x,y,4,6)").alias("sq"),
        parse_func("dist(1,x,y,4,6)").alias("d1"),
        parse_func("dist(2,vector(x,y),vector(4,6))").alias("d2"),
        parse_func("dist(0,x,y,1,6)").alias("d0"),
        parse_func("dist(3,x,y,4,6)").alias("d3"),
    ).collect()[0]
    assert row["sq"] == pytest.approx(9.0 + 16.0)
    assert row["d1"] == pytest.approx(3.0 + 4.0)
    assert row["d2"] == pytest.approx(5.0)
    assert row["d0"] == pytest.approx(1.0)  # x equal, y differs
    assert row["d3"] == pytest.approx((27.0 + 64.0) ** (1.0 / 3.0))
    for bad in ("dist(x,y,4,6)", "sqedist(x,y,4)", "vector(x,y)"):
        with pytest.raises(FuncParseError):
            parse_func(bad)


def test_const_sources(spark):
    import math

    df = spark.createDataFrame([(250,)], "n_chars long")
    row = df.select(
        parse_func("sum(pi(),e())").alias("pe"),
        parse_func("if(true(),1,0)").alias("t"),
        parse_func("if(false(),1,0)").alias("f"),
        parse_func("top(linear(n_chars,2,0))").alias("topv"),
        parse_func(
            "strdist(literal('kitten'),literal('sitting'),'edit')"
        ).alias("sd"),
    ).collect()[0]
    assert row["pe"] == pytest.approx(math.pi + math.e)
    assert (row["t"], row["f"]) == (1.0, 0.0)
    assert row["topv"] == pytest.approx(500.0)
    assert row["sd"] == pytest.approx(1.0 - 3.0 / 7.0)


def test_geohash_roundtrip_and_hsin(spark):
    """geohash matches the canonical example; ghhsin over geohash()
    args equals the cell-center haversine; hsin radius parameterizes."""
    from lucene_solr_spark.search.spatial import (
        geohash_decode_py,
        geohash_encode_py,
    )

    assert geohash_encode_py(57.64911, 10.40744) == "u4pruydqqvj8"
    lat, lon = geohash_decode_py("u4pruydqqvj8")
    assert lat == pytest.approx(57.64911, abs=1e-6)
    assert lon == pytest.approx(10.40744, abs=1e-6)

    df = spark.createDataFrame(
        [(57.64911, 10.40744)], "lat double, lon double"
    )
    row = df.select(
        parse_func("geohash(lat,lon)").alias("gh"),
        parse_func(
            "ghhsin(6371.0087714,geohash(lat,lon),geohash(45.5,-122.6))"
        ).alias("ghd"),
        parse_func(
            "ghhsin(6371.0087714,geohash(lat,lon),'c20ff5j2syy0')"
        ).alias("ghd_lit"),
        parse_func("hsin(6371.0087714,true,lat,lon,45.5,-122.6)").alias(
            "hs_km"
        ),
        parse_func("hsin(3958.761,true,lat,lon,45.5,-122.6)").alias(
            "hs_mi"
        ),
    ).collect()[0]
    assert row["gh"] == "u4pruydqqvj8"
    # cell centers are within ~2e-7 deg of the points: ghd ~ hs
    assert row["ghd"] == pytest.approx(row["hs_km"], abs=0.001)
    # literal geohash arg constant-folds to the identical center
    assert geohash_encode_py(45.5, -122.6) == "c20ff5j2syy0"
    assert row["ghd_lit"] == row["ghd"]
    # parametric radius: miles/km ratio
    assert row["hs_mi"] / row["hs_km"] == pytest.approx(
        3958.761 / 6371.0087714
    )


def test_ord_rord(spark):
    """ord/rord: 1-based sorted ordinal, 0 for missing,
    rord = (#terms + 1) - ord (ReverseOrdFieldSource.java:77-83)."""
    from lucene_solr_spark.search.funcquery import compile_func

    df = spark.createDataFrame(
        [(1, "de"), (2, "en"), (3, None), (4, "ar"), (5, "en")],
        "doc_id long, lang string",
    )
    c1, att1 = compile_func("ord(lang)", docs=df)
    c2, att2 = compile_func("rord(lang)", docs=df)
    joined = df
    for alias, frame in att1 + att2:
        joined = joined.join(frame, "doc_id", "left")
    rows = {
        r["doc_id"]: (r["o"], r["r"])
        for r in joined.select(
            "doc_id", c1.alias("o"), c2.alias("r")
        ).collect()
    }
    # sorted terms: ar=1, de=2, en=3; numOrd = 4
    assert rows[4] == (1.0, 3.0)
    assert rows[1] == (2.0, 2.0)
    assert rows[2] == (3.0, 1.0)
    assert rows[3] == (0.0, 4.0)  # missing: ord 0, rord numOrd
    assert rows[5] == rows[2]


def test_boost_vs(spark, tiny_index):
    """boost('q',f) = query score * f, 0 for non-matches."""
    from lucene_solr_spark.search.funcquery import compile_func
    from lucene_solr_spark.search.executor import Searcher

    s = Searcher(tiny_index)
    cb, attb = compile_func("boost('the',2)", searcher=s)
    cq, attq = compile_func("query('the')", searcher=s)
    joined = tiny_index.docs.select("doc_id")
    for alias, frame in attb + attq:
        joined = joined.join(frame, "doc_id", "left")
    for r in joined.select(
        cb.alias("b"), cq.alias("q")
    ).collect():
        assert r["b"] == pytest.approx(2.0 * r["q"])


def test_funcquery_crash_freedom_fuzz(spark):
    """Random ValueSource expressions either compile or raise
    FuncParseError — never IndexError/TypeError/etc. (the r3-advice
    truncated-call guard, generalized)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_spark.search.funcquery import (
        FuncParseError,
        parse_func,
    )

    alphabet = "abcsum(),'\"0123.5_ -+reciplogmaxif$"

    @given(st.text(alphabet=alphabet, max_size=40))
    @settings(max_examples=400, deadline=None)
    def check(s):
        try:
            parse_func(s)
        except FuncParseError:
            pass

    check()
