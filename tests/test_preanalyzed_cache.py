"""PreAnalyzedField JSON parser (JsonPreAnalyzedParser.java) and the
queryResultCache (SolrIndexSearcher getDocListC window semantics)."""

import pytest

from lucene_solr_spark.analysis.preanalyzed import (
    parse_preanalyzed,
    preanalyzed_analyzer,
    to_preanalyzed_json,
)
from lucene_solr_spark.search.resultcache import (
    QueryResultCache,
    cached_select,
)


def test_preanalyzed_parse_pins():
    terms, pos, stored = parse_preanalyzed(
        '{"v":"1","str":"Hello Anna","tokens":['
        '{"t":"hello","s":0,"e":5},'
        '{"t":"anna","i":2,"s":6,"e":10}]}'
    )
    # default i=1 -> position 0; i=2 leaves a stop-style gap
    assert terms == ["hello", "anna"]
    assert pos == [0, 2]
    assert stored == "Hello Anna"
    # empty value -> empty stream (parser accepts it)
    assert parse_preanalyzed("  ") == ([], [], None)
    # version enforcement
    with pytest.raises(ValueError, match="Missing VERSION"):
        parse_preanalyzed('{"tokens":[]}')
    with pytest.raises(ValueError, match="Unknown VERSION"):
        parse_preanalyzed('{"v":"2","tokens":[]}')
    with pytest.raises(ValueError):
        parse_preanalyzed("not json")
    with pytest.raises(ValueError, match="malformed token"):
        parse_preanalyzed('{"v":"1","tokens":[{"i":1}]}')


def test_preanalyzed_roundtrip_and_analyzer_slot():
    from lucene_solr_spark.analysis.tokenizer import analyze

    text = "the quick brown fox and the lazy dog"
    terms, pos = analyze(text)
    wire = to_preanalyzed_json(terms, pos, stored=text)
    an = preanalyzed_analyzer()
    assert an(wire) == (terms, pos)


def test_preanalyzed_indexing_matches_text_indexing(spark):
    """Indexing pre-analyzed JSON through the analyzer slot must build
    the same postings as indexing the raw text."""
    from lucene_solr_spark.analysis.tokenizer import analyze
    from lucene_solr_spark.index.builder import build_index

    texts = [
        "deploy failed with timeout error",
        "retry the deploy after the error",
        "scan merge join",
    ]
    docs_txt = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wire = [
        (i, to_preanalyzed_json(*analyze(t))) for i, t in enumerate(texts)
    ]
    docs_pre = spark.createDataFrame(wire, "doc_id long, text string")
    a = build_index(spark, docs_txt)
    b = build_index(
        spark, docs_pre, analyzer=preanalyzed_analyzer()
    )
    pa = sorted(
        tuple(r)
        for r in a.postings.select("term", "doc_id", "tf").collect()
    )
    pb = sorted(
        tuple(r)
        for r in b.postings.select("term", "doc_id", "tf").collect()
    )
    assert pa == pb
    assert a.stats.sum_total_term_freq == b.stats.sum_total_term_freq


def test_query_result_cache_window_and_lru(tiny_index):
    from lucene_solr_spark.search.executor import Searcher

    s = Searcher(tiny_index)
    cache = QueryResultCache(max_size=2, window_size=8)
    p1 = cached_select(cache, s, q="error", rows=5)
    assert cache.misses == 1 and cache.hits == 0
    # page 2 inside the 8-row window: HIT, no new fetch
    p2 = cached_select(cache, s, q="error", start=5, rows=3)
    assert cache.hits == 1
    assert [r["doc_id"] for r in p1 + p2] == [
        r["doc_id"]
        for r in cached_select(cache, s, q="error", rows=8)
    ]
    # fq order must not change the key
    a = cached_select(cache, s, q="error", fq=["turn_idx >= 0", "doc_id >= 0"], rows=3)
    b = cached_select(cache, s, q="error", fq=["doc_id >= 0", "turn_idx >= 0"], rows=3)
    assert cache.hits >= 2
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    # LRU eviction at max_size=2
    cached_select(cache, s, q="retry", rows=3)
    assert cache.evictions >= 1


def test_query_result_cache_short_result_hits():
    """A result shorter than its window is complete — any deeper page
    request must still hit and return the empty tail."""
    calls = []

    def fetch(asked):
        calls.append(asked)
        return ["r0", "r1"]  # complete result: only 2 rows exist

    c = QueryResultCache(window_size=10)
    assert c.get_page("q", None, None, 0, 2, fetch) == ["r0", "r1"]
    assert c.get_page("q", None, None, 2, 5, fetch) == []
    assert calls == [10]  # second request never re-fetched


def test_filter_cache_lfu_policy(spark):
    """LFUCache eviction (ConcurrentLFUCache.markAndSweep): the least
    frequently used entry goes first, unlike LRU."""
    from lucene_solr_spark.search.filtercache import FilterCache

    def mk(n):
        return lambda: spark.range(n).selectExpr("id as doc_id")

    lfu = FilterCache(max_size=2, policy="lfu")
    lfu.get_or_compute("hot", mk(1))
    lfu.get_or_compute("hot", mk(1))  # freq 2
    lfu.get_or_compute("cold", mk(2))  # freq 1
    lfu.get_or_compute("new", mk(3))  # evicts 'cold' (lowest freq)
    assert "hot" in lfu._items and "cold" not in lfu._items
    # LRU would have evicted 'hot' (least recently inserted/used order
    # after the same sequence puts 'hot' oldest)
    lru = FilterCache(max_size=2, policy="lru")
    lru.get_or_compute("hot", mk(1))
    lru.get_or_compute("hot", mk(1))
    lru.get_or_compute("cold", mk(2))
    lru.get_or_compute("new", mk(3))
    assert "hot" not in lru._items
    import pytest

    with pytest.raises(ValueError):
        FilterCache(policy="fifo")


def test_currency_field_conversion(spark):
    """CurrencyValue.convertAmount pins: identity, rate conversion,
    fraction-digit delta (JPY 0 digits <-> USD 2), truncation toward
    zero, missing rate -> null."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.functions.currency import (
        convert_minor,
        currency_range,
        parse_currency,
    )

    df = spark.createDataFrame(
        [
            (1, "4.50,USD"),
            (2, "10.00,EUR"),
            (3, "1000,JPY"),
            (4, "3.999,USD"),
            (5, "2.00,CHF"),  # no CHF rate -> null conversion
        ],
        "id int, price string",
    )
    rates = {("EUR", "USD"): 2.0, ("JPY", "USD"): 0.01}
    cur = parse_currency(F.col("price"))
    out = {
        r["id"]: (r["minor"], r["code"], r["usd"])
        for r in df.select(
            "id",
            cur["minor"].alias("minor"),
            cur["code"].alias("code"),
            convert_minor(cur, "USD", rates).alias("usd"),
        ).collect()
    }
    assert out[1] == (450, "USD", 450)  # identity
    assert out[2] == (1000, "EUR", 2000)  # 10 EUR -> 20 USD
    # JPY minor units are whole yen; digit delta +2: 1000 yen * 0.01
    # = 10 USD = 1000 cents
    assert out[3] == (1000, "JPY", 1000)
    # parse uses Math.round (CurrencyField.java:689): 3.999 -> 400,
    # and binary-inexact 1.15 must still store 115 (floor would: 114)
    assert out[4][0] == 400
    extra = df.sparkSession.createDataFrame(
        [(10, "1.15,USD"), (11, "0.29,USD")], "id int, price string"
    )
    pc = parse_currency(F.col("price"))
    got = {
        r["id"]: r["m"]
        for r in extra.select("id", pc["minor"].alias("m")).collect()
    }
    assert got == {10: 115, 11: 29}
    assert out[5][2] is None  # missing rate never guesses
    kept = {
        r["id"]
        for r in currency_range(
            df, "price", 5.0, 25.0, "USD", rates
        ).collect()
    }
    assert kept == {2, 3}


def test_phrase_highlighter(spark):
    """Phrase-aware highlighting: whole-phrase wrap as one unit, words
    apart never match, case/separator normalized in the wrap."""
    from lucene_solr_spark.search.highlight import highlight_phrase

    df = spark.createDataFrame(
        [
            (1, "sort by Key  Order in the plan"),
            (2, "key appears here and order there"),
            (3, "the KEY-ORDER hint wins"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["snippet"]
        for r in highlight_phrase(df, ["key", "order"]).collect()
    }
    assert set(out) == {1, 3}  # doc 2: words apart -> no match
    assert "<b>key order</b>" in out[1]
    assert "<b>key order</b>" in out[3]
    # the individual word is NOT wrapped outside the phrase
    assert "<b>key</b>" not in out[1]


def test_file_based_spellchecker(spark, tmp_path):
    """FileBasedSpellChecker: one word per line, blanks dropped,
    duplicates collapsed, every word df=1 (distance-only ranking)."""
    from lucene_solr_spark.search.spellcheck import (
        file_dictionary,
        suggest,
    )

    (tmp_path / "words.txt").write_text(
        "query\n\n  merge  \nquery\nqueue\nquark\nzebra\n"
    )
    fd = file_dictionary(spark, str(tmp_path / "words.txt"))
    rows = {r["term"]: r for r in fd.collect()}
    assert set(rows) == {"query", "merge", "queue", "quark", "zebra"}
    assert all(r["df"] == 1 for r in rows.values())
    got = [(r["term"], r["dist"]) for r in suggest(fd, "qery", k=5).collect()]
    # within maxEdits=2 only 'query' (one insertion) qualifies;
    # queue/quark sit at distance 3 and are pruned
    assert got == [("query", 1)]
    wide = [r["term"] for r in suggest(fd, "quer", k=5).collect()]
    assert wide[0] == "query" and "queue" in wide
