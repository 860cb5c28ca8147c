"""Connected-components dedup clustering (datapipe/components.py):
alternating large-star/small-star must label every node with the
minimum reachable id, in O(log n) rounds."""

import pyspark.sql.functions as F

from lucene_solr_spark.datapipe.components import (
    connected_components,
    keep_canonical,
)


def _cc_brute(pairs):
    # union-find ground truth
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        int(r["node"]): int(r["component"])
        for r in connected_components(df).collect()
    }
    return got


def test_two_components_and_chain(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11)]
    assert _run(spark, pairs) == _cc_brute(pairs)


def test_long_path_converges_logarithmically(spark):
    # a 64-node path is the worst case for naive min-propagation
    # (63 rounds); star contraction must finish well inside max_iter
    pairs = [(i, i + 1) for i in range(64)]
    got = _run(spark, pairs)
    assert got == {i: 0 for i in range(65)}


def test_duplicate_and_reversed_edges(spark):
    pairs = [(5, 3), (3, 5), (5, 3), (7, 7), (3, 2)]
    assert _run(spark, pairs) == {2: 2, 3: 2, 5: 2}


def test_random_graph_matches_union_find(spark):
    import random

    rng = random.Random(42)
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run(spark, pairs) == _cc_brute(pairs)


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (6, 7)], "doc_a long, doc_b long"
    )
    kept = sorted(
        int(r["doc_id"])
        for r in keep_canonical(docs, pairs).select("doc_id").collect()
    )
    # {1,2,5} -> 1; {6,7} -> 6; 0,3,4 unpaired
    assert kept == [0, 1, 3, 4, 6]
    # schema is preserved (component/node helper columns dropped)
    assert keep_canonical(docs, pairs).columns == ["doc_id", "text"]


def test_string_distances_match_reference_semantics():
    """LuceneLevenshteinDistance (OSA + transposition primitive;
    'ab'/'bca' raw distance 3 per the class javadoc) and NGramDistance
    (NUL-padded sliding-gram DP, Kondrak 2005)."""
    from lucene_solr_spark.search.spellcheck import (
        lucene_levenshtein,
        ngram_distance,
    )

    # javadoc example: parallel edits -> raw distance 3, 1 - 3/2
    assert lucene_levenshtein("ab", "bca") == -0.5
    # transposition is ONE primitive edit: 1 - 1/4
    assert lucene_levenshtein("abcd", "abdc") == 0.75
    # plain edit with no transposition == classic levenshtein
    assert lucene_levenshtein("scan", "scann") == 1.0 - 1.0 / 4.0
    # degenerate empty cases mirror the reference's raw returns
    assert lucene_levenshtein("", "") == 0.0
    assert lucene_levenshtein("", "abc") == 3.0

    assert ngram_distance("abc", "abc") == 1.0
    # short-string fallback: positional overlap / max(len)
    assert ngram_distance("a", "ab") == 0.5
    assert ngram_distance("", "") == 1.0
    assert ngram_distance("", "x") == 0.0
    # symmetric on same-length inputs; decreasing with divergence
    d1 = ngram_distance("scan", "scann")
    d2 = ngram_distance("scan", "merge")
    assert 0.0 <= d2 < d1 < 1.0


def test_suggest_with_distance_and_hf_threshold(spark, tiny_index):
    from lucene_solr_spark.search.spellcheck import (
        suggest,
        suggest_with_distance,
    )

    ts = tiny_index.terms_stats
    rows = suggest_with_distance(ts, "erro", metric="ngram", k=3).collect()
    assert rows and rows[0]["term"] == "error"
    rows2 = suggest_with_distance(
        ts, "erro", metric="lucene_levenshtein", k=3
    ).collect()
    assert rows2 and rows2[0]["term"] == "error"
    # HighFrequencyDictionary threshold: a high bar prunes candidates
    n = tiny_index.stats.max_doc
    all_s = suggest(ts, "erro", k=10).collect()
    thr = suggest(ts, "erro", k=10, threshold=0.9, max_doc=n).collect()
    assert len(thr) < len(all_s) or not thr


def test_spelling_query_converter(spark, tiny_index):
    """SpellingQueryConverter (SpellingQueryConverter.java:97-140):
    field prefixes and bare numbers skipped, operator words dropped —
    then collate_query corrects the surviving words."""
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.spellcheck import (
        collate_query,
        spelling_query_convert,
    )

    toks = spelling_query_convert(
        "title:scann AND mergee OR 42 n_chars:[1 TO 5]"
    )
    assert toks == ["scann", "mergee"]
    assert spelling_query_convert('erorr^2 "shrd phrase"~3') == [
        "erorr",
        "shrd",
        "phrase",
    ]
    s = Searcher(tiny_index)
    collation, hits = collate_query(s, "role:user erorr AND shardd")
    assert "error" in collation and "shard" in collation


def test_fl_glob_and_max_collations(spark, tiny_index):
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.handler import select
    from lucene_solr_spark.search.spellcheck import collations

    s = Searcher(tiny_index)
    out = select(s, q="error", fl=["*"], rows=3)["response"]
    # every stored field present exactly once, after doc_id + score
    assert out.columns[:2] == ["doc_id", "score"]
    assert set(out.columns) >= {"conv_id", "turn_idx", "role", "text"}
    assert len(out.columns) == len(set(out.columns))

    got = collations(s, ["erorr", "shardd"], max_collations=2)
    assert got and got[0][0] == "error shard" and got[0][1] > 0


def test_suggest_more_popular(spark, tiny_index):
    """SUGGEST_MORE_POPULAR (SpellChecker.java:335,396): only
    candidates with df strictly above the query word's own df."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.spellcheck import (
        suggest,
        suggest_more_popular,
    )

    ts = tiny_index.terms_stats
    # pick the LOWEST-df member of the fill1..fill16 family: every
    # higher-df sibling within 2 edits must appear; none with lower df
    fam = sorted(
        (r["df"], r["term"])
        for r in ts.where(F.col("term").rlike("^fill[0-9]+$")).collect()
    )
    low_df, low = fam[0]
    got = suggest_more_popular(ts, low, max_edits=2, k=50).collect()
    assert got, "family guarantees more-popular neighbors"
    assert all(r["df"] > low_df for r in got)
    # plain suggest also returns LESS popular family members
    plain = suggest(ts, low, max_edits=2, k=50).collect()
    assert {r["term"] for r in got} <= {r["term"] for r in plain}
    if any(df < low_df for df, _ in fam[1:]) or any(
        df == low_df for df, _ in fam[1:]
    ):
        assert len(got) <= len(plain)
