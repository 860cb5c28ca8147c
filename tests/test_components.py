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
