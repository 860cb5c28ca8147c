"""Skew handling: the BASELINE target "salted repartition of high-df
terms; no straggler partition" made measurable.

A pathological corpus where ONE hot term occurs in EVERY document
would, without salting, send its entire postings list to a single
reducer (a df=10^11 stopword-adjacent straggler at 10^12-turn scale).
The store shuffles by (term, doc_id // split_range), so the hot term
must fragment into independent bounded doc-range groups — asserted
here directly on the persisted block metadata."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_hot_term_fragments_into_bounded_splits(spark, tmp_path):
    import pandas as pd

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.index.segments import write_segments

    n_docs, split_range = 1000, 100
    pdf = pd.DataFrame(
        {
            "doc_id": range(n_docs),
            # 'hotterm' in every doc + a unique rare term per doc
            "text": [f"hotterm uniq{i}" for i in range(n_docs)],
        }
    )
    docs = spark.createDataFrame(pdf).repartition(8)
    idx = build_index(spark, docs, cache=True)
    seg = write_segments(
        idx, str(tmp_path / "seg"), n_buckets=4, split_range=split_range
    )
    blocks = (
        spark.read.parquet(str(tmp_path / "seg" / "postings"))
        .where(F.col("term") == "hotterm")
        .select("first_doc", "last_doc", "num_docs")
        .collect()
    )
    # the hot term's postings landed in n_docs/split_range independent
    # groups, each bounded by the salt width — no straggler reducer
    assert len(blocks) >= n_docs // split_range
    spans = sorted((r["first_doc"], r["last_doc"]) for r in blocks)
    total = 0
    for lo, hi in spans:
        assert hi - lo < split_range, "block crossed its salt range"
        total += 1
    assert sum(r["num_docs"] for r in blocks) == n_docs
    # ranges must partition the corpus without overlap
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2

    # and the salted store still answers correctly
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.query import TermQuery

    s = Searcher(seg)
    assert s.score(TermQuery("hotterm")).count() == n_docs
