"""Index splitters (index/splitter.py): a split half must answer
queries bit-identically to a fresh index built over the same doc
subset (PKIndexSplitter.java / MultiPassIndexSplitter.java
semantics), and a PK range split must copy most blocks verbatim."""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.index.segments import build_segment_store
from lucene_solr_spark.index.splitter import multipass_split, pk_split
from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.query import And, Or, PhraseQuery, TermQuery


@pytest.fixture(scope="module")
def split_setup(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import generate_transcripts

    base = tmp_path_factory.mktemp("split")
    pdf = generate_transcripts(800, seed=11)
    sdf = spark.createDataFrame(pdf)
    src = str(base / "src")
    seg = build_segment_store(
        spark, sdf, src, n_buckets=8,
        order_cols=["conv_id", "turn_idx"],
    )
    mid = seg.stats.max_doc // 2
    stats = {}
    lo, hi = pk_split(
        spark, src, str(base / "lo"), str(base / "hi"), mid,
        stats_out=stats,
    )
    return dict(
        spark=spark, base=base, src=src, seg=seg, mid=mid,
        lo=lo, hi=hi, stats=stats, sdf=sdf,
    )


def _docs_subset_store(st, name, pred):
    spark = st["spark"]
    docs = spark.read.parquet(f"{st['src']}/docs")
    sub = (
        docs.where(pred)
        .orderBy("doc_id")
        .drop("doc_id", "dl", "norm_byte", "fingerprint")
    )
    keep = [c for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
            if c in sub.columns]
    return build_segment_store(
        spark,
        sub.select(*keep),
        str(st["base"] / name),
        n_buckets=8,
        order_cols=["conv_id", "turn_idx"],
    )


def test_pk_split_partitions_postings_exactly(split_setup):
    st = split_setup
    seg, lo, hi, mid = st["seg"], st["lo"], st["hi"], st["mid"]
    assert lo.stats.max_doc + hi.stats.max_doc == seg.stats.max_doc
    assert (
        lo.stats.sum_total_term_freq + hi.stats.sum_total_term_freq
        == seg.stats.sum_total_term_freq
    )
    # postings round-trip: each half's decoded postings == the full
    # store's postings filtered by the range
    full = {
        (r["term"], r["doc_id"], r["tf"])
        for r in seg.postings_for_terms(["error", "the", "deploy"])
        .select("term", "doc_id", "tf")
        .collect()
    }
    got_lo = {
        (r["term"], r["doc_id"], r["tf"])
        for r in lo.postings_for_terms(["error", "the", "deploy"])
        .select("term", "doc_id", "tf")
        .collect()
    }
    got_hi = {
        (r["term"], r["doc_id"], r["tf"])
        for r in hi.postings_for_terms(["error", "the", "deploy"])
        .select("term", "doc_id", "tf")
        .collect()
    }
    assert got_lo == {t for t in full if t[1] < st["mid"]}
    assert got_hi == {t for t in full if t[1] >= st["mid"]}


def test_pk_split_mostly_verbatim(split_setup):
    """The metadata-speed reshard claim: only boundary-straddling
    blocks re-encode."""
    s = split_setup["stats"]
    assert s["blocks_total"] > 0
    assert s["blocks_reencoded"] < s["blocks_total"]
    assert (
        s["blocks_copied"] + s["blocks_reencoded"] == s["blocks_total"]
    )


def test_split_half_equals_fresh_subindex(split_setup):
    """Gold assertion: searching the lo half == searching a fresh
    segment store built over the same doc subset — same docIDs AND
    same BM25 scores (stats re-aggregation is exact)."""
    st = split_setup
    fresh = _docs_subset_store(
        st, "fresh_lo", F.col("doc_id") < st["mid"]
    )
    a = Searcher(st["lo"], exact_float32=True)
    b = Searcher(fresh, exact_float32=True)
    for q in (
        TermQuery("error"),
        Or("error", "timeout", "deploy"),
        And("error", "the"),
        PhraseQuery(["the", "deploy"], slop=1),
    ):
        got = [
            (r["doc_id"], round(float(r["score"]), 5))
            for r in a.search(q, 10).collect()
        ]
        want = [
            (r["doc_id"], round(float(r["score"]), 5))
            for r in b.search(q, 10).collect()
        ]
        assert got == want, q


def test_multipass_round_robin(split_setup):
    st = split_setup
    spark = st["spark"]
    parts = multipass_split(
        spark,
        st["src"],
        [str(st["base"] / f"rr{i}") for i in range(3)],
    )
    assert sum(p.stats.max_doc for p in parts) == st["seg"].stats.max_doc
    # each part holds exactly the doc_id % 3 == i slice
    for i, p in enumerate(parts):
        ids = [
            r["doc_id"]
            for r in p.postings_for_terms(["error"])
            .select("doc_id")
            .distinct()
            .collect()
        ]
        assert ids and all(d % 3 == i for d in ids)
    # df conservation per term
    full_df = st["seg"].term_stats(["error"])["error"][0]
    assert sum(
        p.term_stats(["error"]).get("error", (0, 0))[0] for p in parts
    ) == full_df


def test_merge_with_rebase_shifts_doc_ids(spark, tmp_path):
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.index.merger import merge_stores
    from lucene_solr_spark.index.segments import write_segments
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.query import TermQuery

    def mk(name, texts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        d = str(tmp_path / name)
        return write_segments(
            build_index(spark, docs), d, n_buckets=2, split_range=64
        )

    a = mk("a", ["alpha beta", "alpha gamma", "beta beta"])
    b = mk("b", ["alpha alpha", "delta"])
    merged = merge_stores(
        spark, [a.index_dir, b.index_dir], str(tmp_path / "m"),
        rebase=True,
    )
    # docBase shift: source b's doc 0 becomes 3
    assert merged.stats.max_doc == 5
    hits = Searcher(merged).search(TermQuery("alpha"), 10).collect()
    assert sorted(r["doc_id"] for r in hits) == [0, 1, 3]
    # delta lives only in source b, shifted
    d_hits = Searcher(merged).search(TermQuery("delta"), 10).collect()
    assert [r["doc_id"] for r in d_hits] == [4]
    # df/ttf re-aggregated across sources
    stats = {
        r["term"]: (r["df"], r["ttf"])
        for r in merged.terms_stats.collect()
    }
    assert stats["alpha"] == (3, 4)
    # doc store shifted too
    assert merged.docs.where(F.col("doc_id") == 4).count() == 1


def test_merge_requires_compatible_stores(spark, tmp_path):
    import pytest as _pytest

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.index.merger import merge_stores
    from lucene_solr_spark.index.segments import write_segments

    docs = spark.createDataFrame(
        [(0, "x y")], "doc_id long, text string"
    )
    a = write_segments(
        build_index(spark, docs), str(tmp_path / "sa"), n_buckets=2
    )
    b = write_segments(
        build_index(spark, docs), str(tmp_path / "sb"), n_buckets=4
    )
    with _pytest.raises(ValueError, match="n_buckets"):
        merge_stores(
            spark, [a.index_dir, b.index_dir], str(tmp_path / "sm")
        )
