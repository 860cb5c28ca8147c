"""ComplexPhraseQueryParser: wildcard/fuzzy phrase slots vs a per-doc
brute-force oracle (ComplexPhraseQueryParser.java:197-283)."""

import pytest


@pytest.fixture(scope="module")
def searcher(small_index):
    from lucene_solr_spark.search.executor import Searcher

    return Searcher(small_index)


def _brute(pdf, slot_preds, slop):
    """Docs with an ordered assignment of one position per slot,
    strictly increasing, total gap <= slop."""
    from lucene_solr_spark.analysis.tokenizer import analyze

    out = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        terms, positions = analyze(text)
        slots = [
            [p for t, p in zip(terms, positions) if pred(t)]
            for pred in slot_preds
        ]
        if any(not s for s in slots):
            continue

        def assigns(i, prev, gap):
            if gap > slop:
                return False
            if i == len(slots):
                return True
            return any(
                assigns(
                    i + 1,
                    p,
                    gap + (max(0, p - prev - 1) if prev >= 0 else 0),
                )
                for p in slots[i]
                if prev < 0 or p > prev
            )

        if assigns(0, -1, 0):
            out.append(int(doc_id))
    return sorted(out)


def test_fuzzy_slot_matches_brute(searcher, small_pdf):
    from lucene_solr_spark.search.complexphrase import (
        complex_phrase_doc_ids,
    )

    def lev1(t):
        import difflib

        # exact levenshtein <= 1 via dp (tiny strings)
        a, b = t, "error"
        if abs(len(a) - len(b)) > 1:
            return False
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1] <= 1

    want = _brute(
        small_pdf,
        [lev1, lambda t: t == "shard"],
        slop=1,
    )
    got = sorted(
        r["doc_id"]
        for r in complex_phrase_doc_ids(
            searcher, "error~1 shard", slop=1
        ).collect()
    )
    assert want and got == want


def test_wildcard_slot_matches_brute(searcher, small_pdf):
    import re

    from lucene_solr_spark.search.complexphrase import (
        complex_phrase_doc_ids,
    )

    rx = re.compile(r"^err.r$")
    want = _brute(
        small_pdf,
        [lambda t: bool(rx.match(t)), lambda t: t == "shard"],
        slop=0,
    )
    got = sorted(
        r["doc_id"]
        for r in complex_phrase_doc_ids(
            searcher, "err?r shard", slop=0
        ).collect()
    )
    assert want and got == want


def test_single_slot_rejected(searcher):
    from lucene_solr_spark.search.complexphrase import (
        complex_phrase_doc_ids,
    )

    with pytest.raises(ValueError):
        complex_phrase_doc_ids(searcher, "solo")
