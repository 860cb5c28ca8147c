"""CheckIndex — distributed index integrity verification.

Reference: lucene/core/src/java/org/apache/lucene/index/CheckIndex.java
(the checkIndex() segment walk: terms/postings cross-checks, docFreq
vs enumerated postings, totalTermFreq vs summed freqs, doc count vs
maxDoc, position sanity per freq — :430-700's testTerms/testPostings).

Spark shape: every check is ONE aggregate over the decoded postings or
the doc store — distributed, no driver iteration; the postings decode
is the same pruned block scan queries use, so CheckIndex cost scales
like one full scan (exactly the reference's one-pass walk).
Returns (check, ok, detail) rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .segments import SegmentIndex


def check_index(seg: SegmentIndex) -> DataFrame:
    """Run the integrity checks; one row per check."""
    spark = seg.spark
    rows: list[tuple[str, bool, str]] = []

    man = seg.manifest
    rows.append(
        (
            "manifest",
            bool(man) and "generation" in man and "max_doc" in man,
            f"generation={man.get('generation')}",
        )
    )

    n_docs = seg.docs.count()
    ok = n_docs == int(man["max_doc"])
    rows.append(
        ("doc_count", ok, f"docs={n_docs} manifest={man['max_doc']}")
    )

    decoded = seg.postings.select("term", "doc_id", "tf")
    agg = decoded.groupBy("term").agg(
        F.count(F.lit(1)).alias("df2"),
        F.sum("tf").cast("long").alias("ttf2"),
    )
    mism = (
        seg.terms_stats.join(agg, "term", "full_outer")
        .where(
            F.col("df").isNull()
            | F.col("df2").isNull()
            | (F.col("df") != F.col("df2"))
            | (F.col("ttf") != F.col("ttf2"))
        )
        .count()
    )
    rows.append(
        (
            "terms_stats_vs_postings",
            mism == 0,
            f"mismatched_terms={mism}",
        )
    )

    sttf = decoded.agg(F.sum("tf")).collect()[0][0] or 0
    ok = int(sttf) == int(man["sum_total_term_freq"])
    rows.append(
        (
            "sum_total_term_freq",
            ok,
            f"decoded={sttf} manifest={man['sum_total_term_freq']}",
        )
    )

    bad_ids = decoded.where(
        (F.col("doc_id") < 0) | (F.col("doc_id") >= int(man["max_doc"]))
    ).count()
    rows.append(("doc_id_bounds", bad_ids == 0, f"out_of_range={bad_ids}"))

    if man.get("keep_positions"):
        posn = (
            seg.postings.select(
                "tf", F.size("positions").alias("np")
            )
            .where(F.col("np") != F.col("tf"))
            .count()
        )
        rows.append(
            ("positions_match_tf", posn == 0, f"mismatched={posn}")
        )

    return spark.createDataFrame(
        [(c, bool(o), d) for c, o, d in rows],
        "check string, ok boolean, detail string",
    )
