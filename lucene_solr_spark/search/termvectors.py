"""TermVectorComponent analogue — per-document term vectors.

Reference: solr/core/src/java/org/apache/solr/handler/component/
TermVectorComponent.java (returns tf / positions / df per term of one
document) over Lucene40TermVectorsWriter's per-doc mini inverted index.

The engine never stores term vectors (SURVEY.md §1.1: derivable on
demand) — a vector is produced DOC-MAJOR by re-analyzing the one stored
text row, exactly the path MoreLikeThis uses, then joined to broadcast
df stats. One driver-side row fetch + one pruned terms_stats lookup; the
inverted postings store is never decoded.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher


def term_vector(
    searcher: Searcher,
    doc_id: int,
    with_df: bool = True,
    with_tf_idf: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """(term, tf[, df][, tf_idf]) for one document, ordered by term.
    ``with_tf_idf`` adds TermVectorComponent's tv.tf_idf value —
    tf / df as a float (S/handler/component/TermVectorComponent.java
    TVMapper, the literal frequency ratio the component returns)."""
    from ..analysis.tokenizer import analyze

    idx = searcher.index
    row = (
        idx.docs.where(F.col("doc_id") == doc_id)
        .select(text_col)
        .collect()
    )
    spark = idx.spark
    if not row:
        return spark.createDataFrame(
            [], "term string, tf long" + (", df long" if with_df else "")
        )
    terms_seq, _ = analyze(row[0][text_col])
    counts = sorted(Counter(terms_seq).items())
    out = spark.createDataFrame(
        [(t, int(c)) for t, c in counts], "term string, tf long"
    )
    if with_df:
        stats = idx.term_stats([t for t, _ in counts])
        df_map = F.create_map(
            *[
                x
                for t, _ in counts
                for x in (F.lit(t), F.lit(int(stats.get(t, (0, 0))[0])))
            ]
        )
        out = out.withColumn("df", df_map[F.col("term")].cast("long"))
        if with_tf_idf:
            out = out.withColumn(
                "tf_idf",
                F.round(
                    F.col("tf").cast("double")
                    / F.col("df").cast("double"),
                    6,
                ),
            )
    return out.orderBy("term")
