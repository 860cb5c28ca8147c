"""SimpleText postings dump — the human-readable debug codec.

Reference: lucene/codecs/src/java/org/apache/lucene/codecs/simpletext/
SimpleTextFieldsWriter.java:20-40 — the exact line vocabulary:

    field <name>
      term <term>
        doc <docID>
          freq <tf>
          pos <position>        (one line per occurrence)
    END

Terms are written in BytesRef UTF-8 order (identical to code-point
order for the ASCII vocabularies here), docs ascending within a term,
positions ascending within a doc.

Spark shape: the dump is a pure Catalyst projection over the flat
postings (line arrays built with concat/transform, term headers
attached at each term's first doc via a window), exploded with
posexplode to preserve intra-doc order, then numbered with one global
row_number. The final ordering window is single-partition — fine for
a debug artifact; a 100 TB dump would instead sortWithinPartitions
and write numbered part files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def simpletext_dump(
    index,
    field_name: str = "text",
    terms: list[str] | None = None,
) -> DataFrame:
    """(line_no, line) rows of the SimpleText postings file for the
    given terms (or every term when ``terms`` is None)."""
    p = index.postings.select("term", "doc_id", "tf", "positions")
    if terms is not None:
        p = p.where(F.col("term").isin(list(terms)))
    doc_lines = F.array(
        F.concat(F.lit("    doc "), F.col("doc_id").cast("string")),
        F.concat(F.lit("      freq "), F.col("tf").cast("string")),
    )
    pos_lines = F.coalesce(
        F.transform(
            "positions",
            lambda x: F.concat(F.lit("      pos "), x.cast("string")),
        ),
        F.array().cast("array<string>"),
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    lines = F.concat(doc_lines, pos_lines)
    # the window must resolve before posexplode sees it — two selects
    staged = p.select(
        "term",
        "doc_id",
        F.when(
            F.row_number().over(w) == 1,
            F.concat(
                F.array(F.concat(F.lit("  term "), F.col("term"))),
                lines,
            ),
        )
        .otherwise(lines)
        .alias("lines"),
    )
    body = staged.select(
        F.lit(1).alias("sect"),
        "term",
        "doc_id",
        F.posexplode("lines").alias("idx", "line"),
    )
    header = index.spark.createDataFrame(
        [(0, "", -1, 0, f"field {field_name}"), (2, "", -1, 0, "END")],
        "sect int, term string, doc_id long, idx int, line string",
    )
    ordered = Window.orderBy("sect", "term", "doc_id", "idx")
    return (
        body.unionByName(header)
        .select(
            F.row_number().over(ordered).cast("long").alias("line_no"),
            "line",
        )
    )
