"""ExternalFileField — per-document floats from a side file, as a
ValueSource.

Reference: solr/core/src/java/org/apache/solr/schema/
ExternalFileField.java + solr/core/.../search/function/
FileFloatSource.java:213-280 — a ``key=value`` text file in the data
dir supplies a float per uniqueKey (boosts computed outside the index:
pagerank, CTR, freshness), readable in function queries without
re-indexing. Parse rules (getFloats): split at the LAST '=', lines
without '=' skipped, unparsable floats skipped, later lines overwrite
earlier ones, missing keys get the default. VersionedFile semantics:
``external_<field>.*`` files sort by name and the latest wins.

Spark-first: the file reads through ``spark.read.text`` (distributed —
a 10^12-key boost file is just another table), parses with Catalyst
expressions, resolves last-wins per key, and joins onto the doc store
as a broadcast or shuffle join depending on size. The reference's
float[maxDoc] materialization becomes a column, which is exactly what
a function query needs.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_FLOAT_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def latest_external_file(data_dir: str, field: str) -> str:
    """VersionedFile.getLatestFile: among external_<field>* files the
    lexicographically-greatest name is current."""
    cands = sorted(glob.glob(os.path.join(data_dir, f"external_{field}*")))
    if not cands:
        raise FileNotFoundError(
            f"no external_{field}* under {data_dir}"
        )
    return cands[-1]


def external_file_values(
    spark: SparkSession,
    path: str,
    key_type: str = "long",
) -> DataFrame:
    """Parse one key=value file -> (key, value float), last occurrence
    per key winning, exactly as FileFloatSource.getFloats assigns
    sequentially. Line order is recovered from the read order within
    the file (monotonically_increasing_id is ordered by (split, row)
    and text splits follow file offsets)."""
    lines = spark.read.text(path).withColumn(
        "__ord", F.monotonically_increasing_id()
    )
    # key = before the LAST '=', val = after it
    key = F.expr("substring(value, 1, length(value) - length(element_at(split(value, '=', -1), -1)) - 1)")
    val = F.element_at(F.split(F.col("value"), "=", -1), -1)
    parsed = (
        lines.where(F.col("value").contains("="))
        .select(
            key.try_cast(key_type).alias("key"),
            F.when(
                val.rlike(_FLOAT_RE), val.try_cast("float")
            ).alias("v"),
            "__ord",
        )
        .where(F.col("v").isNotNull() & F.col("key").isNotNull())
    )
    return (
        parsed.groupBy("key")
        .agg(F.max_by("v", "__ord").alias("value"))
    )


def with_external_field(
    docs: DataFrame,
    values: DataFrame,
    out_col: str,
    key_col: str = "doc_id",
    default: float = 0.0,
) -> DataFrame:
    """Attach the external float as a column (the float[] of
    FileFloatSource becomes a broadcastable dim join; Spark/AQE picks
    broadcast vs shuffle by size)."""
    v = values.select(
        F.col("key").alias(key_col), F.col("value").alias(out_col)
    )
    return docs.join(v, key_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(float(default)))
    )
