"""Scalable dense docID assignment — Lucene insertion-order docIDs
(segment docBase + local id, lucene/core/.../index/
AtomicReaderContext.java:30-42) re-expressed without a single-partition
window.

A naive ``row_number() OVER (ORDER BY ...)`` collapses to one partition.
Instead: range-partition by the order key, sort within partitions, count
per partition, broadcast the cumulative offsets (the per-segment docBase),
and add ``docBase + local_row_number`` per partition — exactly Lucene's
global docID = docBase + segment-local id, and it scales linearly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def assign_doc_ids(
    df: DataFrame, order_cols: list[str], doc_id_col: str = "doc_id"
) -> DataFrame:
    sdf = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    sdf = sdf.withColumn("_pid", F.spark_partition_id())
    # Persist so the partition layout is identical between the count pass
    # and the numbering pass (AQE may otherwise re-coalesce between jobs).
    sdf = sdf.persist()
    counts = (
        sdf.groupBy("_pid").count().orderBy("_pid").collect()
    )  # tiny: one row per partition (the segments_N manifest analogue)
    bases: dict[int, int] = {}
    acc = 0
    for r in counts:
        bases[int(r["_pid"])] = acc
        acc += int(r["count"])
    out_schema = StructType(
        sdf.schema.fields + [StructField(doc_id_col, LongType(), False)]
    )
    bases_local = dict(bases)

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{doc_id_col: pd.Series([], dtype="int64")})
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = bases_local[pid] + seen.get(pid, 0)
            seen[pid] = seen.get(pid, 0) + len(pdf)
            pdf = pdf.copy()
            pdf[doc_id_col] = pd.RangeIndex(start, start + len(pdf)).astype(
                "int64"
            )
            yield pdf

    return sdf.mapInPandas(add_ids, out_schema).drop("_pid")
