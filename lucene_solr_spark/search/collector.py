"""Custom Collector extension point — applyInPandas over scored rows.

Reference: lucene/core/src/java/org/apache/lucene/search/Collector.java —
a Collector consumes (doc, score) pairs per segment leaf and accumulates
arbitrary state; TopScoreDocCollector / TotalHitCountCollector /
grouping collectors are all instances.

Spark analogue: a collector is a vectorized kernel over the scored
(doc_id, score) frame. Per-partition accumulation (the per-leaf
collect()) runs inside ``mapInPandas``; the cross-partition merge (the
reduce over leaf collectors) is a plain groupBy on the collector's
output key — exactly Lucene's per-segment collect + merge split, so a
collector written once scales from one partition to thousands.

``ScoreHistogramCollector`` ships as the worked example (the pattern a
user copies to build t-digests, top-k-per-key, sampling collectors...).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher
from .query import Query


def collect(
    searcher: Searcher,
    q: Query,
    partition_kernel: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    kernel_schema: str,
    merge: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Run ``q``, stream scored rows through the per-partition kernel
    (Collector.collect analogue), then merge partials (the
    per-segment-collector reduce)."""
    scored = searcher.score(q)
    partials = scored.mapInPandas(partition_kernel, kernel_schema)
    return merge(partials)


class ScoreHistogramCollector:
    """Histogram of scores in fixed-width buckets — bucket =
    floor(score / width). Worked Collector example; per-partition counts
    merge by summation."""

    def __init__(self, width: float = 0.1):
        self.width = float(width)

    def kernel(self):
        width = self.width

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                if not len(pdf):
                    continue
                b = np.floor(
                    pdf["score"].to_numpy(dtype=np.float64) / width
                ).astype(np.int64)
                vc = pd.Series(b).value_counts()
                yield pd.DataFrame(
                    {
                        "bucket": vc.index.astype("int64"),
                        "cnt": vc.to_numpy(dtype="int64"),
                    }
                )

        return run

    def merge(self, partials: DataFrame) -> DataFrame:
        return (
            partials.groupBy("bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy("bucket")
        )

    def run(self, searcher: Searcher, q: Query) -> DataFrame:
        return collect(
            searcher, q, self.kernel(), "bucket long, cnt long", self.merge
        )
