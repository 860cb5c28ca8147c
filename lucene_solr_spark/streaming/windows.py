"""Event-time windowed aggregation with late-data handling.

The reference has no stream processing (SURVEY.md §2.10) — its nearest
analogue is range faceting over a time field (S/request/SimpleFacets.java
getFacetRangeCounts). This module is the Structured Streaming expression
of that operator for unbounded inputs: tumbling event-time windows with a
watermark bounding state and late arrivals.

Scale notes: the windowed agg is a partial+final hash aggregate keyed by
(window, group) — state per live window only; the watermark evicts state
and finalizes windows, so executor memory is bounded by (watermark /
window) * |groups| regardless of stream length.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    slide: str | None = None,
) -> DataFrame:
    """(window, event_type, cnt, sum_value) — works on both batch and
    streaming DataFrames (the same plan, per Structured Streaming's
    unified semantics; on a stream add a sink with append output mode and
    only watermark-finalized windows emit). ``slide`` < window makes the
    windows SLIDING (each event lands in window/slide windows; state per
    live window, still watermark-bounded)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        src.groupBy(
            win.alias("win"),
            F.col(type_col),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            type_col,
            "cnt",
            "sum_value",
        )
    )
