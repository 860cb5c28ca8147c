"""Session windows + custom stateful operators (task brief: Structured
Streaming with watermarks/windowed aggs, `applyInPandasWithState` for
custom stateful operators).

Batch/stream duality: `sessionize` uses Spark's native
``session_window`` (gap-merged event-time sessions — works identically
over a batch DataFrame and a watermarked stream), so the DuckDB oracle
can pin it with a gap-and-island SQL twin. `running_totals_stateful`
is the custom-stateful-operator slot: per-key state carried across
micro-batches in GroupState via ``applyInPandasWithState``.

Scale shape: session_window is one shuffle on the session key with
state-store-backed merging on streams; the stateful operator keeps one
tiny state row per key (RocksDB state store on a real cluster).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per key: (key, session_start, session_end,
    n_events, sum_value). session_end = last event + gap (Spark
    session_window semantics). Works on batch frames and watermarked
    streams alike."""
    return (
        df.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            key_col,
            F.date_format(
                F.col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("session_start"),
            F.date_format(
                F.col("sw.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def running_totals_stateful(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-key running (cnt, sum_value) held in GroupState across
    micro-batches, one updated row emitted per key per batch. The
    final emission per key must equal the batch groupBy aggregate —
    pinned by tests/test_sessions.py."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            cnt, sv = state.get
        else:
            cnt, sv = 0, 0.0
        for pdf in pdfs:
            cnt += len(pdf)
            sv += float(pdf[value_col].sum())
        state.update((cnt, sv))
        yield pd.DataFrame(
            {key_col: [key[0]], "cnt": [cnt], "sum_value": [sv]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} string, cnt long, sum_value double",
        stateStructType="cnt long, sum_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
