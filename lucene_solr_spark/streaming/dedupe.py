"""Streaming exact dedup — ingest-time duplicate suppression with
bounded state.

The batch dedup family (datapipe/dedup.py) assumes the corpus is at
rest; a training-data INGEST stream needs the same guarantee online.
Reference anchor: SignatureUpdateProcessorFactory (solr/core/.../
update/processor/SignatureUpdateProcessorFactory.java) runs per added
document at ingest; Structured Streaming's analogue is
``dropDuplicatesWithinWatermark`` over the signature (without
watermark-scoped eviction, state grows with every distinct signature
ever seen — unbounded at 10^12 turns; with it, Spark evicts
signatures once the watermark passes their event time, trading
cross-horizon duplicate detection for O(window) state — the standard
streaming-dedup contract).

``first_occurrences_batch`` is the batch twin: the exact set a
perfectly-ordered stream (no late data beyond the watermark) must
emit, used by the stream==batch test.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text_analysis import with_fingerprint


def with_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content signature column (the MD5Signature analogue used by the
    batch dedup_exact path — md5 over sorted distinct analyzed
    tokens)."""
    return with_fingerprint(df, text_col=text_col)


def deduped_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    text_col: str = "text",
    signature_col: str | None = None,
) -> DataFrame:
    """Streaming dedup: first arrival per signature inside the
    watermark horizon passes, later duplicates drop.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+): plain
    ``dropDuplicates([sig])`` only evicts state when the event-time
    column is PART of the dedup subset, so keyed-by-signature state
    would grow with every distinct signature ever seen — exactly the
    unbounded failure mode this module exists to avoid. The
    WithinWatermark variant keys state by the subset but expires each
    key once the watermark passes its event time, giving the stated
    O(window) state bound."""
    d = (
        stream_df
        if signature_col
        else with_signature(stream_df, text_col)
    )
    sig = signature_col or "fingerprint"
    return d.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [sig]
    )


def first_occurrences_batch(
    df: DataFrame,
    ts_col: str = "ts",
    order_col: str = "doc_id",
    text_col: str = "text",
    signature_col: str | None = None,
) -> DataFrame:
    """Batch twin: the earliest row (ts, then order_col) per
    signature — what an in-order stream emits."""
    d = df if signature_col else with_signature(df, text_col)
    sig = signature_col or "fingerprint"
    w = F.struct(F.col(ts_col), F.col(order_col))
    keep = d.groupBy(sig).agg(F.min(w).alias("__first"))
    return (
        d.join(keep, sig)
        .where(
            (F.col(ts_col) == F.col("__first")[ts_col])
            & (F.col(order_col) == F.col("__first")[order_col])
        )
        .drop("__first")
    )
