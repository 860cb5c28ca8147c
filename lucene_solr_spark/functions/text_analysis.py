"""Text-analysis operators for a training-data pipeline, Spark-native.

Each returns a DataFrame transformation built ONLY from built-in
functions (JVM expressions — no Python in the hot path), so they hold up
at 100 TB: embarrassingly parallel projections, no shuffle.

  - token_count: whitespace count + analyzer token count
  - quality_score: length/punct/stopword-ratio features -> [0,1] score
  - lang_id: marker-token heuristic (deterministic, SQL-mirrorable)
  - fingerprint: md5 over sorted distinct analyzed tokens (the
    Solr update-dedup Signature analogue,
    solr/core/src/java/org/apache/solr/update/processor/
    SignatureUpdateProcessorFactory.java / TextProfileSignature)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .spark_text import STOPWORDS_SORTED, analyzed_tokens, raw_tokens

# tiny deterministic per-language marker sets (content-based heuristic;
# real models would be a broadcast table — the *shape* is what matters)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    ws = F.size(
        F.filter(F.split(t, r"\s+"), lambda x: F.length(x) > 0)
    )
    return df.withColumn("ws_tokens", ws).withColumn(
        "analyzer_tokens", F.size(analyzed_tokens(t))
    )


def quality_features(text: Column) -> dict[str, Column]:
    raw = raw_tokens(text)
    n_raw = F.size(raw)
    n_stop = F.size(
        F.filter(raw, lambda x: x.isin(STOPWORDS_SORTED))
    )
    n_chars = F.length(text)
    alnum = F.length(F.regexp_replace(text, r"[^A-Za-z0-9]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_raw.cast("long"),
        "stop_ratio": F.when(n_raw > 0, n_stop.cast("double") / n_raw)
        .otherwise(F.lit(0.0)),
        "alnum_ratio": F.when(n_chars > 0, alnum.cast("double") / n_chars)
        .otherwise(F.lit(0.0)),
        "mean_token_len": F.when(
            n_raw > 0,
            F.aggregate(
                raw, F.lit(0.0), lambda acc, x: acc + F.length(x)
            )
            / n_raw,
        ).otherwise(F.lit(0.0)),
    }


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality score in [0,1]: rewards alnum density,
    moderate stopword ratio, and useful length. SQL mirror in oracles.py
    keeps the exact arithmetic order."""
    feats = quality_features(F.col(text_col))
    for name, col in feats.items():
        df = df.withColumn(name, col)
    length_norm = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * F.col("alnum_ratio")
        + F.lit(0.3) * length_norm
        + F.lit(0.3) * (F.lit(1.0) - F.abs(F.col("stop_ratio") - F.lit(0.4)))
    )
    return df.withColumn("quality", F.round(score, 4))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-count language heuristic; 'und' when no markers hit.
    Deterministic tie-break: higher count wins, then language code asc."""
    raw = raw_tokens(F.col(text_col))

    def _in(markers: list[str]):
        # NB: F.filter treats a 2-arg lambda as (element, index) — keep
        # the lambda unary and close over the marker list instead.
        return lambda x: x.isin(markers)

    counts = [
        (lang, F.size(F.filter(raw, _in(markers))))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best_count = F.greatest(*[c for _, c in counts])
    pred = F.lit("und")
    # evaluate in reverse-alphabetical so the earliest alphabetical lang
    # wins ties via the final when() chain
    for lang, c in reversed(counts):
        pred = F.when((c == best_count) & (best_count > 0), F.lit(lang)).otherwise(
            pred
        )
    return df.withColumn("lang_pred", pred)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the space-joined sorted distinct
    analyzed tokens — order-insensitive content signature."""
    toks = analyzed_tokens(F.col(text_col))
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    return df.withColumn("fingerprint", fp)


def with_clean_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-pipeline text normalization, pure column expressions
    (whole-stage codegen, no UDF): strip C0 control characters to
    spaces, collapse whitespace runs to one space, trim. Adds
    ``clean_text`` and ``n_chars_clean``. At 100 TB this is a
    map-only pass — no shuffle, fully pushed through the scan."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.col(text_col), "[\\x00-\\x08\\x0b-\\x1f]", " "
            ),
            "\\s+",
            " ",
        )
    )
    return df.withColumn("clean_text", cleaned).withColumn(
        "n_chars_clean", F.length("clean_text")
    )


def with_split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    hash of the document id: bucket = md5(id)[:4] as int % 100. Stable
    across runs/partitionings (never rand()-based — resumable pipelines
    need replayable splits), mirrors exactly in ANSI SQL, and at 10^12
    docs is a map-only projection."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


# PII patterns — identical Java-regex/RE2-safe syntax on both the
# engine (Spark regexp_replace) and oracle (DuckDB 'g' flag) sides:
# character classes only, no lookaround.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_URL = "https?://[^\\s]+"


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-pipeline PII scrubbing, pure column expressions: mask
    emails -> <EMAIL> and URLs -> <URL>, and count the redacted spans
    (``n_redacted``) so pipelines can filter or audit. Email masking
    runs first so mailto-like strings inside URLs count once as URLs.
    Map-only — no shuffle, whole-stage codegen, pushed through the
    scan at 100 TB."""
    n_red = F.size(
        F.expr(f"regexp_extract_all({text_col}, '{PII_EMAIL}', 0)")
    ) + F.size(F.expr(f"regexp_extract_all({text_col}, '{PII_URL}', 0)"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>"),
        PII_URL,
        "<URL>",
    )
    return df.withColumn("redacted", redacted).withColumn(
        "n_redacted", n_red.cast("long")
    )


def with_repetition_ratio(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Gopher-style repetition quality signal (Rae et al. 2021 §A1.1:
    'fraction of characters in duplicate n-grams'; here the simpler
    duplicate n-gram FRACTION over [a-z0-9]+ tokens): rep = 1 -
    distinct_ngrams/total_ngrams, 0.0 for docs shorter than n tokens.
    Entirely Catalyst array ops (regexp_extract_all -> transform ->
    array_distinct) — no UDF, no shuffle; the heavy-duplication tail
    this flags is exactly what LLM training pipelines drop."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    df = df.withColumn("__toks", toks)
    sz = F.size("__toks")
    grams = F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("__toks", i + j) for j in range(n)]
        ),
    )
    rep = F.when(sz < n, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double")
        / F.size(grams).cast("double")
    )
    return df.withColumn("rep_ratio", rep).drop("__toks")
