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


def with_gopher_rules(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, §A1.1 — the document
    filter set of the Gopher/MassiveText pipeline), each as a boolean
    column plus the overall verdict.  Pure Catalyst projections — one
    whole-stage-codegen pass, no shuffle:

      gr_word_count      50 <= #words <= 100,000
      gr_mean_word_len   3 <= mean word length <= 10
      gr_hash_ratio      #'#' / #words <= 0.1
      gr_ellipsis_ratio  #'...' / #lines <= 0.3  (lines = \\n splits)
      gr_bullet_ratio    <= 90% of lines start with a bullet
      gr_stop_presence   >= 2 of the 8 Gopher indicator stopwords
      gr_alpha_ratio     >= 80% of words contain an alphabetic char
      gopher_pass        all of the above
    """
    words = F.expr(
        f"regexp_extract_all({text_col}, '[^\\\\s]+', 0)"
    )
    nw = F.size(words).cast("double")
    lines = F.split(F.col(text_col), "\n")
    nl = F.size(lines).cast("double")
    mean_len = (
        F.length(F.regexp_replace(F.col(text_col), "\\s+", ""))
        / F.greatest(nw, F.lit(1.0))
    )
    n_hash = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), "#", ""))
    ).cast("double")
    n_ellipsis = F.size(
        F.expr(f"regexp_extract_all({text_col}, '\\\\.\\\\.\\\\.', 0)")
    ).cast("double")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.rlike("^\\s*([-*•])"),
        )
    ).cast("double")
    # the 8 indicator words (Gopher §A1.1: and, the, to, of + 4 more
    # common function words; presence of >= 2 in the doc)
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    n_stops = sum(
        F.when(
            F.col(text_col).rlike(f"(^|\\s){w}(\\s|$)"), 1
        ).otherwise(0)
        for w in stops
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("double")
    checks = {
        "gr_word_count": (nw >= 50) & (nw <= 100000),
        "gr_mean_word_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "gr_hash_ratio": (n_hash / F.greatest(nw, F.lit(1.0))) <= 0.1,
        "gr_ellipsis_ratio": (
            n_ellipsis / F.greatest(nl, F.lit(1.0))
        ) <= 0.3,
        "gr_bullet_ratio": (
            n_bullet / F.greatest(nl, F.lit(1.0))
        ) <= 0.9,
        "gr_stop_presence": n_stops >= F.lit(2),
        "gr_alpha_ratio": (
            n_alpha_words / F.greatest(nw, F.lit(1.0))
        ) >= 0.8,
    }
    out = df
    verdict = F.lit(True)
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
        verdict = verdict & F.col(name)
    return out.withColumn("gopher_pass", verdict)


def with_c4_filters(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, §2.2 — the filters that
    produced the Colossal Clean Crawled Corpus), as boolean columns +
    verdict; line-level rules are computed over \\n splits.  Pure
    Catalyst, no shuffle:

      c4_min_words      >= 5 words
      c4_no_lorem       no 'lorem ipsum'
      c4_no_braces      no '{' (code page indicator)
      c4_no_badlines    >= 50% of lines end with terminal punctuation
      c4_min_sentences  >= 3 sentences (terminal-punctuation splits)
    """
    words = F.expr(
        f"regexp_extract_all({text_col}, '[^\\\\s]+', 0)"
    )
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines).cast("double")
    n_good_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike("[.!?\"']\\s*$"))
    ).cast("double")
    n_sentences = F.size(
        F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")
    )
    checks = {
        "c4_min_words": F.size(words) >= 5,
        "c4_no_lorem": ~F.lower(F.col(text_col)).contains(
            "lorem ipsum"
        ),
        "c4_no_braces": ~F.col(text_col).contains("{"),
        "c4_no_badlines": (
            n_good_lines / F.greatest(n_lines, F.lit(1.0))
        ) >= 0.5,
        "c4_min_sentences": n_sentences >= 3,
    }
    out = df
    verdict = F.lit(True)
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
        verdict = verdict & F.col(name)
    return out.withColumn("c4_pass", verdict)


def with_gopher_repetition(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher repetition signals (Rae et al. 2021 §A1.2 — the
    duplicate-content rules that complement the §A1.1 quality rules),
    one pure-Catalyst projection per doc, no shuffle:

      rep_dup_line_frac        1 - distinct_lines/total_lines
      rep_dup_line_char_frac   chars in lines occurring >1x / total
                               line chars
      rep_top2gram_char_frac   token-chars covered by occurrences of
                               the most frequent 2-gram / total token
                               chars (tie-break: lexicographically
                               greatest gram at the max count)
      rep_dup3gram_char_frac   token-chars of 3-gram occurrences
                               whose gram repeats / total 3-gram
                               occurrence chars

    Character counts are over token characters (separators excluded),
    making the SQL twin exact; the paper's thresholds are applied by
    the caller.
    """
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    )
    out = df.withColumn("__toks", toks).withColumn(
        "__lines", F.split(F.col(text_col), "\n")
    )
    lines, tks = F.col("__lines"), F.col("__toks")
    nl = F.size(lines).cast("double")
    dup_line_frac = F.when(nl <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(lines)) / nl
    )
    line_chars = F.expr(
        "aggregate(__lines, 0L, (a, x) -> a + length(x))"
    ).cast("double")
    dup_line_chars = F.expr(
        "aggregate(transform(__lines, l -> struct(l AS l, "
        "size(filter(__lines, x -> x = l)) AS c)), 0L, "
        "(a, s) -> a + IF(s.c > 1, length(s.l), 0L))"
    ).cast("double")
    dup_line_char_frac = F.when(
        line_chars <= 0, F.lit(0.0)
    ).otherwise(dup_line_chars / line_chars)

    def grams_expr(n):
        return (
            f"CASE WHEN size(__toks) >= {n} THEN "
            f"transform(sequence(1, size(__toks) - {n - 1}), "
            "i -> concat_ws(' ', "
            + ", ".join(f"__toks[i + {j} - 1]" for j in range(n))
            + ")) ELSE array() END"
        )

    out = out.withColumn("__g2", F.expr(grams_expr(2))).withColumn(
        "__g3", F.expr(grams_expr(3))
    )
    tok_chars = F.expr(
        "aggregate(__toks, 0L, (a, x) -> a + length(x))"
    ).cast("double")
    # most frequent 2-gram: max count, then lexicographically greatest
    top2_cnt = F.expr(
        "array_max(transform(array_distinct(__g2), "
        "g -> size(filter(__g2, x -> x = g))))"
    )
    top2_gram = F.expr(
        "array_max(filter(array_distinct(__g2), "
        "g -> size(filter(__g2, x -> x = g)) = "
        "array_max(transform(array_distinct(__g2), "
        "h -> size(filter(__g2, x -> x = h))))))"
    )
    top2_chars = (
        top2_cnt.cast("double")
        * (F.length(top2_gram) - 1).cast("double")  # minus the space
    )
    top2_frac = F.when(
        (F.size(F.col("__g2")) <= 0) | (tok_chars <= 0), F.lit(0.0)
    ).otherwise(top2_chars / tok_chars)
    g3_chars = F.expr(
        "aggregate(__g3, 0L, (a, x) -> a + length(x) - 2)"
    ).cast("double")
    dup3_chars = F.expr(
        "aggregate(transform(__g3, g -> struct(g AS g, "
        "size(filter(__g3, x -> x = g)) AS c)), 0L, "
        "(a, s) -> a + IF(s.c > 1, length(s.g) - 2, 0L))"
    ).cast("double")
    dup3_frac = F.when(g3_chars <= 0, F.lit(0.0)).otherwise(
        dup3_chars / g3_chars
    )
    return (
        out.withColumn("rep_dup_line_frac", dup_line_frac)
        .withColumn("rep_dup_line_char_frac", dup_line_char_frac)
        .withColumn("rep_top2gram_char_frac", top2_frac)
        .withColumn("rep_dup3gram_char_frac", dup3_frac)
        .drop("__toks", "__lines", "__g2", "__g3")
    )
