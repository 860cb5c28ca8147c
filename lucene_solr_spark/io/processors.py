"""UpdateRequestProcessor chain — ingest-time document mutation, Spark-native.

Reference: solr/core/src/java/org/apache/solr/update/processor/ — Solr
runs every added document through a configured chain of
UpdateRequestProcessors (UpdateRequestProcessorChain.java) before it
reaches the index writer. The Spark-first re-expression: each processor
is a DataFrame -> DataFrame transform built from pure Catalyst column
expressions (map-only, no shuffle, whole-stage codegen), and a chain is
their ordered composition. At 100 TB every one of these is an
embarrassingly parallel projection pushed into the ingest scan.

Field-mutating family (FieldMutatingUpdateProcessor.java and its
factories — Trim, Truncate, FieldLength, RemoveBlank, Ignore, Clone,
Concat, First/Last/Min/MaxFieldValue, Uniq, CountFieldValues,
RegexReplace, DefaultValue, Timestamp, UUID, HTMLStrip):
single-valued fields are plain columns, multi-valued fields are array
columns (the SolrInputDocument multi-value analogue).

URLClassifyProcessor (URLClassifyProcessor.java:1-230): URL metadata
enrichment — length / path levels / top-level / landing-page flags,
optional domain + canonical URL, after RFC-3986 dot-segment
normalization (getNormalizedURL's URI.normalize()).

TextProfileSignature (TextProfileSignature.java:50-140, the Nutch
near-duplicate page profile) + SignatureUpdateProcessorFactory
overwriteDupes semantics: quantized token-frequency profile -> md5;
docs sharing a signature collapse to one survivor.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# ---------------------------------------------------------------------------
# Field-mutating processors (FieldMutatingUpdateProcessorFactory family)
# ---------------------------------------------------------------------------


def trim_fields(df: DataFrame, *cols: str) -> DataFrame:
    """TrimFieldUpdateProcessorFactory: strip leading/trailing
    whitespace from string field values."""
    for c in cols:
        df = df.withColumn(c, F.trim(F.col(c)))
    return df


def truncate_fields(df: DataFrame, max_length: int, *cols: str) -> DataFrame:
    """TruncateFieldUpdateProcessorFactory: cap string values at
    ``maxLength`` characters."""
    for c in cols:
        df = df.withColumn(c, F.substring(F.col(c), 1, max_length))
    return df


def field_length(df: DataFrame, src: str, dst: str | None = None) -> DataFrame:
    """FieldLengthUpdateProcessorFactory: replace a string value with
    its character length (written to ``dst`` if given, else in place)."""
    return df.withColumn(dst or src, F.length(F.col(src)).cast("int"))


def remove_blank(df: DataFrame, *cols: str) -> DataFrame:
    """RemoveBlankFieldUpdateProcessorFactory: zero-length string
    values become missing (null)."""
    for c in cols:
        df = df.withColumn(
            c, F.when(F.col(c) != F.lit(""), F.col(c))
        )
    return df


def ignore_fields(df: DataFrame, *cols: str) -> DataFrame:
    """IgnoreFieldUpdateProcessorFactory: drop the fields entirely."""
    return df.drop(*cols)


def clone_field(df: DataFrame, src: str, dst: str) -> DataFrame:
    """CloneFieldUpdateProcessorFactory: copy a field's value into a
    second field (the ingest-side copyField)."""
    return df.withColumn(dst, F.col(src))


def concat_values(
    df: DataFrame, col: str, delimiter: str = ", "
) -> DataFrame:
    """ConcatFieldUpdateProcessorFactory: join a multi-valued (array)
    field's values into one delimited string."""
    return df.withColumn(col, F.array_join(F.col(col), delimiter))


def first_value(df: DataFrame, col: str) -> DataFrame:
    """FirstFieldValueUpdateProcessorFactory: keep only the first value
    of a multi-valued field (null for an empty one — F.get is
    out-of-bounds-safe under ANSI mode, unlike element_at)."""
    return df.withColumn(col, F.get(F.col(col), 0))


def last_value(df: DataFrame, col: str) -> DataFrame:
    """LastFieldValueUpdateProcessorFactory: keep only the last value."""
    return df.withColumn(col, F.get(F.col(col), F.size(F.col(col)) - 1))


def min_value(df: DataFrame, col: str) -> DataFrame:
    """MinFieldValueUpdateProcessorFactory: collapse to the minimum."""
    return df.withColumn(col, F.array_min(F.col(col)))


def max_value(df: DataFrame, col: str) -> DataFrame:
    """MaxFieldValueUpdateProcessorFactory: collapse to the maximum."""
    return df.withColumn(col, F.array_max(F.col(col)))


def uniq_values(df: DataFrame, col: str) -> DataFrame:
    """UniqFieldsUpdateProcessorFactory: de-duplicate a multi-valued
    field's values, preserving first-occurrence order."""
    return df.withColumn(col, F.array_distinct(F.col(col)))


def count_field_values(
    df: DataFrame, src: str, dst: str
) -> DataFrame:
    """CountFieldValuesUpdateProcessorFactory: number of values of a
    multi-valued field into ``dst``."""
    return df.withColumn(dst, F.size(F.col(src)).cast("int"))


def regex_replace(
    df: DataFrame, col: str, pattern: str, replacement: str
) -> DataFrame:
    """RegexReplaceProcessorFactory: regex-rewrite every value
    (replaceAll semantics, as the reference's Matcher.replaceAll)."""
    return df.withColumn(
        col, F.regexp_replace(F.col(col), pattern, replacement)
    )


def default_value(df: DataFrame, col: str, value) -> DataFrame:
    """DefaultValueUpdateProcessorFactory: fill missing (null) values
    with a constant."""
    return df.withColumn(col, F.coalesce(F.col(col), F.lit(value)))


def add_timestamp(df: DataFrame, col: str, now: str) -> DataFrame:
    """TimestampUpdateProcessorFactory: stamp documents lacking the
    field with the request time. ``now`` is explicit (an ISO instant)
    so a replayed ingest is deterministic — the distributed analogue of
    one NOW per update request."""
    return df.withColumn(
        col,
        F.coalesce(
            F.col(col) if col in df.columns else F.lit(None).cast("timestamp"),
            F.lit(now).cast("timestamp"),
        ),
    )


def uuid_field(df: DataFrame, col: str, *key_cols: str) -> DataFrame:
    """UUIDUpdateProcessorFactory analogue. The reference assigns
    UUID.randomUUID(); in a replayable distributed ingest a random id
    breaks checkpoint-resume (the same row would get a new id on
    retry), so this derives a name-based UUID (RFC 4122 version 3,
    like Java's UUID.nameUUIDFromBytes: version nibble forced to 3 AND
    variant nibble forced to 8/9/a/b via (n & 0x3) | 0x8) from the md5
    of the key columns — deterministic, collision behavior identical
    to the content hash."""
    h = F.md5(F.concat_ws(" ", *[F.col(c).cast("string") for c in key_cols]))
    # variant nibble: n -> 8 + (n & 3); as a hex-digit translation
    variant = F.translate(
        F.substring(h, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"
    )
    return df.withColumn(
        col,
        F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.concat(F.lit("3"), F.substring(h, 14, 3)),
            F.concat(variant, F.substring(h, 18, 3)),
            F.substring(h, 21, 12),
        ),
    )


class ProcessorChain:
    """UpdateRequestProcessorChain.java analogue: an ordered list of
    processors applied to every ingested batch. Each step is a
    ``DataFrame -> DataFrame`` callable; the chain composes them so the
    whole enrichment stays one Catalyst projection."""

    def __init__(self, *steps: Callable[[DataFrame], DataFrame]):
        self.steps = list(steps)

    def __call__(self, df: DataFrame) -> DataFrame:
        for step in self.steps:
            df = step(df)
        return df


# ---------------------------------------------------------------------------
# URLClassifyProcessor
# ---------------------------------------------------------------------------

# URLClassifyProcessor.java:70-87 landingPageSuffixes, in reference
# order ("/" first): the FIRST suffix the lowercased path ends with is
# the landing suffix.
LANDING_SUFFIXES = ["/"] + [
    f"{base}.{ext}"
    for base in ("index", "welcome")
    for ext in ("html", "htm", "phtml", "shtml", "xml", "php", "asp", "aspx")
]

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"


def normalize_urls(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """getNormalizedURL (URI.normalize()) analogue: RFC 3986 §5.2.4
    dot-segment removal on the path, pure Catalyst. The path is split
    on '/', folded left with aggregate(): '.' segments drop, '..'
    segments pop the previous segment — no Python in the hot path."""
    target = out or col
    scheme = F.regexp_extract(F.col(col), _URL_RE, 1)
    host = F.regexp_extract(F.col(col), _URL_RE, 2)
    path = F.regexp_extract(F.col(col), _URL_RE, 3)
    full = F.regexp_extract(F.col(col), _URL_RE, 0)
    # the tail after the match (the #fragment part) — Column.substr so
    # the regex never round-trips through SQL-literal escaping
    rest = F.col(col).substr(
        F.length(full) + F.lit(1), F.length(F.col(col))
    )
    query = F.regexp_extract(F.col(col), _URL_RE, 4)
    segs = F.split(path, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == F.lit("."), acc)
        .when(
            s == F.lit(".."),
            F.when(
                F.size(acc) > 1, F.slice(acc, 1, F.size(acc) - 1)
            ).otherwise(acc),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    norm_path = F.when(path == F.lit(""), F.lit("")).otherwise(
        F.concat_ws("/", folded)
    )
    # URI.normalize keeps a trailing slash implied by a final '.'/'..'
    trail = F.when(
        path.endswith("/.") | path.endswith("/..") | path.endswith("/"),
        F.when(norm_path.endswith("/"), F.lit("")).otherwise(F.lit("/")),
    ).otherwise(F.lit(""))
    normalized = F.concat(scheme, F.lit("://"), host, norm_path, trail, query, rest)
    return df.withColumn(
        target,
        F.when(
            F.col(col).rlike(_URL_RE) & path.contains("/."),
            normalized,
        ).otherwise(F.col(col)),
    )


def url_classify(
    df: DataFrame,
    input_col: str = "url",
    domain: bool = False,
    canonical: bool = False,
    normalize: bool = True,
) -> DataFrame:
    """URLClassifyProcessor.java:95-230: enrich documents with URL
    metadata columns —

      url_length       characters in the (normalized) URL
      url_levels       '/' count of the lowercased path after stripping
                       the landing suffix and trailing slashes
      url_toplevel     1 if that stripped path is empty and there is no
                       query string
      url_landingpage  1 if there is no query and the path ends with a
                       landing suffix ("/", index.*, welcome.*)
      url_domain       host (when ``domain``)
      url_canonical    URL with a trailing "/"+suffix collapsed to "/"
                       (when ``canonical``)

    Suffix matching is on the lowercased path (landingPageSuffix();
    the canonical strip is applied case-insensitively, a documented
    tightening of the reference's case-sensitive replaceFirst). Rows
    whose value does not parse as scheme://host... pass through with
    null metadata (the reference logs and skips MalformedURLException
    rows). Entirely Catalyst — map-only at any scale."""
    work = "__ucn" if normalize else input_col
    if normalize:
        df = normalize_urls(df, input_col, out=work)
    u = F.col(work)
    valid = u.rlike(_URL_RE)
    host = F.regexp_extract(u, _URL_RE, 2)
    path = F.lower(F.regexp_extract(u, _URL_RE, 3))
    query = F.regexp_extract(u, _URL_RE, 4)
    has_query = query != F.lit("")
    # landing suffix: first match in reference order — "/" first, so a
    # trailing slash wins over index.*/welcome.* exactly as the Java
    # loop does
    suffix = F.lit("")
    for s in reversed(LANDING_SUFFIXES):
        suffix = F.when(path.endswith(s), F.lit(s)).otherwise(suffix)
    # materialize the suffix once — the length arithmetic below uses it
    # three times
    df = df.withColumn("__suf", suffix)
    suf = F.col("__suf")
    stripped = F.when(
        suf != F.lit(""),
        path.substr(F.lit(1), F.length(path) - F.length(suf)),
    ).otherwise(path)
    stripped = F.regexp_replace(stripped, "/+$", "")
    levels = (
        F.length(stripped) - F.length(F.regexp_replace(stripped, "/", ""))
    ).cast("int")
    toplevel = (
        (F.length(stripped) == 0) & ~has_query
    ).cast("int")
    landing = (~has_query & (suf != F.lit(""))).cast("int")
    out = (
        df.withColumn("url_length", F.when(valid, F.length(u)).cast("int"))
        .withColumn("url_levels", F.when(valid, levels))
        .withColumn("url_toplevel", F.when(valid, toplevel))
        .withColumn("url_landingpage", F.when(valid, landing))
    )
    if domain:
        out = out.withColumn("url_domain", F.when(valid, host))
    if canonical:
        # getCanonicalUrl: replaceFirst("/" + suffix + "$", "/") on the
        # URL string — only fires when the URL itself ends with the
        # suffix (a query string blocks it, as in the reference)
        cut = F.when(
            valid
            & (suf != F.lit(""))
            & (suf != F.lit("/"))
            & F.lower(u).endswith(F.concat(F.lit("/"), suf)),
            F.concat(
                u.substr(
                    F.lit(1), F.length(u) - F.length(suf) - F.lit(1)
                ),
                F.lit("/"),
            ),
        ).otherwise(F.when(valid, u))
        out = out.withColumn("url_canonical", cut)
    drop = ["__suf"] + (["__ucn"] if normalize else [])
    return out.drop(*drop)


# ---------------------------------------------------------------------------
# TextProfileSignature
# ---------------------------------------------------------------------------


def text_profile_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant_rate: float = 0.01,
    min_token_len: int = 2,
) -> DataFrame:
    """TextProfileSignature.java:68-140 (the Nutch page profile):
    per-document md5 of the quantized token-frequency profile —

      - tokens: maximal letter/digit runs of the lowercased text,
        kept only when strictly longer than ``min_token_len``
      - maxFreq = max token frequency; QUANT = round(maxFreq *
        quant_rate), floored at 2 when maxFreq > 1 else 1
      - per-token count rounded down to a multiple of QUANT; tokens
        falling below QUANT are discarded
      - profile lines "token count" ordered by count descending,
        joined with a newline, md5-hashed

    The reference breaks count ties in HashMap iteration order
    (TokenComparator compares counts only); a distributed engine needs
    a deterministic order, so ties here break on the token ascending —
    the one documented deviation.

    Shape: explode -> groupBy (doc, token) -> groupBy doc. Linear in
    corpus tokens with two well-keyed shuffles (same scale class as
    the index inversion itself). Token counting deliberately does NOT
    use nested array lambdas over the raw token array: Catalyst
    re-inlines a referenced subtree per lambda element (no common
    subexpression elimination inside higher-order functions), which
    turns an O(n) fold into an exponential re-expansion — measured
    minutes instead of seconds on a 5k-doc corpus. After the
    aggregate, the per-doc profile assembly transforms only the small
    collected (cnt, tok) array, where per-element re-evaluation cost
    is a plain column reference. Returns (id_col, signature); docs
    with no qualifying tokens get md5('') — the empty profile."""
    toks = F.filter(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
        ),
        lambda t: F.length(t) > min_token_len,
    )
    tok_rows = df.select(
        F.col(id_col), F.explode(toks).alias("tok")
    )
    freqs = tok_rows.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("int").alias("cnt")
    )
    perdoc = freqs.groupBy(id_col).agg(
        F.max("cnt").alias("mf"),
        F.collect_list(F.struct("cnt", "tok")).alias("arr"),
    )
    quant_raw = F.floor(F.col("mf").cast("double") * quant_rate + 0.5)
    quant = (
        F.when(quant_raw >= 2, quant_raw)
        .when(F.col("mf") > 1, F.lit(2))
        .otherwise(F.lit(1))
        .cast("int")
    )
    perdoc = perdoc.withColumn("quant", quant)
    q = F.col("quant")
    quantized = F.filter(
        F.transform(
            F.col("arr"),
            lambda s: F.struct(
                (F.floor(s["cnt"] / q) * q).cast("int").alias("cnt"),
                s["tok"].alias("tok"),
            ),
        ),
        lambda s: s["cnt"] >= q,
    )
    # order: cnt desc, tok asc == ascending sort of (-cnt, tok)
    ordered = F.array_sort(
        F.transform(
            quantized,
            lambda s: F.struct(
                (-s["cnt"]).alias("neg"), s["tok"].alias("tok")
            ),
        )
    )
    profile = F.array_join(
        F.transform(
            ordered,
            lambda s: F.concat_ws(
                " ", s["tok"], (-s["neg"]).cast("string")
            ),
        ),
        "\n",
    )
    sigs = perdoc.select(
        F.col(id_col), F.md5(profile).alias("signature")
    )
    # docs whose every token was filtered out never reach tok_rows:
    # they carry the empty profile, md5('')
    return df.select(id_col).join(sigs, id_col, "left").select(
        F.col(id_col),
        F.coalesce(
            F.col("signature"), F.md5(F.lit(""))
        ).alias("signature"),
    )


def signature_dedup_textprofile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant_rate: float = 0.01,
    min_token_len: int = 2,
) -> DataFrame:
    """SignatureUpdateProcessorFactory.java overwriteDupes=true with
    signatureClass=TextProfileSignature: group documents by the fuzzy
    profile signature and keep the last (max id) per group — the live
    set a signature-keyed overwrite ingest would leave. One hash
    groupBy on the signature (uniform key, single shuffle) on top of
    the linear profile computation."""
    return (
        text_profile_signatures(
            df, text_col, id_col, quant_rate, min_token_len
        )
        .groupBy("signature")
        .agg(
            F.max(id_col).alias(id_col),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .select(id_col, "signature", "n_docs")
    )
