"""Block-max WAND top-k for disjunctive queries over the segment store.

Reference semantics: Lucene 4.0 has multi-level skip lists only
(lucene/core/.../codecs/lucene40/Lucene40SkipListWriter.java:53-93); the
per-block impacts we persist (`max_tf`, `min_nb`, segments.py) follow
Block-Max WAND (Ding & Suel, SIGIR'11) as SURVEY.md §4.2 notes, with the
bound max_tf/(max_tf + cache[min_nb]) derived at query time from live
collection stats (monotone in tf, anti-monotone in the norm addend, so it
upper-bounds every (tf, norm) pair in the block).
The result must be IDENTICAL to the unpruned OR path — pruning is
score-safe, never approximate.

Spark-first shape (instead of doc-at-a-time pivoting, which is hostile to
a shuffle engine):

  Every posting row of doc d lives in split = d // SPLIT_RANGE for every
  term (the doc-range salt in segments.py), so a split is a self-contained
  scoring unit: scoring a split's blocks yields EXACT totals for its docs.

  1. metadata pass (no decode): per (term, split) max block bound
     ub[t,v] = w_t * max(ub_factor); per split tot[v] = Σ_t ub[t,v] —
     an upper bound on any doc score inside v.
  2. seed: fully score the single best split -> exact top-k there ->
     threshold θ (kth score). Valid globally: k docs with true
     score >= θ exist.
  3. prune: drop every split with tot[v] < θ (no doc there can enter
     top-k); fully score the survivors; merge with the seed; top-k.

  Total: one tiny metadata agg + two scoring jobs, decoding only
  surviving splits. At 10^12 docs / 2^20-wide splits the metadata side is
  ~10^6 rows per term-set — trivially collectable/broadcastable.
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..index.segments import DECODED_SCHEMA, SegmentIndex, _decode_partitions
from .executor import Searcher

# ---- cost model for the seed-then-prune engagement decision -----------
# The two-phase walk adds one extra SEQUENTIAL Spark job (seed decode +
# driver collect) before the survivor job. It wins only when the decode
# work the metadata PREDICTS it can skip repays that fixed overhead.
# Both sides of the comparison are MEASURED, not guessed
# (tools/calibrate_wand.py; numbers recorded in BENCH.md):
#   _JOB_OVERHEAD_SEC        — scheduling+collect latency of one extra
#                              job on this master (local[8] calibration)
#   _DECODE_POSTINGS_PER_SEC — decode+score+agg throughput of the
#                              exhaustive one-shot path
#   _THETA_FRACTION          — conservative (low-quantile) ratio of the
#                              observed seed threshold θ to the best
#                              split's bound across the headline query
#                              set; predicted savings count only splits
#                              whose bound falls below θ̂ = frac·best,
#                              so the prediction UNDER-estimates and a
#                              predicted win is trustworthy.
# The decision uses ONLY the per-(split) block metadata the bound pass
# already collected — no extra scan. Deployments override via env: a
# real cluster has different job latency and per-core decode rate.
# ``force_prune=True`` (tests, plan audits) always runs the two-phase
# walk. Lucene floors skip lists on tiny segments the same way
# (skipInterval in Lucene40SkipListWriter.java:53-93); this replaces
# round-4's fixed _SEED_MIN_SPLITS/_SEED_MIN_POSTINGS constants with
# the measured break-even point.
# Defaults measured 2026-08-19 on local[8] over the sf0.1 gate segment
# store (split_range=128): job overhead median 0.22 s; marginal decode
# throughput 12.8-13.8k postings/s (Δpostings/Δwall between 4- and
# 8-term one-shot runs — tiny 128-doc blocks put per-block Arrow/Python
# overhead in the marginal cost, which is exactly what the one-shot
# path pays here); realized θ/best-bound 0.705-0.821 over the headline
# OR/AND set → 0.8×min = 0.56. A production store (2^20-doc splits,
# larger blocks, JVM-side scheduling) has very different values — set
# the env overrides from tools/calibrate_wand.py on the target cluster.
_JOB_OVERHEAD_SEC = float(os.environ.get("LSS_WAND_JOB_OVERHEAD_SEC", "0.22"))
_DECODE_POSTINGS_PER_SEC = float(
    os.environ.get("LSS_WAND_DECODE_RATE", "13000")
)
_THETA_FRACTION = float(os.environ.get("LSS_WAND_THETA_FRACTION", "0.56"))


def overhead_eq_postings() -> float:
    """Fixed cost of the extra sequential job, in postings-equivalents."""
    return _JOB_OVERHEAD_SEC * _DECODE_POSTINGS_PER_SEC


def predicted_saving_postings(cands: list[tuple[float, int]]) -> int:
    """Metadata-predicted decode savings of the seed-then-prune walk.

    ``cands`` is [(score_upper_bound, num_postings)] sorted bound-desc.
    A split is predicted prunable when its bound cannot reach the
    conservative threshold estimate θ̂ = _THETA_FRACTION · best_bound
    (the seed split itself is always decoded)."""
    if len(cands) < 2:
        return 0
    theta_hat = float(cands[0][0]) * _THETA_FRACTION
    return sum(int(nd) for ub, nd in cands[1:] if float(ub) < theta_hat)


def seed_walk_predicted_win(cands: list[tuple[float, int]]) -> bool:
    """True iff the metadata cost model predicts the two-phase walk
    beats the one-shot decode: predicted skipped postings must repay
    the extra job's fixed overhead."""
    return predicted_saving_postings(cands) > overhead_eq_postings()


def wand_or_search(
    searcher: Searcher,
    terms: list[str],
    k: int = 10,
    force_prune: bool = False,
) -> DataFrame:
    """Top-k for OR(terms), rank-identical to
    ``searcher.search(Or(*terms), k)`` but decoding only splits whose
    block-max bound can beat the seed threshold."""
    index = searcher.index
    if not isinstance(index, SegmentIndex):
        raise TypeError("wand_or_search needs a SegmentIndex")
    term_stats = index.term_stats(sorted(set(terms)))
    # duplicate input terms: searcher.search(Or(*terms)) scores each
    # duplicate SHOULD clause and sums, so fold multiplicity into the
    # weight (k identical clauses contribute k * clause_score)
    mult: dict[str, int] = {}
    for t in terms:
        if t in term_stats:
            mult[t] = mult.get(t, 0) + 1
    present = list(mult)
    if not present:
        return index.spark.createDataFrame(
            [], f"doc_id long, score {searcher._score_type}"
        )
    weights = {
        t: mult[t] * searcher._term_weight_value(t, term_stats, 1.0)
        for t in present
    }

    # -- 1. metadata-only bound per split --------------------------------
    # driver-side pandas aggregation over the memoized per-term split
    # metadata (index.split_meta): the per-query Spark job drops from a
    # 2-stage shuffle+collect to (at most) one narrow fetch for terms
    # not yet cached — the one-shot route then pays ~no bound-pass tax
    # over its exhaustive twin.
    cache64 = searcher.cache64
    mdf = index.split_meta(present)
    if len(mdf):
        tf = mdf["max_tf"].to_numpy(dtype="float64")
        ub_factor = tf / (
            tf + cache64[mdf["min_nb"].to_numpy(dtype="int64")]
        )
        agg = (
            pd.DataFrame(
                {
                    "split": mdf["split"].to_numpy(),
                    "term": mdf["term"].to_numpy(),
                    "ubf": ub_factor,
                    "nd": mdf["nd"].to_numpy(dtype="int64"),
                }
            )
            .groupby(["split", "term"], sort=False)
            .agg(ub=("ubf", "max"), nd=("nd", "sum"))
            .reset_index()
        )
        agg["wub"] = agg["ub"] * agg["term"].map(weights)
        tot = (
            agg.groupby("split", sort=False)
            .agg(tot=("wub", "sum"), nd=("nd", "sum"))
            .reset_index()
        )
        splits_desc = [
            {"split": int(r.split), "tot": float(r.tot), "nd": int(r.nd)}
            for r in tot.itertuples()
        ]
        splits_desc.sort(key=lambda r: -r["tot"])
    else:
        splits_desc = []
    if not splits_desc:
        return index.spark.createDataFrame(
            [], f"doc_id long, score {searcher._score_type}"
        )

    def score_splits(split_ids: list[int]) -> DataFrame:
        pruned = index.blocks.where(
            F.col("bucket").isin(index.buckets_of(present))
            & F.col("term").isin(present)
            & (F.col("first_doc") / F.lit(index.split_range))
            .cast("long")
            .isin(split_ids)
        )
        decoded = pruned.mapInPandas(
            _decode_partitions(False), DECODED_SCHEMA
        ).select("term", "doc_id", "tf", "norm_byte")
        scored = searcher._apply_score_col(decoded, weights)
        return scored.groupBy("doc_id").agg(F.sum("score").alias("score"))

    if not force_prune and not seed_walk_predicted_win(
        [(float(r["tot"]), int(r["nd"])) for r in splits_desc]
    ):
        return (
            score_splits([int(r["split"]) for r in splits_desc])
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    # -- 2. seed threshold from the best split ---------------------------
    seed_split = int(splits_desc[0]["split"])
    seed = score_splits([seed_split]).orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(k)
    seed_rows = seed.collect()
    theta = (
        float(seed_rows[-1]["score"]) if len(seed_rows) == k else float("-inf")
    )

    # -- 3. prune + score survivors --------------------------------------
    # the bound uses the float64 cache; in exact-float32 mode per-term
    # scores round to float32 and could exceed the real-valued bound by a
    # half-ulp — keep a tiny relative inflation so pruning stays safe
    survivors = [
        int(r["split"])
        for r in splits_desc
        if r["split"] != seed_split
        and float(r["tot"]) * (1.0 + 1e-6) + 1e-12 >= theta
    ]
    if survivors:
        rest = score_splits(survivors)
        merged = rest.unionByName(
            index.spark.createDataFrame(
                seed_rows, "doc_id long, score double"
            ).select(
                "doc_id", F.col("score").cast(searcher._score_type)
            )
        )
    else:
        merged = index.spark.createDataFrame(
            seed_rows, "doc_id long, score double"
        ).select("doc_id", F.col("score").cast(searcher._score_type))
    return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def wand_and_search(
    searcher: Searcher,
    terms: list[str],
    k: int = 10,
    stats_out: dict | None = None,
    force_prune: bool = False,
) -> DataFrame:
    """Block-max pruned top-k for AND(terms) — rank-identical to
    ``searcher.search(BooleanQuery(MUST terms), k)``.

    The exhaustive conjunction decodes every posting of every MUST term
    before the groupBy can reject docs missing a term — on a
    common∧common query that is both full postings lists. Here the
    per-(term, split) block metadata (max_tf / min_nb, segments.py)
    prunes at the SPLIT level before any decode, mirroring
    ConjunctionScorer.doNext leapfrogging
    (lucene/core/src/java/org/apache/lucene/search/ConjunctionScorer.java:56-101)
    and the skip lists that make it cheap
    (lucene40/Lucene40SkipListWriter.java:53-93):

      1. presence prune: a split missing ANY must term cannot contain a
         conjunction match — dropped on metadata alone (the leapfrog:
         the rarest term's split set gates everything).
      2. score bound: over the surviving splits,
         tot[v] = Σ_t w_t * max_tf/(max_tf + cache[min_nb]) upper-bounds
         any doc's conjunction score inside v. Seed the threshold θ by
         exactly scoring the best-bounded split; drop every other split
         with tot[v] < θ; decode only the survivors.

    ``stats_out`` (optional dict) receives ``splits_any`` (splits where
    at least one term appears), ``splits_all`` (presence-surviving) and
    ``splits_decoded`` — the pytest hook proving decode work shrank.
    """
    index = searcher.index
    if not isinstance(index, SegmentIndex):
        raise TypeError("wand_and_search needs a SegmentIndex")
    musts = sorted(set(terms))
    if len(musts) != len(terms):
        raise ValueError("duplicate MUST terms are redundant in AND")
    n = len(musts)
    term_stats = index.term_stats(musts)
    if any(t not in term_stats for t in musts):
        # a df=0 MUST term empties the whole conjunction
        if stats_out is not None:
            stats_out.update(
                splits_any=0, splits_all=0, splits_decoded=0
            )
        return index.spark.createDataFrame(
            [], f"doc_id long, score {searcher._score_type}"
        )
    weights = {
        t: searcher._term_weight_value(t, term_stats, 1.0) for t in musts
    }

    # -- 1. metadata pass: per-split presence + score upper bound --------
    # driver-side pandas over the memoized per-term split metadata (see
    # wand_or_search) — presence prune AND bound both come from the same
    # cached rows, with no per-query shuffle job.
    cache64 = searcher.cache64
    mdf = index.split_meta(musts)
    if len(mdf):
        tf = mdf["max_tf"].to_numpy(dtype="float64")
        ub_factor = tf / (
            tf + cache64[mdf["min_nb"].to_numpy(dtype="int64")]
        )
        agg = (
            pd.DataFrame(
                {
                    "split": mdf["split"].to_numpy(),
                    "term": mdf["term"].to_numpy(),
                    "ubf": ub_factor,
                    "nd": mdf["nd"].to_numpy(dtype="int64"),
                }
            )
            .groupby(["split", "term"], sort=False)
            .agg(ub=("ubf", "max"), nd=("nd", "sum"))
            .reset_index()
        )
        agg["wub"] = agg["ub"] * agg["term"].map(weights)
        per = (
            agg.groupby("split", sort=False)
            .agg(
                nt=("term", "nunique"),
                tot=("wub", "sum"),
                nd=("nd", "sum"),
            )
            .reset_index()
        )
        per_split = [
            {
                "split": int(r.split),
                "nt": int(r.nt),
                "tot": float(r.tot),
                "nd": int(r.nd),
            }
            for r in per.itertuples()
        ]
    else:
        per_split = []
    splits_any = len(per_split)
    candidates = sorted(
        (r for r in per_split if r["nt"] == n), key=lambda r: -r["tot"]
    )
    if stats_out is not None:
        stats_out.update(
            splits_any=splits_any,
            splits_all=len(candidates),
            splits_decoded=0,
        )
    if not candidates:
        return index.spark.createDataFrame(
            [], f"doc_id long, score {searcher._score_type}"
        )

    def score_splits(split_ids: list[int]) -> DataFrame:
        pruned = index.blocks.where(
            F.col("bucket").isin(index.buckets_of(musts))
            & F.col("term").isin(musts)
            & (F.col("first_doc") / F.lit(index.split_range))
            .cast("long")
            .isin(split_ids)
        )
        decoded = pruned.mapInPandas(
            _decode_partitions(False), DECODED_SCHEMA
        ).select("term", "doc_id", "tf", "norm_byte")
        scored = searcher._apply_score_col(decoded, weights)
        return (
            scored.groupBy("doc_id")
            .agg(
                F.sum("score").alias("score"),
                F.countDistinct("term").alias("nt"),
            )
            .where(F.col("nt") == F.lit(n))
            .select("doc_id", "score")
        )

    if not force_prune and not seed_walk_predicted_win(
        [(float(r["tot"]), int(r["nd"])) for r in candidates]
    ):
        if stats_out is not None:
            stats_out["splits_decoded"] = len(candidates)
        return (
            score_splits([int(r["split"]) for r in candidates])
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    # -- 2. seed threshold from the best-bounded split --------------------
    seed_split = int(candidates[0]["split"])
    seed_rows = (
        score_splits([seed_split])
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    theta = (
        float(seed_rows[-1]["score"]) if len(seed_rows) == k else float("-inf")
    )

    # -- 3. prune + decode only survivors ---------------------------------
    # same safety inflation as the OR path (float32 half-ulp headroom)
    survivors = [
        int(r["split"])
        for r in candidates
        if r["split"] != seed_split
        and float(r["tot"]) * (1.0 + 1e-6) + 1e-12 >= theta
    ]
    if stats_out is not None:
        stats_out["splits_decoded"] = 1 + len(survivors)
    seed_df = index.spark.createDataFrame(
        seed_rows, "doc_id long, score double"
    ).select("doc_id", F.col("score").cast(searcher._score_type))
    merged = (
        score_splits(survivors).unionByName(seed_df)
        if survivors
        else seed_df
    )
    return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


class _SplitView:
    """Read-only facade over a SegmentIndex restricted to a split set:
    postings decode only the given splits, while collection/term stats
    stay GLOBAL so BM25 weights are identical to the full index. Splits
    are self-contained scoring units (every posting of doc d lives in
    split d // split_range for every term), so phrase/conjunction
    scoring inside the view is exact for the view's docs."""

    def __init__(self, seg: SegmentIndex, splits: list[int]):
        self._seg = seg
        self._splits = list(splits)
        self.spark = seg.spark
        self.docs = seg.docs
        self.stats = seg.stats
        self.terms_stats = seg.terms_stats

    def postings_for_terms(
        self, terms: list[str], want_positions: bool = False
    ):
        return self._seg.postings_for_terms(
            terms, want_positions, splits=self._splits
        )

    def term_stats(self, terms: list[str]):
        return self._seg.term_stats(terms)


def wand_phrase_search(
    searcher: Searcher,
    terms: list[str],
    slop: int = 0,
    k: int = 10,
    stats_out: dict | None = None,
    force_prune: bool = False,
) -> DataFrame:
    """Block-max pruned top-k for a PhraseQuery — rank-identical to
    ``searcher.search(PhraseQuery(terms, slop), k)``.

    The exhaustive phrase path decodes positions for every split any
    constituent term touches. Metadata prunes twice before any decode:

      1. presence: a split missing ANY constituent term cannot contain
         the phrase (ExactPhraseScorer/SloppyPhraseScorer advance via
         ConjunctionScorer-style leapfrogging — same presence logic).
      2. score bound: phrase freq in a doc <= min term tf <= min over
         terms of the split's max_tf, and the slop factor adds <= 1 per
         match, so weight * tf_ub/(tf_ub + cache[min_nb]) upper-bounds
         any doc's phrase score in the split (weight = boost * Σidf *
         (k1+1), BM25Similarity.idfExplain:185-196). Seed θ from the
         best split, decode only survivors.

    Scoring restricted splits goes through the ordinary phrase scorer
    over a _SplitView, so exact/sloppy/hasRpts semantics are inherited
    unchanged.
    """
    import math

    from .query import PhraseQuery

    index = searcher.index
    if not isinstance(index, SegmentIndex):
        raise TypeError("wand_phrase_search needs a SegmentIndex")
    if not index.manifest["keep_positions"]:
        raise ValueError("phrase search needs a positions-bearing store")
    distinct = sorted(set(terms))
    n = len(distinct)
    term_stats = index.term_stats(distinct)
    if any(t not in term_stats for t in distinct):
        if stats_out is not None:
            stats_out.update(splits_any=0, splits_all=0, splits_decoded=0)
        return index.spark.createDataFrame(
            [], f"doc_id long, score {searcher._score_type}"
        )

    # summed-idf weight, double path (mirrors _score_phrase_freqs)
    w = 0.0
    for t in terms:
        df_ = term_stats[t][0]
        w += math.log(
            1 + (index.stats.max_doc - df_ + 0.5) / (df_ + 0.5)
        )
    weight = w * (1.2 + 1)

    # driver-side pandas over the memoized per-term split metadata
    # (see wand_or_search) — no per-query shuffle job.
    mdf = index.split_meta(distinct)
    if len(mdf):
        per_term = (
            mdf.groupby(["split", "term"], sort=False)
            .agg(
                tmax=("max_tf", "max"),
                nbmin=("min_nb", "min"),
                nd=("nd", "sum"),
            )
            .reset_index()
        )
        per = (
            per_term.groupby("split", sort=False)
            .agg(
                nt=("term", "nunique"),
                tf_ub=("tmax", "min"),
                nb_min=("nbmin", "min"),
                nd=("nd", "sum"),
            )
            .reset_index()
        )
        per_split = list(per.itertuples())
    else:
        per_split = []
    cache64 = searcher.cache64
    candidates = []
    for r in per_split:
        if int(r.nt) != n:
            continue
        tf_ub = float(r.tf_ub)
        ub = weight * tf_ub / (tf_ub + float(cache64[int(r.nb_min)]))
        candidates.append((int(r.split), ub, int(r.nd)))
    candidates.sort(key=lambda t: -t[1])
    if stats_out is not None:
        stats_out.update(
            splits_any=len(per_split),
            splits_all=len(candidates),
            splits_decoded=0,
        )
    if not candidates:
        return index.spark.createDataFrame(
            [], f"doc_id long, score {searcher._score_type}"
        )

    q = PhraseQuery(list(terms), slop=slop)

    def score_splits(split_ids: list[int]) -> DataFrame:
        view = _SplitView(index, split_ids)
        return Searcher(view, searcher.exact).score(q)

    if not force_prune and not seed_walk_predicted_win(
        [(ub, nd) for _, ub, nd in candidates]
    ):
        if stats_out is not None:
            stats_out["splits_decoded"] = len(candidates)
        return (
            score_splits([s for s, _, _ in candidates])
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    seed_split = candidates[0][0]
    seed_rows = (
        score_splits([seed_split])
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    theta = (
        float(seed_rows[-1]["score"]) if len(seed_rows) == k else float("-inf")
    )
    survivors = [
        s
        for s, ub, _ in candidates
        if s != seed_split and ub * (1.0 + 1e-6) + 1e-12 >= theta
    ]
    if stats_out is not None:
        stats_out["splits_decoded"] = 1 + len(survivors)
    seed_df = index.spark.createDataFrame(
        seed_rows, "doc_id long, score double"
    ).select("doc_id", F.col("score").cast(searcher._score_type))
    merged = (
        score_splits(survivors).unionByName(seed_df)
        if survivors
        else seed_df
    )
    return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
