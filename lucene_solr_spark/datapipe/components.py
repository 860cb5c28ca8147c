"""Connected components over near-duplicate candidate pairs — the
clustering stage that turns pair lists (minhash/simhash/jaccard) into
dedup groups with a canonical representative per group.

Algorithm: alternating large-star / small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", SoCC'14): O(log n) rounds, each round two
groupBy-min + join passes over the edge list, no driver-side graph. The
fixpoint is the star graph rooted at each component's minimum node id,
so the output labeling is deterministic: component = min doc_id.

Reference behavior analogue: Solr/Lucene deduplication keys every doc
to a signature and keeps one doc per signature
(solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java:1-60 — exact-signature grouping).
Near-dup pairs generalize the signature to a similarity graph; the
component id plays the signature's role and transitively-linked docs
collapse to one representative, which is what a training-data dedup
pipeline consumes downstream of MinHash/SimHash banding.

Scale shape per round: the edge list only shrinks (star contraction
never adds more edges than it removes after round one); every pass is
one shuffle on node id. Convergence is detected with a two-field
checksum aggregate (count + bit_xor of xxhash64(a, b)) instead of a full
except-join — one tiny driver row per round. Lineage is cut per round
with localCheckpoint so the plan stays O(1) deep across iterations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = the minimum node id reachable from the node. Nodes with
    no pair (singletons) do not appear — callers treat absence as
    "its own component" (see :func:`keep_canonical`)."""
    edges = (
        pairs.select(
            F.col(a_col).cast("long").alias("a"),
            F.col(b_col).cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    prev_chk = None
    for _ in range(max_iter):
        # -- large-star: every neighbor v > u links to min(Γ(u) ∪ {u})
        both = edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = both.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            both.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # -- small-star: per hi node, all lo neighbors (and hi) link to
        #    the minimum lo
        canon = large.select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        mins2 = canon.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            canon.join(mins2, "hi")
            .where(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("a"), F.col("m").alias("b"))
            .unionByName(
                mins2.select(F.col("hi").alias("a"), F.col("m").alias("b"))
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        # bit_xor is order-independent and cannot overflow (ANSI mode
        # rejects a plain sum of 64-bit hashes)
        row = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        chk = (int(row["n"]), int(row["h"]) if row["h"] is not None else 0)
        edges = small
        if chk == prev_chk:
            break
        prev_chk = chk
    roots = edges.select(F.col("b").alias("a"), F.col("b")).distinct()
    return (
        edges.unionByName(roots)
        .distinct()
        .select(
            F.col("a").alias("node"), F.col("b").alias("component")
        )
    )


def keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Dedup-by-clustering: keep exactly one row per connected component
    of the pair graph — the minimum ``id_col`` — plus every row not in
    any pair. The component mapping is broadcast-size relative to the
    corpus only when dup density is high; the join below is a plain
    shuffle hash join on the id, which AQE converts to broadcast when
    the mapping is small."""
    comp = connected_components(pairs, a_col, b_col)
    return (
        df.join(
            comp, df[id_col] == comp["node"], "left"
        )
        .where(
            F.col("component").isNull()
            | (F.col("component") == df[id_col])
        )
        .drop("node", "component")
    )
