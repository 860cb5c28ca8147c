"""Search-result clustering — the ClusteringComponent analogue.

Reference: solr/contrib/clustering/src/java/org/apache/solr/handler/
clustering/ClusteringComponent.java + SearchClusteringEngine.java
(CarrotClusteringEngine.java runs Carrot2 Lingo/STC over the RESULT
PAGE inside the Solr JVM and returns labeled clusters of the returned
docs). The algorithm here is spherical k-means over tf-idf vectors of
the result set with Lingo-style labels (top centroid terms) — same
component contract (cluster the top-N hits, label each cluster),
different algorithm by design (Carrot2 is a bundled third-party
library, not reference index code).

Spark-first shape: scoring and tf-idf vectorization are DataFrame ops
(the vocabulary projection is a broadcast of ≤ ``n_vocab`` terms);
Lloyd iterations reuse ivf_train_kmeans's map-only Arrow-partials
pattern (no shuffle per iteration; driver combines k×V floats). Like
the reference, the clustered set is the result PAGE (top-N docs), so
every per-doc structure here is bounded by n_docs, never corpus size.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher
from .qparser import parse_lucene


def _tfidf_vectors(
    searcher: Searcher, top: DataFrame, n_vocab: int, text_col: str
) -> tuple[DataFrame, list[str]]:
    """(doc_id, embedding float-array) over the result page + the vocab
    term list: tf-idf with idf = ln(1 + N/df) computed WITHIN the page
    (Carrot2 also builds its model from the returned docs only)."""
    from ..functions.spark_text import analyzed_tokens

    toks = (
        top.join(
            searcher.index.docs.select("doc_id", text_col), "doc_id"
        )
        .select(
            "doc_id",
            F.explode(analyzed_tokens(F.col(text_col))).alias("term"),
        )
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    vocab_rows = (
        dfs.orderBy(F.desc("df"), F.asc("term")).limit(n_vocab).collect()
    )
    vocab = [r["term"] for r in vocab_rows]
    n_docs = top.count()
    idf = {
        r["term"]: float(np.log(1.0 + n_docs / r["df"]))
        for r in vocab_rows
    }
    slot = {t: i for i, t in enumerate(vocab)}
    slot_map = F.create_map(
        *[x for t in vocab for x in (F.lit(t), F.lit(slot[t]))]
    )
    idf_map = F.create_map(
        *[x for t in vocab for x in (F.lit(t), F.lit(idf[t]))]
    )
    weighted = (
        tf.where(F.col("term").isin(vocab))
        .select(
            "doc_id",
            slot_map[F.col("term")].alias("slot"),
            (F.col("tf") * idf_map[F.col("term")]).alias("w"),
        )
    )
    vecs = weighted.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("slot", "w"))
        ).alias("pairs")
    )
    dense = vecs.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(len(vocab) - 1)),
            lambda i: F.coalesce(
                F.element_at(
                    F.map_from_entries("pairs"), i.cast("int")
                ),
                F.lit(0.0),
            ),
        ).alias("embedding"),
    )
    return dense, vocab


def cluster_results(
    searcher: Searcher,
    q: str,
    k_docs: int = 100,
    n_clusters: int = 4,
    n_iter: int = 5,
    n_vocab: int = 64,
    label_terms: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Cluster the top ``k_docs`` results of ``q`` into ``n_clusters``
    labeled clusters: returns (cluster, label, size, top_doc) with
    label = '+'-joined top centroid terms, top_doc = the best-scoring
    member (ClusteringComponent returns each cluster's doc list; the
    representative doc stands in for it relationally). Deterministic:
    k-means init = the k best-scoring docs' vectors, ties to the lower
    centroid id (ivf_train_kmeans contract)."""
    from ..datapipe.similarity import ivf_train_kmeans

    top = (
        searcher.score(parse_lucene(q))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k_docs)
        .select("doc_id", "score")
        .localCheckpoint(eager=False)
    )
    dense, vocab = _tfidf_vectors(searcher, top, n_vocab, text_col)
    # seed ids for the k-means trainer are 0..k-1 = result rank
    # (init = the k best-scoring docs' vectors)
    from pyspark.sql import Window

    rank = top.select(
        "doc_id",
        (
            F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("doc_id"))
            )
            - 1
        ).alias("rank"),
    )
    dense = dense.join(rank, "doc_id").localCheckpoint(eager=False)
    cents = ivf_train_kmeans(
        dense, n_centroids=n_clusters, n_iter=n_iter, id_col="rank"
    )
    C = np.stack([c for _, c in cents])
    labels = []
    for ci in range(len(C)):
        order = np.argsort(-C[ci], kind="stable")[:label_terms]
        labels.append(
            "+".join(vocab[i] for i in order if C[ci][i] > 0) or "_"
        )
    # assign each doc to its centroid (same tie rule as training)
    spark = searcher.index.spark
    Cb = spark.sparkContext.broadcast(C)

    def assign(batches):
        import pandas as pd

        Cn = Cb.value
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(
                [np.asarray(v, np.float64) for v in pdf["embedding"]]
            )
            nrm = np.linalg.norm(E, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            a = ((E / nrm) @ Cn.T).argmax(axis=1)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "cluster": a.astype("int64")}
            )

    assigned = dense.mapInPandas(assign, "doc_id long, cluster long")
    label_map = F.create_map(
        *[
            x
            for ci, lb in enumerate(labels)
            for x in (F.lit(ci), F.lit(lb))
        ]
    )
    return (
        assigned.join(top, "doc_id")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("size"),
            F.max_by("doc_id", F.struct("score", (-F.col("doc_id")).alias("nd"))).alias(
                "top_doc"
            ),
        )
        .select(
            "cluster",
            label_map[F.col("cluster")].alias("label"),
            "size",
            "top_doc",
        )
        .orderBy("cluster")
    )
