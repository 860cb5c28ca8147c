"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema = BASELINE.json input_hint:
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp

Everything is seeded (numpy Generator, seed=42 by default) — no wall clock,
no external data. The vocabulary is restricted to tokens on which any
reasonable UAX#29 word-break implementation and our pinned tokenizer
provably agree (ASCII words / numbers / mixed case), per FIXTURES.md, and
includes the exact 33 Lucene stopwords so stop removal, position gaps, and
the high-df skew path are exercised.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from .analysis.tokenizer import ENGLISH_STOP_WORDS

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_CONTENT_STEMS = [
    "error", "timeout", "deploy", "token", "retry", "cache", "query",
    "index", "shard", "merge", "commit", "search", "score", "rank",
    "filter", "parse", "batch", "stream", "latency", "throughput",
    "cluster", "executor", "partition", "shuffle", "spill", "broadcast",
    "join", "agg", "sort", "limit", "plan", "stage", "task", "driver",
    "worker", "node", "disk", "memory", "cpu", "network", "socket",
    "http", "grpc", "kafka", "parquet", "iceberg", "schema", "column",
    "row", "block",
]
_MIXED_CASE = ["Error", "TimeOut", "Deploy", "Retry", "Cache"]
_NUMBERS = ["404", "500", "42", "200", "503", "1024"]
_TOOLS = ["", "", "", "", "bash", "search", "python", "browser"]
_ROLES = ["user", "assistant", "assistant", "tool"]


def build_vocabulary(seed: int = 42) -> tuple[list[str], np.ndarray]:
    """Returns (vocab, probs): stopwords + fillers (high df), ~2000 content
    words (Zipf), ~rare words, numbers, mixed case."""
    rng = np.random.default_rng(seed)
    stop = sorted(ENGLISH_STOP_WORDS)
    fillers = [f"fill{i}" for i in range(17)]  # stopword-adjacent high-df
    content = list(_CONTENT_STEMS)
    for i in range(2000 - len(content)):
        stem = _CONTENT_STEMS[i % len(_CONTENT_STEMS)]
        content.append(f"{stem}{i}")
    rare = [f"rare{rng.integers(0, 16**6):x}w{i}" for i in range(20000)]
    vocab = stop + fillers + content + _NUMBERS + _MIXED_CASE + rare
    n = len(vocab)
    ranks = np.arange(1, n + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.07
    probs /= probs.sum()
    return vocab, probs


def generate_transcripts(
    n_turns: int, seed: int = 42, conv_prefix: str = "conv"
) -> pd.DataFrame:
    """Deterministic transcript table with exactly ``n_turns`` rows."""
    vocab, probs = build_vocabulary(seed)
    vocab_arr = np.array(vocab, dtype=object)
    rng = np.random.default_rng(seed + 1)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    ts: list[datetime] = []

    global_turn = 0
    conv_i = 0
    while global_turn < n_turns:
        conv_len = int(rng.integers(4, 33))
        conv_len = min(conv_len, n_turns - global_turn)
        cid = f"{conv_prefix}{conv_i:08d}"
        # one rare per-conv unique id token, appears in a random turn
        uniq_turn = int(rng.integers(0, conv_len))
        for t in range(conv_len):
            n_words = int(rng.integers(5, 60))
            words = rng.choice(vocab_arr, size=n_words, p=probs)
            text = " ".join(words.tolist())
            if t == uniq_turn:
                text += f" errcode{conv_i:06x}"
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(_ROLES[int(rng.integers(0, len(_ROLES)))])
            texts.append(text)
            tools.append(_TOOLS[int(rng.integers(0, len(_TOOLS)))])
            ts.append(_EPOCH + timedelta(seconds=7 * global_turn))
            global_turn += 1
        conv_i += 1

    return pd.DataFrame(
        {
            "conv_id": pd.Series(conv_ids, dtype="object"),
            "turn_idx": pd.Series(turn_idxs, dtype="int32"),
            "role": pd.Series(roles, dtype="object"),
            "text": pd.Series(texts, dtype="object"),
            "tool": pd.Series(tools, dtype="object"),
            "ts": pd.Series(ts),
        }
    )


def transcripts_spark(spark, n_turns: int, seed: int = 42, partitions: int = 8):
    """Spark DataFrame over the deterministic corpus (generated on the
    driver for test scales; the bench harness generates per-partition via
    mapInPandas for large n)."""
    pdf = generate_transcripts(n_turns, seed)
    df = spark.createDataFrame(pdf)
    return df.repartition(partitions, "conv_id")


def transcripts_distributed(
    spark, n_turns: int, seed: int = 42, partitions: int = 32
):
    """Distributed deterministic corpus: each Spark partition generates a
    disjoint slice of conversations via mapInPandas (Arrow-batched; no
    driver-side materialization). Deterministic for a fixed
    (n_turns, seed, partitions) regardless of cluster size/task order:
    partition i derives its own seed and conv-id prefix.

    This is the 10^12-turn scale path — generation cost is O(n/partitions)
    per task and the result is already hash-spread across the cluster.
    """
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", IntegerType(), False),
            StructField("role", StringType(), False),
            StructField("text", StringType(), False),
            StructField("tool", StringType(), False),
            StructField("ts", TimestampType(), False),
        ]
    )
    per = n_turns // partitions
    rem = n_turns % partitions
    plan = spark.createDataFrame(
        [(i, per + (1 if i < rem else 0)) for i in range(partitions)],
        "part int, n long",
    ).repartition(partitions, "part")

    def gen(batches):
        for pdf in batches:
            for part, n in zip(pdf["part"], pdf["n"]):
                if int(n) <= 0:
                    continue
                out = generate_transcripts(
                    int(n),
                    seed=seed + 1000003 * int(part),
                    conv_prefix=f"p{int(part):04d}c",
                )
                yield out

    return plan.mapInPandas(gen, schema)
