"""Document routing — the SolrCloud hash-range shard router.

References:
  - solr/solrj/src/java/org/apache/solr/common/cloud/
    HashPartitioner.java (Range [min,max] inclusive over the signed
    32-bit space; partitionRange splits it; hex serialization);
  - solr/core/.../update/processor/DistributedUpdateProcessor.java:
    1087-1090 — a document routes to the shard whose Range includes
    murmurhash3_x86_32(uniqueKey UTF-8 bytes, seed 0);
  - solr/solrj/.../common/util/Hash.java:243-298 (the murmur3 port).

This is the piece of SolrCloud a Spark engine genuinely re-creates:
routing IS partitioning. ``with_shard`` assigns the shard id as a
column, so a repartition("shard") co-locates exactly the documents a
SolrCloud cluster would put on the same shard, and a shard's range is
stable metadata (the clusterstate.json ranges) — resharding composes
with index/splitter.py.

The murmur3 here is bit-exact vs Hash.java (pinned against the classic
public vectors AND cross-checked against Spark's built-in ``F.hash``,
which is the same Murmur3_x86_32 over UTF-8 bytes at seed 42).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_M32 = 0xFFFFFFFF
INT_MIN = -(1 << 31)
INT_MAX = (1 << 31) - 1


def murmurhash3_x86_32(data: bytes, seed: int = 0) -> int:
    """Hash.murmurhash3_x86_32 (Java int semantics — returns the
    SIGNED 32-bit hash, as the Range comparisons expect)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & _M32
    n = len(data)
    rounded = n & ~0x03
    for i in range(0, rounded, 4):
        k1 = (
            data[i]
            | (data[i + 1] << 8)
            | (data[i + 2] << 16)
            | (data[i + 3] << 24)
        )
        k1 = (k1 * c1) & _M32
        k1 = ((k1 << 15) | (k1 >> 17)) & _M32
        k1 = (k1 * c2) & _M32
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & _M32
        h1 = (h1 * 5 + 0xE6546B64) & _M32
    k1 = 0
    tail = n & 0x03
    if tail == 3:
        k1 = data[rounded + 2] << 16
    if tail >= 2:
        k1 |= data[rounded + 1] << 8
    if tail >= 1:
        k1 |= data[rounded]
        k1 = (k1 * c1) & _M32
        k1 = ((k1 << 15) | (k1 >> 17)) & _M32
        k1 = (k1 * c2) & _M32
        h1 ^= k1
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 & 0x80000000 else h1


def route_hash(key: str) -> int:
    """DistributedUpdateProcessor.hash(): murmur3 of the uniqueKey's
    UTF-8 bytes, seed 0."""
    return murmurhash3_x86_32(str(key).encode("utf-8"), 0)


def partition_range(
    partitions: int, min_: int = INT_MIN, max_: int = INT_MAX
) -> list[tuple[int, int]]:
    """HashPartitioner.partitionRange: split [min, max] (inclusive)
    into ``partitions`` contiguous ranges, the last always ending on
    max — the clusterstate shard ranges."""
    if partitions == 0:
        return []
    rng = max_ - min_
    srange = max(1, rng // partitions)
    ranges: list[tuple[int, int]] = []
    start = min_
    end = start
    while end < max_:
        end = start + srange
        if len(ranges) == partitions - 1:
            end = max_
        ranges.append((start, end))
        start = end + 1
    return ranges


def range_to_str(r: tuple[int, int]) -> str:
    """Range.toString: unsigned hex of the signed bounds."""
    return f"{r[0] & _M32:x}-{r[1] & _M32:x}"


def range_from_str(s: str) -> tuple[int, int]:
    lo, _, hi = s.partition("-")
    def _signed(x: int) -> int:
        return x - (1 << 32) if x & 0x80000000 else x
    return (_signed(int(lo, 16)), _signed(int(hi, 16)))


def shard_of(key: str, ranges: list[tuple[int, int]]) -> int:
    h = route_hash(key)
    for i, (lo, hi) in enumerate(ranges):
        if lo <= h <= hi:
            return i
    raise ValueError(f"hash {h} outside every range")


def with_shard(
    df: DataFrame, key_col: str, n_shards: int
) -> DataFrame:
    """Assign each document its SolrCloud shard id (column ``shard``)
    plus the route hash — an Arrow-batched kernel (Spark's built-in
    murmur3 ``F.hash`` uses seed 42, not the router's seed 0, so exact
    cross-system routing needs the explicit hash; use plain
    ``F.hash`` when only internal co-location matters)."""
    import pandas as pd

    ranges = partition_range(n_shards)
    bounds = [hi for _, hi in ranges]

    def run(batches):
        import bisect

        for pdf in batches:
            hashes = [route_hash(k) for k in pdf[key_col].astype(str)]
            shards = [bisect.bisect_left(bounds, h) for h in hashes]
            out = pdf.copy()
            out["route_hash"] = pd.Series(hashes, dtype="int64")
            out["shard"] = pd.Series(shards, dtype="int32")
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        run, f"{schema}, route_hash long, shard int"
    )
