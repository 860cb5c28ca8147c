"""SolrCloud hash-range document router (index/router.py): murmur3
bit-exactness, HashPartitioner range semantics, shard assignment."""

import pyspark.sql.functions as F

from lucene_solr_spark.index.router import (
    murmurhash3_x86_32,
    partition_range,
    range_from_str,
    range_to_str,
    route_hash,
    shard_of,
    with_shard,
)


def test_murmur3_canonical_vectors():
    """Public murmur3_x86_32 vectors (smhasher) — covers the tail
    path (len%4 != 0) the Spark cross-check can't."""
    pins = [
        (b"", 0, 0x00000000),
        (b"", 1, 0x514E28B7),
        (b"hello", 0, 0x248BFA47),
        (b"hello, world", 0, 0x149BBB7F),
        (b"The quick brown fox jumps over the lazy dog", 0, 0x2E4FF723),
    ]
    for data, seed, want in pins:
        assert (murmurhash3_x86_32(data, seed) & 0xFFFFFFFF) == want, data


def test_murmur3_matches_spark_builtin_on_aligned(spark):
    """Spark's F.hash IS Murmur3_x86_32 over UTF-8 bytes at seed 42
    with standard block processing — for 4-byte-aligned strings the
    two must agree bit-for-bit (Spark's per-byte tail variant makes
    unaligned lengths legitimately differ)."""
    words = ["", "abcd", "hello, w", "12345678", "conv0042", "ünï"]
    aligned = [w for w in words if len(w.encode("utf-8")) % 4 == 0]
    df = spark.createDataFrame([(w,) for w in aligned], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.hash("s").alias("h")).collect()}
    for w in aligned:
        assert murmurhash3_x86_32(w.encode("utf-8"), 42) == got[w], w


def test_partition_range_reference_pins():
    """TestHashPartitioner.java pins: explicit 2-way split of the
    positive half, full-space coverage, hex round-trip."""
    r = partition_range(2, 0, 0x7FFFFFFF)
    assert r == [(0, 0x3FFFFFFF), (0x40000000, 0x7FFFFFFF)]
    assert range_to_str(r[0]) == "0-3fffffff"
    for n in (1, 2, 3, 7, 16, 101):
        rs = partition_range(n)
        assert len(rs) == n
        assert rs[0][0] <= -(1 << 31)
        assert rs[-1][1] >= (1 << 31) - 1
        # contiguous, non-overlapping
        for a, b in zip(rs, rs[1:]):
            assert b[0] == a[1] + 1
        assert all(range_from_str(range_to_str(x)) == x for x in rs)


def test_shard_assignment_spark(spark):
    n = 4
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(200)], "doc_id long, id string"
    )
    out = with_shard(df, "id", n).collect()
    ranges = partition_range(n)
    seen = set()
    for r in out:
        assert r["route_hash"] == route_hash(r["id"])
        assert r["shard"] == shard_of(r["id"], ranges)
        lo, hi = ranges[r["shard"]]
        assert lo <= r["route_hash"] <= hi
        seen.add(r["shard"])
    assert seen == set(range(n))  # murmur3 spreads 200 keys everywhere
