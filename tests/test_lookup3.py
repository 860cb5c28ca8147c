"""lookup3 hash family: bit-exact vs the reference's C-generated
vectors (solr/solrj TestHash.testEqualsLOOKUP3) + Lookup3Signature
chaining."""

from lucene_solr_spark.functions.lookup3 import (
    lookup3,
    lookup3_signature,
    lookup3ycs,
    lookup3ycs64,
    signature_dedup_lookup3,
)

# hashword() outputs from lookup3.c for "hello world" prefixes with
# initval i*12345 (TestHash.java:30)
C_VECTORS = [
    0xC4C20DD5, 0x3AB04CC3, 0xEBE874A3, 0x0E770EF3, 0xEC321498,
    0x73845E86, 0x8A2DB728, 0x03C313BB, 0xFE5B9199, 0x95965125,
    0xCBC4E7C2,
]


def test_lookup3_matches_c_reference():
    s = "hello world"
    for i in range(len(s)):
        prefix = s[: i + 1]
        arr = [ord(ch) for ch in prefix]
        assert lookup3(arr, i * 12345) == C_VECTORS[i]
        # ycs: initval pre-biased by +(len<<2) gives identical output
        assert (
            lookup3ycs(prefix, i * 12345 + (len(prefix) << 2))
            == C_VECTORS[i]
        )


def test_ycs64_low_word_equals_ycs():
    """Hash.java contract: with zero high seed bits, the low 32 bits
    of lookup3ycs64 equal lookup3ycs (TestHash.tstEquiv)."""
    import random

    rng = random.Random(13)
    for _ in range(200):
        n = rng.randint(0, 17)
        s = "".join(chr(rng.randint(32, 0x2FFF)) for _ in range(n))
        assert (lookup3ycs64(s, 100) & 0xFFFFFFFF) == lookup3ycs(s, 100)


def test_signature_chaining_and_format():
    # one field vs two fields chained: h2 = ycs64(f2, ycs64(f1, 0))
    h1 = lookup3ycs64("title value", 0)
    h2 = lookup3ycs64("body value", h1)
    assert lookup3_signature("title value", "body value") == format(
        h2, "016x"
    )
    assert len(lookup3_signature("x")) == 16
    # empty content: the initial state is emitted (mixed=True path)
    assert lookup3_signature("") == format(lookup3ycs64("", 0), "016x")


def test_signature_dedup_lookup3_spark(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (7, "same text"), (3, "different text")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in signature_dedup_lookup3(df).collect()}
    assert set(rows) == {7, 3}  # last-wins per signature
    assert rows[7]["n_docs"] == 2
    assert rows[7]["signature"] == lookup3_signature("same text")


def test_batch_kernel_bit_equals_scalar():
    """The vectorized lockstep kernel must be bit-identical to the
    scalar reference walk: lengths straddling every n%3 case, empty
    strings, astral code points, scalar AND per-string chained
    initvals."""
    import random

    import numpy as np

    from lucene_solr_spark.functions.lookup3 import (
        lookup3ycs64,
        lookup3ycs64_batch,
    )

    rng = random.Random(42)
    texts = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef"]
    for _ in range(200):
        n = rng.randrange(0, 40)
        texts.append(
            "".join(
                chr(
                    rng.choice(
                        [
                            rng.randrange(32, 127),
                            rng.randrange(0x4E00, 0x9FFF),
                            rng.randrange(0x10000, 0x10400),
                        ]
                    )
                )
                for _ in range(n)
            )
        )
    for iv in (0, 1, 0xDEADBEEF, (1 << 63) | 12345):
        expect = np.array(
            [lookup3ycs64(t, iv) for t in texts], dtype=np.uint64
        )
        assert (lookup3ycs64_batch(texts, iv) == expect).all()
    # chained (vector initval) — the multi-field signature case
    prev = np.array([lookup3ycs64(t, 0) for t in texts], dtype=np.uint64)
    expect = np.array(
        [lookup3ycs64(t, int(p)) for t, p in zip(texts, prev)],
        dtype=np.uint64,
    )
    assert (lookup3ycs64_batch(texts, prev) == expect).all()
