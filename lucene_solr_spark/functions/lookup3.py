"""Bob Jenkins lookup3 hashes + Lookup3Signature — bit-exact.

Reference: solr/solrj/src/java/org/apache/solr/common/util/Hash.java
(lookup3 / lookup3ycs / lookup3ycs64 — public-domain lookup3.c ported
to Java by the Solr project) and solr/core/.../update/processor/
Lookup3Signature.java (the default SignatureUpdateProcessor signature:
the 64-bit hash chained across field values, emitted as 8 big-endian
bytes). Pinned by the reference's own C-generated vectors
(solr/solrj/src/test/.../TestHash.java testEqualsLOOKUP3).

The arithmetic transliterates the published spec with explicit 32-bit
wrapping (Java's int overflow); ``>>> -n`` in the Java source is an
n-bit left rotation. Java iterates UTF-16 code units pairing
surrogates into code points — Python strings already iterate code
points, so ``ord`` per char is the same sequence.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _rot(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & _M32


def _mix(a: int, b: int, c: int) -> tuple[int, int, int]:
    a = (a - c) & _M32; a ^= _rot(c, 4);  c = (c + b) & _M32
    b = (b - a) & _M32; b ^= _rot(a, 6);  a = (a + c) & _M32
    c = (c - b) & _M32; c ^= _rot(b, 8);  b = (b + a) & _M32
    a = (a - c) & _M32; a ^= _rot(c, 16); c = (c + b) & _M32
    b = (b - a) & _M32; b ^= _rot(a, 19); a = (a + c) & _M32
    c = (c - b) & _M32; c ^= _rot(b, 4);  b = (b + a) & _M32
    return a, b, c


def _final(a: int, b: int, c: int) -> tuple[int, int, int]:
    c ^= b; c = (c - _rot(b, 14)) & _M32
    a ^= c; a = (a - _rot(c, 11)) & _M32
    b ^= a; b = (b - _rot(a, 25)) & _M32
    c ^= b; c = (c - _rot(b, 16)) & _M32
    a ^= c; a = (a - _rot(c, 4)) & _M32
    b ^= a; b = (b - _rot(a, 14)) & _M32
    c ^= b; c = (c - _rot(b, 24)) & _M32
    return a, b, c


def lookup3(k: list[int], initval: int) -> int:
    """Hash.lookup3 (hashword): 32-bit hash of an int array."""
    length = len(k)
    a = b = c = (0xDEADBEEF + (length << 2) + initval) & _M32
    i = 0
    while length > 3:
        a = (a + k[i]) & _M32
        b = (b + k[i + 1]) & _M32
        c = (c + k[i + 2]) & _M32
        a, b, c = _mix(a, b, c)
        length -= 3
        i += 3
    if length == 3:
        c = (c + k[i + 2]) & _M32
    if length >= 2:
        b = (b + k[i + 1]) & _M32
    if length >= 1:
        a = (a + k[i]) & _M32
        a, b, c = _final(a, b, c)
    return c


def lookup3ycs(s: str, initval: int) -> int:
    """Hash.lookup3ycs over a string's code points (the
    length-independent variant: initval pre-biased by -(len<<2))."""
    a = b = c = (0xDEADBEEF + initval) & _M32
    cps = [ord(ch) for ch in s]
    i, n = 0, len(cps)
    mixed = True
    while i < n:
        mixed = False
        a = (a + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        b = (b + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        c = (c + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        a, b, c = _mix(a, b, c)
        mixed = True
    if not mixed:
        a, b, c = _final(a, b, c)
    return c


def lookup3ycs64(s: str, initval: int) -> int:
    """Hash.lookup3ycs64: 64-bit variant — low word c, high word b,
    combined exactly as Java's ``c + (((long) b) << 32)`` (signed c
    borrows from the high word)."""
    a = b = c = (0xDEADBEEF + (initval & _M32)) & _M32
    c = (c + ((initval >> 32) & _M32)) & _M32
    cps = [ord(ch) for ch in s]
    i, n = 0, len(cps)
    mixed = True
    while i < n:
        mixed = False
        a = (a + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        b = (b + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        c = (c + cps[i]) & _M32
        i += 1
        if i >= n:
            break
        a, b, c = _mix(a, b, c)
        mixed = True
    if not mixed:
        a, b, c = _final(a, b, c)
    c_signed = c - (1 << 32) if c & 0x80000000 else c
    return ((b << 32) + c_signed) & _M64


def lookup3_signature(*field_values: str) -> str:
    """Lookup3Signature.java: the 64-bit hash chained across field
    values (hash = lookup3ycs64(value, prev_hash), starting at 0),
    rendered as the 8 big-endian bytes in hex — the dedup signature
    string."""
    h = 0
    for v in field_values:
        h = lookup3ycs64(v, h)
    return format(h, "016x")


def signature_dedup_lookup3(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """SignatureUpdateProcessor with signatureClass=Lookup3Signature:
    last-wins per 64-bit content signature. The hash is inherently
    sequential per value, so it runs as an Arrow-batched Python kernel
    (the exact-bit-compat price; content-hash dedup at pure Spark
    speed is the md5 path in datapipe/dedup.py)."""
    import pandas as pd
    import pyspark.sql.functions as F

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "signature": [
                        lookup3_signature(t or "") for t in pdf[text_col]
                    ],
                }
            )

    sigs = df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, signature string"
    )
    return (
        sigs.groupBy("signature")
        .agg(
            F.max(id_col).alias(id_col),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .select(id_col, "signature", "n_docs")
    )
