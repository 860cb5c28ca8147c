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


def lookup3ycs64_batch(texts, initval=0):
    """Vectorized lookup3ycs64 over a batch of strings — bit-identical
    to the scalar walk (pinned by tests/test_lookup3.py's batch==scalar
    fuzz) but numpy-elementwise instead of per-character Python.

    The hash is sequential per STRING but the mix/final rounds are
    pure elementwise uint32 arithmetic, so all strings advance in
    lockstep over a padded [docs x max_len] code-point matrix:

    - code points come from one ``utf-32-le`` encode of the joined
      batch (exactly Java's surrogate-paired code-point sequence, the
      contract Hash.lookup3ycs documents);
    - zero padding is harmless because the per-round ADD is the only
      op that reads input (a += 0 is identity); the MIX after group g
      applies only where the string still has characters beyond the
      group (the reference walk breaks BEFORE mixing the last group),
      selected with np.where;
    - FINAL applies exactly once to every non-empty string.

    uint32 wraparound is numpy-native, so each of the ~L/3 rounds is a
    handful of whole-batch vector ops — the 100 TB answer to the old
    per-character loop (map-only, no shuffle, Arrow-batch friendly).

    ``initval`` may be a scalar or a uint64 vector (one previous hash
    per string — the Lookup3Signature chaining case).
    """
    import numpy as np

    n_docs = len(texts)
    if n_docs == 0:
        return np.zeros(0, dtype=np.uint64)
    iv = np.asarray(initval, dtype=np.uint64)
    if iv.ndim == 0:
        iv = np.full(n_docs, iv, dtype=np.uint64)
    lens = np.fromiter(
        (len(t) for t in texts), dtype=np.int64, count=n_docs
    )
    max_len = int(lens.max())
    a = (
        np.uint32(0xDEADBEEF) + (iv & np.uint64(_M32)).astype(np.uint32)
    ).astype(np.uint32)
    b = a.copy()
    c = (a + (iv >> np.uint64(32)).astype(np.uint32)).astype(np.uint32)
    if max_len:
        flat = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        )
        mat = np.zeros((n_docs, max_len), dtype=np.uint32)
        mat[np.arange(max_len)[None, :] < lens[:, None]] = flat
        a0, b0, c0 = a.copy(), b.copy(), c.copy()  # n==0 snapshot
        for g in range(0, max_len, 3):
            a = a + mat[:, g]
            if g + 1 < max_len:
                b = b + mat[:, g + 1]
            if g + 2 < max_len:
                c = c + mat[:, g + 2]
            live = lens > g + 3  # chars beyond this group -> mix
            if live.any():
                ma, mb, mc = _vmix(a, b, c)
                a = np.where(live, ma, a)
                b = np.where(live, mb, b)
                c = np.where(live, mc, c)
            else:
                break
        fa, fb, fc = _vfinal(a, b, c)
        nonempty = lens > 0
        b = np.where(nonempty, fb, b0)
        c = np.where(nonempty, fc, c0)
        del a0, fa
    # Java: c + (((long) b) << 32) with c SIGNED — a negative c
    # borrows from the high word; in mod-2^64 that is +0xFFFFFFFF00000000
    borrow = np.where(
        (c & np.uint32(0x80000000)).astype(bool),
        np.uint64(0xFFFFFFFF00000000),
        np.uint64(0),
    )
    return (
        (b.astype(np.uint64) << np.uint64(32))
        + c.astype(np.uint64)
        + borrow
    )


def _vrot(x, n: int):
    import numpy as np

    return (x << np.uint32(n)) | (x >> np.uint32(32 - n))


def _vmix(a, b, c):
    a = a - c; a = a ^ _vrot(c, 4);  c = c + b
    b = b - a; b = b ^ _vrot(a, 6);  a = a + c
    c = c - b; c = c ^ _vrot(b, 8);  b = b + a
    a = a - c; a = a ^ _vrot(c, 16); c = c + b
    b = b - a; b = b ^ _vrot(a, 19); a = a + c
    c = c - b; c = c ^ _vrot(b, 4);  b = b + a
    return a, b, c


def _vfinal(a, b, c):
    c = c ^ b; c = c - _vrot(b, 14)
    a = a ^ c; a = a - _vrot(c, 11)
    b = b ^ a; b = b - _vrot(a, 25)
    c = c ^ b; c = c - _vrot(b, 16)
    a = a ^ c; a = a - _vrot(c, 4)
    b = b ^ a; b = b - _vrot(a, 14)
    c = c ^ b; c = c - _vrot(b, 24)
    return a, b, c


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
    last-wins per 64-bit content signature. The hash is sequential per
    value but elementwise across DOCUMENTS, so it runs as the
    numpy-vectorized lockstep kernel (lookup3ycs64_batch) inside an
    Arrow batch — bit-exact vs the reference's C vectors, no
    per-character Python (content-hash dedup at pure Catalyst speed is
    the md5 path in datapipe/dedup.py)."""
    import pandas as pd
    import pyspark.sql.functions as F

    def run(batches):
        for pdf in batches:
            texts = [t or "" for t in pdf[text_col]]
            hashes = lookup3ycs64_batch(texts)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "signature": [format(int(h), "016x") for h in hashes],
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
