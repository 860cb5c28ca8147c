"""Atomic updates + optimistic concurrency
(DistributedUpdateProcessor.versionAdd :444-520 / getUpdatedDocument
:573-660)."""

import tempfile

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.streaming.incremental import (
    IncrementalIndexWriter,
    VersionConflict,
)


def _writer(spark):
    d = tempfile.mkdtemp(prefix="lss_atomic_test_")
    return IncrementalIndexWriter(spark, d, order_cols=("uid",))


def _base(spark):
    return spark.createDataFrame(
        [(i, f"alpha beta doc{i}", 10 * i) for i in range(6)],
        "uid long, text string, views long",
    )


def _docmap(reader, *cols):
    return {
        int(r["uid"]): tuple(r[c] for c in cols)
        for r in reader.docs.collect()
    }


def test_add_versioned_stamps_and_bumps_clock(spark):
    w = _writer(spark)
    assert w.add_versioned(_base(spark), 0) == 6
    got = _docmap(w.reader(), "_version_")
    assert got == {i: (1,) for i in range(6)}
    # second versioned batch overwrites two docs at version 2
    upd = spark.createDataFrame(
        [(1, "gamma delta", 999), (3, "gamma", 5)],
        "uid long, text string, views long",
    )
    assert w.add_versioned(upd, 1) == 2
    got = _docmap(w.reader(), "_version_", "views")
    assert got[1] == (2, 999) and got[3] == (2, 5)
    assert got[0] == (1, 0)


def test_version_one_is_must_exist_not_exact(spark):
    # versionOnUpdate==1 means "must exist", NOT "must be at version 1"
    # (versionAdd: versionOnUpdate==1 && foundVersion > 0 is ok)
    w = _writer(spark)
    w.add_versioned(_base(spark), 0)
    ok = spark.createDataFrame(
        [(2, "t", 7, 1)], "uid long, text string, views long, _version_ long"
    )
    assert w.add_versioned(ok, 1) == 1  # doc 2 -> version 2
    again = spark.createDataFrame(
        [(2, "t", 8, 1)], "uid long, text string, views long, _version_ long"
    )
    assert w.add_versioned(again, 2) == 1  # still ok: doc exists


def test_version_semantics_table(spark):
    w = _writer(spark)
    w.add_versioned(_base(spark), 0)  # all at version 1
    w.add_versioned(
        spark.createDataFrame(
            [(0, "x", 1)], "uid long, text string, views long"
        ),
        1,
    )  # doc 0 -> version 2
    # versionOnUpdate=2 exact-matches doc 0
    assert (
        w.add_versioned(
            spark.createDataFrame(
                [(0, "y", 2, 2)],
                "uid long, text string, views long, _version_ long",
            ),
            2,
        )
        == 1
    )
    # versionOnUpdate=5 mismatches -> conflict
    with pytest.raises(VersionConflict):
        w.add_versioned(
            spark.createDataFrame(
                [(0, "z", 3, 5)],
                "uid long, text string, views long, _version_ long",
            ),
            3,
        )
    # must-not-exist (<0) on an existing doc -> conflict
    with pytest.raises(VersionConflict):
        w.add_versioned(
            spark.createDataFrame(
                [(0, "z", 3, -1)],
                "uid long, text string, views long, _version_ long",
            ),
            4,
        )
    # must-not-exist on a new key -> ok
    assert (
        w.add_versioned(
            spark.createDataFrame(
                [(99, "new", 0, -1)],
                "uid long, text string, views long, _version_ long",
            ),
            5,
        )
        == 1
    )
    # must-exist (==1) on a missing key -> conflict
    with pytest.raises(VersionConflict):
        w.add_versioned(
            spark.createDataFrame(
                [(123456, "no", 0, 1)],
                "uid long, text string, views long, _version_ long",
            ),
            6,
        )


def test_on_conflict_skip_applies_rest(spark):
    w = _writer(spark)
    w.add_versioned(_base(spark), 0)
    mixed = spark.createDataFrame(
        [(1, "ok", 11, 0), (2, "bad", 22, 42)],
        "uid long, text string, views long, _version_ long",
    )
    assert w.add_versioned(mixed, 1, on_conflict="skip") == 1
    got = _docmap(w.reader(), "views", "_version_")
    assert got[1] == (11, 2)
    assert got[2] == (20, 1)  # untouched


def test_atomic_update_set_inc_add_and_carryover(spark):
    w = _writer(spark)
    base = spark.createDataFrame(
        [(1, "alpha", 10, ["a"]), (2, "beta", 20, ["b"])],
        "uid long, text string, views long, tags array<string>",
    )
    w.add_versioned(base, 0)
    upd = spark.createDataFrame(
        [(1, 5, "c"), (3, 7, "d")], "uid long, views long, tags string"
    )
    w.atomic_update(
        upd, 1, modifiers={"views": "inc", "tags": "add"}, key_col="uid"
    )
    got = {
        int(r["uid"]): (
            r["text"],
            int(r["views"]),
            list(r["tags"] or []),
            int(r["_version_"]),
        )
        for r in w.reader().docs.collect()
    }
    # doc 1: text carried over, views incremented, tag appended
    assert got[1] == ("alpha", 15, ["a", "c"], 2)
    # doc 2 untouched
    assert got[2] == ("beta", 20, ["b"], 1)
    # doc 3 created (versionOnUpdate absent -> 0): inc seeds, add seeds
    assert got[3][1] == 7 and got[3][2] == ["d"]


def test_atomic_update_must_exist_conflict_on_missing(spark):
    w = _writer(spark)
    w.add_versioned(_base(spark), 0)
    upd = spark.createDataFrame(
        [(777, 5, 1)], "uid long, views long, _version_ long"
    )
    with pytest.raises(VersionConflict):
        w.atomic_update(
            upd, 1, modifiers={"views": "inc"}, key_col="uid"
        )
