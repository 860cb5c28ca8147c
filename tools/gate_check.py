"""Local mirror of the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB over the same sf dir, compare
row count, column names, and order-insensitive values.

Usage: python tools/gate_check.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if isinstance(r, dict) else r[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import duckdb

    import __spark_entry__ as entrymod
    from lucene_solr_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # Let heavy oracles (recursive CTEs over materialized pair graphs)
    # spill instead of failing allocation alongside the Spark JVM.
    con.execute("SET temp_directory='/tmp/duckdb_gate_spill'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
            if name not in oq:
                # no SQL twin (non-expressible op) -> driver does a
                # rows-only check; mirror that
                print(f"PASS {name} ({len(srows)} rows, rows-only)")
                n_pass += 1
                continue
            cur = con.execute(oq[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            if sorted(scols) != sorted(dcols):
                print(f"FAIL {name}: cols spark={scols} duck={dcols}")
                n_fail += 1
                continue
            a = normalize(srows, scols)
            b = normalize(drows, dcols)
            if len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
                print("  spark sample:", a[:3])
                print("  duck  sample:", b[:3])
                n_fail += 1
                continue
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            if diffs:
                print(f"FAIL {name}: {len(diffs)} value diffs, first:")
                for x, y in diffs[:3]:
                    print("   spark:", x)
                    print("   duck :", y)
                n_fail += 1
            else:
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
