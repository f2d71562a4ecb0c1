"""Local mirror of the driver's correctness gate: run each
__spark_entry__ query on Spark AND its oracle SQL on DuckDB over the
same parquet dir; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    """Type-STRICT normalization: the driver's value-hash distinguishes
    Decimal(5) from 5 (DuckDB integer sum() -> decimal128 via Arrow vs
    Spark int64), so each value carries its type name.  Python's
    Decimal == int comparison would otherwise silently mask exactly the
    hash-fail class seen in CORRECTNESS_r01 (VERDICT.md What's-wrong #1)."""
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, bool):
                vals.append(("bool", v))
                continue
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
                vals.append(("float", v))
                continue
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            if isinstance(v, dict):
                v = tuple(sorted(v.items()))
            vals.append((type(v).__name__, v))
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from hetman_spark.session import get_spark

    spark = get_spark(app_name="parity", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_cols = sorted(sdf.columns)
        srows = [r.asDict() for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        cur = con.execute(oracles[name])
        duck_cols_orig = [d[0] for d in cur.description]
        drows_raw = cur.fetchall()
        duck_cols = sorted(duck_cols_orig)
        ok = True
        if spark_cols != duck_cols:
            print(f"{name}: SCHEMA MISMATCH spark={spark_cols} duck={duck_cols}")
            ok = False
        elif len(srows) != len(drows_raw):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} duck={len(drows_raw)}")
            ok = False
        else:
            s_norm = normalize(srows, spark_cols)
            d_dicts = [dict(zip(duck_cols_orig, r)) for r in drows_raw]
            d_norm = normalize(d_dicts, duck_cols)
            if s_norm != d_norm:
                diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
                print(f"{name}: VALUE MISMATCH ({len([1 for a,b in zip(s_norm,d_norm) if a!=b])} rows) e.g. {diffs}")
                ok = False
        if ok:
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            failures.append(name)

    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
