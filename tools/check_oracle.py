"""Driver-mimic: run every queries() entry on Spark and its oracle_sql() on
DuckDB over the same sf dir; compare row count, column names, and sorted
value multisets. Usage: python tools/check_oracle.py [sf_dir] [names...]"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from fsharp_data_validation_spark.sources.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"[FAIL-spark] {name}: {type(ex).__name__}: {str(ex)[:400]}")
            failures += 1
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(os_[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as ex:
            print(f"[FAIL-duck ] {name}: {type(ex).__name__}: {str(ex)[:400]}")
            failures += 1
            continue
        scols_l = [c.lower() for c in scols]
        if sorted(scols_l) != sorted(ocols):
            print(f"[FAIL-cols ] {name}: spark={scols_l} duck={ocols}")
            failures += 1
            continue
        if len(srows) != len(orows):
            print(f"[FAIL-count] {name}: spark={len(srows)} duck={len(orows)}")
            failures += 1
            continue
        sk, ok = rows_key(srows, scols_l), rows_key(orows, ocols)
        if sk != ok:
            diffs = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            print(f"[FAIL-vals ] {name}: first diffs {diffs}")
            failures += 1
            continue
        print(f"[OK        ] {name}: {len(srows)} rows match")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
