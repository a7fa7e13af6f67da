"""Self-check harness replicating the driver's DuckDB-oracle comparison.

Runs every ``queries()`` entry at sf0.01 next to its ``oracle_sql()`` and
compares row count + sorted-column names + order-insensitive value multiset.
Usage: ``python tests/oracle_check.py [sf_dir] [query ...]``
"""

from __future__ import annotations

import math
import sys
from collections import Counter

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # values are pre-rounded by the queries; normalize representation
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_rows(pdf):
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(canon_cell(v) for v in row))
    return Counter(out), cols


def compare(name, spark_df, duck_pdf, verbose=True):
    sp = spark_df.toPandas()
    sc, scols = canon_rows(sp)
    dc, dcols = canon_rows(duck_pdf)
    ok = True
    if scols != dcols:
        print(f"  [{name}] COLUMN MISMATCH spark={scols} duck={dcols}")
        ok = False
    if len(sp) != len(duck_pdf):
        print(f"  [{name}] ROWCOUNT MISMATCH spark={len(sp)} duck={len(duck_pdf)}")
        ok = False
    if ok and sc != dc:
        only_s = list((sc - dc).items())[:3]
        only_d = list((dc - sc).items())[:3]
        print(f"  [{name}] VALUE MISMATCH; spark-only={only_s} duck-only={only_d}")
        ok = False
    return ok


def main():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from german_newspaper_crawler_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                duck = con.sql(oracles[name]).df()
                if compare(name, df, duck):
                    print(f"  [{name}] MATCH ({len(duck)} rows)")
                    n_pass += 1
                else:
                    n_fail += 1
            else:
                n = df.count()
                print(f"  [{name}] ROWS-ONLY ({n} rows)")
                n_rowsonly += 1
        except Exception as ex:
            print(f"  [{name}] ERROR {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail} ROWSONLY={n_rowsonly}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
