"""Self-check: run every contract query on Spark AND its DuckDB oracle,
compare row counts, column sets, and order-insensitive values — a local
replica of the driver's correctness gate.

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    """Sort columns by name, rows by all values, normalize cell types."""
    df = df[sorted(df.columns)]

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(round(v, 9))
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return rows


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from search_engine_spark import contract
    from search_engine_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8, driver_memory="16g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    # pass the CLI sf_dir so dump-backed engine/ANN oracles regenerate
    # against the same scale the Spark side runs at (the driver's own
    # gate always runs at ORACLE_SF_DIR; this matters for local checks
    # at other scales)
    oracles = contract.oracle_sql(sf)
    failures = []
    for name, fn in contract.queries().items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: spark error {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(sdf)} rows")
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"FAIL {name}: oracle error {ex}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            s, o = canon(sdf), canon(odf)
            if s != o:
                diff = [i for i, (a, b) in enumerate(zip(s, o)) if a != b][:3]
                detail = "; ".join(f"row{i}: {s[i]} vs {o[i]}" for i in diff)
                problems.append(f"values differ ({detail})")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match oracle")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, p in failures:
            print(f"  {n}: {p[:300]}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
