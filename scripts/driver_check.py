"""Driver-style oracle check: stricter than tests/test_oracle_parity.py.

The driver converts both result sets to pandas, sorts columns by name,
sorts rows, and hashes the stringified values — so a DuckDB HUGEINT sum
that pandas renders as ``8387.0`` mismatches Spark's ``8387`` even
though the numbers are equal.  This script reproduces that exact
comparison so oracle-type bugs surface before the round snapshot.

Usage: python scripts/driver_check.py [query_name ...]   (default: all)
"""

from __future__ import annotations

import sys

import duckdb

SF = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def norm(df):
    df = df[sorted(df.columns)]
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows


def main() -> int:
    import importlib.util
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries, oracles = mod.queries(), mod.oracle_sql()

    names = sys.argv[1:] or list(queries)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    failed = []
    for name in names:
        if name not in queries:
            print(f"{name}: NOT IN CATALOG"); failed.append(name); continue
        try:
            sdf = queries[name](spark, SF).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERR {type(e).__name__}: {str(e)[:200]}")
            failed.append(name); continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)"); continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {type(e).__name__}: {str(e)[:200]}")
            failed.append(name); continue
        scols, srows = norm(sdf)
        ocols, orows = norm(odf)
        if scols != ocols:
            print(f"{name}: SCHEMA MISMATCH {scols} vs {ocols}"); failed.append(name); continue
        if len(srows) != len(orows):
            print(f"{name}: ROWS {len(srows)} vs {len(orows)}"); failed.append(name); continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"{name}: HASH FAIL {len(bad)}/{len(srows)} rows; first: {bad[0]}")
            failed.append(name)
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} green" + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
