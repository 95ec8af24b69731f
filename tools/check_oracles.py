"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count + schema-ish +
order-insensitive value hash. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _kind(s: pd.Series) -> str:
    """Normalized dtype kind so Spark-vs-DuckDB type drift is visible.

    int widths collapse (i32 == i64 hashes identically) but float vs
    int vs decimal vs string do NOT — a DecimalType column on the Spark
    side (the round-1 q03 failure mode) shows up as kind 'decimal'."""
    import decimal

    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "ts"
    for v in s:
        if v is None:
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (list, np.ndarray)):
            return "list"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        return type(v).__name__
    return "empty"


def canon(df: pd.DataFrame) -> tuple:
    """Order-insensitive (rows, value-hash) at FULL float precision.

    Floats hash via repr() (shortest round-trip) — NOT rounded — so a
    Spark Decimal('2664.450000') vs DuckDB double 2664.4500000000003
    divergence fails here exactly as it fails the driver's hash."""
    import decimal

    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        vals = []
        for v in t:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                vals.append("∅")
            elif isinstance(v, (np.floating, float, decimal.Decimal)):
                vals.append(repr(float(v)))
            elif isinstance(v, (np.integer, int)):
                vals.append(str(int(v)))
            elif isinstance(v, (pd.Timestamp,)):
                vals.append(str(v))
            elif isinstance(v, (list, np.ndarray)):
                vals.append(str(list(v)))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return len(rows), hash(tuple(rows))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from lagespark.session import get_spark

    spark = get_spark("local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    osql = entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # isolate queries from each other's GC debt (same rationale as
        # bench.py: image-payload/md5 churn otherwise inflates whatever runs
        # next — q69 measured 45 s mid-gate vs 13 s standalone)
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            fails.append(name)
            continue
        if name not in osql:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            fails.append(name)
            continue
        ns, hs = canon(sdf)
        no, ho = canon(odf)
        schema_s = sorted((c, _kind(sdf[c])) for c in sdf.columns)
        schema_o = sorted((c, _kind(odf[c])) for c in odf.columns)
        status = "PASS" if (ns == no and hs == ho and schema_s == schema_o) else "FAIL"
        msg = f"{status} {name}: spark {ns} rows, oracle {no} rows [{time.time()-t0:.1f}s]"
        if status == "FAIL":
            fails.append(name)
            if schema_s != schema_o:
                msg += f"\n  schema spark={schema_s} oracle={schema_o}"
            elif ns == no:
                # find first differing row
                a = sdf.reindex(sorted(sdf.columns), axis=1)
                b = odf.reindex(sorted(odf.columns), axis=1)
                msg += f"\n  spark head:\n{a.head(3)}\n  oracle head:\n{b.head(3)}"
        print(msg)
    print(f"\n{'ALL PASS' if not fails else 'FAILURES: ' + ', '.join(fails)}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
