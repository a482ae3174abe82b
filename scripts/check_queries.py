"""Ad-hoc oracle check for a subset of gate queries at one SF.

Usage: python scripts/check_queries.py [sf_dir] q_name [q_name ...]
Mirrors the driver's compare (rows / sorted-columns / value hash).
"""
import glob
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as m


def vh(p):
    p = p[sorted(p.columns)].copy()
    for c in p.columns:
        if p[c].dtype == "float64":
            p[c] = p[c].round(9)
    p = p.sort_values(by=list(p.columns)).reset_index(drop=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(p.astype(str), index=False).values.tobytes()
    ).hexdigest()


def main():
    args = sys.argv[1:]
    sf = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    names = args or sorted(m.queries().keys())
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for f in glob.glob(f"{sf}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(f)[:-8]} AS "
            f"SELECT * FROM read_parquet('{f}')"
        )
    bad = []
    for name in names:
        fn = m.queries()[name]
        got = fn(spark, sf).toPandas()
        o = m.oracle_sql().get(name)
        if o is None:
            print(name, "rows-only", len(got))
            continue
        try:
            want = con.execute(o).df()
        except Exception as e:  # noqa: BLE001
            print(name, "ORACLE ERR", e)
            bad.append(name)
            continue
        ok = (
            len(got) == len(want)
            and sorted(got.columns) == sorted(want.columns)
            and vh(got) == vh(want)
        )
        print(name, len(got), len(want), "match" if ok else "MISMATCH")
        if not ok:
            bad.append(name)
            if sorted(got.columns) != sorted(want.columns):
                print("  spark cols:", sorted(got.columns))
                print("  oracle cols:", sorted(want.columns))
    print("RESULT:", "ALL MATCH" if not bad else bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
