"""Driver simulation: run every __spark_entry__.queries() entry on local[8]
and hash-compare against oracle_sql() via DuckDB at the given sf dir.

Mimics the grading driver: row-count + schema + order-insensitive value-hash
(sort columns by name, sort rows, CSV, md5). Prints OK/FAIL/WEAK per query
plus one JSON summary line.
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def df_hash(pdf):
    import pandas as pd
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    # normalize floats to avoid 6dp-rounded representation diffs
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    csv = pdf.to_csv(index=False, float_format="%.6f")
    return hashlib.md5(csv.encode()).hexdigest()


def main():
    import duckdb
    from pyspark.sql import SparkSession
    import __spark_entry__ as E

    spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from parquet_scan('{p}')")

    # smoke: entry()
    t0 = time.time()
    edf = E.entry(spark)
    n = len(edf.collect())
    print(f"entry: {n} rows, schema={edf.schema.simpleString()} ({time.time()-t0:.1f}s)")

    oracles = E.oracle_sql()
    results = {}
    for name, fn in E.queries().items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = sdf.toPandas()
            if name in oracles:
                opdf = con.execute(oracles[name]).df()
                ok_rows = len(spdf) == len(opdf)
                ok_cols = sorted(spdf.columns) == sorted(opdf.columns)
                ok_hash = ok_rows and ok_cols and df_hash(spdf) == df_hash(opdf)
                status = "OK" if ok_hash else "FAIL"
                detail = f"rows {len(spdf)}/{len(opdf)} cols_match={ok_cols}"
            else:
                status = "WEAK" if len(spdf) >= 0 else "FAIL"
                detail = f"rows {len(spdf)} (rows-only)"
        except Exception as e:
            status, detail = "ERROR", str(e)[:200]
        dt = time.time() - t0
        results[name] = status
        print(f"{status:5s} {name:28s} {detail} ({dt:.1f}s)")

    summary = {"sf_dir": SF_DIR,
               "ok": sum(v == "OK" for v in results.values()),
               "weak": sum(v == "WEAK" for v in results.values()),
               "fail": sum(v in ("FAIL", "ERROR") for v in results.values())}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
