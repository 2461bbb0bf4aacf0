"""Run ONE __spark_entry__ queries() entry vs its oracle at a given sf dir."""
import os, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from verify_driver_sim import df_hash, TABLES

name = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

import duckdb
from pyspark.sql import SparkSession
import __spark_entry__ as E

spark = (SparkSession.builder.master("local[8]").appName("one-entry")
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

t0 = time.time()
spdf = E.queries()[name](spark, SF_DIR).toPandas()
opdf = con.execute(E.oracle_sql()[name]).df()
ok = (len(spdf) == len(opdf)
      and sorted(spdf.columns) == sorted(opdf.columns)
      and df_hash(spdf) == df_hash(opdf))
print(f"{'OK' if ok else 'FAIL'} {name} rows {len(spdf)}/{len(opdf)} "
      f"({time.time()-t0:.1f}s) sf={SF_DIR}")
sys.exit(0 if ok else 1)
