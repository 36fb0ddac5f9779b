#!/usr/bin/env python
"""Drive the graft driver's contract end-to-end: entry() smoke + every
queries() entry vs its oracle_sql() twin in DuckDB, with the driver's
own comparison semantics (row count, column names, order-insensitive
values over name-sorted columns) PLUS per-cell python-type equality —
the check that catches DuckDB HUGEINT-vs-BIGINT hash mismatches
locally before the driver does.

    python tools/verify_contract.py [sf_dir] [--only name1,name2]
"""
import duckdb, math
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as em
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
args = sys.argv[1:]
only = None
if "--only" in args:
    i = args.index("--only")
    only = set(args[i + 1].split(","))
    del args[i:i + 2]
SF = args[0] if args else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def nc(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 6)
        return v
    return sorted((tuple(nc(r[i]) for i in order) for r in rows), key=repr)

if only is None:
    print("entry rows:", em.entry(spark).count(), flush=True)
qs, os_ = em.queries(), em.oracle_sql()
if only is not None:
    unknown = only - set(os_)
    if unknown:
        raise SystemExit(f"--only names not in oracle_sql(): {sorted(unknown)}")
    os_ = {k: v for k, v in os_.items() if k in only}
bad = []
for name, sql in os_.items():
    sdf = qs[name](spark, SF)
    srows, scols = sdf.collect(), sdf.columns
    cur = con.execute(sql)
    orows, ocols = cur.fetchall(), [d[0] for d in cur.description]
    if sorted(scols) != sorted(ocols):
        bad.append((name, "cols")); continue
    if len(srows) != len(orows):
        bad.append((name, f"rows {len(srows)} vs {len(orows)}")); continue
    a, b = canon(srows, scols), canon(orows, ocols)
    if a != b:
        bad.append((name, "vals")); continue
    tmis = None
    for ra, rb in zip(a, b):
        for ca, cb in zip(ra, rb):
            if ca is not None and cb is not None and type(ca) is not type(cb):
                tmis = (name, f"types {type(ca).__name__} vs {type(cb).__name__}")
                break
        if tmis:
            break
    if tmis:
        bad.append(tmis)
print("checked:", len(os_), "failures:", bad, flush=True)
spark.stop()
