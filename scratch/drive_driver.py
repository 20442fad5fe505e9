"""Simulate the driver: fresh process, vanilla SparkSession, import
__spark_entry__ by path, run entry + queries vs oracle_sql via DuckDB
with an order-insensitive value-hash."""
import hashlib, importlib.util, sys
import duckdb
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)

spark = SparkSession.builder.master("local[4]").appName("driver-sim").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

df = mod.entry(spark)
rows = df.collect()
print("SMOKE entry rows:", len(rows), "schema:", df.schema.simpleString())
assert len(rows) > 0

Q, O = mod.queries(), mod.oracle_sql()
print(f"{len(Q)} queries, {len(O)} oracles")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('/root/testdata/sf0.01/{t}.parquet')")

def vhash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    lines = sorted(",".join(repr(v) for v in row) for row in pdf.itertuples(index=False))
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:12]

fails = 0
for name, fn in sorted(Q.items()):
    sdf = fn(spark, "/root/testdata/sf0.01")
    sp = sdf.toPandas()
    if name not in O:
        print(f"{name}: rows-only, {len(sp)} rows"); continue
    du = con.execute(O[name]).df()
    for d in (sp, du):
        for c in d.columns:
            import pandas as pd
            if pd.api.types.is_datetime64_any_dtype(d[c]):
                col = d[c]
                if getattr(col.dtype, "tz", None) is not None:
                    col = col.dt.tz_convert("UTC").dt.tz_localize(None)
                d[c] = col.astype("datetime64[us]")
    hs, hd = vhash(sp), vhash(du)
    ok = len(sp)==len(du) and hs==hd
    print(f"{name}: rows {len(sp)}/{len(du)} hash {hs}/{hd} {'OK' if ok else 'MISMATCH'}")
    fails += 0 if ok else 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
