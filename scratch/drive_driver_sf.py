"""Driver simulation parameterized by SF dir (env SFDIR).

Optional env filters:
  ONLY=q_a,q_b    run just these queries
  SKIP=q_x,q_y    exclude these (e.g. the O(n^2) Jaccard oracles that
                  take 35+ min in DuckDB at sf0.1)
  SKIP=auto       exclude registry.SWEEP_SKIP — the documented
                  quadratic-oracle set for the standing round-close
                  full-registry sf0.1 sweep (VERDICT r13 item 8)
"""
import hashlib, importlib.util, os, sys
import duckdb, pandas as pd
from pyspark.sql import SparkSession

SFDIR = os.environ.get("SFDIR", "/root/testdata/sf0.01")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
spark = SparkSession.builder.master("local[8]").appName("driver-sim").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
Q, O = mod.queries(), mod.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('{SFDIR}/{t}.parquet')")
def vhash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return hashlib.sha256("\n".join(sorted(",".join(repr(v) for v in row) for row in pdf.itertuples(index=False))).encode()).hexdigest()[:12]
def norm(d):
    for c in d.columns:
        if pd.api.types.is_datetime64_any_dtype(d[c]):
            col = d[c]
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            d[c] = col.astype("datetime64[us]")
    return d
fails = 0
only = set(filter(None, os.environ.get("ONLY", "").split(",")))
_skip_env = os.environ.get("SKIP", "")
if _skip_env == "auto":
    sys.path.insert(0, "/root/repo")
    from sas_etl_spark.registry import SWEEP_SKIP

    skip = set(SWEEP_SKIP)
    print("SKIP=auto ->", len(skip), "quadratic-oracle queries skipped:",
          ",".join(sorted(skip)))
else:
    skip = set(filter(None, _skip_env.split(",")))
for name, fn in sorted(Q.items()):
    if name not in O: continue
    if only and name not in only: continue
    if name in skip: continue
    sp = norm(fn(spark, SFDIR).toPandas()); du = norm(con.execute(O[name]).df())
    ok = len(sp)==len(du) and vhash(sp)==vhash(du)
    if not ok:
        print(f"{name}: MISMATCH rows {len(sp)}/{len(du)}"); fails += 1
print("SF:", SFDIR, "FAILURES:", fails)
sys.exit(1 if fails else 0)
