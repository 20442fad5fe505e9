"""Quick parity smoke for the round-6b queries at sf0.001 + sf0.01."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb

from parity import assert_parity
from sas_etl_spark.catalog import TABLES
from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

NEW = [
    "q_text_normalize",
    "q_chunk_docs",
    "q_pii_redact",
    "q_keyword_extract",
    "q_mode_per_group",
    "q_outlier_mad",
    "q_ewma",
    "q_partial_agg_merge",
    "q_correlated_subquery",
    "q_top_paths",
]

queries_map()
spark = get_spark("r6b-check", cpus=8, shuffle_partitions=8)
for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    for name in NEW:
        spec = QUERIES[name]
        try:
            assert_parity(spec.fn(spark, sf_dir), con, spec.oracle, name)
            print(f"OK   {sf_dir.split('/')[-1]} {name}")
        except Exception as e:
            msg = str(e).replace("\n", " | ")[:400]
            print(f"FAIL {sf_dir.split('/')[-1]} {name}: {msg}")
    con.close()
spark.stop()
