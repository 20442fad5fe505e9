import duckdb
from sas_etl_spark.registry import QUERIES, queries_map
queries_map()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from read_parquet('/root/testdata/sf0.01/{t}.parquet')")
for n, s in sorted(QUERIES.items()):
    if s.oracle:
        c = con.execute(f"select count(*) from ({s.oracle})").fetchone()[0]
        print(f"{n}: {c}")
