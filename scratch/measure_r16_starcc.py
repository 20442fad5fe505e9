"""Round-16: large-star/small-star CC vs pointer-jump twin on the
adversarial 10k chain + a cliquish near-dup-shaped graph."""
import sys, time
sys.path.insert(0, "/root/repo")
from sas_etl_spark.session import get_spark
from sas_etl_spark.operators.graph import connected_components, connected_components_jump
from pyspark.sql import functions as F

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

def run(fn, edges, **kw):
    t0 = time.time()
    out = fn(edges, **kw)
    row = out.agg(F.count("*").alias("n"), F.countDistinct("component").alias("k"),
                  F.max("component").alias("mx")).collect()[0]
    return time.time() - t0, (row.n, row.k, row.mx)

chain = spark.createDataFrame([(i, i + 1) for i in range(9_999)], "a_id long, b_id long")
rounds = []
t, res = run(connected_components, chain, max_iter=20, round_log=rounds)
print(f"star  chain10k: {t:.2f}s rounds={rounds[0]} result={res}")
t, res = run(connected_components_jump, chain, max_iter=20)
print(f"jump  chain10k: {t:.2f}s result={res}")

# cliquish: 500 components x 20-clique (near-dup shape)
cl = [(c * 100 + a, c * 100 + b) for c in range(500) for a in range(20) for b in range(a + 1, 20)]
cliq = spark.createDataFrame(cl, "a_id long, b_id long")
rounds = []
t, res = run(connected_components, cliq, max_iter=20, round_log=rounds)
print(f"star  cliques:  {t:.2f}s rounds={rounds[0]} result={res}")
t, res = run(connected_components_jump, cliq, max_iter=20)
print(f"jump  cliques:  {t:.2f}s result={res}")
