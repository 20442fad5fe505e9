"""Full-registry execution sweep at sf10 (/tmp/sf10, 100x the sf0.1
universe): run EVERY registered query's plan to completion via the
noop sink (full column materialization, no driver fetch) and record
wall time. Purpose: demonstrate the whole operator surface — not just
the 10 bench queries — executes two decades above the correctness SF.

Skipped: the pair-emitting near-dup family. The bench fixtures are
VERBATIM-replicated copies, so true pair/cluster OUTPUT grows
quadratically in copies (measured 501k containment pairs at sf1 —
SCALE.md); at sf10 that is ~50M+ pairs of pure fixture artifact.
Those operators' scale behavior is analyzed separately
(intermediate-SF exactness + the candidate/output decomposition).
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

SKIP = {
    # quadratic true-pair output on replicated fixtures (see module doc)
    "q_jaccard_pairs", "q_near_dup_minhash", "q_near_dup_simhash",
    "q_near_dup_embedding", "q_dup_clusters", "q_containment_pairs",
    "q_prefix_join", "q_cosine_pairs", "q_chunk_dedup", "q_fuzzy_match",
    "q_cross_source_dups", "q_simhash_fingerprints",
    # q_neardup_apply's EDGE stage is the exact all-pairs scorer
    # (same class as q_dup_clusters); its scale lane swaps in LSH
    # candidate edges — the downstream apply is linear.
    "q_neardup_apply",
}

SF_DIR = "/tmp/sf10"
queries_map()
spark = get_spark("sweep-sf10", cpus=32, shuffle_partitions=32)

results, failures = {}, {}
for name, spec in sorted(QUERIES.items()):
    if name in SKIP:
        continue
    try:
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[name] = round(dt, 3)
        print(f"{name:28s} {dt*1000:9.1f} ms", flush=True)
    except Exception as e:
        failures[name] = str(e).split("\n")[0][:200]
        print(f"{name:28s} FAIL {failures[name]}", flush=True)

print(json.dumps({
    "sf": 10, "ran": len(results), "skipped": len(SKIP),
    "failed": len(failures),
    "total_sec": round(sum(results.values()), 1),
    "median_sec": round(statistics.median(results.values()), 3),
    "slowest": dict(sorted(results.items(), key=lambda kv: -kv[1])[:12]),
    "failures": failures,
}))
spark.stop()
