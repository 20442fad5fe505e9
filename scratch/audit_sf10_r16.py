"""Round-16 DELTA plan audit at sf10: the round-16 new/changed
queries only (the r15 full sweep covers the untouched rest): build every registered
query's physical plan against /tmp/sf10 and flag CartesianProduct
nodes and unexplained SinglePartition funnels. Plan SHAPE is under
audit (broadcast gates and AQE choices differ from sf0.001); plans are
built, not executed, though some fn() bodies run bounded eager steps
(index builds, snapshot publishes, fixtures). RESUMABLE: progress
appends to /tmp/r16_audit_progress.jsonl; rerun to continue."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sas_etl_spark.plans import formatted_plan
from sas_etl_spark.plans.audit import single_partition_funnels
from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

SF_DIR = "/tmp/sf10"
PROGRESS = "/tmp/r16_audit_progress.jsonl"
ALLOW = {
    "q_rfm_segments": "exact global median cuts (allowlisted in tests)",
}

#: Same skip set as scratch/sweep_sf10.py + the exact-edge composites:
#: these fn() bodies EXECUTE (connected-components loops with eager
#: checkpoints, or exact all-pairs verifies) over the bench fixtures'
#: verbatim-replicated copies, whose TRUE pair output grows
#: quadratically in copies — a fixture artifact, not a plan property.
#: Their plan SHAPES are audited at sf0.001 by
#: tests/test_plan_audit.py::test_no_query_plans_cartesian_or_single_partition_funnel,
#: and their scale stories are the LSH/banded candidate paths.
SKIP = {
    "q_jaccard_pairs", "q_near_dup_minhash", "q_near_dup_simhash",
    "q_near_dup_embedding", "q_dup_clusters", "q_containment_pairs",
    "q_prefix_join", "q_cosine_pairs", "q_chunk_dedup", "q_fuzzy_match",
    "q_cross_source_dups", "q_simhash_fingerprints", "q_neardup_apply",
    "q_pretrain_pipeline",  # exact all-pairs edge stage, test-SF contract
}

queries_map()
done = set()
if os.path.exists(PROGRESS):
    with open(PROGRESS) as f:
        for line in f:
            done.add(json.loads(line)["name"])

R16 = {
    "q_phash_neardup", "q_exact_substring", "q_webp_lossy",
    "q_image_phash", "q_webp_features", "q_webp_vp8x",
    "q_mannwhitney", "q_kruskal_wallis", "q_pretrain_pipeline_prod",
}
todo = [n for n in sorted(R16) if n not in done and n not in SKIP]
print(f"todo={len(todo)} done={len(done)}", flush=True)
if not todo:
    sys.exit(0)
spark = get_spark("audit-sf10-r16", cpus=32, shuffle_partitions=32)

t_start = time.perf_counter()
with open(PROGRESS, "a") as out:
    for name in todo:
        if time.perf_counter() - t_start > 500:
            print("time budget reached; rerun to continue", flush=True)
            break
        rec = {"name": name}
        try:
            t0 = time.perf_counter()
            plan = formatted_plan(QUERIES[name].fn(spark, SF_DIR))
            rec["plan_sec"] = round(time.perf_counter() - t0, 2)
            flags = []
            if "CartesianProduct" in plan:
                flags.append("cartesian")
            funnels = single_partition_funnels(plan)
            if funnels and name not in ALLOW:
                flags.append(f"funnel {funnels}")
            rec["flags"] = flags
        except Exception as e:
            rec["error"] = str(e).split("\n")[0][:160]
        out.write(json.dumps(rec) + "\n")
        out.flush()
        tag = rec.get("error") or (rec["flags"] if rec.get("flags") else "ok")
        print(f"{name:32s} {tag}", flush=True)
