"""Round-12 full-registry PLAN-AUDIT sweep at sf10 (VERDICT r11 item
9, the r8 protocol re-run on the current tree): build every registered
query's physical plan against /tmp/sf10 and flag CartesianProduct
nodes and unexplained SinglePartition funnels. Plan SHAPE is under
audit (broadcast gates and AQE choices differ from sf0.001); plans are
built, not executed, though some fn() bodies run bounded eager steps
(index builds, snapshot publishes, fixtures). RESUMABLE: progress
appends to /tmp/r12_audit_progress.jsonl; rerun to continue."""
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
PROGRESS = "/tmp/r12_audit_progress.jsonl"
ALLOW = {
    "q_rfm_segments": "exact global median cuts (allowlisted in tests)",
}

queries_map()
done = set()
if os.path.exists(PROGRESS):
    with open(PROGRESS) as f:
        for line in f:
            done.add(json.loads(line)["name"])

todo = [n for n in sorted(QUERIES) if n not in done]
print(f"todo={len(todo)} done={len(done)}", flush=True)
if not todo:
    sys.exit(0)
spark = get_spark("audit-sf10-r12", cpus=32, shuffle_partitions=32)

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
