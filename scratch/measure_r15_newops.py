"""Round-15 new-operator growth measurement: the hypothesis-test trio
executed (not just planned) at sf0.1 and sf10 (100x rows) on a quiet
box — the scaling evidence for SCALE.md. q_image_phash / q_webp_vp8x
are fixture-bound (64 images at any SF) and are covered by the webp
lane economics instead. Protocol: build the DataFrame once, time
repeated .collect() (scratch/measure_r7.py lesson), floor control in
the same session."""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

queries_map()
spark = get_spark("measure-r15", cpus=32, shuffle_partitions=32)

NAMES = ["q_ttest_welch", "q_mannwhitney", "q_anova_oneway"]
for sf_dir, label in [("/root/testdata/sf0.1", "sf0.1"), ("/tmp/sf10", "sf10")]:
    # job-floor control
    t0 = time.perf_counter()
    spark.range(10).toPandas()
    floor = (time.perf_counter() - t0) * 1000
    for name in NAMES:
        df = QUERIES[name].fn(spark, sf_dir)
        df.collect()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            rows = df.collect()
            ts.append(time.perf_counter() - t0)
        m = statistics.median(ts)
        print(
            f"{label:6s} {name:16s} {m*1000:9.1f} ms  rows {len(rows)}  "
            f"(floor {floor:.1f} ms)",
            flush=True,
        )
spark.stop()
