"""Round-14 WebP-lane measurements for SCALE.md.

Two numbers the 100 TB plan needs:
1. Per-image pure-decode cost driver-side (the Python-worker unit
   price: VP8L prefix decoding is symbol-sequential, so the per-byte
   cost is higher than PNG's vectorized inflate lane — quantify it).
2. The distributed lane A/B: q_webp_features vs q_png_features wall
   on the same 64-image corpus spec (identical pixel oracle), same
   session — the relative cost of the codec inside the attested
   mapInPandas shape.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from sas_etl_spark.operators import webp
from sas_etl_spark.operators.multimodal import decode_png, png_bytes


def med(f, n=5):
    xs = []
    for _ in range(n):
        t = time.perf_counter()
        f()
        xs.append(time.perf_counter() - t)
    xs.sort()
    return xs[n // 2]


def main():
    # 1) unit decode price per feature mix, 24x14 (largest fixture size)
    print("== per-image decode cost (24x14, median of 5) ==")
    for mix in range(6):
        x = np.arange(24)[None, :, None]
        y = np.arange(14)[:, None, None]
        c = np.arange(3)[None, None, :]
        arr = ((mix * 7 + c * 13 + x + y) % 256).astype(np.uint8)
        enc = webp.vp8l_encode(arr, **webp.webp_fixture_encode_opts(mix))
        png = png_bytes(24, 14, mix)
        t_webp = med(lambda: webp.decode_webp(enc))
        t_png = med(lambda: decode_png(png))
        print(
            f"mix {mix}: webp {len(enc)}B {t_webp*1e3:.2f} ms | "
            f"png {len(png)}B {t_png*1e3:.2f} ms | ratio {t_webp/t_png:.1f}x"
        )

    # 2) distributed lane A/B on the attested query shapes
    from sas_etl_spark.registry import QUERIES, queries_map
    from sas_etl_spark.session import get_spark

    queries_map()
    spark = get_spark("measure-webp", cpus=8, shuffle_partitions=8)
    sf = "/root/testdata/sf0.01"
    for name in ("q_png_features", "q_webp_features"):
        fn = QUERIES[name].fn
        fn(spark, sf).collect()  # warm (fixture write + JVM)
        walls = []
        for _ in range(3):
            t = time.perf_counter()
            fn(spark, sf).collect()
            walls.append(time.perf_counter() - t)
        walls.sort()
        print(f"{name}: lane wall median {walls[1]:.3f} s of {walls}")
    spark.stop()


if __name__ == "__main__":
    main()
