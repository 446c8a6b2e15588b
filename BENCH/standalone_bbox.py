#!/usr/bin/env python
"""PBSM bbox-overlap join on the standalone grid (north-rule shape).

Synthesizes a deterministic box table (uniform background + a 20%
metro hot spot for cell skew), self-joins it with
``bbox_overlap_join`` (grid-cell equi-join, canonical-cell dedup — no
``distinct``), and prints wall + result rows.  Run at two fleet sizes:

    BBOX_N=8000000 spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/gvt.zip --conf spark.cores.max={8,32} \
        BENCH/standalone_bbox.py

Also asserts the physical plan has no Distinct/Window — the
canonical-cell rule is the whole point of the PBSM shape at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("BBOX_N", "8000000"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("gvt-standalone-bbox")
             .config("spark.executor.cores", "8")
             .config("spark.executor.memory", "20g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    deadline = time.time() + 60
    want = int(spark.conf.get("spark.cores.max", "0") or 0)
    while want and time.time() < deadline and sc.defaultParallelism < want:
        time.sleep(0.5)
    cores = sc.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))

    from geojson_vt_spark.operators.spatial_join import bbox_overlap_join

    # deterministic boxes: xxhash-uniform centers over a 2000x2000
    # domain, 20% of ids concentrated into a 100x100 metro (hot cells),
    # extents 0.5-4.0 so a box covers 1-2 grid cells at cell=4
    h = lambda k, m: (F.abs(F.xxhash64(F.col("id"), F.lit(k))) % m)
    metro = (F.col("id") % 5) == 0
    cx = F.when(metro, 950.0 + h(1, 100000) / 1000.0) \
          .otherwise(h(2, 2000000) / 1000.0)
    cy = F.when(metro, 950.0 + h(3, 100000) / 1000.0) \
          .otherwise(h(4, 2000000) / 1000.0)
    w = 0.25 + h(5, 1875) / 1000.0
    ht = 0.25 + h(6, 1875) / 1000.0
    boxes = (spark.range(N).select(
        F.col("id"),
        (cx - w).alias("xmin"), (cy - ht).alias("ymin"),
        (cx + w).alias("xmax"), (cy + ht).alias("ymax")))

    joined = bbox_overlap_join(boxes, cell=4.0)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Distinct" not in plan and "Window" not in plan, plan[:2000]

    # warmup (python workers + codegen), small slice
    bbox_overlap_join(boxes.limit(50000), cell=4.0).count()

    walls = []
    n_pairs = 0
    for _ in range(2):
        t0 = time.monotonic()
        n_pairs = joined.count()
        walls.append(round(time.monotonic() - t0, 2))
    print(json.dumps({
        "mode": "standalone", "cores": cores, "n_boxes": N,
        "pairs": n_pairs, "walls": walls, "wall": min(walls),
        "pairs_per_sec": round(n_pairs / min(walls), 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
