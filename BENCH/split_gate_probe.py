#!/usr/bin/env python
"""Isolate ONE deferred-split gate from the build's concurrency.

The 2M-page grid profile shows the per-zoom split gates as the
pyramid's critical path (sum ≈ 72% of the 4×8 wall) scaling only
~1.9× for 4× cores.  Inside a build, each gate shares the fleet with
the render/subtree/finalize jobs under FAIR — this probe times the
SAME gate (read frontier z → heavy filter → split_children_df →
repartition → parquet write) with nothing else running, at whatever
spark.cores.max the submit grants, so the plan's own scaling
separates from the contention term.

Usage: build once with GVT_PROF_KEEP=1 BENCH/pyramid_profile.py, then

    /opt/spark/bin/spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/gvt.zip --conf spark.cores.max={8,32} \
        BENCH/split_gate_probe.py <workdir> <zoom>

Prints one JSON line {"cores": C, "zoom": z, "n_heavy": H,
"heavy_points": P, "secs": [gate walls, 2 repeats]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    wd, zoom = sys.argv[1], int(sys.argv[2])
    builder = (SparkSession.builder.appName("gvt-split-gate-probe")
               .config("spark.executor.cores", "8")
               .config("spark.executor.memory", "20g")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.adaptive.coalescePartitions.enabled",
                       "true")
               .config("spark.scheduler.mode", "FAIR")
               .config("spark.sql.execution.arrow.pyspark.enabled", "true")
               .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                       "20000")
               .config("spark.sql.parquet.compression.codec", "zstd")
               .config("spark.ui.enabled", "false"))
    spark = builder.getOrCreate()
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    deadline = time.time() + 60
    want = int(spark.conf.get("spark.cores.max", "32"))
    while sc.defaultParallelism < want and time.time() < deadline:
        time.sleep(0.5)
    cores = sc.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))

    from geojson_vt_spark import TileOptions
    from geojson_vt_spark.engine import SparkTileEngine, _pack_xy
    from geojson_vt_spark.pipeline import split_children_df

    opts = TileOptions(index_max_zoom=7, index_max_points=1000)
    eng = SparkTileEngine(spark, opts, workdir=wd)
    lineage = eng._read_lineage()
    heavy = next(r["heavy"] for r in lineage
                 if r.get("zoom") == zoom and "heavy" in r)
    frontier = eng._read_frontier(zoom)
    packed = [_pack_xy(int(x), int(y)) for x, y in heavy]
    pack_col = (F.shiftleft(F.col("x").cast("long"), 25)
                + F.col("y").cast("long"))
    fr_heavy = frontier.where(
        F.col("x").isin([int(x) for x, _ in heavy]) &
        F.col("y").isin([int(y) for _, y in heavy]) &
        pack_col.isin(packed))
    n_verts = (F.expr("size(coords)") / F.lit(3)).cast("long")
    hp = sum(r.get("heavy_points", 0) for r in lineage
             if r.get("split_for") == zoom + 1)
    n_parts = max(cores, min(4096, hp // eng.target_points_per_partition + 1))

    secs = []
    for rep in range(2):
        out = tempfile.mkdtemp(prefix="gvt_gate_", dir=os.path.dirname(wd))
        t0 = time.monotonic()
        (split_children_df(fr_heavy, zoom, opts)
         .select("*", n_verts.alias("n_verts"))
         .repartition(n_parts)
         .write.mode("overwrite").parquet(os.path.join(out, "frontier")))
        secs.append(round(time.monotonic() - t0, 2))
        shutil.rmtree(out, ignore_errors=True)

    print(json.dumps({"cores": cores, "zoom": zoom,
                      "n_heavy": len(heavy), "heavy_points": hp,
                      "n_parts": n_parts, "secs": secs}))
    spark.stop()


if __name__ == "__main__":
    main()
