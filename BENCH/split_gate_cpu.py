#!/usr/bin/env python
"""Run the isolated clip stage in a sustained loop so a concurrent
sampler can measure how many HARDWARE THREADS the leg actually burns.

The standalone 1x8-vs-4x8 comparison grants task SLOTS, not cores: a
mapInArrow task is one python worker process plus JVM-side scan/Arrow
feeder threads, none of which are pinned to the 8-slot grant.  If the
"1x8" leg consumes ~13 hw threads of the shared box, the "4x" rung is
really ~2.5x the resources, and wall-clock efficiency computed as
T8/(4*T32) understates the partition strategy.  Pair with:

    while :; do ps -eo pcpu,comm | awk '/java|python/ {s+=$1} END {print s}'; sleep 1; done

Usage: spark-submit ... --conf spark.cores.max={8,32} \
           BENCH/split_gate_cpu.py <workdir> <zoom> <loops>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    wd, zoom, loops = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = (SparkSession.builder.appName("gvt-split-gate-cpu")
             .config("spark.executor.cores", "8")
             .config("spark.executor.memory", "20g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.scheduler.mode", "FAIR")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
             .config("spark.sql.parquet.compression.codec", "zstd")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
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
    clip = split_children_df(fr_heavy, zoom, opts)

    clip.agg(F.sum(F.expr("size(coords)"))).collect()  # warm
    t0 = time.monotonic()
    print(json.dumps({"phase": "start", "t": time.time()}), flush=True)
    for _ in range(loops):
        clip.agg(F.sum(F.expr("size(coords)"))).collect()
    dt = time.monotonic() - t0
    print(json.dumps({"phase": "done", "t": time.time(), "cores": cores,
                      "loops": loops, "secs": round(dt, 2),
                      "per_loop": round(dt / loops, 2)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
