#!/usr/bin/env python
"""Stage-wise decomposition of one isolated split gate (see
split_gate_probe.py): scan-only, scan+clip (no egress write), and the
full scan+clip+repartition+write, each timed twice warm.

    spark-submit ... --conf spark.cores.max={8,32} \
        BENCH/split_gate_decomp.py <workdir> <zoom>
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
    spark = (SparkSession.builder.appName("gvt-split-gate-decomp")
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
    n_verts = (F.expr("size(coords)") / F.lit(3)).cast("long")

    def t(fn):
        out = []
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            out.append(round(time.monotonic() - t0, 2))
        return out

    res = {"cores": cores, "zoom": zoom, "n_heavy": len(heavy)}
    res["scan_count"] = t(lambda: fr_heavy.count())
    # force full column materialization without python: sum coords len
    res["scan_decode"] = t(lambda: fr_heavy.agg(
        F.sum(F.expr("size(coords)"))).collect())
    clip = split_children_df(fr_heavy, zoom, opts).select(
        "*", n_verts.alias("n_verts"))
    res["scan_clip_count"] = t(lambda: clip.count())
    res["scan_clip_agg"] = t(lambda: clip.agg(
        F.sum(F.expr("size(coords)"))).collect())

    def full():
        out = tempfile.mkdtemp(prefix="gvt_gate_",
                               dir=os.path.dirname(wd))
        (clip.repartition(cores).write.mode("overwrite")
         .parquet(os.path.join(out, "f")))
        shutil.rmtree(out, ignore_errors=True)

    def nowrite_shuffle():
        clip.repartition(cores).agg(
            F.sum(F.expr("size(coords)"))).collect()

    res["scan_clip_shuffle"] = t(nowrite_shuffle)
    res["full_gate"] = t(full)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
