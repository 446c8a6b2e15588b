"""Hilbert-clustered layout pruning evidence.

Writes the same synthetic point table twice — once range-partitioned
on the S2-style Hilbert key (`cluster_by_hilbert`), once unclustered —
then times the same small-region query against both: the Hilbert
layout's BETWEEN ranges reach the parquet scan and row-group min/max
stats skip everything outside the region, so the pruned scan reads a
small fraction of the bytes.  Prints one JSON line.

Run: python BENCH/hilbert_prune.py [n_points]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from geojson_vt_spark.functions import project_x_col, project_y_col
from geojson_vt_spark.functions.hilbert import (cluster_by_hilbert,
                                                filter_bbox_by_hilbert,
                                                with_hilbert_cell)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
ORDER = 12
BBOX = (0.30, 0.40, 0.34, 0.44)  # ~0.16% of projected space


def main() -> None:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .appName("hilbert-prune").getOrCreate())
    # payload column: the realistic shape (pages/features carry text) —
    # pruning pays in proportion to the bytes it skips
    pts = spark.range(0, N).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 17000) / 100.0 - 85.0).alias("lat"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    base = tempfile.mkdtemp(prefix="gvt_hprune_")
    clustered, flat = f"{base}/clustered", f"{base}/flat"
    (cluster_by_hilbert(pts, F.col("lon"), F.col("lat"), order=ORDER,
                        num_partitions=32).write.parquet(clustered))
    (with_hilbert_cell(pts, F.col("lon"), F.col("lat"), ORDER)
     .repartition(32).write.parquet(flat))

    def exact(df):
        return df.where(
            project_x_col(F.col("lon")).between(BBOX[0], BBOX[2])
            & project_y_col(F.col("lat")).between(BBOX[1], BBOX[3]))

    def measure(df):
        # aggregate over the payload so the scan must materialize it —
        # a bare count() would column-prune the payload away
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.length("payload")).alias("b")).collect()[0]
        return int(r["n"])

    def timed(path):
        df = spark.read.parquet(path)
        t0 = time.monotonic()
        n = measure(exact(filter_bbox_by_hilbert(df, *BBOX, order=ORDER,
                                                 max_cells=256)))
        return time.monotonic() - t0, n

    # warm both file listings
    spark.read.parquet(clustered).count()
    spark.read.parquet(flat).count()
    runs = {"clustered": [], "flat": []}
    for _ in range(3):
        for name, path in (("clustered", clustered), ("flat", flat)):
            dt, n = timed(path)
            runs[name].append(dt)
    t_full0 = time.monotonic()
    n_exact = measure(exact(spark.read.parquet(flat)))
    t_full = time.monotonic() - t_full0
    out = {
        "n_points": N, "order": ORDER, "bbox": BBOX,
        "rows_selected": n_exact,
        "clustered_range_scan_s": round(min(runs["clustered"]), 3),
        "flat_range_scan_s": round(min(runs["flat"]), 3),
        "full_scan_filter_s": round(t_full, 3),
        "speedup_vs_flat": round(min(runs["flat"])
                                 / min(runs["clustered"]), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
