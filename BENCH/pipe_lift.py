"""Pipe-ceiling lift experiment: is the pandas-UDF throughput cap
per-JVM (lifts with more executor JVMs) or per-machine?

Worker mode: run a fixed mapInPandas workload over a row range inside
one Spark session.  The harness launches 1 process x local[32] over the
full range, then K processes x local[32/K] over 1/K ranges CONCURRENTLY
— same machine, same total core count, same total rows.  If the
K-process wall is much lower, the ceiling is the single JVM's
Python-worker pipe, i.e. a real multi-executor cluster restores
scaling (each executor JVM has its own pipe).
"""
import json
import os
import subprocess
import sys
import time


def worker(cpus: int, lo: int, hi: int, mode: str) -> None:
    os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "6g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(lo, hi, 1, cpus * 2)

    if mode == "pyramid":
        # full pyramid build over this worker's own corpus shard —
        # 4 workers do 4x the total work of the single-JVM run
        import tempfile
        sys.path.insert(0, "/root/repo")
        from geojson_vt_spark import TileOptions
        from geojson_vt_spark.engine import SparkTileEngine
        from geojson_vt_spark.pipeline import features_from_json_df
        from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                     synth_pages_df)
        opts = TileOptions(index_max_zoom=7, index_max_points=1000)
        wd = tempfile.mkdtemp(prefix=f"gvt_lift_{lo}_")
        pages = synth_pages_df(spark, hi - lo, seed=42 + lo)
        extract_geo_features_df(pages).write.mode("overwrite") \
            .parquet(wd + "/_ext")
        rows = spark.read.parquet(wd + "/_ext")
        t0 = time.monotonic()
        eng = SparkTileEngine(spark, opts, workdir=wd)
        eng.build_from_converted(features_from_json_df(rows, opts))
        n = eng.tiles().count()
        dt = time.monotonic() - t0
        print(json.dumps({"rows": n, "sec": dt}))
        spark.stop()
        return

    if mode == "identity":
        def ident(batches):
            for pdf in batches:
                yield pdf
        out = df.mapInPandas(ident, "id long")
    else:  # 'convert': the pyramid's ingest-shaped workload
        import numpy as np
        import pandas as pd

        def work(batches):
            for pdf in batches:
                v = pdf["id"].to_numpy(dtype=np.float64)
                for _ in range(8):
                    v = np.sqrt(v * 1.0001 + 1.0)
                yield pd.DataFrame({"id": v.astype(np.int64)})
        out = df.mapInPandas(work, "id long")

    # warm python workers, then measure
    out.limit(1).count()
    t0 = time.monotonic()
    n = out.count()
    dt = time.monotonic() - t0
    print(json.dumps({"rows": n, "sec": dt}))
    spark.stop()


def harness(total_rows: int, mode: str) -> None:
    def run_procs(k: int, cpus: int):
        procs = []
        step = total_rows // k
        t0 = time.monotonic()
        for i in range(k):
            procs.append(subprocess.Popen(
                [sys.executable, __file__, "worker", str(cpus),
                 str(i * step), str((i + 1) * step), mode],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True))
        outs = [p.communicate()[0] for p in procs]
        wall = time.monotonic() - t0
        per = [json.loads(o.strip().splitlines()[-1]) for o in outs]
        return wall, per

    results = {}
    for k, cpus in ((1, 32), (4, 8)):
        wall, per = run_procs(k, cpus)
        rate = total_rows / max(p["sec"] for p in per)
        results[f"{k}x local[{cpus}]"] = {
            "wall_incl_startup_sec": round(wall, 2),
            "max_worker_measured_sec": round(max(p["sec"] for p in per), 2),
            "rows_per_sec_total": round(rate),
        }
        print(json.dumps({f"{k}x local[{cpus}]": results[f"{k}x local[{cpus}]"]}))
    a = results["1x local[32]"]["rows_per_sec_total"]
    b = results["4x local[8]"]["rows_per_sec_total"]
    print(json.dumps({"mode": mode, "total_rows": total_rows,
                      "single_jvm_rows_per_sec": a,
                      "four_jvm_rows_per_sec": b,
                      "lift": round(b / a, 2)}))


if __name__ == "__main__":
    if sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               sys.argv[5])
    else:
        harness(int(sys.argv[1]), sys.argv[2] if len(sys.argv) > 2
                else "identity")
