#!/usr/bin/env python
"""Diagnose the forest wave's hottest LEAF task at 2M pages.

Phase 1 (spark): build/extract the 2M-page z0 frontier once to
/dev/shm/gvt_probe_frontier.parquet (reused across runs), run the
forest gate + cut, print every cut leaf with (m, i, est-work), then
run the leaf wave and print the top-10 per-cell acks (secs, n_cand).

Phase 2 (pure task-side): for the hottest cell, re-execute the wave
kernel body locally with per-phase timers (arrow materialize / ord
sort / z0->cell clip chain / subtree descent / part write) so the
50 s ack decomposes into actionable terms.

    SPARK_GRAFT_CPUS=32 python BENCH/forest_leaf_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRONTIER = "/dev/shm/gvt_probe_frontier.parquet"
PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "2000000"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.parquet.compression.codec", "zstd")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from geojson_vt_spark import TileOptions
    from geojson_vt_spark.engine import SparkTileEngine
    from geojson_vt_spark.pipeline import (features_from_json_df,
                                           forest_gate_df,
                                           forest_route_df)
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=7, index_max_points=1000)
    if not os.path.isdir(FRONTIER):
        t0 = time.monotonic()
        ext = "/dev/shm/gvt_probe_extracted.parquet"
        if not os.path.isdir(ext):
            extract_geo_features_df(
                synth_pages_df(spark, PAGES, seed=42)).write.parquet(ext)
        rows = spark.read.parquet(ext)
        conv = features_from_json_df(rows, opts)
        conv.write.parquet(FRONTIER)
        print(f"features built in {time.monotonic()-t0:.1f}s",
              file=sys.stderr)

    import tempfile
    wd = tempfile.mkdtemp(prefix="gvt_probe_")
    eng = SparkTileEngine(spark, opts, workdir=wd)
    # no-wrap corpus: the z0 frontier is exactly this view (the same
    # shape _read_frontier(0) serves from the features checkpoint)
    fr0 = eng._frontier0_view(spark.read.parquet(FRONTIER))
    budget = SparkTileEngine._KERNEL_PTS_PER_TASK
    imz = opts.index_max_zoom

    t0 = time.monotonic()
    gate = forest_gate_df(fr0, opts, 6).collect()
    print(f"gate: {time.monotonic()-t0:.2f}s, {len(gate)} cells",
          file=sys.stderr)
    cells = {(r["lvl"], r["x"], r["y"]): (r["m"], r["i"]) for r in gate}

    imp = opts.index_max_points
    leaves, internals, stragglers = [], [], []
    stack = [(1, x, y) for y in (0, 1) for x in (0, 1)]
    while stack:
        l, x, y = stack.pop(0)
        m, i = cells.get((l, x, y), (0, 0))
        if m == 0:
            continue
        work = m * (imz - l + 1)
        if (l < 6 and i > imp and work > budget):
            internals.append((l, x, y))
            stack.extend((l + 1, 2 * x + dx, 2 * y + dy)
                         for dy in (0, 1) for dx in (0, 1))
        else:
            (stragglers if work > 2 * budget else leaves).append(
                (l, x, y, m, i, work))

    over = sorted(leaves + stragglers, key=lambda t: -t[5])[:15]
    print("top cut cells by est work (l,x,y,m,i,work):")
    for c in over:
        print("  ", c)

    # leaf wave with per-cell acks
    cut = {(l, x, y): 0 for (l, x, y, *_rest) in leaves + stragglers}
    routed = forest_route_df(fr0, opts, cut)
    from geojson_vt_spark.pipeline import one_wave_stage_df
    import tempfile
    out = tempfile.mkdtemp(prefix="gvt_probe_out_")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                   "false")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(max(64, 2 * len(cut))))
    t0 = time.monotonic()
    acks = one_wave_stage_df(routed.where(F.col("role") == 0), opts,
                             out_dir=out, from_zoom=0).collect()
    wall = time.monotonic() - t0
    acks = sorted(acks, key=lambda r: -r["secs"])
    print(f"leaf wave: {wall:.2f}s, {len(acks)} tasks, "
          f"sum {sum(r['secs'] for r in acks):.1f}s")
    print("top-10 acks (z,x,y,n_cand,secs):")
    est = {(l, x, y): w for (l, x, y, m, i, w) in leaves + stragglers}
    for r in acks[:10]:
        k = (r["z"], r["x"], r["y"])
        print(f"   z{r['z']} ({r['x']},{r['y']}) n_cand={r['n_cand']} "
              f"secs={r['secs']:.2f} est_work={est.get(k)}")
    with open("/tmp/leaf_probe_acks.json", "w") as f:
        json.dump([{k: r[k] for k in ("z", "x", "y", "n", "n_cand",
                                      "secs")} for r in acks], f)
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
