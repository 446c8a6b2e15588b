#!/usr/bin/env python
"""Headline benchmark: corpus→pyramid slicing + spatial joins + dedup/ANN.

Env:
  SPARK_GRAFT_SF_DIR   input tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_QUERIES        comma list to restrict (default: all)
  SPARK_GRAFT_REPEATS  min-over-N runs per query (default 2; the
                       sandbox host's speed swings minute-to-minute)

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "throughput": {...rows|tiles per sec...}}

`--scaling` runs the pyramid job in two fresh subprocesses at
local[N] and local[4N] (sandbox proxy for N vs 4N executors, see
BASELINE.md) and writes BENCH/SCALING_RAW.md with the efficiency
ratio; the curated analysis lives in BENCH/SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    name = os.path.basename(d.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_from_dir(SF_DIR)
# corpus scale tracks sf: sf0.1 → 30k pages (~210k polygon vertices)
N_PAGES = int(os.environ.get("SPARK_GRAFT_PAGES",
                             max(2000, int(300_000 * SF))))
# scaling mode swaps the PIP probe side for a generated point cloud so
# the join is compute-bound rather than driver-overhead-bound
PIP_POINTS = int(os.environ.get("SPARK_GRAFT_PIP_POINTS", "0"))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder
            .master(f"local[{cpus}]")
            .appName("geojson-vt-spark-bench")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.default.parallelism", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            # FAIR lets the build loop's small classification jobs run
            # alongside long subtree-batch tasks instead of queueing
            # behind them (FIFO cost the 480k-page pyramid ~2x)
            .config("spark.scheduler.mode", "FAIR")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
            # zstd for the per-zoom stores: ~16% fewer bytes and a
            # faster decode than snappy (measured on the frontier
            # store) — the build is store-I/O-heavy at scale
            .config("spark.sql.parquet.compression.codec", "zstd")
            .config("spark.driver.memory", "16g")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def bench_pyramid(spark) -> tuple[float, dict]:
    """Full first-pass pyramid over the synthetic web corpus."""
    from geojson_vt_spark import TileOptions
    from geojson_vt_spark.engine import SparkTileEngine
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)
    opts = TileOptions(index_max_zoom=7, index_max_points=1000)
    wd = tempfile.mkdtemp(prefix="gvt_bench_")
    eng = SparkTileEngine(spark, opts, workdir=wd)
    pages = synth_pages_df(spark, N_PAGES, seed=42)
    # materialize the extracted GeoJSON rows OUTSIDE the timed region —
    # the reference's wall time starts from parsed GeoJSON in memory,
    # so the timed span here is convert + wrap + pyramid + tile count.
    # A tiny throwaway build first brings the session to steady state
    # (JIT + python workers), matching how the reference measurement
    # excludes node/V8 startup; cold-session first-build overhead was
    # measured at +4-7 s of pure warmup, swamping the job itself.
    warm_wd = tempfile.mkdtemp(prefix="gvt_warm_")
    warm = SparkTileEngine(spark, opts, workdir=warm_wd)
    wpages = synth_pages_df(spark, 2000, seed=7)
    warm.build_from_converted(
        features_from_json_df(extract_geo_features_df(wpages), opts))
    shutil.rmtree(warm_wd, ignore_errors=True)
    ext_path = os.path.join(wd, "_extracted")
    extract_geo_features_df(pages).write.mode("overwrite").parquet(ext_path)
    rows = spark.read.parquet(ext_path)
    # min over repeats (fresh workdir each): the sandbox VM's
    # boot-to-boot and minute-to-minute speed swings are far larger
    # than the build's own variance, and min-of-N is the standard way
    # to report a compute benchmark under noisy neighbours.  The
    # reference-side comparison numbers are min-of-5 the same way.
    # The pyramid (the headline row) defaults to min-of-3 — one more
    # than the suite-wide default: the drift band measured on this
    # sandbox (4-19 s for the same binary within an hour, BASELINE.md)
    # swamps a 2-sample min too often.
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    dt, n_tiles = None, 0
    for i in range(max(repeats, 1)):
        wd_i = None if i == 0 else tempfile.mkdtemp(prefix="gvt_bench_")
        eng_i = eng if i == 0 else SparkTileEngine(spark, opts,
                                                   workdir=wd_i)
        t0 = time.monotonic()
        feats = features_from_json_df(rows, opts)
        eng_i.build_from_converted(feats, approx_rows=N_PAGES)
        # exact count from store metadata (tile_count) — the
        # reference's timed span ends with tileCoords.length, an
        # in-memory array length, not a re-scan of every tile
        n_tiles = eng_i.tile_count()
        dt_i = time.monotonic() - t0
        dt = dt_i if dt is None else min(dt, dt_i)
        if wd_i is not None:
            shutil.rmtree(wd_i, ignore_errors=True)
    shutil.rmtree(wd, ignore_errors=True)  # repeat 0's workdir + _extracted
    return dt, {"tiles": n_tiles, "tiles_per_sec": n_tiles / dt,
                "pages": N_PAGES}


def bench_pip(spark) -> tuple[float, dict]:
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    if PIP_POINTS:
        from geojson_vt_spark.functions import project_x_col, project_y_col
        from geojson_vt_spark.operators import point_in_polygon_join
        pts = spark.range(PIP_POINTS).select(
            F.col("id").alias("point_id"),
            ((F.col("id") * 7919 % 36000) / 100.0 - 180.0
             + (F.col("id") % 97) / 9700.0).alias("lon"),
            ((F.col("id") * 104729 % 14000) / 100.0 - 70.0
             + (F.col("id") % 89) / 8900.0).alias("lat"))
        rects = em._nation_rects(spark, SF_DIR)
        polys = rects.select(
            "poly_id",
            F.array(project_x_col(F.col("lon0")), project_x_col(F.col("lon1")),
                    project_x_col(F.col("lon1")), project_x_col(F.col("lon0")),
                    project_x_col(F.col("lon0"))).alias("pxs"),
            F.array(project_y_col(F.col("lat0")), project_y_col(F.col("lat0")),
                    project_y_col(F.col("lat1")), project_y_col(F.col("lat1")),
                    project_y_col(F.col("lat0"))).alias("pys"))
        t0 = time.monotonic()
        n = point_in_polygon_join(pts, polys, res=6, salt_n=8).count()
        dt = time.monotonic() - t0
        return dt, {"pairs": n, "probe_rows_per_sec": PIP_POINTS / dt}
    t0 = time.monotonic()
    n = em.q_pip_join(spark, SF_DIR).count()
    dt = time.monotonic() - t0
    n_pts = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    return dt, {"pairs": n, "probe_rows_per_sec": n_pts / dt}


def bench_knn(spark) -> tuple[float, dict]:
    import __spark_entry__ as em
    t0 = time.monotonic()
    n = em.q_knn_join(spark, SF_DIR).count()
    dt = time.monotonic() - t0
    return dt, {"result_rows": n}


def bench_raster(spark) -> tuple[float, dict]:
    import __spark_entry__ as em
    t0 = time.monotonic()
    n = em.q_raster_overlay(spark, SF_DIR).count()
    return time.monotonic() - t0, {"pairs": n}


def bench_minhash(spark) -> tuple[float, dict]:
    from geojson_vt_spark.operators import minhash_lsh_pairs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    t0 = time.monotonic()
    n = minhash_lsh_pairs(docs, threshold=0.3).count()
    dt = time.monotonic() - t0
    return dt, {"pairs": n, "docs_per_sec": n_docs / dt}


def bench_dedup_exact(spark) -> tuple[float, dict]:
    from geojson_vt_spark.operators import exact_dedup
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    t0 = time.monotonic()
    exact_dedup(docs).count()
    dt = time.monotonic() - t0
    return dt, {"docs_per_sec": n_docs / dt}


def bench_ann(spark) -> tuple[float, dict]:
    from geojson_vt_spark.operators import cosine_topk
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(0, 50))
    t0 = time.monotonic()
    n = cosine_topk(emb, qids, k=10).count()
    dt = time.monotonic() - t0
    return dt, {"result_rows": n}


def bench_text(spark) -> tuple[float, dict]:
    import __spark_entry__ as em
    t0 = time.monotonic()
    em.q_text_quality(spark, SF_DIR).count()
    em.q_lang_id(spark, SF_DIR).count()
    em.q_fingerprint(spark, SF_DIR).count()
    return time.monotonic() - t0, {}


def bench_webtext(spark) -> tuple[float, dict]:
    """Web-corpus curation stages over documents: URL dedup, Gopher
    repetition rules, benchmark decontamination, PII scrub, TF-IDF,
    substring dedup, mixture sampling, sequence packing, quality
    scoring."""
    import __spark_entry__ as em
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    passes = [em.q_url_dedup, em.q_gopher_quality, em.q_decontaminate,
              em.q_pii_redact, em.q_tfidf_topterms, em.q_substring_dedup,
              em.q_mixture_sample, em.q_pack_sequences,
              em.q_quality_classifier]
    t0 = time.monotonic()
    for q in passes:
        q(spark, SF_DIR).count()
    dt = time.monotonic() - t0
    return dt, {"docs": n_docs,
                "doc_passes_per_sec": len(passes) * n_docs / dt}


def bench_ingest(spark) -> tuple[float, dict]:
    """Ingest/audit additions: snapshot-incremental dedup, NB
    classification of the held-out split, corpus profiling, perceptual
    ahash dedup + hamming near-dup pairs."""
    from pyspark.sql import functions as F
    import __spark_entry__ as em
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    agg = F.count(F.lit(1))
    t0 = time.monotonic()
    em.q_incremental_dedup(spark, SF_DIR).agg(agg, F.sum("keep")).collect()
    em.q_nb_classify(spark, SF_DIR).agg(agg, F.sum("correct")).collect()
    em.q_corpus_profile(spark, SF_DIR).agg(agg, F.sum("n_docs")).collect()
    em.q_image_ahash(spark, SF_DIR).agg(agg, F.sum("is_dup")).collect()
    em.q_ahash_near_dup(spark, SF_DIR).agg(agg, F.sum("hamming")).collect()
    dt = time.monotonic() - t0
    return dt, {"docs": n_docs, "doc_passes_per_sec": 5 * n_docs / dt}


def bench_temporal_graph(spark) -> tuple[float, dict]:
    """Round-4 additions: as-of join + overlapping-interval range join
    over events, and the real <a href> extraction → host link graph
    over the html bytes of the page bridge."""
    from pyspark.sql import functions as F
    import __spark_entry__ as em
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_ev = ev.count()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    agg = F.count(F.lit(1))
    t0 = time.monotonic()
    em.q_asof_join(spark, SF_DIR).agg(agg, F.sum("asof_value_cents")) \
        .collect()
    em.q_range_join(spark, SF_DIR).agg(agg, F.sum("v_cents")).collect()
    em.q_extract_links(spark, SF_DIR).agg(agg, F.sum("link_ord")).collect()
    em.q_link_graph(spark, SF_DIR).agg(agg, F.sum("n_links")).collect()
    dt = time.monotonic() - t0
    return dt, {"events": n_ev, "docs": n_docs,
                "rows_per_sec": (2 * n_ev + 2 * n_docs) / dt}


def bench_serve(spark) -> tuple[float, dict]:
    """Batch tile serving: build a small pyramid (outside the timed
    span), then serve EVERY built tile through warmed get_tiles batches
    — the getTile(z,x,y) surface at bulk-request shape."""
    from geojson_vt_spark import TileOptions
    from geojson_vt_spark.engine import SparkTileEngine
    opts = TileOptions(index_max_zoom=6, index_max_points=500)
    wd = tempfile.mkdtemp(prefix="gvt_serve_")
    eng = SparkTileEngine(spark, opts, workdir=wd)
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)
    pages = synth_pages_df(spark, min(N_PAGES, 10000), seed=42)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)
    eng.build_from_converted(feats)
    eng.warm()
    coords = eng.tile_coords()
    t0 = time.monotonic()
    served = 0
    for i in range(0, len(coords), 256):
        batch = eng.get_tiles(coords[i:i + 256])
        served += sum(1 for v in batch.values() if v is not None)
    dt = time.monotonic() - t0
    return dt, {"tiles_served": served,
                "tiles_per_sec": served / dt if dt else 0.0}


def bench_search_events(spark) -> tuple[float, dict]:
    """Retrieval + event analytics: BM25 top-k for the four driver
    queries, gap sessionization, and per-session roll-up."""
    from pyspark.sql import functions as F
    import __spark_entry__ as em
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_ev = ev.count()
    agg = F.count(F.lit(1))
    t0 = time.monotonic()
    em.q_bm25_topk(spark, SF_DIR).agg(agg, F.sum("score")).collect()
    # sum a window-derived column: a bare count() would let the
    # optimizer prune the window entirely
    em.q_sessionize(spark, SF_DIR).agg(agg, F.sum("session_seq")).collect()
    em.q_session_stats(spark, SF_DIR).agg(agg, F.sum("n_events")).collect()
    dt = time.monotonic() - t0
    return dt, {"events": n_ev, "rows_per_sec": 3 * n_ev / dt}


BENCHES = {
    "pyramid": bench_pyramid,
    "pip_join": bench_pip,
    "knn_join": bench_knn,
    "raster_overlay": bench_raster,
    "minhash_dedup": bench_minhash,
    "dedup_exact": bench_dedup_exact,
    "ann_cosine_topk": bench_ann,
    "text_suite": bench_text,
    "webtext_suite": bench_webtext,
    "search_events_suite": bench_search_events,
    "ingest_suite": bench_ingest,
    "temporal_graph_suite": bench_temporal_graph,
    "tile_serve": bench_serve,
}


def run(cpus: int, only: list[str] | None = None) -> dict:
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = {}
    throughput = {}
    # tile_serve is opt-in (BENCH_QUERIES=tile_serve): it measures the
    # read surface, and adding it to the default set would make the
    # headline total incomparable across rounds
    names = only or [n for n in BENCHES if n != "tile_serve"]
    # min over repeats for every query (the sandbox host's speed swings
    # minute-to-minute; min-of-N is the standard report under noisy
    # neighbours).  The pyramid manages its own fresh-workdir repeats.
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    for name in names:
        dt, extra = BENCHES[name](spark)
        for _ in range(max(repeats, 1) - 1):
            if name == "pyramid":
                break          # repeats internally
            spark.catalog.clearCache()
            dt2, extra2 = BENCHES[name](spark)
            if dt2 < dt:
                dt, extra = dt2, extra2
        queries[name] = round(dt, 3)
        for k, v in extra.items():
            throughput[f"{name}.{k}"] = round(v, 2) if isinstance(v, float) else v
    spark.stop()
    return {
        "metric": "pyramid tiles/sec + spatial-join and dedup throughput "
                  f"over synthetic web corpus + sf tables (local[{cpus}])",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF,
        "throughput": throughput,
        "cpus": cpus,
        "pages": N_PAGES,
    }


def run_scaling() -> None:
    """North-rule scaling evidence: same job at local[N] and local[4N]."""
    n = max(2, CPUS // 4)
    results = {}
    for cpus in (n, CPUS):
        # compute-bound sizes: at 100 TB the work:overhead ratio is what
        # the partition strategy faces, so the proxy job must be big
        # enough that parallel work dominates fixed per-job latency
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_PAGES=os.environ.get("SPARK_GRAFT_PAGES", "120000"),
                   SPARK_GRAFT_PIP_POINTS=os.environ.get(
                       "SPARK_GRAFT_PIP_POINTS", "3000000"),
                   BENCH_QUERIES="pyramid,pip_join")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = results[n], results[CPUS]
    lines = [
        "# SCALING — local[N] vs local[4N] (proxy for N vs 4N executors)",
        "",
        f"Same job + input ({SF_DIR}, {hi['pages']} corpus pages, "
        f"{os.environ.get('SPARK_GRAFT_PIP_POINTS', '3000000')} PIP probe "
        "points), fresh JVM per level.",
        "",
        "| queries | local[{}] sec | local[{}] sec | speedup | efficiency |".format(n, CPUS),
        "|---|---|---|---|---|",
    ]
    total_eff = []
    for q in lo["queries"]:
        t_lo, t_hi = lo["queries"][q], hi["queries"][q]
        speed = t_lo / t_hi if t_hi else float("inf")
        eff = speed / (CPUS / n)
        total_eff.append((q, t_lo, t_hi, speed, eff))
        lines.append(f"| {q} | {t_lo} | {t_hi} | {speed:.2f}x | {eff:.2f} |")
    speed = lo["value"] / hi["value"]
    eff = speed / (CPUS / n)
    lines.append(f"| **total** | {lo['value']} | {hi['value']} | "
                 f"**{speed:.2f}x** | **{eff:.2f}** |")
    lines.append("")
    lines.append(f"Throughput at local[{CPUS}]: "
                 f"{hi['throughput'].get('pyramid.tiles_per_sec')} tiles/sec, "
                 f"{hi['throughput'].get('pip_join.probe_rows_per_sec')} PIP probe rows/sec.")
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SCALING_RAW.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"scaling_efficiency_total": round(eff, 3),
                      "results": {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        only = None
        if os.environ.get("BENCH_QUERIES"):
            only = [q.strip() for q in os.environ["BENCH_QUERIES"].split(",")]
        print(json.dumps(run(CPUS, only)))
