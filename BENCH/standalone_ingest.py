#!/usr/bin/env python
"""Standalone-mode scaling probe for the ingest-shaped late-round
operators: snapshot-incremental dedup, corpus profiling, and the
perceptual-ahash image dedup — the north-rule two-cluster-size
comparison on the real deployment shape (1 executor JVM × 8 cores vs
4 executor JVMs × 8 cores, each JVM with its own Python/Arrow pipe).

Launch (master + 4 workers already running, see BENCH/SCALING.md):

    cd /root/repo && zip -qr /tmp/gvt.zip geojson_vt_spark
    spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/gvt.zip \
        --conf spark.cores.max=8   BENCH/standalone_ingest.py   # N
    spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/gvt.zip \
        --conf spark.cores.max=32  BENCH/standalone_ingest.py   # 4N

Env: INGEST_REPLICAS (default 240 -> 1.2M docs over sf0.1; the ahash
op uses REPLICAS/4 -> 300k assets, its Arrow decode pass is ~8x the
per-row cost of the Column ops); INGEST_OPS (comma list, default all:
incremental_dedup,corpus_profile,ahash_dedup); INGEST_PASSES
(default 3). Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(os.environ.get("INGEST_REPLICAS", "240"))
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("gvt-standalone-ingest")
             .config("spark.executor.cores", "8")
             .config("spark.executor.memory", "20g")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    deadline = time.time() + 60
    want = int(spark.conf.get("spark.cores.max", "32"))
    sc = spark.sparkContext
    while time.time() < deadline:
        if sc.defaultParallelism >= want:
            break
        time.sleep(0.5)
    cores = sc.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))

    ops_wanted = os.environ.get(
        "INGEST_OPS",
        "incremental_dedup,corpus_profile,ahash_dedup").split(",")
    # profile-only runs don't need document bodies — keep the staged
    # set slim so the probe measures the aggregate, not text scanning
    slim = ops_wanted == ["corpus_profile"]
    cols = ["rep", "lang", "source", "n_chars"] if slim \
        else ["rep", "text", "lang", "source", "n_chars"]
    # stage the replicated input to parquet ONCE so every timed pass
    # (after a clearCache) reads the same durable layout at both
    # parallelism levels — operators that persist internally
    # (ahash_dedup) must not carry warm caches between passes
    stage = f"/tmp/gvt_ingest_stage_r{REPLICAS}_{'slim' if slim else 'full'}"
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
        (base_docs.crossJoin(reps)
         .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                 .alias("doc_id"), *cols)
         .repartition(32).write.mode("overwrite").parquet(stage))
    docs = spark.read.parquet(stage)
    n = docs.count()

    from geojson_vt_spark.operators.multimodal import (ahash_dedup_df,
                                                       assets_from_documents)
    from geojson_vt_spark.operators.webtext import (corpus_profile_df,
                                                    incremental_dedup_df)

    sink = lambda df, c: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum(c).alias("s")).collect()
    from geojson_vt_spark.operators.webtext import (chunk_documents_df,
                                                    nb_classify_df,
                                                    topk_ngrams_df)

    from geojson_vt_spark.functions.hilbert import with_hilbert_cell
    from geojson_vt_spark.operators.webtext import latest_capture_df

    # latest-capture input: messy synthetic urls + revisit timestamps
    # (same construction as the driver query, sized by the replica set)
    def _captures():
        return docs.select(
            "doc_id",
            F.concat(F.lit("https://WWW."), F.col("source"),
                     F.lit(".Example.COM/A-"),
                     (F.col("doc_id") % 50_000).cast("string"),
                     F.lit("?utm_campaign=x&id="),
                     (F.col("doc_id") % 11).cast("string")).alias("url"),
            (F.lit(1_700_000_000) + F.col("doc_id") * 37 % 100_000)
            .cast("long").alias("warc_ts"))

    # hilbert input: deterministic point cloud keyed off doc_id
    def _points():
        return docs.select(
            ((F.col("doc_id") * 7919 % 36000) / 100.0 - 180.0)
            .alias("lon"),
            ((F.col("doc_id") * 104729 % 17000) / 100.0 - 85.0)
            .alias("lat"))

    from geojson_vt_spark.operators.temporal import (asof_join_df,
                                                      range_join_df)

    # temporal-join inputs are slim (id, key, ts/value) — synthesized
    # from spark.range at TEMPORAL_ROWS scale and STAGED to parquet
    # once (same protocol as the document corpus above), so the timed
    # op measures the join over a durable layout, not input synthesis
    t_rows = int(os.environ.get("TEMPORAL_ROWS", "48000000"))
    t_stage = f"/tmp/gvt_temporal_stage_{t_rows}"
    if any(o in ops_wanted for o in ("asof_join", "range_join")) and \
            not os.path.exists(os.path.join(t_stage, "_SUCCESS")):
        (spark.range(t_rows).repartition(128).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % (t_rows // 10)).alias("user_id"),
            F.expr("cast(timestamp_micros(1700000000000000"
                   " + id * 1337 % 86400000000) as timestamp_ntz)")
            .alias("ts"),
            (F.col("id") % 1_000_000).alias("v_cents"))
         .write.mode("overwrite").parquet(t_stage))

    # as-of inputs: every staged row is a probe event; every 10th row
    # is a build event; ~10 rows per user so the window has real volume
    def _asof_base():
        return spark.read.parquet(t_stage).select(
            "doc_id", "user_id", "ts")

    def _asof_build():
        return (_asof_base().where(F.col("doc_id") % 10 == 0)
                .withColumn("value_cents",
                            (F.col("doc_id") % 100_000).cast("long")))

    # range inputs: values vs 200 overlapping bands (width 10k,
    # step 5k -> each point matches ~2 bands), broadcast range side
    def _range_points():
        return spark.read.parquet(t_stage).select("doc_id", "v_cents")

    def _ranges():
        return spark.range(0, 200).select(
            F.col("id").alias("range_id"),
            (F.col("id") * 5_000).alias("lo_cents"),
            (F.col("id") * 5_000 + 10_000).alias("hi_cents"))

    # incremental ingest: the newest 20% of replicas arrive as the batch
    cut = int(REPLICAS * 0.8)
    table = {
        "asof_join": lambda: sink(asof_join_df(
            _asof_base(), _asof_build(), on="user_id", ts_col="ts",
            probe_cols=("doc_id",), build_values=("value_cents",)),
            "asof_value_cents"),
        "range_join": lambda: sink(range_join_df(
            _range_points(), _ranges(), "v_cents", "lo_cents",
            "hi_cents", bucket_width=5_000), "range_id"),
        "latest_capture": lambda: sink(latest_capture_df(
            _captures(), keys_only=False), "n_captures"),
        "latest_capture_slim": lambda: sink(latest_capture_df(
            _captures(), keys_only=True), "n_captures"),
        "hilbert_cell": lambda: sink(with_hilbert_cell(
            _points(), F.col("lon"), F.col("lat"), 12), "hilbert_d"),
        "chunk_documents": lambda: sink(chunk_documents_df(
            docs, chunk_tokens=64, overlap=16), "n_tokens"),
        "topk_ngrams": lambda: sink(topk_ngrams_df(docs, n=2, k=50),
                                    "n_occurrences"),
        "nb_classify": lambda: sink(nb_classify_df(
            docs.where(F.col("rep") >= cut),
            docs.where(F.col("rep") < cut)), "nb_logprob"),
        "incremental_dedup": lambda: sink(incremental_dedup_df(
            docs.where(F.col("rep") >= cut),
            docs.where(F.col("rep") < cut)), "keep"),
        "corpus_profile": lambda: sink(
            corpus_profile_df(docs), "n_docs"),
        "ahash_dedup": lambda: sink(ahash_dedup_df(assets_from_documents(
            docs.where(F.col("rep") < (
                REPLICAS if ops_wanted == ["ahash_dedup"]
                else max(REPLICAS // 4, 1))))), "is_dup"),
    }
    ops = [o for o in ops_wanted if o in table]
    passes = int(os.environ.get("INGEST_PASSES", "3"))
    per_op = {}
    for name in ops:
        fn = table[name]
        fn()                               # warm-up
        times = []
        for _ in range(passes):
            spark.catalog.clearCache()     # drop operator-internal persists
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        per_op[name] = round(statistics.median(times), 2)
    total = round(sum(per_op.values()), 2)
    print(json.dumps({"mode": "standalone", "cores": cores,
                      "executors": want // 8, "docs": n, "sec": total,
                      "per_op": per_op}))
    spark.stop()


if __name__ == "__main__":
    main()
