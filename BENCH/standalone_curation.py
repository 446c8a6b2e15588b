#!/usr/bin/env python
"""Standalone-mode scaling probe for the curation additions
(substring dedup, quality classifier, sequence packing) — the
north-rule two-cluster-size comparison on the REAL deployment shape:
one executor JVM (8 cores) vs four executor JVMs (8 cores each), each
with its own Python-worker Arrow pipe.

Launch (master + 4 workers already running, see BENCH/SCALING.md):

    cd /root/repo && zip -qr /tmp/gvt.zip geojson_vt_spark
    spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/gvt.zip \
        --conf spark.cores.max=8   BENCH/standalone_curation.py   # N
    spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/gvt.zip \
        --conf spark.cores.max=32  BENCH/standalone_curation.py   # 4N

Env: CURATION_REPLICAS (default 240 -> 1.2M docs over sf0.1);
CURATION_OPS (comma list, default all; options substring_dedup,
substring_dedup_hof, quality_classifier, pack_sequences);
CURATION_PASSES (default 3). Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(os.environ.get("CURATION_REPLICAS", "240"))
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("gvt-standalone-curation")
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

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    docs = (docs.crossJoin(reps)
            .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                    .alias("doc_id"), "text", "lang")
            .repartition(cores)).persist()
    n = docs.count()

    from geojson_vt_spark.operators import (pack_sequences_df,
                                            quality_classifier_df,
                                            substring_dedup_df)

    sink = lambda df, c: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum(c).alias("s")).collect()
    table = {
        "substring_dedup": lambda: sink(substring_dedup_df(
            docs, span_len=16, stride=8), "n_dup_spans"),
        # JVM-HOF span emitter: the compute-path variant (slower
        # absolute, no Arrow pipe in the wall) per SCALING.md's
        # compute-path vs default-path methodology
        "substring_dedup_hof": lambda: sink(substring_dedup_df(
            docs, span_len=16, stride=8, arrow=False), "n_dup_spans"),
        "quality_classifier": lambda: sink(
            quality_classifier_df(docs), "score_sum"),
        "pack_sequences": lambda: sink(pack_sequences_df(
            docs, seq_len=2048, n_shards=64), "last_seq"),
    }
    ops = [o for o in os.environ.get(
        "CURATION_OPS",
        "substring_dedup,quality_classifier,pack_sequences").split(",")
        if o in table]
    passes = int(os.environ.get("CURATION_PASSES", "3"))
    per_op = {}
    for name in ops:
        fn = table[name]
        fn()                               # warm-up
        times = []
        for _ in range(passes):
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        per_op[name] = round(statistics.median(times), 2)
    total = round(sum(per_op.values()), 2)
    print(json.dumps({"mode": "standalone", "cores": cores,
                      "executors": want // 8, "docs": n, "sec": total,
                      "per_op": per_op,
                      "docs_per_sec": round(len(per_op) * n / total)}))
    spark.stop()


if __name__ == "__main__":
    main()
