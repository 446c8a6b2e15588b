"""Scaling probe for the round-3 curation additions: sequence packing,
mixture sampling, substring dedup, and the hashing-trick quality scorer
over an N-times replicated documents table, at two parallelism levels
(north-rule two-cluster-size proxy, per the task brief).

Usage: python BENCH/curation_scaling.py [cores] [replicas]
Prints one JSON line; compare throughput(32) / (4 * throughput(8)).
Warm-up pass first; reported per-op time is the median of 3 passes.
"""

import json
import statistics
import sys
import time

from pyspark.sql import SparkSession, functions as F

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 60
SF_DIR = "/root/testdata/sf0.1"

WEIGHTS = {"en": 50, "de": 20, "es": 15, "fr": 10, "zh": 5}


def scaled_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    return (docs.crossJoin(reps)
            .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                    .alias("doc_id"), "text", "lang")
            .repartition(max(CORES, 8)))


def ops(docs):
    from geojson_vt_spark.operators import (mixture_sample_df,
                                            pack_sequences_df,
                                            quality_classifier_df,
                                            substring_dedup_df)
    # aggregate over COMPUTED columns — a bare count() would let
    # Catalyst eliminate the join/window and measure nothing
    sink = lambda df, c: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum(c).alias("s")).collect()
    return {
        "pack_sequences": lambda: sink(pack_sequences_df(
            docs, seq_len=2048, n_shards=64), "last_seq"),
        "mixture_sample": lambda: sink(
            mixture_sample_df(docs, WEIGHTS), "ppm"),
        "substring_dedup": lambda: sink(substring_dedup_df(
            docs, span_len=16, stride=8), "n_dup_spans"),
        "quality_classifier": lambda: sink(
            quality_classifier_df(docs), "score_sum"),
    }


def main():
    spark = (SparkSession.builder.master(f"local[{CORES}]")
             .config("spark.sql.shuffle.partitions", str(max(CORES, 8)))
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = scaled_docs(spark).localCheckpoint()
    n = docs.count()
    table = ops(docs)
    per_op = {}
    for name, fn in table.items():
        fn()                                    # warm-up
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        per_op[name] = round(statistics.median(times), 2)
    total = round(sum(per_op.values()), 2)
    print(json.dumps({"cores": CORES, "docs": n, "sec": total,
                      "per_op": per_op,
                      "docs_per_sec": round(len(per_op) * n / total)}))
    spark.stop()


if __name__ == "__main__":
    main()
