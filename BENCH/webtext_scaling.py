"""Webtext-suite scaling probe: the same curation job (Gopher rules +
PII scrub + TF-IDF + URL dedup) over an N-times replicated documents
table, run at two parallelism levels (north-rule two-cluster-size
proxy, per the task brief).

Usage: python BENCH/webtext_scaling.py [cores] [replicas]
Prints one JSON line per run; compare throughput(32) / (4 * throughput(8)).
Warm-up iteration first; reported time is the median of 3 timed passes.
"""

import json
import statistics
import sys
import time

from pyspark.sql import SparkSession, functions as F

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
SF_DIR = "/root/testdata/sf0.1"


def scaled_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    return (docs.crossJoin(reps)
            .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                    .alias("doc_id"), "text", "source"))


def run_suite(spark, docs):
    from geojson_vt_spark.operators.webtext import (pii_redact_df,
                                                    repetition_stats_df,
                                                    tfidf_topk_df, url_dedup)
    import __spark_entry__ as em
    repetition_stats_df(docs).count()
    pii_redact_df(docs).count()
    tfidf_topk_df(docs, k=3).count()
    pages = docs.select("doc_id", em._synth_url_col().alias("url"))
    url_dedup(pages).count()


def main():
    spark = (SparkSession.builder.master(f"local[{CORES}]")
             .config("spark.sql.shuffle.partitions", str(max(CORES, 8)))
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = scaled_docs(spark)
    n = docs.count()
    run_suite(spark, docs)            # warm-up (JIT, parquet footer cache)
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        run_suite(spark, docs)
        times.append(time.monotonic() - t0)
    dt = statistics.median(times)
    print(json.dumps({"cores": CORES, "docs": n, "sec": round(dt, 2),
                      "all_secs": [round(t, 2) for t in times],
                      "doc_passes_per_sec": round(4 * n / dt)}))
    spark.stop()


if __name__ == "__main__":
    main()
