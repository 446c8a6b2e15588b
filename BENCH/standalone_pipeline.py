#!/usr/bin/env python
"""End-to-end resumable curation pipeline on the standalone grid —
the north-rule deployment shape in one artifact: the full crawl→
tokenizer chain (URL dedup → Gopher → exact dedup → decontaminate →
classifier → mixture → packing), every stage committed to a durable
parquet store with snapshot lineage, run at two cluster sizes.

    CURATION_REPLICAS=240 spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/gvt.zip --conf spark.cores.max={8,32} \
        BENCH/standalone_pipeline.py

Prints one JSON line with per-stage walls, rows, and the total.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(os.environ.get("CURATION_REPLICAS", "240"))
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.appName("gvt-standalone-pipeline")
             .config("spark.executor.cores", "8")
             .config("spark.executor.memory", "20g")
             .config("spark.sql.adaptive.enabled", "true")
             # docs are ~300 bytes: without these, a 1.2M-doc stage
             # store is ~350 MB -> 3 scan splits, flat-lining the chain
             .config("spark.sql.files.maxPartitionBytes", "8388608")
             .config("spark.sql.files.openCostInBytes", "1048576")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    deadline = time.time() + 60
    want = int(spark.conf.get("spark.cores.max", "32"))
    sc = spark.sparkContext
    while time.time() < deadline and sc.defaultParallelism < want:
        time.sleep(0.5)
    cores = sc.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))

    from geojson_vt_spark.curation import CurationPipeline, standard_stages

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    # URLs: unique per doc (host spread over ~1k domains, path carries
    # the id) with a light tracking-param/fragment mix so
    # canonicalization does real work but dedup keeps ~8% duplicates
    # (every 12th doc aliases its neighbor's canonical URL)
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://h"), (F.expr("doc_id div 12") % 997).cast("string"),
        F.lit(".example.com/p/"),
        F.when(d % 12 == 0, d + 1).otherwise(d).cast("string"),
        F.when(d % 3 == 0, F.lit("?utm_source=feed")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("#top")).otherwise(F.lit("")))
    # texts: a per-doc uid token keeps replicas distinct except a
    # planted 10% exact-duplicate rate, so exact_dedup does real work
    # without collapsing the corpus back to the base table
    text2 = F.when(d % 10 == 0, F.col("text")).otherwise(
        F.concat(F.col("text"), F.lit(" uid"), d.cast("string")))
    corpus = (docs.crossJoin(reps)
              .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                      .alias("doc_id"), "text", "lang")
              .select("doc_id", text2.alias("text"), "lang", url.alias("url"))
              .repartition(cores))
    bench = docs.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")

    wd = tempfile.mkdtemp(prefix="gvt_pipe_")
    pipe = CurationPipeline(spark, wd, target_file_rows=25_000, stages=standard_stages(
        benchmark=bench,
        mixture={"en": 50, "de": 20, "es": 15, "fr": 10, "zh": 5},
        seq_len=2048, n_shards=64))
    t0 = time.monotonic()
    out, results = pipe.run(corpus)
    total = time.monotonic() - t0
    assert pipe.verify() == []

    # incremental snapshot ingest: a 25%-sized fresh batch (new
    # replica ids, same url/text recipe) through pipe.ingest — dedup
    # against corpus+seen fps, then the chain over survivors only.
    # Full-text md5 fingerprints: the prefix fp would collapse every
    # replica of a base doc into one fingerprint and zero the batch.
    n_batch_reps = max(REPLICAS // 4, 1)
    reps2 = spark.range(REPLICAS, REPLICAS + n_batch_reps) \
        .select(F.col("id").alias("rep"))
    batch = (docs.crossJoin(reps2)
             .select((F.col("doc_id") + F.col("rep") * 1_000_000)
                     .alias("doc_id"), "text", "lang")
             .select("doc_id", text2.alias("text"), "lang",
                     url.alias("url"))
             .repartition(cores))
    t1 = time.monotonic()
    out2, results2 = pipe.ingest(batch,
                                 fingerprints=[F.md5(F.col("text"))])
    ingest_total = time.monotonic() - t1
    assert pipe.verify() == []
    corpus_rows = pipe.corpus().count()

    print(json.dumps({
        "mode": "standalone", "cores": cores, "executors": want // 8,
        "docs_in": REPLICAS * docs.count(), "sec": round(total, 2),
        "stages": {r.name: {"sec": round(r.seconds, 2), "rows": r.rows}
                   for r in results},
        "docs_out": results[-1].rows,
        "docs_per_sec": round(REPLICAS * 5000 / total),
        "ingest": {"docs_in": n_batch_reps * 5000,
                   "sec": round(ingest_total, 2),
                   "stages": {r.name: {"sec": round(r.seconds, 2),
                                       "rows": r.rows}
                              for r in results2},
                   "docs_per_sec": round(n_batch_reps * 5000
                                         / ingest_total),
                   "corpus_rows": corpus_rows}}))
    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
