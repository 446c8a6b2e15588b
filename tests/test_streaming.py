"""Structured Streaming surface: windowed tile rollups and streaming
dedup over the rate-replayed corpus."""

import time

from pyspark.sql import functions as F


def _drain(query, seconds=20, want_rows=1, spark=None, table=None):
    deadline = time.time() + seconds
    while time.time() < deadline:
        query.processAllAvailable()
        if spark is not None and table is not None:
            if spark.table(table).count() >= want_rows:
                break
        time.sleep(0.5)


def test_streaming_tile_counts(spark, tmp_path):
    from geojson_vt_spark.streaming import (streaming_synth_pages,
                                            streaming_tile_counts)
    pages = streaming_synth_pages(spark, rows_per_second=2000)
    counts = streaming_tile_counts(pages, res=4, window="2 seconds",
                                   watermark="4 seconds")
    q = (counts.writeStream.format("memory").queryName("tile_counts")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck1"))
         .start())
    try:
        time.sleep(6)
        _drain(q, seconds=30, want_rows=1, spark=spark, table="tile_counts")
        rows = spark.table("tile_counts").collect()
    finally:
        q.stop()
    assert len(rows) >= 1
    assert all(r.n_pages > 0 for r in rows)
    # cell ids must be valid z=4 tile ids (low 5 bits == 4)
    assert all(r.cell % 32 == 4 for r in rows)


def test_streaming_dedup_by_url(spark, tmp_path):
    from geojson_vt_spark.streaming import (streaming_dedup_by_url,
                                            streaming_synth_pages)
    pages = streaming_synth_pages(spark, rows_per_second=1000)
    # duplicate every page within the batch: union the stream with itself
    dup = pages.unionByName(pages)
    deduped = streaming_dedup_by_url(dup, watermark="10 seconds")
    q = (deduped.writeStream.format("memory").queryName("deduped")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .start())
    try:
        time.sleep(4)
        _drain(q, seconds=30, want_rows=10, spark=spark, table="deduped")
        urls = [r.url for r in spark.table("deduped").collect()]
    finally:
        q.stop()
    assert len(urls) >= 10
    assert len(urls) == len(set(urls)), "urls must be unique after dedup"


def test_streaming_heavy_tiles_stateful(spark, tmp_path):
    """applyInPandasWithState heavy-tile detector: a tile fires exactly
    once, when its cumulative count first crosses the threshold."""
    from geojson_vt_spark.streaming import (streaming_heavy_tiles,
                                            streaming_synth_pages)
    pages = streaming_synth_pages(spark, rows_per_second=3000)
    heavy = streaming_heavy_tiles(pages, res=2, max_points=50)
    q = (heavy.writeStream.format("memory").queryName("heavy_tiles")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck3"))
         .start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if (q.exception() is None
                    and spark.table("heavy_tiles").count() >= 1):
                break
            time.sleep(2)
        rows = spark.table("heavy_tiles").collect()
    finally:
        q.stop()
    assert len(rows) >= 1
    cells = [r.cell for r in rows]
    assert len(cells) == len(set(cells)), "each tile fires at most once"
    assert all(r.num_points > 50 for r in rows)
    assert all(c % 32 == 2 for c in cells), "valid z=2 tile ids"
