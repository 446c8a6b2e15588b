"""Driver contract for the spark-graft builder (PySpark target).

One ``queries()`` entry per implemented operator family from SURVEY.md
§2 plus the engine additions (spatial joins, dedup, similarity, ANN,
text, multimodal, corpus).  31 of the 32 entries carry a DuckDB
``oracle_sql()`` twin over the same parquet tables — including the
minhash/simhash/ANN pipelines, replayed end-to-end in SQL via
engine-portable md5/plane-literal hashing; only ``pyramid_tiles`` (the
full geometry kernel) is rows-only, pinned byte-identical by the
golden-fixture pytest suite and live-node differentials instead.

Float discipline: every float column either comes from pure-rational
arithmetic (bit-identical in Spark and DuckDB) or is rounded after
identical formulas; sin/ln-derived values are rounded to 6dp.
Deterministic jitter breaks grid symmetry so rank tie-breaks never
depend on cross-engine ulp differences.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

PI = repr(math.pi)


# --------------------------------------------------------------- inputs

def _events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic point cloud derived from the events table (jittered
    off every tile/polygon boundary)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_id").alias("point_id"),
        ((F.col("event_id") * 7919 % 36000) / 100.0 - 180.0
         + (F.col("event_id") % 97) / 9700.0).alias("lon"),
        ((F.col("event_id") * 104729 % 14000) / 100.0 - 70.0
         + (F.col("event_id") % 89) / 8900.0).alias("lat"))


_POINTS_SQL = """
    SELECT event_id AS point_id,
           (event_id * 7919 % 36000) / 100.0 - 180.0
               + (event_id % 97) / 9700.0 AS lon,
           (event_id * 104729 % 14000) / 100.0 - 70.0
               + (event_id % 89) / 8900.0 AS lat
    FROM events
"""

_PROJ_X_SQL = "({lon}) / 360 + 0.5"
_PROJ_Y_SQL = ("least(greatest(0.5 - 0.25 * ln((1 + sin(({lat}) * " + PI +
               " / 180)) / (1 - sin(({lat}) * " + PI + " / 180))) / " + PI +
               ", 0.0), 1.0)")


def _nation_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25 deterministic lon/lat rectangles keyed by nation (edges on
    0.5-degree multiples, disjoint from the jittered points)."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    return n.select(
        k.alias("poly_id"),
        (-172.5 + (k % 13) * 26.0).alias("lon0"),
        (-63.5 + (k * 7 % 120)).alias("lat0"),
        (-172.5 + (k % 13) * 26.0 + 22.5).alias("lon1"),
        F.least(-63.5 + (k * 7 % 120) + 21.0, F.lit(69.5)).alias("lat1"))


_RECTS_SQL = """
    SELECT n_nationkey AS poly_id,
           CAST(-172.5 + (n_nationkey % 13) * 26.0 AS DOUBLE) AS lon0,
           CAST(-63.5 + (n_nationkey * 7 % 120) AS DOUBLE) AS lat0,
           CAST(-172.5 + (n_nationkey % 13) * 26.0 + 22.5 AS DOUBLE) AS lon1,
           CAST(least(-63.5 + (n_nationkey * 7 % 120) + 21.0, 69.5) AS DOUBLE) AS lat1
    FROM nation
"""


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: slice the synthetic web corpus into the z0-z6 tile
    pyramid (convert → wrap → split → assemble) and return per-tile
    stats joined with a tile assignment of the events point cloud."""
    import tempfile

    from geojson_vt_spark import TileOptions
    from geojson_vt_spark.engine import SparkTileEngine
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=4, index_max_points=200)
    eng = SparkTileEngine(spark, opts, workdir=tempfile.mkdtemp(prefix="gvt_entry_"))
    pages = synth_pages_df(spark, 400, seed=42)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)
    eng.build_from_converted(feats)
    return (eng.tiles()
            .select("z", "x", "y", "tile_id", "num_features",
                    "num_points", "num_simplified")
            .orderBy("tile_id"))


# --------------------------------------------------------------- queries

def q_mercator_project(spark, sf_dir):
    from geojson_vt_spark.functions import project_x_col, project_y_col
    pts = _events_points(spark, sf_dir)
    return pts.select(
        "point_id",
        F.round(project_x_col(F.col("lon")), 6).alias("px"),
        F.round(project_y_col(F.col("lat")), 6).alias("py"))


def q_tile_assign(spark, sf_dir):
    from geojson_vt_spark.functions import cell_xy_cols
    pts = _events_points(spark, sf_dir)
    tx, ty = cell_xy_cols(F.col("lon"), F.col("lat"), 8)
    return (pts.select(tx.alias("tx"), ty.alias("ty"))
            .groupBy("tx", "ty").agg(F.count(F.lit(1)).alias("cnt")))


def q_tile_id_pack(spark, sf_dir):
    from geojson_vt_spark.functions import cell_xy_cols, tile_id_col
    pts = _events_points(spark, sf_dir)
    tx, ty = cell_xy_cols(F.col("lon"), F.col("lat"), 8)
    d = pts.select("point_id", tx.alias("tx"), ty.alias("ty"))
    d = d.withColumn("tile_id", tile_id_col(8, F.col("tx"), F.col("ty")))
    # unpack roundtrip: z from low 5 bits, xy from the quotient
    return d.select(
        "point_id", "tile_id",
        (F.col("tile_id") % 32).alias("uz"),
        F.floor(F.col("tile_id") / 32).__mod__(F.lit(256)).alias("ux"),
        F.floor(F.floor(F.col("tile_id") / 32) / 256).alias("uy"))


def q_wrap_x(spark, sf_dir):
    from geojson_vt_spark.functions import wrap_x_col
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    x = (F.col("event_id") % 1000 - 500).cast("long")
    return ev.select(F.col("event_id"), x.alias("x"),
                     wrap_x_col(x, 6).alias("wrapped"))


def q_bbox_agg(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    x = F.col("l_extendedprice") / 100000.0
    y = F.col("l_discount")
    return (li.groupBy("l_orderkey")
            .agg(F.round(F.min(x), 9).alias("minx"),
                 F.round(F.min(y), 9).alias("miny"),
                 F.round(F.max(x), 9).alias("maxx"),
                 F.round(F.max(y), 9).alias("maxy"),
                 F.count(F.lit(1)).alias("n_rings")))


def q_tile_stats(spark, sf_dir):
    from geojson_vt_spark.functions import cell_xy_cols
    pts = _events_points(spark, sf_dir)
    tx, ty = cell_xy_cols(F.col("lon"), F.col("lat"), 6)
    return (pts
            .select(tx.alias("tx"), ty.alias("ty"),
                    (F.col("point_id") % 100 + 2).alias("n_verts"))
            .groupBy("tx", "ty")
            .agg(F.count(F.lit(1)).alias("num_features"),
                 F.sum("n_verts").alias("num_points")))


def q_tiny_ring_filter(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    size = F.col("l_quantity") / 50.0
    is_poly = F.col("l_linenumber") % 2 == 0
    tol = 0.5
    keep = ~F.when(is_poly, size < tol * tol).otherwise(size < tol)
    return (li.where(keep)
            .select("l_orderkey", "l_linenumber",
                    F.round(size, 9).alias("ring_size")))


def q_stripe_classify(spark, sf_dir):
    pts = _events_points(spark, sf_dir)
    w = 0.25
    minx = F.col("lon") / 360 + 0.5 - 0.01
    maxx = F.col("lon") / 360 + 0.5 + 0.01
    cls = (F.when((minx >= w) & (maxx < 1 - w), F.lit("accept"))
           .when((maxx < w) | (minx >= 1 - w), F.lit("reject"))
           .otherwise(F.lit("cross")))
    return pts.select(cls.alias("cls")).groupBy("cls").agg(
        F.count(F.lit(1)).alias("n"))


def q_zoom_tile_counts(spark, sf_dir):
    from geojson_vt_spark.functions import cell_col
    pts = _events_points(spark, sf_dir)
    out = None
    for z in (4, 6, 8):
        d = (pts.select(cell_col(F.col("lon"), F.col("lat"), z).alias("cell"))
             .agg(F.countDistinct("cell").alias("n_tiles"))
             .select(F.lit(z).alias("z"), "n_tiles"))
        out = d if out is None else out.unionByName(d)
    return out


def q_pip_join(spark, sf_dir):
    from geojson_vt_spark.functions import project_x_col, project_y_col
    from geojson_vt_spark.operators import point_in_polygon_join
    pts = _events_points(spark, sf_dir)
    rects = _nation_rects(spark, sf_dir)
    polys = rects.select(
        "poly_id",
        F.array(project_x_col(F.col("lon0")), project_x_col(F.col("lon1")),
                project_x_col(F.col("lon1")), project_x_col(F.col("lon0")),
                project_x_col(F.col("lon0"))).alias("pxs"),
        F.array(project_y_col(F.col("lat0")), project_y_col(F.col("lat0")),
                project_y_col(F.col("lat1")), project_y_col(F.col("lat1")),
                project_y_col(F.col("lat0"))).alias("pys"))
    return point_in_polygon_join(pts, polys, res=5, salt_n=4)


def q_knn_join(spark, sf_dir):
    from geojson_vt_spark.operators import knn_join
    pts = _events_points(spark, sf_dir)
    qs = (pts.where(F.col("point_id") % 500 == 0)
          .select(F.col("point_id").alias("query_id"), "lon", "lat"))
    res = knn_join(pts, qs, k=3, res=5)
    # re-rank on rounded distance so cross-engine ulp noise can't flip order
    w = Window.partitionBy("query_id").orderBy(
        F.round("dist", 6), F.col("point_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "point_id", "rank"))


def q_raster_overlay(spark, sf_dir):
    from geojson_vt_spark.functions import project_x_col, project_y_col
    from geojson_vt_spark.operators import raster_vector_overlay
    raster = (spark.range(256)
              .select((F.col("id") % 16).cast("int").alias("x"),
                      F.floor(F.col("id") / 16).cast("int").alias("y")))
    rects = _nation_rects(spark, sf_dir)
    vec = rects.select(
        F.col("poly_id").alias("vec_id"),
        F.array(project_x_col(F.col("lon0")), project_x_col(F.col("lon1"))).alias("pxs"),
        F.array(project_y_col(F.col("lat0")), project_y_col(F.col("lat1"))).alias("pys"))
    return (raster_vector_overlay(raster, vec, res=4)
            .select("x", "y", "vec_id"))


def q_dedup_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return (d.groupBy(F.md5("text").alias("fp"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def q_ngram_jaccard(spark, sf_dir):
    from geojson_vt_spark.operators import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.05)


def q_near_dup_clusters(spark, sf_dir):
    """Transitive near-dup clustering: exact ngram-Jaccard pairs (the
    SQL-twin candidate generator) closed into connected components —
    every document labeled with its cluster representative (min
    reachable doc_id; isolated docs label themselves)."""
    from geojson_vt_spark.operators import (near_dup_clusters,
                                            ngram_jaccard_pairs)
    d = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.05)
    return near_dup_clusters(pairs, nodes=d, node_col="doc_id")


def q_token_count(spark, sf_dir):
    from geojson_vt_spark.operators import token_count_col
    return _docs(spark, sf_dir).select(
        "doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens"))


def q_text_quality(spark, sf_dir):
    from geojson_vt_spark.operators import quality_score_df
    return quality_score_df(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    from geojson_vt_spark.operators import lang_id_df
    return lang_id_df(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    from geojson_vt_spark.operators import fingerprint_df
    return fingerprint_df(_docs(spark, sf_dir))


def q_cosine_topk(spark, sf_dir):
    from geojson_vt_spark.operators import cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb, [0, 1, 2, 3, 4], k=5).select(
        "query_id", "nbr_id", "rank")


def q_embedding_pairs_exact(spark, sf_dir):
    from geojson_vt_spark.operators.dedup import cosine_col
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .where(F.col("vec_id") < 100)
           .select("vec_id", F.col("embedding").cast("array<double>").alias("v")))
    return (emb.alias("a").join(emb.alias("b"),
                                F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                    F.round(cosine_col("a.v", "b.v"), 6).alias("cosine"))
            .where(F.col("cosine") >= 0.25))


def q_winnow_fingerprint(spark, sf_dir):
    """Winnowing (rolling-hash) fingerprints — position-robust document
    fingerprints, one row per selected k-gram hash."""
    from geojson_vt_spark.operators import winnow_fingerprints_df
    return winnow_fingerprints_df(_docs(spark, sf_dir))


def q_embedding_near_dup(spark, sf_dir):
    """Hyperplane-LSH near-duplicate pairs (bucketed candidates, exact
    cosine verify) — the LSH scale path whose exact twin is
    embedding_pairs_exact."""
    from geojson_vt_spark.operators import embedding_near_dup_pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup_pairs(emb, threshold=0.5)


def q_events_window(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.date_format(F.date_trunc("day", "ts"),
                                     "yyyy-MM-dd").alias("day"),
                       "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 3).alias("total_value")))


def q_events_rollup(spark, sf_dir):
    """Subtotal hierarchy over events via ROLLUP (event_type, month):
    per-(type, month) rows plus per-type and grand-total subtotal rows
    (null-marked) in ONE pass — the grouping-sets surface §2.8 notes
    Spark provides for free.  Value sums go through int64 micro-units
    so every subtotal is order-independent and engine-exact."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    micro = F.round(F.col("value") * 1e6).cast("long")
    return (ev.select("event_type",
                      F.date_format(F.date_trunc("month", "ts"),
                                    "yyyy-MM").alias("month"),
                      micro.alias("_v"))
            .rollup("event_type", "month")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("_v") / 1e6, 6).alias("total_value")))


# rows-only checks (geometry kernels / hash-scheme ops not expressible
# in portable SQL; pinned by the pytest golden suite instead)

def q_pyramid_tiles(spark, sf_dir):
    return entry(spark)


# engine-portable variants: signatures derive from md5 (identical hex
# in Spark and DuckDB), so the ENTIRE minhash/simhash pipeline —
# shingling, slot minima, banding, bucket capping, candidate join,
# exact verify — is replicated by the oracle SQL below
_MH_CAP = 500
_MH_THRESHOLD = 0.3
_SH_CAP = 500
_SH_MAXHAM = 10


def q_minhash_dedup(spark, sf_dir):
    from geojson_vt_spark.operators import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=_MH_THRESHOLD,
                             hash_fn="md5", bucket_cap=_MH_CAP)


def q_simhash_pairs(spark, sf_dir):
    from geojson_vt_spark.operators import simhash_pairs
    return simhash_pairs(_docs(spark, sf_dir), max_hamming=_SH_MAXHAM,
                         hash_fn="md5", bucket_cap=_SH_CAP)


def q_ann_ivf(spark, sf_dir):
    from geojson_vt_spark.operators import ivf_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, [0, 1, 2, 3, 4], k=5)


def q_ann_lsh(spark, sf_dir):
    from geojson_vt_spark.operators import lsh_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(emb, [0, 1, 2, 3, 4], k=5)


def q_corpus_extract(spark, sf_dir):
    """Geo extraction (the real Arrow-batched regex operator) over the
    SQL-constructible documents→pages bridge; coordinates re-parsed
    from the emitted GeoJSON so the oracle can check them as numbers."""
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 pages_from_documents)
    feats = extract_geo_features_df(pages_from_documents(_docs(spark, sf_dir)))
    sch = "STRUCT<geometry: STRUCT<coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>>>"
    d = feats.select("input_ord", F.from_json("feature_json", sch).alias("fj"))
    return (d.select("input_ord",
                     F.posexplode(F.col("fj.geometry.coordinates")[0]))
            .select("input_ord", F.col("pos").cast("long").alias("pt_idx"),
                    F.col("col")[0].alias("lon"), F.col("col")[1].alias("lat")))


def q_multimodal_features(spark, sf_dir):
    from geojson_vt_spark.operators.multimodal import (assets_from_documents,
                                                       extract_features_df)
    feats = extract_features_df(assets_from_documents(_docs(spark, sf_dir)))
    return feats.select(
        "asset_id", "kind",
        *[F.round(F.col("features")[i], 6).alias(f"f{i:02d}")
          for i in range(16)])


def q_multimodal_resize(spark, sf_dir):
    from geojson_vt_spark.operators.multimodal import (assets_from_documents,
                                                       resize_df)
    return resize_df(assets_from_documents(_docs(spark, sf_dir)))


def q_frame_sample(spark, sf_dir):
    from geojson_vt_spark.operators.multimodal import (assets_from_documents,
                                                       frame_sample_df)
    return frame_sample_df(assets_from_documents(_docs(spark, sf_dir)),
                           every_ms=2000)


# --- webtext curation suite (C4/Gopher/RefinedWeb-style stages) ---

def _synth_url_col():
    """Deterministic synthetic crawl URL per document — messy on
    purpose (mixed case, www, default port, tracking params, trailing
    slash, fragment) so canonicalization has real work to do.  The
    oracle SQL builds the identical string."""
    d = F.col("doc_id")
    sh = F.when(d % 2 == 0,
                F.concat(F.lit("HTTPS://WWW."), F.col("source"),
                         F.lit(".Example.COM"))) \
         .otherwise(F.concat(F.lit("https://"), F.col("source"),
                             F.lit(".example.com")))
    port = F.when(d % 7 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(F.lit("/A-"), (d % 23).cast("string"),
                    F.when(d % 3 == 2, F.lit("/")).otherwise(F.lit("")))
    q = (F.when(d % 3 == 0, F.concat(F.lit("?utm_campaign=feed&id="),
                                     (d % 11).cast("string")))
         .when(d % 3 == 1, F.concat(F.lit("?id="), (d % 11).cast("string"),
                                    F.lit("&gclid=trk")))
         .otherwise(F.concat(F.lit("?sid="), d.cast("string"))))
    frag = F.when(d % 5 >= 3, F.concat(F.lit("#Sec-"),
                                       (d % 5).cast("string"))) \
            .otherwise(F.lit(""))
    return F.concat(sh, port, path, q, frag)


# DuckDB twin of _synth_url_col() — must build the identical string
_URL_SYNTH_SQL = """
    (CASE WHEN doc_id % 2 = 0
          THEN 'HTTPS://WWW.' || source || '.Example.COM'
          ELSE 'https://' || source || '.example.com' END)
    || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
    || '/A-' || CAST(doc_id % 23 AS VARCHAR)
    || (CASE WHEN doc_id % 3 = 2 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0
             THEN '?utm_campaign=feed&id=' || CAST(doc_id % 11 AS VARCHAR)
             WHEN doc_id % 3 = 1
             THEN '?id=' || CAST(doc_id % 11 AS VARCHAR) || '&gclid=trk'
             ELSE '?sid=' || CAST(doc_id AS VARCHAR) END)
    || (CASE WHEN doc_id % 5 >= 3
             THEN '#Sec-' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END)
"""


def q_url_dedup(spark, sf_dir):
    """URL canonicalization + keep-lowest-id dedup (RefinedWeb-style)
    over synthetic crawl URLs derived from the documents table."""
    from geojson_vt_spark.operators.webtext import url_dedup
    pages = _docs(spark, sf_dir).select(
        "doc_id", _synth_url_col().alias("url"))
    # string-keyed form: the DuckDB oracle compares canon_url values;
    # the library default is the slim int64 keys_only exchange
    return url_dedup(pages, keys_only=False)


def q_latest_capture(spark, sf_dir):
    """Common-Crawl revisit dedup: newest capture per canonical URL.
    warc_ts is synthesized as deterministic epoch seconds so the
    oracle orders by the identical value."""
    from geojson_vt_spark.operators.webtext import latest_capture_df
    pages = _docs(spark, sf_dir).select(
        "doc_id", _synth_url_col().alias("url"),
        (F.lit(1704067200) + (F.col("doc_id") * 37 % 100000))
        .cast("long").alias("warc_ts"))
    return latest_capture_df(pages, keys_only=False)


def q_hilbert_cell(spark, sf_dir):
    """S2-style Hilbert cell key per point at order 10 — the
    locality-preserving join/clustering index (functions/hilbert.py);
    the oracle replays the identical per-level transition as nested
    SELECTs generated from the same transition description."""
    from geojson_vt_spark.functions.hilbert import with_hilbert_cell
    pts = _events_points(spark, sf_dir)
    return (with_hilbert_cell(pts, F.col("lon"), F.col("lat"), 10)
            .select("point_id", "hilbert_d"))


def q_gopher_quality(spark, sf_dir):
    """Gopher-style repetition/shape rules: top-bigram share,
    duplicate-trigram share, mean word length, alpha-word fraction,
    composite keep flag."""
    from geojson_vt_spark.operators.webtext import repetition_stats_df
    return repetition_stats_df(_docs(spark, sf_dir))


def q_corpus_profile(spark, sf_dir):
    """Per-(lang, source) corpus audit: doc counts, size totals, and
    exact length quartiles in ONE partially-aggregated groupBy."""
    from geojson_vt_spark.operators.webtext import corpus_profile_df
    return corpus_profile_df(_docs(spark, sf_dir))


def q_incremental_dedup(spark, sf_dir):
    """Snapshot-incremental dedup: docs with doc_id % 5 == 0 arrive as
    the incoming batch, the rest are the already-ingested base; flag
    seen-in-base via prefix-8-token fingerprints and keep one doc per
    new fingerprint."""
    from geojson_vt_spark.operators.webtext import incremental_dedup_df
    d = _docs(spark, sf_dir)
    return incremental_dedup_df(d.where(F.col("doc_id") % 5 == 0),
                                d.where(F.col("doc_id") % 5 != 0))


def q_nb_train(spark, sf_dir):
    """Distributed multinomial Naive-Bayes training (Laplace-smoothed
    term log-conditionals in int64 micro-units) on the doc_id % 3 != 0
    train split, labels = lang."""
    from geojson_vt_spark.operators.webtext import nb_train_df
    return nb_train_df(_docs(spark, sf_dir).where(F.col("doc_id") % 3 != 0))


def q_nb_classify(spark, sf_dir):
    """NB language classification of the held-out doc_id % 3 == 0
    split with the model trained on the rest; reports the argmax label
    and whether it matches the true lang.  (The synthetic corpus draws
    every language's text from one shared word soup — zero
    language-specific vocabulary — so accuracy tops out at the
    majority-class rate here by construction; the learning mechanism
    itself is pinned by the planted-vocabulary test in
    tests/test_operators.py.)"""
    from geojson_vt_spark.operators.webtext import nb_classify_df
    d = _docs(spark, sf_dir)
    test = d.where(F.col("doc_id") % 3 == 0)
    pred = nb_classify_df(test, d.where(F.col("doc_id") % 3 != 0))
    return (pred.join(test.select("doc_id", "lang"), "doc_id")
            .select("doc_id", "pred", "nb_logprob",
                    (F.col("pred") == F.col("lang")).cast("int")
                    .alias("correct")))


def q_topk_ngrams(spark, sf_dir):
    """Corpus-wide top-50 word bigrams (vocabulary seeding /
    boilerplate discovery), gram-ascending tie-break."""
    from geojson_vt_spark.operators.webtext import topk_ngrams_df
    return topk_ngrams_df(_docs(spark, sf_dir), n=2, k=50)


def q_chunk_documents(spark, sf_dir):
    """RAG-style overlapping token-window chunker (128-token chunks,
    32-token overlap) — shuffle-free Column HOFs."""
    from geojson_vt_spark.operators.webtext import chunk_documents_df
    return chunk_documents_df(_docs(spark, sf_dir), chunk_tokens=128,
                              overlap=32)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: drop documents sharing any word
    8-gram with the (synthetic, doc_id % 97 == 0) benchmark set."""
    from geojson_vt_spark.operators.webtext import decontaminate_df
    d = _docs(spark, sf_dir)
    return decontaminate_df(d, d.where(F.col("doc_id") % 97 == 0), n=8)


def q_pii_redact(spark, sf_dir):
    """PII scrub over documents with deterministic synthetic
    emails/IPs/phones appended (the corpus itself is digit-free word
    soup, so the planted PII is the only thing to find)."""
    from geojson_vt_spark.operators.webtext import pii_redact_df
    d = F.col("doc_id")
    messy = F.concat(
        F.col("text"),
        F.when(d % 4 == 0, F.concat(
            F.lit(" Contact user"), (d % 50).cast("string"),
            F.lit("@mail"), (d % 7).cast("string"),
            F.lit(".example.com now"))).otherwise(F.lit("")),
        F.when(d % 3 == 0, F.concat(
            F.lit(" from 10.0."), (d % 256).cast("string"),
            F.lit("."), (d % 254 + 1).cast("string"))).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(
            F.lit(" call +1 (555) 010-"),
            F.lpad((d % 100).cast("string"), 2, "0"))).otherwise(F.lit("")))
    docs = _docs(spark, sf_dir).select("doc_id", messy.alias("text"))
    return pii_redact_df(docs)


def q_tfidf_topterms(spark, sf_dir):
    """Top-3 TF-IDF terms per document, smooth idf, term tie-break."""
    from geojson_vt_spark.operators.webtext import tfidf_topk_df
    return tfidf_topk_df(_docs(spark, sf_dir), k=3)


def q_paragraph_dedup(spark, sf_dir):
    """CCNet-style corpus-wide paragraph dedup over documents given
    synthetic paragraph structure: a per-(doc_id%7) cookie-banner
    header every doc shares, the real text chunked into 20-word
    paragraphs, and a per-(doc_id%5) footer on every third doc — so
    the planted boilerplate is duplicated corpus-wide and must survive
    only at its lowest (doc_id, idx) occurrence."""
    from geojson_vt_spark.operators.webtext import paragraph_dedup_df
    d = F.col("doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nch = F.greatest(F.ceil(F.size(toks) / F.lit(20)).cast("int"), F.lit(1))
    body = F.array_join(
        F.transform(F.sequence(F.lit(0), nch - 1),
                    lambda i: F.array_join(
                        F.slice(toks, i * 20 + 1, 20), " ")), "\n")
    synth = F.concat(
        F.lit("accept cookies policy variant "),
        (d % 7).cast("string"), F.lit("\n"), body,
        F.when(d % 3 == 0,
               F.concat(F.lit("\nall rights reserved variant "),
                        (d % 5).cast("string"))).otherwise(F.lit("")))
    docs = _docs(spark, sf_dir).select("doc_id", synth.alias("text"))
    return paragraph_dedup_df(docs)


def q_domain_stats(spark, sf_dir):
    """Per-host crawl aggregates over the synthetic-URL pages."""
    from geojson_vt_spark.operators.webtext import domain_stats_df
    pages = _docs(spark, sf_dir).select(
        "doc_id", _synth_url_col().alias("url"), "text")
    return domain_stats_df(pages)


def q_c4_line_filter(spark, sf_dir):
    """C4-style line filters over documents given synthetic line
    structure: 12-word lines with rotating ./!/?/none endings, a
    cookie-banner line on even docs, and a ``{`` code line on every
    11th doc (which fails the whole document)."""
    from geojson_vt_spark.operators.webtext import c4_line_filter_df
    d = F.col("doc_id")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nl = F.greatest(F.ceil(F.size(toks) / F.lit(12)).cast("int"), F.lit(1))
    puncts = F.array(F.lit("."), F.lit("!"), F.lit("?"), F.lit(""))
    body = F.array_join(
        F.transform(F.sequence(F.lit(0), nl - 1),
                    lambda i: F.concat(
                        F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
                        F.element_at(puncts,
                                     ((d + i) % 4 + 1).cast("int")))), "\n")
    synth = F.concat(
        body,
        F.when(d % 2 == 0,
               F.lit("\nThis site uses cookie tracking technology today.")
               ).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("\nfunction() {")).otherwise(F.lit("")))
    docs = _docs(spark, sf_dir).select("doc_id", synth.alias("text"))
    return c4_line_filter_df(docs)


def q_pack_sequences(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing into 256-token
    context windows across 8 shards."""
    from geojson_vt_spark.operators.webtext import pack_sequences_df
    return pack_sequences_df(_docs(spark, sf_dir), seq_len=256, n_shards=8)


def q_mixture_sample(spark, sf_dir):
    """Deterministic domain-mixture subsampling to a 50/20/15/10/5
    en/de/es/fr/zh target over the documents table."""
    from geojson_vt_spark.operators.webtext import mixture_sample_df
    return mixture_sample_df(
        _docs(spark, sf_dir),
        {"en": 50, "de": 20, "es": 15, "fr": 10, "zh": 5})


def q_substring_dedup(spark, sf_dir):
    """Exact-substring duplication stats (8-token spans, stride 4)
    over documents with a planted shared block on every doc_id%13<3
    document (3 variants), so corpus-wide duplicated spans exist."""
    from geojson_vt_spark.operators.webtext import substring_dedup_df
    d = F.col("doc_id")
    synth = F.concat(
        F.col("text"),
        F.when(d % 13 < 3, F.concat(
            F.lit(" copy pasta block variant "), (d % 3).cast("string"),
            F.lit(" alpha beta gamma delta epsilon"
                  " zeta eta theta iota kappa"))).otherwise(F.lit("")))
    docs = _docs(spark, sf_dir).select("doc_id", synth.alias("text"))
    return substring_dedup_df(docs, span_len=8, stride=4)


def q_quality_classifier(spark, sf_dir):
    """Hashing-trick linear quality scorer (1024 buckets, integer
    pseudo-weights) over the documents table."""
    from geojson_vt_spark.operators.webtext import quality_classifier_df
    return quality_classifier_df(_docs(spark, sf_dir), dim=1024)


def q_domain_cap(spark, sf_dir):
    """C4-style per-host page cap (keep lowest-id 3 pages per host)
    over the synthetic-URL pages."""
    from geojson_vt_spark.operators.webtext import domain_cap_df
    pages = _docs(spark, sf_dir).select(
        "doc_id", _synth_url_col().alias("url"))
    return domain_cap_df(pages, max_per_host=3)


def q_split(spark, sf_dir):
    """Deterministic 98/1/1 train/val/test split over documents."""
    from geojson_vt_spark.operators.webtext import split_df
    return split_df(_docs(spark, sf_dir))


def q_host_pagerank(spark, sf_dir):
    """Damped PageRank (5 rounds, int64 micro-units) over the
    deterministic 50-host link graph derived from documents."""
    from geojson_vt_spark.operators.graph import (host_edges_from_docs,
                                                  pagerank_df)
    return pagerank_df(host_edges_from_docs(_docs(spark, sf_dir)))


def q_semdedup(spark, sf_dir):
    """SemDeDup over the embeddings table: 16 deterministic clusters,
    drop-on-cosine>=0.5-to-a-lower-id-cluster-mate."""
    from geojson_vt_spark.operators.similarity import semdedup_df
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semdedup_df(emb, threshold=0.5, n_clusters=16)


_BM25_QUERIES = [("q1", "fast hash join"), ("q2", "window agg sort"),
                 ("q3", "stream batch spark table"),
                 ("q4", "slow scan customer")]


def q_bm25_topk(spark, sf_dir):
    """Okapi-BM25 top-5 documents per query for four literal queries
    over the documents table (Lucene idf variant, integer-micro-unit
    score sums for cross-engine determinism)."""
    from geojson_vt_spark.operators.search import bm25_topk_df
    qdf = spark.createDataFrame(_BM25_QUERIES,
                                "query_id string, qtext string")
    return bm25_topk_df(_docs(spark, sf_dir), qdf, k=5)


def q_sessionize(spark, sf_dir):
    """Gap-based (30 min) session assignment over the events table."""
    from geojson_vt_spark.operators.sessions import sessionize_df
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize_df(ev, gap_minutes=30)


def q_session_stats(spark, sf_dir):
    """Per-session roll-up (count, integer-microsecond duration,
    integer-cent value sum) at a 30-minute gap."""
    from geojson_vt_spark.operators.sessions import session_stats_df
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats_df(ev, gap_minutes=30)


def q_asof_join(spark, sf_dir):
    """As-of join: for every click event, the same user's most recent
    purchase at or before it (integer-microsecond timestamps, integer
    cents) — union-tag + carry-forward window, one shuffle, never a
    range blowup.  Oracle: DuckDB's native ASOF LEFT JOIN, a genuinely
    independent implementation of the same semantics."""
    from pyspark.sql import functions as F
    from geojson_vt_spark.operators.temporal import asof_join_df
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probe = ev.filter(F.col("event_type") == "click")
    build = (ev.filter(F.col("event_type") == "purchase")
             .withColumn("value_cents",
                         F.round(F.col("value") * 100).cast("long")))
    return asof_join_df(probe, build, on="user_id", ts_col="ts",
                        probe_cols=("event_id",),
                        build_values=("value_cents",))


def q_range_join(spark, sf_dir):
    """Interval join of event values (integer cents) against 20
    OVERLAPPING bands [i*2500, i*2500+4000) — bucket-decomposed
    equi-join + exact refine, each pair meets in exactly one bucket.
    Oracle: DuckDB's native inequality (IE) join."""
    from pyspark.sql import functions as F
    from geojson_vt_spark.operators.temporal import range_join_df
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    points = ev.select(
        "event_id", F.round(F.col("value") * 100).cast("long")
        .alias("v_cents"))
    ranges = spark.range(0, 20).select(
        F.col("id").alias("range_id"),
        (F.col("id") * 2500).alias("lo_cents"),
        (F.col("id") * 2500 + 4000).alias("hi_cents"))
    return (range_join_df(points, ranges, "v_cents",
                          "lo_cents", "hi_cents", bucket_width=2500)
            .select("event_id", "v_cents", "range_id",
                    "lo_cents", "hi_cents"))


def q_image_ahash(spark, sf_dir):
    """Perceptual average-hash + exact-hash dedup over the fake-decoded
    asset grid (keep-lowest rule)."""
    from geojson_vt_spark.operators.multimodal import (ahash_dedup_df,
                                                       assets_from_documents)
    return ahash_dedup_df(assets_from_documents(_docs(spark, sf_dir)))


def q_ahash_near_dup(spark, sf_dir):
    """Hamming-radius perceptual near-dup pairs over the asset grid
    with planted clones (every 7th document re-ingested under
    asset_id + 1000000, so exact-hash pairs exist alongside the random
    16-bit-band collisions)."""
    from geojson_vt_spark.operators.multimodal import (
        ahash_near_dup_pairs, assets_from_documents)
    d = _docs(spark, sf_dir)
    clones = (d.where(F.col("doc_id") % 7 == 0)
              .select((F.col("doc_id") + 1000000).alias("doc_id"), "text",
                      "lang", "source", "n_chars"))
    return ahash_near_dup_pairs(
        assets_from_documents(d.unionByName(clones)))


def q_bbox_join(spark, sf_dir):
    """Rectangle-overlap self-join over deterministic boxes around the
    jittered event points (PBSM grid join vs the oracle's O(n²)
    inequality join)."""
    from geojson_vt_spark.operators.spatial_join import bbox_overlap_join
    pid = F.col("point_id")
    boxes = _events_points(spark, sf_dir).select(
        pid.alias("id"),
        (F.col("lon") - (pid % 23 + 1) / 20.0).alias("xmin"),
        (F.col("lat") - (pid % 17 + 1) / 20.0).alias("ymin"),
        (F.col("lon") + (pid % 23 + 1) / 20.0).alias("xmax"),
        (F.col("lat") + (pid % 17 + 1) / 20.0).alias("ymax"))
    return bbox_overlap_join(boxes, cell=4.0)


def q_lm_score(spark, sf_dir):
    """CCNet-style unigram-LM perplexity scoring with head/middle/tail
    tercile buckets (exact terciles so the oracle's quantile_cont cuts
    at identical doubles)."""
    from geojson_vt_spark.operators.webtext import lm_score_df
    return lm_score_df(_docs(spark, sf_dir), exact_terciles=True)


def q_extract_links(spark, sf_dir):
    """Real <a href> extraction from the html BYTES of the
    SQL-constructible page bridge (decode → regexp_extract_all →
    posexplode, pure codegen).  The oracle reconstructs the expected
    link set from the bridge's integer link rule — an independent
    derivation path, so the gate verifies the parse end to end."""
    from geojson_vt_spark.operators.webgraph import extract_links_df
    from geojson_vt_spark.sources.corpus import html_pages_from_documents
    return extract_links_df(html_pages_from_documents(_docs(spark, sf_dir)))


def q_link_graph(spark, sf_dir):
    """Directed host graph aggregated from the extracted links —
    the real-crawl edge table pagerank_df consumes (one slim-key
    exchange over (src_host, dst_host))."""
    from geojson_vt_spark.operators.webgraph import (extract_links_df,
                                                     host_link_graph_df)
    from geojson_vt_spark.sources.corpus import html_pages_from_documents
    return host_link_graph_df(extract_links_df(
        html_pages_from_documents(_docs(spark, sf_dir))))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering note (round 5): the driver's CORRECTNESS snapshot checks the
    # FIRST 50 entries only.  The 19 entries that have never had a
    # driver-green row (they were appended after the window filled in r03)
    # are therefore listed first this round; the 31 slots that remain go to
    # previously-green rows, and the 19 oldest driver-green entries
    # (two consecutive green rounds in CORRECTNESS_r03/r04) rotate out of
    # the window — they stay fully covered by tests/test_entry_contract.py,
    # which runs every entry against its DuckDB oracle with driver-style
    # typed value hashing.
    return {
        # --- never-driver-verified (round-4 verdict task #1) ---
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "extract_links": q_extract_links,
        "link_graph": q_link_graph,
        "host_pagerank": q_host_pagerank,
        "semdedup": q_semdedup,
        "bm25_topk": q_bm25_topk,
        "sessionize": q_sessionize,
        "session_stats": q_session_stats,
        "domain_cap": q_domain_cap,
        "train_val_split": q_split,
        "mixture_sample": q_mixture_sample,
        "substring_dedup": q_substring_dedup,
        "quality_classifier": q_quality_classifier,
        "lm_score": q_lm_score,
        "bbox_join": q_bbox_join,
        "image_ahash": q_image_ahash,
        "ahash_near_dup": q_ahash_near_dup,
        # rows-only (full geometry-kernel pyramid; pinned byte-identical
        # to the reference by the golden-fixture pytest suite):
        "pyramid_tiles": q_pyramid_tiles,
        # --- driver-green in r03+r04, kept inside the window ---
        "mercator_project": q_mercator_project,
        "tile_assign": q_tile_assign,
        "tile_id_pack": q_tile_id_pack,
        "wrap_x": q_wrap_x,
        "bbox_agg": q_bbox_agg,
        "tile_stats": q_tile_stats,
        "tiny_ring_filter": q_tiny_ring_filter,
        "stripe_classify": q_stripe_classify,
        "zoom_tile_counts": q_zoom_tile_counts,
        "pip_join": q_pip_join,
        "knn_join": q_knn_join,
        "raster_overlay": q_raster_overlay,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "near_dup_clusters": q_near_dup_clusters,
        "token_count": q_token_count,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "winnow_fingerprint": q_winnow_fingerprint,
        "cosine_topk": q_cosine_topk,
        "embedding_pairs_exact": q_embedding_pairs_exact,
        "embedding_near_dup": q_embedding_near_dup,
        "events_window": q_events_window,
        "minhash_dedup": q_minhash_dedup,
        "simhash_pairs": q_simhash_pairs,
        "ann_ivf": q_ann_ivf,
        "ann_lsh": q_ann_lsh,
        "corpus_extract": q_corpus_extract,
        "multimodal_features": q_multimodal_features,
        "multimodal_resize": q_multimodal_resize,
        # --- driver-green in r03+r04, rotated past the 50-row window;
        #     still oracle-verified every run by test_entry_contract.py ---
        "frame_sample": q_frame_sample,
        "url_dedup": q_url_dedup,
        "latest_capture": q_latest_capture,
        "hilbert_cell": q_hilbert_cell,
        "gopher_quality": q_gopher_quality,
        "corpus_profile": q_corpus_profile,
        "incremental_dedup": q_incremental_dedup,
        "topk_ngrams": q_topk_ngrams,
        "events_rollup": q_events_rollup,
        "chunk_documents": q_chunk_documents,
        "nb_train": q_nb_train,
        "nb_classify": q_nb_classify,
        "decontaminate": q_decontaminate,
        "tfidf_topterms": q_tfidf_topterms,
        "pii_redact": q_pii_redact,
        "paragraph_dedup": q_paragraph_dedup,
        "domain_stats": q_domain_stats,
        "c4_line_filter": q_c4_line_filter,
        "pack_sequences": q_pack_sequences,
    }


# --------------------------------------------------------------- oracles

# shared CTE body for the Naive-Bayes oracles: Laplace-smoothed
# multinomial model over the doc_id % 3 != 0 train split (micro-unit
# int64 log-probs, the bm25 determinism rule)
_NB_MODEL_CTE = """
            tr AS (SELECT * FROM documents WHERE doc_id % 3 != 0),
            trt AS (SELECT label, term FROM (
                        SELECT lang AS label,
                               unnest(string_split_regex(
                                   trim(lower(text)), '\\s+')) AS term
                        FROM tr) u
                    WHERE term != ''),
            ct AS (SELECT label, term, count(*) AS n_tc
                   FROM trt GROUP BY 1, 2),
            tot AS (SELECT label, sum(n_tc) AS n_c FROM ct GROUP BY 1),
            v AS (SELECT count(DISTINCT term) AS v FROM ct),
            model AS (SELECT label, term, n_tc,
                             CAST(round(ln((n_tc + 1.0) / (n_c + v)) * 1e6)
                                  AS BIGINT) AS lp
                      FROM ct JOIN tot USING (label) CROSS JOIN v),
            dc AS (SELECT lang AS label, count(*) AS nd FROM tr GROUP BY 1),
            n AS (SELECT count(*) AS n FROM tr),
            classes AS (SELECT label,
                               CAST(round(ln(nd * 1.0 / n) * 1e6)
                                    AS BIGINT) AS prior,
                               CASE WHEN coalesce(n_c, 0) + v > 0
                                    THEN CAST(round(ln(1.0 /
                                        (coalesce(n_c, 0) + v)) * 1e6)
                                        AS BIGINT)
                                    ELSE 0 END AS def_lp
                        FROM dc LEFT JOIN tot USING (label)
                        CROSS JOIN v CROSS JOIN n)"""

_PX = _PROJ_X_SQL.format(lon="lon")
_PY = _PROJ_Y_SQL.format(lat="lat")
_TX8 = f"least(greatest(CAST(floor(({_PX}) * 256) AS BIGINT), 0), 255)"
_TY8 = f"least(greatest(CAST(floor(({_PY}) * 256) AS BIGINT), 0), 255)"
_TX6 = f"least(greatest(CAST(floor(({_PX}) * 64) AS BIGINT), 0), 63)"
_TY6 = f"least(greatest(CAST(floor(({_PY}) * 64) AS BIGINT), 0), 63)"
_TX5 = f"least(greatest(CAST(floor(({_PX}) * 32) AS BIGINT), 0), 31)"
_TY5 = f"least(greatest(CAST(floor(({_PY}) * 32) AS BIGINT), 0), 31)"
_TX10 = f"least(greatest(CAST(floor(({_PX}) * 1024) AS BIGINT), 0), 1023)"
_TY10 = f"least(greatest(CAST(floor(({_PY}) * 1024) AS BIGINT), 0), 1023)"

_EN_STOP = "'the','a','and','of','to','in','is','it','that','for'"
_LANG_LISTS = {
    "de": "'der','die','das','und','ist','ein','zu','mit','von','nicht'",
    "en": _EN_STOP,
    "es": "'el','la','de','que','y','en','un','por','con','para'",
    "fr": "'le','la','et','les','des','est','un','une','dans','pour'",
}


def _lang_hits(lang: str) -> str:
    return (f"len(list_filter(string_split(trim(lower(text)), ' '), "
            f"t -> t IN ({_LANG_LISTS[lang]})))")


# md5 hex → first-60-bit int64 (DuckDB side of operators.dedup._md5_int_col)
def _md5i(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _cos_sql(a: str, b: str, nd: int) -> str:
    return (f"round(list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b}))), {nd})")


def _minhash_oracle() -> str:
    """DuckDB twin of minhash_lsh_pairs(hash_fn='md5', bucket_cap=_MH_CAP,
    threshold=_MH_THRESHOLD): same shingles, same md5-derived slot
    hashes, same (a·h+b) mod M minima, same band buckets, same cap."""
    from geojson_vt_spark.operators.dedup import _MERSENNE, _hash_params
    a, b = _hash_params(32, seed=42)
    slots = ",\n        ".join(
        f"list_min(list_transform(hv, h -> ({int(a[j])} * h + {int(b[j])})"
        f" % {_MERSENNE}))" for j in range(32))
    return f"""
        WITH toks AS (
            SELECT doc_id AS id, string_split(trim(lower(text)), ' ') AS t
            FROM documents),
        shl AS (
            SELECT id, list_distinct(list_transform(
                range(1, greatest(len(t) - 2, 1) + 1),
                i -> array_to_string(t[i:i+2], ' '))) AS sh
            FROM toks),
        hs AS (
            SELECT id, sh,
                   list_transform(sh, s -> {_md5i('s')} % {_MERSENNE}) AS hv
            FROM shl WHERE len(sh) > 0),
        sig AS (SELECT id, sh, [{slots}] AS sig FROM hs),
        bnd AS (
            SELECT id, bd.b AS band,
                   {_md5i("array_to_string(sig[bd.b*4+1 : bd.b*4+4], ',')")}
                       AS bucket
            FROM sig, LATERAL (SELECT unnest(range(0, 8)) AS b) bd),
        cap AS (
            SELECT * FROM bnd
            QUALIFY count(*) OVER (PARTITION BY band, bucket) <= {_MH_CAP}),
        cand AS (
            SELECT DISTINCT l.id AS id_a, r.id AS id_b
            FROM cap l JOIN cap r
              ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
        pairs AS (
            SELECT id_a, id_b,
                   len(list_intersect(sa.sh, sb.sh)) AS it,
                   len(sa.sh) + len(sb.sh) AS tot
            FROM cand
            JOIN sig sa ON sa.id = cand.id_a
            JOIN sig sb ON sb.id = cand.id_b)
        SELECT id_a, id_b, round(it / (tot - it), 6) AS jaccard
        FROM pairs WHERE round(it / (tot - it), 6) >= {_MH_THRESHOLD}
    """


def _simhash_oracle() -> str:
    """DuckDB twin of simhash_pairs(hash_fn='md5', bucket_cap=_SH_CAP):
    token bit i from two 32-bit md5 chunks, ±1 sums per bit, sign →
    signature (bit 63 = int64 min), 16-bit band buckets, cap, hamming."""
    tok_bit = ("(CASE WHEN i < 32 "
               "THEN (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) >> i) "
               "ELSE (CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT)"
               " >> (i - 32)) END & 1)")
    return f"""
        WITH toks AS (
            SELECT doc_id AS id, string_split(trim(lower(text)), ' ') AS t
            FROM documents),
        sums AS (
            SELECT id, list_transform(range(0, 64), i ->
                list_sum(list_transform(t, tok ->
                    CASE WHEN {tok_bit} = 1 THEN 1 ELSE -1 END))) AS s
            FROM toks),
        sim AS (
            SELECT id, CAST(list_sum(list_transform(range(0, 64), i ->
                CASE WHEN s[CAST(i AS INT) + 1] > 0 THEN
                    (CASE WHEN i = 63 THEN -9223372036854775808
                          ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END)
                ELSE 0 END)) AS BIGINT) AS sim
            FROM sums),
        bnd AS (
            SELECT id, sim, bd.b AS band,
                   (sim >> (CAST(bd.b AS INT) * 16)) & 65535 AS bucket
            FROM sim, LATERAL (SELECT unnest(range(0, 4)) AS b) bd),
        cap AS (
            SELECT * FROM bnd
            QUALIFY count(*) OVER (PARTITION BY band, bucket) <= {_SH_CAP})
        SELECT DISTINCT l.id AS id_a, r.id AS id_b,
               bit_count(xor(l.sim, r.sim)) AS hamming
        FROM cap l JOIN cap r
          ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
        WHERE bit_count(xor(l.sim, r.sim)) <= {_SH_MAXHAM}
    """


def _ann_lsh_oracle() -> str:
    """DuckDB twin of lsh_topk(query_ids=[0..4], k=5): the 8 hyperplane
    normals (numpy RandomState(7), identical literals) sign-hash every
    vector to a bucket; candidates share the query's bucket; exact
    6dp-rounded rerank inside."""
    import numpy as np
    planes = np.random.RandomState(7).standard_normal((8, 64))
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(x)) for x in planes[p])}]) > 0 "
        f"THEN {1 << p} ELSE 0 END)" for p in range(8))
    return f"""
        WITH base AS (SELECT vec_id AS nbr_id, embedding::DOUBLE[] AS v
                      FROM embeddings),
        bk AS (SELECT nbr_id, v, {terms} AS bucket FROM base),
        q AS (SELECT nbr_id AS query_id, v AS qv, bucket FROM bk
              WHERE nbr_id IN (0, 1, 2, 3, 4)),
        sc AS (SELECT q.query_id, b.nbr_id,
                      {_cos_sql('q.qv', 'b.v', 6)} AS cosine
               FROM q JOIN bk b USING (bucket)
               WHERE b.nbr_id != q.query_id),
        r AS (SELECT query_id, nbr_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, nbr_id) AS rank
              FROM sc)
        SELECT query_id, nbr_id, cosine, rank FROM r WHERE rank <= 5
    """


def _winnow_oracle(k: int = 8, window: int = 4) -> str:
    """DuckDB twin of winnow_fingerprints_df: identical Rabin k-gram
    hashes (mod-reduced per term, one final mod — both engines sum k
    terms < 2^42 in int64) and identical per-window minima."""
    m = (1 << 31) - 1
    pows = [pow(257, j, m) for j in range(k)]
    term = " + ".join(
        f"(CAST(cp[CAST(i + {j} AS INT)] AS BIGINT)"
        f" * {pows[k - 1 - j]}) % {m}" for j in range(k))
    return f"""
        WITH c AS (
            SELECT doc_id, list_transform(range(1, len(text) + 1),
                i -> ascii(substr(text, CAST(i AS INT), 1))) AS cp
            FROM documents),
        h AS (
            SELECT doc_id, list_transform(
                range(1, greatest(len(cp) - {k} + 1, 0) + 1),
                i -> CAST(({term}) % {m} AS BIGINT)) AS hs
            FROM c WHERE len(cp) >= {k}),
        w AS (
            SELECT doc_id, CASE WHEN len(hs) <= {window}
                THEN [list_min(hs)]
                ELSE list_transform(range(1, len(hs) - {window} + 1 + 1),
                    i -> list_min(hs[i:i + {window} - 1])) END AS mins
            FROM h)
        SELECT DISTINCT doc_id, CAST(u.fp AS BIGINT) AS fp
        FROM w, LATERAL (SELECT unnest(mins) AS fp) u
    """


def _ahash_hsh_cte(src: str) -> str:
    """Shared CTE body producing hsh(asset_id, kind, b0, ahash) from a
    (asset_id, text) source — the DuckDB replay of ahash_df over
    assets_from_documents: the fake decoder's pixel grid is
    sha256(text) repeated 4×, so the grid mean is sum(d)/32 and every
    32-bit band / every 4-byte hex block repeats the first one (bit i
    thresholds byte i mod 32)."""
    d = [f"CAST('0x' || substr(h, {2*j+1}, 2) AS BIGINT)" for j in range(32)]
    mean = "((" + " + ".join(d) + ") / 32.0)"
    band = " + ".join(
        f"(CASE WHEN {d[t]} > m THEN {1 << (31 - t)} ELSE 0 END)"
        for t in range(32))
    byte = [" + ".join(
        f"(CASE WHEN {d[8*mm+u]} > m THEN {1 << (7 - u)} ELSE 0 END)"
        for u in range(8)) for mm in range(4)]
    hexes = " || ".join(f"printf('%02x', {b})" for b in byte)
    return f"""
        a AS (SELECT asset_id,
                     CASE CAST(asset_id % 3 AS INT) WHEN 0 THEN 'image'
                          WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     sha256(text) AS h
              FROM ({src})),
        m AS (SELECT asset_id, kind, h, {mean} AS m FROM a),
        hsh AS (SELECT asset_id, kind, CAST({band} AS BIGINT) AS b0,
                       repeat({hexes}, 4) AS ahash
                FROM m)"""


def _ahash_oracle() -> str:
    """DuckDB twin of ahash_dedup_df over assets_from_documents."""
    return f"""
        WITH {_ahash_hsh_cte("SELECT doc_id AS asset_id, text"
                             " FROM documents")},
        grp AS (SELECT ahash, min(asset_id) AS rep_id
                FROM hsh GROUP BY 1)
        SELECT asset_id, kind, b0, b0 AS b1, b0 AS b2, b0 AS b3, ahash,
               rep_id,
               CAST(asset_id != rep_id AS INT) AS is_dup
        FROM hsh JOIN grp USING (ahash)
    """


def _ahash_near_dup_oracle(max_hamming: int = 8, cap: int = 1000) -> str:
    """DuckDB twin of ahash_near_dup_pairs over documents + planted
    clones (doc_id % 7 == 0 re-ingested as asset_id + 1000000): 16-bit
    chunk bands, capped band join, exact 128-bit hamming verify."""
    src = ("SELECT doc_id AS asset_id, text FROM documents "
           "UNION ALL "
           "SELECT doc_id + 1000000 AS asset_id, text FROM documents "
           "WHERE doc_id % 7 = 0")
    ham = " + ".join(
        f"bit_count(xor(CAST('0x' || substr(l.ahash, {4*j+1}, 4) AS BIGINT),"
        f" CAST('0x' || substr(r.ahash, {4*j+1}, 4) AS BIGINT)))"
        for j in range(8))
    return f"""
        WITH {_ahash_hsh_cte(src)},
        bnd AS (SELECT asset_id AS id, ahash, CAST(b.b AS INT) AS band,
                       CAST('0x' || substr(ahash, CAST(b.b AS INT) * 4 + 1,
                                           4) AS BIGINT) AS bucket
                FROM hsh, LATERAL (SELECT unnest(range(0, 8)) AS b) b),
        cap AS (SELECT * FROM bnd
                QUALIFY count(*) OVER (PARTITION BY band, bucket) <= {cap})
        SELECT DISTINCT l.id AS id_a, r.id AS id_b,
               CAST({ham} AS INT) AS hamming
        FROM cap l JOIN cap r
          ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
        WHERE CAST({ham} AS INT) <= {max_hamming}
    """


def _near_dup_oracle() -> str:
    """DuckDB twin of embedding_near_dup_pairs(threshold=0.5): 12
    hyperplane normals (RandomState(42)), same-bucket candidates,
    exact 6dp cosine verify."""
    import numpy as np
    planes = np.random.RandomState(42).standard_normal((12, 64))
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(x)) for x in planes[p])}]) > 0 "
        f"THEN {1 << p} ELSE 0 END)" for p in range(12))
    return f"""
        WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
                      FROM embeddings),
        bk AS (SELECT id, v, {terms} AS bucket FROM base)
        SELECT l.id AS id_a, r.id AS id_b,
               {_cos_sql('l.v', 'r.v', 6)} AS cosine
        FROM bk l JOIN bk r ON l.bucket = r.bucket AND l.id < r.id
        WHERE {_cos_sql('l.v', 'r.v', 6)} >= 0.5
    """


def _ann_ivf_oracle() -> str:
    """DuckDB twin of ivf_topk(query_ids=[0..4], k=5, C=16, nprobe=4):
    same lowest-id centroids, same 9dp-rounded nearest-centroid argmax,
    same nprobe probe lists, same 6dp-rounded final top-k."""
    return f"""
        WITH base AS (SELECT vec_id AS nbr_id, embedding::DOUBLE[] AS v
                      FROM embeddings),
        cents AS (SELECT nbr_id AS centroid_id, v AS cv
                  FROM base ORDER BY nbr_id LIMIT 16),
        asgx AS (
            SELECT b.nbr_id, b.v, c.centroid_id,
                   row_number() OVER (PARTITION BY b.nbr_id ORDER BY
                       {_cos_sql('b.v', 'c.cv', 9)} DESC, c.centroid_id) AS rk
            FROM base b, cents c),
        asg AS (SELECT nbr_id, v, centroid_id FROM asgx WHERE rk = 1),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
        prx AS (
            SELECT q.query_id, q.qv, c.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id ORDER BY
                       {_cos_sql('q.qv', 'c.cv', 9)} DESC, c.centroid_id) AS rk
            FROM q, cents c),
        pr AS (SELECT query_id, qv, centroid_id FROM prx WHERE rk <= 4),
        sc AS (
            SELECT pr.query_id, a.nbr_id,
                   {_cos_sql('pr.qv', 'a.v', 6)} AS cosine
            FROM pr JOIN asg a USING (centroid_id)
            WHERE a.nbr_id != pr.query_id),
        r AS (SELECT query_id, nbr_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, nbr_id) AS rank
              FROM sc)
        SELECT query_id, nbr_id, cosine, rank FROM r WHERE rank <= 5
    """


def _pagerank_oracle(iters: int = 5) -> str:
    """DuckDB twin of pagerank_df(host_edges_from_docs(docs)): same
    distinct simple graph, same int64 micro-unit recurrence (integer
    division is order-independent), one CTE per round."""
    ctes = ["""
        e AS (SELECT DISTINCT src, dst FROM (
                  SELECT doc_id % 50 AS src, (doc_id*31 + 7) % 50 AS dst
                  FROM documents
                  UNION ALL
                  SELECT doc_id % 50, (doc_id*97 + 3) % 50
                  FROM documents)
              WHERE src != dst),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        outdeg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""
        r{i} AS (
            SELECT n.node,
                   CAST(150000 + (85 * coalesce(s.m, 0)) // 100 AS BIGINT)
                       AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst, SUM(r.rank // o.od) AS m
                FROM e JOIN r{i-1} r ON r.node = e.src
                       JOIN outdeg o ON o.src = e.src
                GROUP BY e.dst) s ON s.dst = n.node)""")
    return ("WITH " + ",".join(ctes) +
            f" SELECT node, rank AS rank_micros FROM r{iters}")


def _semdedup_oracle() -> str:
    """DuckDB twin of semdedup_df(threshold=0.5, n_clusters=16): same
    lowest-id centroids, same 9dp-rounded nearest-centroid argmax
    (ann_ivf's assignment CTE), same 6dp-rounded within-cluster pair
    threshold, same keep-lowest-id survivor rule."""
    return f"""
        WITH base AS (SELECT vec_id AS nbr_id, embedding::DOUBLE[] AS v
                      FROM embeddings),
        cents AS (SELECT nbr_id AS centroid_id, v AS cv
                  FROM base ORDER BY nbr_id LIMIT 16),
        asgx AS (
            SELECT b.nbr_id, b.v, c.centroid_id,
                   row_number() OVER (PARTITION BY b.nbr_id ORDER BY
                       {_cos_sql('b.v', 'c.cv', 9)} DESC, c.centroid_id)
                       AS rk
            FROM base b, cents c),
        asg AS (SELECT nbr_id, v, centroid_id FROM asgx WHERE rk = 1),
        pairs AS (
            SELECT a.nbr_id AS id_a, b.nbr_id AS id_b
            FROM asg a JOIN asg b
              ON a.centroid_id = b.centroid_id AND a.nbr_id < b.nbr_id
            WHERE {_cos_sql('a.v', 'b.v', 6)} >= 0.5),
        losers AS (SELECT id_b, min(id_a) AS dup_of
                   FROM pairs GROUP BY id_b)
        SELECT a.nbr_id AS vec_id, a.centroid_id,
               l.dup_of IS NULL AS keep, l.dup_of
        FROM asg a LEFT JOIN losers l ON l.id_b = a.nbr_id
    """


def oracle_sql() -> dict[str, str]:
    _NGRAM_PAIRS_SELECT = """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(count(*) FILTER (WHERE TRUE)
                         / (sa.n + sb.n - count(*)), 6) AS jaccard
            FROM g a JOIN g b ON a.sh = b.sh AND a.blk = b.blk
                              AND a.doc_id < b.doc_id
            JOIN sizes sa ON sa.doc_id = a.doc_id AND sa.blk = a.blk
            JOIN sizes sb ON sb.doc_id = b.doc_id AND sb.blk = b.blk
            GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
            HAVING round(count(*) / (sa.n + sb.n - count(*)), 6) >= 0.05
    """
    shingle_cte = """
        WITH toks AS (
            SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
            FROM documents
        ), g AS (
            SELECT DISTINCT doc_id, t[1] AS blk,
                   t[gs.i] || ' ' || t[gs.i+1] || ' ' || t[gs.i+2] AS sh
            FROM toks, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i) gs
        ), sizes AS (
            SELECT doc_id, blk, count(*) AS n FROM g GROUP BY doc_id, blk
        )
    """
    return {
        "mercator_project": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT point_id, round({_PX}, 6) AS px, round({_PY}, 6) AS py
            FROM pts
        """,
        "tile_assign": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT {_TX8} AS tx, {_TY8} AS ty, count(*) AS cnt
            FROM pts GROUP BY 1, 2
        """,
        "tile_id_pack": f"""
            WITH pts AS ({_POINTS_SQL}),
            t AS (SELECT point_id, ((256 * {_TY8} + {_TX8}) * 32 + 8) AS tile_id
                  FROM pts)
            SELECT point_id, tile_id,
                   tile_id % 32 AS uz,
                   (tile_id // 32) % 256 AS ux,
                   (tile_id // 32) // 256 AS uy
            FROM t
        """,
        "wrap_x": """
            SELECT event_id, (event_id % 1000 - 500) AS x,
                   (((event_id % 1000 - 500) % 64) + 64) % 64 AS wrapped
            FROM events
        """,
        "bbox_agg": """
            SELECT l_orderkey,
                   round(min(l_extendedprice / 100000.0), 9) AS minx,
                   round(min(l_discount), 9) AS miny,
                   round(max(l_extendedprice / 100000.0), 9) AS maxx,
                   round(max(l_discount), 9) AS maxy,
                   count(*) AS n_rings
            FROM lineitem GROUP BY l_orderkey
        """,
        "tile_stats": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT {_TX6} AS tx, {_TY6} AS ty,
                   count(*) AS num_features,
                   CAST(sum(point_id % 100 + 2) AS BIGINT) AS num_points
            FROM pts GROUP BY 1, 2
        """,
        "tiny_ring_filter": """
            SELECT l_orderkey, l_linenumber,
                   round(l_quantity / 50.0, 9) AS ring_size
            FROM lineitem
            WHERE NOT (CASE WHEN l_linenumber % 2 = 0
                            THEN l_quantity / 50.0 < 0.25
                            ELSE l_quantity / 50.0 < 0.5 END)
        """,
        "stripe_classify": f"""
            WITH pts AS ({_POINTS_SQL}),
            c AS (SELECT CASE
                WHEN lon / 360 + 0.5 - 0.01 >= 0.25
                     AND lon / 360 + 0.5 + 0.01 < 0.75 THEN 'accept'
                WHEN lon / 360 + 0.5 + 0.01 < 0.25
                     OR lon / 360 + 0.5 - 0.01 >= 0.75 THEN 'reject'
                ELSE 'cross' END AS cls FROM pts)
            SELECT cls, count(*) AS n FROM c GROUP BY cls
        """,
        "zoom_tile_counts": f"""
            WITH pts AS ({_POINTS_SQL})
            SELECT 4 AS z, count(DISTINCT ((16 * least(greatest(CAST(floor(({_PY}) * 16) AS BIGINT), 0), 15)
                   + least(greatest(CAST(floor(({_PX}) * 16) AS BIGINT), 0), 15)) * 32 + 4)) AS n_tiles FROM pts
            UNION ALL
            SELECT 6, count(DISTINCT ((64 * {_TY6} + {_TX6}) * 32 + 6)) FROM pts
            UNION ALL
            SELECT 8, count(DISTINCT ((256 * {_TY8} + {_TX8}) * 32 + 8)) FROM pts
        """,
        "pip_join": f"""
            WITH pts AS ({_POINTS_SQL}), rects AS ({_RECTS_SQL})
            SELECT point_id, poly_id
            FROM pts, rects
            WHERE lon > lon0 AND lon < lon1 AND lat > lat0 AND lat < lat1
        """,
        "knn_join": f"""
            WITH pts AS (SELECT point_id, {_PX} AS px, {_PY} AS py
                         FROM ({_POINTS_SQL})),
            qs AS (SELECT point_id AS query_id, px AS qx, py AS qy
                   FROM pts WHERE point_id % 500 = 0),
            d AS (SELECT query_id, point_id,
                         round(sqrt((px - qx) * (px - qx)
                                    + (py - qy) * (py - qy)), 6) AS dist
                  FROM qs, pts),
            r AS (SELECT query_id, point_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY dist, point_id) AS rank
                  FROM d)
            SELECT query_id, point_id, rank FROM r WHERE rank <= 3
        """,
        "raster_overlay": f"""
            WITH rects AS ({_RECTS_SQL}),
            cover AS (
                SELECT poly_id AS vec_id,
                       least(greatest(CAST(floor(({_PROJ_X_SQL.format(lon='lon0')}) * 16) AS BIGINT), 0), 15) AS x0,
                       least(greatest(CAST(floor(({_PROJ_X_SQL.format(lon='lon1')}) * 16) AS BIGINT), 0), 15) AS x1,
                       least(greatest(CAST(floor(({_PROJ_Y_SQL.format(lat='lat0')}) * 16) AS BIGINT), 0), 15) AS y0,
                       least(greatest(CAST(floor(({_PROJ_Y_SQL.format(lat='lat1')}) * 16) AS BIGINT), 0), 15) AS y1
                FROM rects),
            raster AS (SELECT CAST(r % 16 AS INT) AS x, CAST(r // 16 AS INT) AS y
                       FROM range(256) t(r))
            SELECT x, y, vec_id
            FROM raster, cover
            WHERE x BETWEEN least(x0, x1) AND greatest(x0, x1)
              AND y BETWEEN least(y0, y1) AND greatest(y0, y1)
        """,
        "dedup_exact": """
            SELECT md5(text) AS fp, min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "ngram_jaccard": shingle_cte + _NGRAM_PAIRS_SELECT,
        "near_dup_clusters": (
            shingle_cte.replace("WITH toks", "WITH RECURSIVE toks", 1)
            + f""", pairs AS ({_NGRAM_PAIRS_SELECT}
            ), edges AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION
                SELECT id_b AS u, id_a AS v FROM pairs
            ), reach AS (
                SELECT u, v FROM edges
                UNION
                SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            ), mins AS (
                SELECT u, min(v) AS m FROM reach GROUP BY u
            )
            SELECT d.doc_id AS doc_id,
                   least(coalesce(m.m, d.doc_id), d.doc_id) AS rep
            FROM documents d LEFT JOIN mins m ON m.u = d.doc_id
        """),
        "token_count": """
            SELECT doc_id,
                   CASE WHEN len(trim(text)) = 0 THEN 0
                        ELSE len(string_split(trim(text), ' ')) END AS n_tokens
            FROM documents
        """,
        "text_quality": f"""
            WITH t AS (
                SELECT doc_id, len(text) AS n_chars,
                       len(string_split(trim(text), ' ')) AS n_tokens,
                       len(list_filter(string_split(trim(lower(text)), ' '),
                           t -> t IN ({_EN_STOP}))) AS n_stopwords,
                       len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                           AS n_punct
                FROM documents)
            SELECT doc_id, n_chars, n_tokens, n_stopwords, n_punct,
                   round(n_stopwords / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
                   round(n_punct / CAST(greatest(n_chars, 1) AS DOUBLE), 6) AS punct_ratio,
                   round((n_chars - n_tokens + 1) / CAST(n_tokens AS DOUBLE), 6)
                       AS mean_token_len
            FROM t
        """,
        "lang_id": f"""
            WITH h AS (
                SELECT doc_id,
                       {_lang_hits('de')} AS hits_de,
                       {_lang_hits('en')} AS hits_en,
                       {_lang_hits('es')} AS hits_es,
                       {_lang_hits('fr')} AS hits_fr
                FROM documents)
            SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
                   CASE WHEN hits_de = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
                        WHEN hits_en = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
                        WHEN hits_es = greatest(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM h
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS fingerprint
            FROM documents
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
            s AS (SELECT query_id, e.vec_id AS nbr_id,
                         round(list_dot_product(qv, e.embedding::DOUBLE[])
                               / (sqrt(list_dot_product(qv, qv))
                                  * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                          e.embedding::DOUBLE[]))), 6)
                             AS cosine
                  FROM q, embeddings e WHERE e.vec_id != q.query_id),
            r AS (SELECT query_id, nbr_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, nbr_id) AS rank
                  FROM s)
            SELECT query_id, nbr_id, rank FROM r WHERE rank <= 5
        """,
        "embedding_pairs_exact": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings WHERE vec_id < 100)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
            FROM e a, e b
            WHERE a.vec_id < b.vec_id
              AND round(list_dot_product(a.v, b.v)
                        / (sqrt(list_dot_product(a.v, a.v))
                           * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.25
        """,
        "events_window": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   event_type, count(*) AS n,
                   round(sum(value), 3) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "minhash_dedup": _minhash_oracle(),
        "simhash_pairs": _simhash_oracle(),
        "ann_ivf": _ann_ivf_oracle(),
        "host_pagerank": _pagerank_oracle(),
        "semdedup": _semdedup_oracle(),
        "lm_score": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(lower(text)),
                                                 '\\s+')) AS term
                FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY 1, 2),
            vocab AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
            tot AS (SELECT sum(c) AS n_total, count(*) AS v_size
                    FROM vocab),
            nll AS (
                SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                       round(sum(tf * -ln((c + 1.0)
                                          / (n_total + v_size)))
                             / sum(tf), 6) AS nll
                FROM tf JOIN vocab USING (term) CROSS JOIN tot
                GROUP BY doc_id),
            thr AS (SELECT quantile_cont(nll, 1.0/3) AS t1,
                           quantile_cont(nll, 2.0/3) AS t2 FROM nll)
            SELECT doc_id, n_tokens, nll, round(exp(nll), 6) AS ppl,
                   CASE WHEN nll <= t1 THEN 'head'
                        WHEN nll <= t2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM nll CROSS JOIN thr
        """,
        "bbox_join": f"""
            WITH pts AS ({_POINTS_SQL}),
            boxes AS (
                SELECT point_id AS id,
                       lon - (point_id % 23 + 1) / 20.0 AS xmin,
                       lat - (point_id % 17 + 1) / 20.0 AS ymin,
                       lon + (point_id % 23 + 1) / 20.0 AS xmax,
                       lat + (point_id % 17 + 1) / 20.0 AS ymax
                FROM pts)
            SELECT a.id AS id_a, b.id AS id_b,
                   round((least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin))
                         * (least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin)),
                         6) AS inter_area
            FROM boxes a JOIN boxes b
              ON a.id < b.id
             AND a.xmin <= b.xmax AND b.xmin <= a.xmax
             AND a.ymin <= b.ymax AND b.ymin <= a.ymax
        """,
        "image_ahash": _ahash_oracle(),
        "ahash_near_dup": _ahash_near_dup_oracle(),
        "ann_lsh": _ann_lsh_oracle(),
        "embedding_near_dup": _near_dup_oracle(),
        "winnow_fingerprint": _winnow_oracle(),
        "corpus_extract": """
            WITH base AS (
                SELECT doc_id,
                       (doc_id * 37 % 13000) - 6500 AS lat0c,
                       (doc_id * 101 % 35000) - 17500 AS lon0c,
                       50 + doc_id % 73 AS dla,
                       60 + doc_id % 97 AS dlo
                FROM documents)
            SELECT doc_id AS input_ord, p.i AS pt_idx,
                   (CASE p.i WHEN 1 THEN lon0c + dlo WHEN 2 THEN lon0c + dlo
                        ELSE lon0c END) / 100.0 AS lon,
                   (CASE p.i WHEN 2 THEN lat0c + dla WHEN 3 THEN lat0c + dla
                        ELSE lat0c END) / 100.0 AS lat
            FROM base, LATERAL (SELECT unnest(range(0, 5)) AS i) p
        """,
        "multimodal_features": (
            "WITH d AS (SELECT doc_id AS asset_id, "
            "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' "
            "WHEN 1 THEN 'audio' ELSE 'video' END AS kind, "
            "sha256(text) AS h FROM documents) "
            "SELECT asset_id, kind, " + ", ".join(
                f"round(((CAST('0x' || substr(h, {2*j+1}, 2) AS BIGINT) + "
                f"CAST('0x' || substr(h, {2*j+33}, 2) AS BIGINT)) / 2.0) "
                f"/ 255.0, 6) AS f{j:02d}" for j in range(16)) +
            " FROM d"),
        # pooled pixel (ry,rx) of the sha256-derived 8x16 fake grid:
        # rows repeat every 2, so the 2x2 block mean is
        # (d[2rx] + d[2rx+1] + d[16+2rx] + d[16+2rx+1]) / 4 / 255
        "multimodal_resize": """
            WITH d AS (SELECT doc_id AS asset_id, sha256(text) AS h
                       FROM documents),
            g AS (SELECT asset_id, h, CAST(p.ry AS INT) AS ry,
                         CAST(p.rx AS INT) AS rx
                  FROM d, LATERAL (SELECT r.ry, c.rx
                                   FROM range(0, 4) r(ry),
                                        range(0, 8) c(rx)) p)
            SELECT asset_id, ry, rx,
                   round(((CAST('0x' || substr(h, 4*rx + 1, 2) AS BIGINT)
                         + CAST('0x' || substr(h, 4*rx + 3, 2) AS BIGINT)
                         + CAST('0x' || substr(h, 4*rx + 33, 2) AS BIGINT)
                         + CAST('0x' || substr(h, 4*rx + 35, 2) AS BIGINT))
                        / 4.0) / 255.0, 6) AS value
            FROM g
        """,
        "frame_sample": """
            WITH v AS (
                SELECT doc_id AS asset_id, text,
                       CAST(doc_id % 10000 + 1 AS INT) AS duration_ms
                FROM documents WHERE doc_id % 3 = 2),
            fr AS (
                SELECT asset_id,
                       CAST(s.ts AS BIGINT) AS frame_ts,
                       sha256(text || lpad(lower(to_hex(CAST(s.ts AS BIGINT))),
                                           8, '0')) AS h
                FROM v, LATERAL (SELECT unnest(range(0, CAST(duration_ms
                     AS BIGINT), 2000)) AS ts) s)
            SELECT asset_id, frame_ts,
                   CAST(4 * list_sum(list_transform(range(0, 32), j ->
                       CAST('0x' || substr(h, CAST(j AS INT) * 2 + 1, 2)
                            AS BIGINT))) AS BIGINT) AS frame_digest
            FROM fr
        """,
        # --- webtext curation suite ---
        "url_dedup": f"""
            WITH urls AS (
                SELECT doc_id, {_URL_SYNTH_SQL} AS u FROM documents),
            s1 AS (SELECT doc_id,
                          regexp_replace(regexp_replace(u, '#.*', '', 'g'),
                              '[?&](utm_[A-Za-z0-9_]*|gclid|fbclid|sid|ref)=[^&#]*',
                              '', 'g') AS u
                   FROM urls),
            s2 AS (SELECT doc_id,
                          regexp_replace(u, '^([^?]*)&', '\\1?') AS u
                   FROM s1),
            s3 AS (SELECT doc_id, u,
                          regexp_extract(u, '^[^/]*//[^/]*') AS head
                   FROM s2),
            s4 AS (SELECT doc_id,
                          regexp_replace(regexp_replace(lower(head),
                              '^(https?://)www\\.', '\\1'),
                              ':(443|80)$', '')
                          || substr(u, length(head) + 1) AS u
                   FROM s3),
            canon AS (SELECT doc_id,
                             regexp_replace(u, '[/?&]+$', '') AS canon_url
                      FROM s4)
            SELECT min(canon_url) AS canon_url, min(doc_id) AS keep_id,
                   count(*) AS n_dups
            FROM canon GROUP BY md5(canon_url)
        """,
        "latest_capture": f"""
            WITH urls AS (
                SELECT doc_id, {_URL_SYNTH_SQL} AS u,
                       1704067200 + (doc_id * 37 % 100000) AS ts
                FROM documents),
            s1 AS (SELECT doc_id, ts,
                          regexp_replace(regexp_replace(u, '#.*', '', 'g'),
                              '[?&](utm_[A-Za-z0-9_]*|gclid|fbclid|sid|ref)=[^&#]*',
                              '', 'g') AS u
                   FROM urls),
            s2 AS (SELECT doc_id, ts,
                          regexp_replace(u, '^([^?]*)&', '\\1?') AS u
                   FROM s1),
            s3 AS (SELECT doc_id, ts, u,
                          regexp_extract(u, '^[^/]*//[^/]*') AS head
                   FROM s2),
            s4 AS (SELECT doc_id, ts,
                          regexp_replace(regexp_replace(lower(head),
                              '^(https?://)www\\.', '\\1'),
                              ':(443|80)$', '')
                          || substr(u, length(head) + 1) AS u
                   FROM s3),
            canon AS (SELECT doc_id, ts,
                             regexp_replace(u, '[/?&]+$', '') AS canon_url
                      FROM s4),
            grp AS (SELECT md5(canon_url) AS h, min(canon_url) AS canon_url,
                           count(*) AS n_captures
                    FROM canon GROUP BY 1),
            win AS (SELECT md5(canon_url) AS h, doc_id,
                           row_number() OVER (PARTITION BY md5(canon_url)
                               ORDER BY ts DESC, doc_id DESC) AS rn
                    FROM canon)
            SELECT g.canon_url, w.doc_id AS keep_id, g.n_captures
            FROM grp g JOIN win w ON w.h = g.h AND w.rn = 1
        """,
        "hilbert_cell": __import__(
            "geojson_vt_spark.functions.hilbert",
            fromlist=["hilbert_sql"]).hilbert_sql(
                10, _TX10, _TY10, f"({_POINTS_SQL})",
                carry_cols="point_id"),
        "gopher_quality": """
            WITH base AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS w,
                       length(regexp_replace(text, '\\s+', '', 'g')) AS nc
                FROM documents),
            shape AS (
                SELECT doc_id, len(w) AS n_words,
                       nc / greatest(len(w), 1) AS mwl,
                       len(list_filter(w,
                           t -> regexp_matches(t, '[A-Za-z]')))
                           / greatest(len(w), 1) AS alpha,
                       list_transform(range(len(w) - 1),
                           i -> w[i+1] || ' ' || w[i+2]) AS g2,
                       list_transform(range(len(w) - 2),
                           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS g3
                FROM base),
            c2 AS (SELECT doc_id, g, count(*) AS c
                   FROM (SELECT doc_id, unnest(g2) AS g FROM shape)
                   GROUP BY 1, 2),
            top2 AS (SELECT doc_id, max(c) / sum(c) AS v FROM c2 GROUP BY 1),
            c3 AS (SELECT doc_id, g, count(*) AS c
                   FROM (SELECT doc_id, unnest(g3) AS g FROM shape)
                   GROUP BY 1, 2),
            dup3 AS (SELECT doc_id,
                            sum(CASE WHEN c > 1 THEN c ELSE 0 END) / sum(c) AS v
                     FROM c3 GROUP BY 1)
            SELECT s.doc_id, s.n_words,
                   round(s.mwl, 6) AS mean_word_len,
                   round(s.alpha, 6) AS alpha_word_frac,
                   round(coalesce(t.v, 0.0), 6) AS top_bigram_frac,
                   round(coalesce(d.v, 0.0), 6) AS dup_trigram_frac,
                   CAST(s.n_words >= 10 AND s.n_words <= 100000
                        AND s.mwl >= 2.0 AND s.mwl <= 12.0
                        AND s.alpha >= 0.6
                        AND coalesce(t.v, 0.0) <= 0.30
                        AND coalesce(d.v, 0.0) <= 0.60 AS INT) AS keep
            FROM shape s
            LEFT JOIN top2 t ON t.doc_id = s.doc_id
            LEFT JOIN dup3 d ON d.doc_id = s.doc_id
        """,
        "decontaminate": """
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS w
                FROM documents),
            grams AS (
                SELECT doc_id,
                       unnest(list_transform(range(len(w) - 7),
                           i -> array_to_string(w[i+1:i+8], ' '))) AS g
                FROM toks),
            bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
            dirty AS (SELECT DISTINCT doc_id FROM grams
                      WHERE g IN (SELECT g FROM bg))
            SELECT doc_id, length(text) AS n_chars
            FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
        """,
        "pii_redact": """
            WITH messy AS (
                SELECT doc_id,
                       text
                       || (CASE WHEN doc_id % 4 = 0
                           THEN ' Contact user' || CAST(doc_id % 50 AS VARCHAR)
                                || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                                || '.example.com now' ELSE '' END)
                       || (CASE WHEN doc_id % 3 = 0
                           THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                                || '.' || CAST(doc_id % 254 + 1 AS VARCHAR)
                           ELSE '' END)
                       || (CASE WHEN doc_id % 5 = 0
                           THEN ' call +1 (555) 010-'
                                || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                           ELSE '' END) AS t
                FROM documents),
            s1 AS (SELECT doc_id,
                          len(regexp_extract_all(t,
                              '[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+'))
                              AS n_emails,
                          regexp_replace(t,
                              '[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+',
                              '<EMAIL>', 'g') AS t
                   FROM messy),
            s2 AS (SELECT doc_id, n_emails,
                          len(regexp_extract_all(t,
                              '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS n_ips,
                          regexp_replace(t,
                              '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b',
                              '<IP>', 'g') AS t
                   FROM s1),
            s3 AS (SELECT doc_id, n_emails, n_ips,
                          len(regexp_extract_all(t,
                              '\\+?[0-9][0-9().\\- ]{7,}[0-9]')) AS n_phones,
                          regexp_replace(t,
                              '\\+?[0-9][0-9().\\- ]{7,}[0-9]',
                              '<PHONE>', 'g') AS t
                   FROM s2)
            SELECT doc_id, n_emails, n_ips, n_phones, md5(t) AS redacted_md5
            FROM s3
        """,
        "tfidf_topterms": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\\s+')) AS term
                FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY 1, 2),
            dfq AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS c FROM documents),
            scored AS (
                SELECT t.doc_id, t.term, t.tf,
                       round(t.tf * (ln((1.0 + (SELECT c FROM n))
                                        / (1.0 + d.df)) + 1.0), 6) AS score
                FROM tf t JOIN dfq d ON d.term = t.term),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY score DESC, term ASC) AS rank
                FROM scored)
            SELECT doc_id, term, tf, score, rank
            FROM ranked WHERE rank <= 3
        """,
        "paragraph_dedup": """
            WITH base AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS w
                FROM documents),
            synth AS (
                SELECT doc_id,
                       'accept cookies policy variant '
                       || CAST(doc_id % 7 AS VARCHAR) || chr(10)
                       || array_to_string(list_transform(
                              range(0, greatest(
                                  CAST(ceil(len(w) / 20.0) AS INT), 1)),
                              i -> array_to_string(
                                  w[i*20+1 : i*20+20], ' ')), chr(10))
                       || (CASE WHEN doc_id % 3 = 0
                           THEN chr(10) || 'all rights reserved variant '
                                || CAST(doc_id % 5 AS VARCHAR)
                           ELSE '' END) AS t
                FROM base),
            sp AS (SELECT doc_id, string_split(t, chr(10)) AS ps
                   FROM synth),
            paras AS (
                SELECT doc_id, i - 1 AS idx, ps[i] AS para
                FROM sp,
                     LATERAL (SELECT unnest(range(1, len(ps) + 1)) AS i) ii),
            win AS (
                SELECT doc_id, idx, para, row_number() OVER (
                    PARTITION BY md5(para) ORDER BY doc_id, idx) AS rn
                FROM paras),
            kept AS (
                SELECT doc_id, count(*) AS n_kept,
                       md5(string_agg(para, chr(10) ORDER BY idx))
                           AS kept_md5
                FROM win WHERE rn = 1 GROUP BY doc_id)
            SELECT s.doc_id, len(s.ps) AS n_paras,
                   coalesce(k.n_kept, 0) AS n_kept,
                   coalesce(k.kept_md5, md5('')) AS kept_md5
            FROM sp s LEFT JOIN kept k USING (doc_id)
        """,
        "chunk_documents": """
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS w
                FROM documents),
            n AS (SELECT doc_id, w,
                         greatest(1, CAST(ceil((len(w) - 128) / 96.0)
                                          AS BIGINT) + 1) AS nc
                  FROM toks)
            SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
                   CAST(len(w[u.i*96+1 : u.i*96+128]) AS BIGINT)
                       AS n_tokens,
                   array_to_string(w[u.i*96+1 : u.i*96+128], ' ')
                       AS chunk_text
            FROM n, LATERAL (SELECT unnest(range(0, nc)) AS i) u
        """,
        "events_rollup": """
            SELECT event_type,
                   strftime(date_trunc('month', ts), '%Y-%m') AS month,
                   count(*) AS n_events,
                   round(sum(CAST(round(value * 1e6) AS BIGINT)) / 1e6, 6)
                       AS total_value
            FROM events
            GROUP BY ROLLUP (event_type, month)
        """,
        "topk_ngrams": """
            WITH toks AS (
                SELECT string_split_regex(trim(text), '\\s+') AS w
                FROM documents),
            grams AS (
                SELECT unnest(list_transform(range(len(w) - 1),
                    i -> array_to_string(w[i+1:i+2], ' '))) AS gram
                FROM toks),
            c AS (SELECT gram, count(*) AS n_occurrences
                  FROM grams GROUP BY 1)
            SELECT gram, n_occurrences FROM c
            ORDER BY n_occurrences DESC, gram ASC LIMIT 50
        """,
        "nb_train": f"""
            WITH {_NB_MODEL_CTE}
            SELECT label, term, n_tc, lp FROM model
        """,
        "nb_classify": f"""
            WITH {_NB_MODEL_CTE},
            te AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
            tet AS (SELECT doc_id, term, count(*) AS tf FROM (
                        SELECT doc_id,
                               unnest(string_split_regex(
                                   trim(lower(text)), '\\s+')) AS term
                        FROM te) u
                    WHERE term != '' GROUP BY 1, 2),
            sc AS (SELECT t.doc_id, c.label,
                          sum(t.tf * coalesce(m.lp, c.def_lp))
                              + any_value(c.prior) AS s
                   FROM tet t CROSS JOIN classes c
                   LEFT JOIN model m
                     ON m.term = t.term AND m.label = c.label
                   GROUP BY 1, 2),
            pred AS (SELECT doc_id, label, s,
                            row_number() OVER (PARTITION BY doc_id
                                ORDER BY s DESC, label ASC) AS rn
                     FROM sc)
            SELECT p.doc_id, p.label AS pred,
                   round(p.s / 1e6, 6) AS nb_logprob,
                   CAST(p.label = d.lang AS INT) AS correct
            FROM pred p JOIN te d USING (doc_id)
            WHERE p.rn = 1
        """,
        "corpus_profile": """
            SELECT lang, source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(min(n_chars) AS BIGINT) AS min_chars,
                   round(quantile_cont(n_chars, 0.25), 6) AS p25_chars,
                   round(quantile_cont(n_chars, 0.5), 6) AS median_chars,
                   round(quantile_cont(n_chars, 0.75), 6) AS p75_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars,
                   round(avg(n_chars), 6) AS avg_chars
            FROM documents GROUP BY 1, 2
        """,
        "incremental_dedup": """
            WITH fp AS (
                SELECT doc_id,
                       md5(array_to_string(
                           regexp_split_to_array(text, '\\s+')[1:8], ' '))
                       AS fp,
                       doc_id % 5 = 0 AS inc
                FROM documents),
            base AS (SELECT DISTINCT fp FROM fp WHERE NOT inc),
            i AS (SELECT doc_id, fp FROM fp WHERE inc),
            f AS (SELECT fp, min(doc_id) AS first_id FROM i GROUP BY 1)
            SELECT i.doc_id, i.fp,
                   CASE WHEN b.fp IS NULL THEN 0 ELSE 1 END AS in_base,
                   CAST(b.fp IS NULL AND i.doc_id = f.first_id AS INT)
                       AS keep
            FROM i LEFT JOIN base b USING (fp) JOIN f USING (fp)
        """,
        "domain_stats": f"""
            WITH urls AS (
                SELECT doc_id, {_URL_SYNTH_SQL} AS u, text FROM documents),
            s1 AS (SELECT doc_id,
                          regexp_replace(regexp_replace(u, '#.*', '', 'g'),
                              '[?&](utm_[A-Za-z0-9_]*|gclid|fbclid|sid|ref)=[^&#]*',
                              '', 'g') AS u, text
                   FROM urls),
            s2 AS (SELECT doc_id,
                          regexp_replace(u, '^([^?]*)&', '\\1?') AS u, text
                   FROM s1),
            s3 AS (SELECT doc_id, u,
                          regexp_extract(u, '^[^/]*//[^/]*') AS head, text
                   FROM s2),
            s4 AS (SELECT doc_id,
                          regexp_replace(regexp_replace(lower(head),
                              '^(https?://)www\\.', '\\1'),
                              ':(443|80)$', '')
                          || substr(u, length(head) + 1) AS u, text
                   FROM s3),
            canon AS (SELECT doc_id,
                             regexp_replace(u, '[/?&]+$', '') AS cu, text
                      FROM s4),
            slim AS (SELECT
                         regexp_extract(cu, '^[^/]*//([^/:]+)', 1) AS host,
                         md5(regexp_replace(cu, '^[^/]*//[^/]*', '')) AS p,
                         length(text) AS nc,
                         len(string_split_regex(trim(text), '\\s+')) AS nw
                     FROM canon)
            SELECT host, count(*) AS n_pages,
                   count(DISTINCT p) AS n_unique_paths,
                   CAST(sum(nc) AS BIGINT) AS total_chars,
                   CAST(sum(nw) * 1000000 // count(*) AS BIGINT)
                       AS avg_doc_words_micro
            FROM slim GROUP BY host
        """,
        "c4_line_filter": """
            WITH base AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS w
                FROM documents),
            synth AS (
                SELECT doc_id,
                       array_to_string(list_transform(
                           range(0, greatest(
                               CAST(ceil(len(w) / 12.0) AS INT), 1)),
                           i -> array_to_string(w[i*12+1 : i*12+12], ' ')
                                || list_extract(['.', '!', '?', ''],
                                       CAST((doc_id + i) % 4 + 1 AS INT))),
                           chr(10))
                       || (CASE WHEN doc_id % 2 = 0 THEN chr(10) ||
                           'This site uses cookie tracking technology today.'
                           ELSE '' END)
                       || (CASE WHEN doc_id % 11 = 0
                           THEN chr(10) || 'function() {' ELSE '' END) AS t
                FROM base),
            l AS (SELECT doc_id, t, string_split(t, chr(10)) AS ls
                  FROM synth),
            k AS (SELECT doc_id, ls,
                         list_filter(ls, x ->
                             len(string_split_regex(trim(x), '\\s+')) >= 5
                             AND regexp_matches(x, '[.!?"]\\s*$')
                             AND NOT contains(lower(x), 'javascript')
                             AND NOT contains(lower(x), 'cookie')
                             AND NOT contains(lower(x), 'lorem ipsum'))
                             AS kept,
                         contains(t, '{') AS brace
                  FROM l)
            SELECT doc_id, len(ls) AS n_lines, len(kept) AS n_kept_lines,
                   CAST((len(kept) >= 3 AND NOT brace) AS INT) AS keep_doc,
                   md5(coalesce(array_to_string(kept, chr(10)), '')) AS kept_md5
            FROM k
        """,
        "pack_sequences": """
            WITH slim AS (
                SELECT doc_id, doc_id % 8 AS shard,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+'))
                       END AS n_tokens
                FROM documents),
            cum AS (
                SELECT *, CAST(sum(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS a
                FROM slim)
            SELECT doc_id, shard, n_tokens,
                   CAST((a - n_tokens) // 256 AS BIGINT) AS first_seq,
                   CAST(CASE WHEN n_tokens > 0 THEN (a - 1) // 256
                        ELSE (a - n_tokens) // 256 END AS BIGINT)
                       AS last_seq,
                   CAST((a - n_tokens) % 256 AS BIGINT) AS offset_in_seq
            FROM cum
        """,
        "mixture_sample": """
            WITH cnt AS (
                SELECT lang, count(*) AS n FROM documents
                WHERE lang IN ('de','en','es','fr','zh') GROUP BY lang),
            sc AS (SELECT lang, n, n * 100 AS nw,
                          CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20
                               WHEN 'es' THEN 15 WHEN 'fr' THEN 10
                               ELSE 5 END AS w
                   FROM cnt),
            rt AS (SELECT lang,
                          ((w * (SELECT min(nw // w) FROM sc)) // 100)
                              * 1000000 // n AS ppm
                   FROM sc)
            SELECT d.doc_id, d.lang AS domain, r.ppm
            FROM documents d JOIN rt r ON r.lang = d.lang
            WHERE CAST('0x' || substr(md5('mix:' ||
                      CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                  % 1000000 < r.ppm
        """,
        "substring_dedup": """
            WITH synth AS (
                SELECT doc_id, text || (CASE WHEN doc_id % 13 < 3
                    THEN ' copy pasta block variant '
                         || CAST(doc_id % 3 AS VARCHAR)
                         || ' alpha beta gamma delta epsilon'
                         || ' zeta eta theta iota kappa'
                    ELSE '' END) AS t
                FROM documents),
            toks AS (SELECT doc_id,
                            string_split_regex(trim(t), '\\s+') AS w
                     FROM synth),
            spans AS (
                SELECT doc_id,
                       md5(array_to_string(w[i*4+1 : i*4+8], ' ')) AS h
                FROM toks,
                     LATERAL (SELECT unnest(range(0,
                         CASE WHEN len(w) >= 8
                              THEN (len(w) - 8) // 4 + 1
                              ELSE 0 END)) AS i) ii),
            occ AS (SELECT h, count(*) AS c FROM spans GROUP BY h),
            pd AS (SELECT s.doc_id, count(*) AS n_spans,
                          sum(CASE WHEN o.c > 1 THEN 1 ELSE 0 END)
                              AS n_dup_spans
                   FROM spans s JOIN occ o USING (h) GROUP BY s.doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(pd.n_spans, 0) AS BIGINT) AS n_spans,
                   CAST(coalesce(pd.n_dup_spans, 0) AS BIGINT)
                       AS n_dup_spans,
                   round(coalesce(pd.n_dup_spans, 0)
                         / greatest(coalesce(pd.n_spans, 0), 1), 6)
                       AS dup_frac,
                   CAST(coalesce(pd.n_dup_spans, 0) * 10 <=
                        coalesce(pd.n_spans, 0) * 3 AS INT) AS keep
            FROM documents d LEFT JOIN pd USING (doc_id)
        """,
        "quality_classifier": """
            WITH tok AS (
                SELECT doc_id, unnest(list_filter(
                    string_split_regex(trim(text), '\\s+'),
                    t -> t <> '')) AS t
                FROM documents),
            wt AS (
                SELECT doc_id,
                       (CAST('0x' || substr(md5('qw:' || CAST(
                            CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)
                            % 1024 AS VARCHAR)), 1, 15) AS BIGINT)
                        % 2000001) - 1000000 AS w
                FROM tok),
            pd AS (SELECT doc_id, count(*) AS n_tokens,
                          CAST(sum(w) AS BIGINT) AS score_sum
                   FROM wt GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(pd.score_sum, 0) AS BIGINT) AS score_sum,
                   round(coalesce(pd.score_sum, 0)
                         / (1e6 * greatest(coalesce(pd.n_tokens, 0), 1)), 6)
                       AS score,
                   CAST(coalesce(pd.score_sum, 0) > 0 AS INT) AS keep
            FROM documents d LEFT JOIN pd USING (doc_id)
        """,
        "domain_cap": f"""
            WITH urls AS (
                SELECT doc_id, {_URL_SYNTH_SQL} AS u FROM documents),
            s1 AS (SELECT doc_id,
                          regexp_replace(regexp_replace(u, '#.*', '', 'g'),
                              '[?&](utm_[A-Za-z0-9_]*|gclid|fbclid|sid|ref)=[^&#]*',
                              '', 'g') AS u
                   FROM urls),
            s2 AS (SELECT doc_id,
                          regexp_replace(u, '^([^?]*)&', '\\1?') AS u
                   FROM s1),
            s3 AS (SELECT doc_id, u,
                          regexp_extract(u, '^[^/]*//[^/]*') AS head
                   FROM s2),
            s4 AS (SELECT doc_id,
                          regexp_replace(regexp_replace(lower(head),
                              '^(https?://)www\\.', '\\1'),
                              ':(443|80)$', '')
                          || substr(u, length(head) + 1) AS u
                   FROM s3),
            canon AS (SELECT doc_id,
                             regexp_replace(u, '[/?&]+$', '') AS cu
                      FROM s4),
            h AS (SELECT doc_id,
                         regexp_extract(cu, '^[^/]*//([^/:]+)', 1) AS host
                  FROM canon),
            r AS (SELECT doc_id, host, row_number() OVER (
                      PARTITION BY host ORDER BY doc_id) AS host_rank
                  FROM h)
            SELECT doc_id, host, host_rank FROM r WHERE host_rank <= 3
        """,
        "train_val_split": """
            WITH b AS (SELECT doc_id,
                              CAST('0x' || substr(md5('split:' ||
                                  CAST(doc_id AS VARCHAR)), 1, 15)
                                  AS BIGINT) % 1000000 AS bucket
                       FROM documents)
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 10000 THEN 'test'
                        WHEN bucket < 990000 THEN 'train'
                        ELSE 'val' END AS split
            FROM b
        """,
        # literals mirror the Spark expression tree operation-for-
        # operation ((1.2 + 1.0), not 2.2) so both engines execute the
        # identical IEEE sequence before the integer-micro-unit round
        "bm25_topk": """
            WITH q(query_id, qtext) AS (VALUES
                ('q1', 'fast hash join'), ('q2', 'window agg sort'),
                ('q3', 'stream batch spark table'),
                ('q4', 'slow scan customer')),
            t2 AS (SELECT doc_id, term FROM (
                       SELECT doc_id, unnest(string_split_regex(
                           trim(text), '\\s+')) AS term FROM documents)
                   WHERE term <> ''),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM t2 GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS dl FROM t2 GROUP BY 1),
            ad AS (SELECT avg(dl) AS avgdl FROM dl),
            n AS (SELECT count(*) AS n FROM documents),
            qt AS (SELECT DISTINCT query_id, term FROM (
                       SELECT query_id, unnest(string_split_regex(
                           trim(qtext), '\\s+')) AS term FROM q)
                   WHERE term <> ''),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            qi AS (SELECT qt.query_id, qt.term,
                          ln(1.0 + (CAST((SELECT n FROM n) AS DOUBLE)
                                    - coalesce(d.df, 0) + 0.5)
                                   / (coalesce(d.df, 0) + 0.5)) AS idf
                   FROM qt LEFT JOIN dfreq d USING (term)),
            c AS (SELECT qi.query_id, tf.doc_id,
                         CAST(round(qi.idf * (tf.tf * (1.2 + 1.0))
                              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75
                                 * dl.dl / (SELECT avgdl FROM ad)))
                              * 1e6) AS BIGINT) AS ci
                  FROM tf JOIN qi USING (term) JOIN dl USING (doc_id)),
            s AS (SELECT query_id, doc_id, CAST(sum(ci) AS BIGINT) AS s
                  FROM c GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY s DESC, doc_id ASC) AS rank
                  FROM s)
            SELECT query_id, doc_id, round(s / 1e6, 6) AS score, rank
            FROM r WHERE rank <= 5
        """,
        "sessionize": """
            WITH w AS (SELECT event_id, user_id, ts,
                              epoch_us(ts) AS us,
                              lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev
                       FROM events),
            t AS (SELECT event_id, user_id, ts,
                         CASE WHEN prev IS NULL
                                   OR us - prev > 1800000000
                              THEN 1 ELSE 0 END AS st
                  FROM w)
            SELECT event_id, user_id,
                   CAST(sum(st) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS BIGINT)
                       AS session_seq,
                   CAST(st AS BIGINT) AS is_session_start
            FROM t
        """,
        "session_stats": """
            WITH w AS (SELECT event_id, user_id, ts, value,
                              epoch_us(ts) AS us,
                              lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev
                       FROM events),
            t AS (SELECT *, CASE WHEN prev IS NULL
                                      OR us - prev > 1800000000
                                 THEN 1 ELSE 0 END AS st
                  FROM w),
            s AS (SELECT *, sum(st) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                               AS session_seq
                  FROM t)
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   count(*) AS n_events,
                   CAST(max(us) - min(us) AS BIGINT) AS duration_us,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM s GROUP BY user_id, session_seq
        """,
        "asof_join": """
            WITH b AS (SELECT user_id, epoch_us(ts) AS bus,
                              max(CAST(round(value * 100) AS BIGINT))
                                  AS value_cents
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id, epoch_us(ts)),
            p AS (SELECT event_id, user_id, epoch_us(ts) AS us
                  FROM events WHERE event_type = 'click')
            SELECT p.event_id, p.user_id, CAST(p.us AS BIGINT) AS us,
                   CAST(b.bus AS BIGINT) AS asof_us,
                   b.value_cents AS asof_value_cents
            FROM p ASOF LEFT JOIN b
              ON p.user_id = b.user_id AND p.us >= b.bus
        """,
        "range_join": """
            WITH r AS (SELECT i AS range_id,
                              i * 2500 AS lo_cents,
                              i * 2500 + 4000 AS hi_cents
                       FROM range(0, 20) t(i)),
            p AS (SELECT event_id,
                         CAST(round(value * 100) AS BIGINT) AS v_cents
                  FROM events)
            SELECT p.event_id, p.v_cents, r.range_id,
                   r.lo_cents, r.hi_cents
            FROM p JOIN r ON p.v_cents >= r.lo_cents
                         AND p.v_cents < r.hi_cents
        """,
        # independent derivation: the engine PARSES the html bytes;
        # the oracle REBUILDS the expected links from the bridge's
        # integer link rule (sources/corpus.py html_pages_from_documents)
        "extract_links": """
            WITH e AS (SELECT doc_id,
                              unnest(range(0, 1 + doc_id % 4)) AS j
                       FROM documents)
            SELECT 'https://h' || lpad(CAST(doc_id % 997 AS VARCHAR),
                                       3, '0')
                   || '.example/p/' || doc_id AS url,
                   'Doc ' || doc_id AS title,
                   CAST(j AS BIGINT) AS link_ord,
                   'https://h'
                   || lpad(CAST((doc_id * 31 + (j + 1) * 7) % 997
                                AS VARCHAR), 3, '0')
                   || '.example/p/' || (doc_id * 13 + j) AS href,
                   'link ' || j AS anchor
            FROM e
        """,
        "link_graph": """
            WITH e AS (SELECT doc_id,
                              unnest(range(0, 1 + doc_id % 4)) AS j
                       FROM documents)
            SELECT 'h' || lpad(CAST(doc_id % 997 AS VARCHAR), 3, '0')
                   || '.example' AS src_host,
                   'h' || lpad(CAST((doc_id * 31 + (j + 1) * 7) % 997
                                    AS VARCHAR), 3, '0')
                   || '.example' AS dst_host,
                   CAST(count(*) AS BIGINT) AS n_links
            FROM e GROUP BY 1, 2
        """,
    }
