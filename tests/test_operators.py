"""Operator suite correctness: spatial joins vs naive oracles, dedup
behaviors on planted duplicates, ANN vs brute force, corpus invariants."""

import pytest
from pyspark.sql import Window, functions as F

from geojson_vt_spark.functions import project_x_col, project_y_col
from geojson_vt_spark.operators import (cosine_topk, exact_dedup, ivf_topk,
                                        knn_join, minhash_lsh_pairs,
                                        ngram_jaccard_pairs,
                                        point_in_polygon_join,
                                        raster_vector_overlay, simhash_pairs)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def points(spark):
    # 0.037/0.013 offsets keep every point off polygon boundaries
    return spark.range(2000).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 7919 % 3600) / 10.0 - 180.0 + 0.037).alias("lon"),
        ((F.col("id") * 104729 % 1400) / 10.0 - 70.0 + 0.013).alias("lat"))


@pytest.fixture()
def rects(spark):
    rows = [(i, -170.0 + i * 16, -60.0 + (i * 7 % 120),
             -170.0 + i * 16 + 14, min(-60.0 + (i * 7 % 120) + 10, 70.0))
            for i in range(20)]
    return spark.createDataFrame(
        rows, "poly_id long, lon0 double, lat0 double, lon1 double, lat1 double")


def _rect_polys(rects):
    return rects.select(
        "poly_id",
        F.array(project_x_col(F.col("lon0")), project_x_col(F.col("lon1")),
                project_x_col(F.col("lon1")), project_x_col(F.col("lon0")),
                project_x_col(F.col("lon0"))).alias("pxs"),
        F.array(project_y_col(F.col("lat0")), project_y_col(F.col("lat0")),
                project_y_col(F.col("lat1")), project_y_col(F.col("lat1")),
                project_y_col(F.col("lat0"))).alias("pys"))


def _naive_pip(points, rects):
    return (points.crossJoin(rects)
            .where((F.col("lon") > F.col("lon0")) & (F.col("lon") < F.col("lon1")) &
                   (F.col("lat") > F.col("lat0")) & (F.col("lat") < F.col("lat1")))
            .select("point_id", "poly_id"))


def test_pip_join_matches_naive(spark, points, rects):
    got = point_in_polygon_join(points, _rect_polys(rects), res=5)
    want = _naive_pip(points, rects)
    a = sorted((r.point_id, r.poly_id) for r in got.collect())
    b = sorted((r.point_id, r.poly_id) for r in want.collect())
    assert len(a) > 50
    assert a == b


def test_pip_join_size_hint_skips_probe_job(spark, points, rects):
    """With poly_count_hint supplied, building the PIP plan must launch
    ZERO Spark jobs (no limit().collect() auto-broadcast probe) when
    the hint rules out broadcasting, and exactly the ring-payload
    collect (1 job) when it chooses it — and both hinted forms return
    the same pairs as the probing default (VERDICT r3 #8)."""
    sc = spark.sparkContext
    polys = _rect_polys(rects)

    sc.setJobGroup("pip-hint-nobc", "plan build, hint says too big")
    no_bc = point_in_polygon_join(points, polys, res=5,
                                  poly_count_hint=200_000)
    sc.setJobGroup("other", "")
    n = len(sc.statusTracker().getJobIdsForGroup("pip-hint-nobc"))
    assert n == 0, f"hinted no-broadcast plan build ran {n} jobs"

    sc.setJobGroup("pip-hint-bc", "plan build, hint fits broadcast")
    bc = point_in_polygon_join(points, polys, res=5,
                               poly_count_hint=20, poly_vertex_hint=100)
    sc.setJobGroup("other", "")
    n = len(sc.statusTracker().getJobIdsForGroup("pip-hint-bc"))
    assert n <= 1, f"hinted broadcast plan build ran {n} jobs (payload=1)"

    want = sorted(map(tuple,
                      point_in_polygon_join(points, polys, res=5).collect()))
    assert sorted(map(tuple, no_bc.collect())) == want
    assert sorted(map(tuple, bc.collect())) == want


def test_pip_join_salted_identical(spark, points, rects):
    plain = point_in_polygon_join(points, _rect_polys(rects), res=5)
    salted = point_in_polygon_join(points, _rect_polys(rects), res=5, salt_n=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_knn_join_matches_brute_force(spark, points):
    qs = points.where(F.col("point_id") % 400 == 0).select(
        F.col("point_id").alias("query_id"), "lon", "lat")
    got = knn_join(points, qs, k=5, res=5)

    px = project_x_col(F.col("lon"))
    py = project_y_col(F.col("lat"))
    p2 = points.select("point_id", px.alias("px"), py.alias("py"))
    q2 = qs.select("query_id", px.alias("qx"), py.alias("qy"))
    brute = (q2.crossJoin(p2)
             .withColumn("dist", F.sqrt((F.col("px") - F.col("qx")) ** 2 +
                                        (F.col("py") - F.col("qy")) ** 2))
             .withColumn("rank", F.row_number().over(
                 Window.partitionBy("query_id").orderBy("dist", "point_id")))
             .where(F.col("rank") <= 5))
    a = sorted((r.query_id, r.point_id, r.rank) for r in got.collect())
    b = sorted((r.query_id, r.point_id, r.rank) for r in brute.collect())
    assert a == b


def test_knn_join_multi_round_sparse(spark):
    """Adversarially sparse points at a fine grid force several ring
    doublings: the annulus rewrite (scan only new cells per round,
    carry the provisional top-k forward, one localCheckpoint per
    round) must still match brute force exactly through many rounds."""
    pts = spark.range(40).select(
        F.col("id").cast("int").alias("point_id"),
        (-170.0 + F.col("id") * 8.7).alias("lon"),
        ((F.col("id") * 37 % 120) - 60.0).cast("double").alias("lat"))
    qs = spark.createDataFrame(
        [(0, -179.0, -80.0), (1, 10.0, 84.0), (2, 100.0, 0.0)],
        "query_id int, lon double, lat double")
    got = knn_join(pts, qs, k=7, res=8)

    px = project_x_col(F.col("lon"))
    py = project_y_col(F.col("lat"))
    p2 = pts.select("point_id", px.alias("px"), py.alias("py"))
    q2 = qs.select("query_id", px.alias("qx"), py.alias("qy"))
    brute = (q2.crossJoin(p2)
             .withColumn("dist", F.sqrt((F.col("px") - F.col("qx")) ** 2 +
                                        (F.col("py") - F.col("qy")) ** 2))
             .withColumn("rank", F.row_number().over(
                 Window.partitionBy("query_id").orderBy("dist", "point_id")))
             .where(F.col("rank") <= 7))
    a = sorted((r.query_id, r.point_id, r.rank) for r in got.collect())
    b = sorted((r.query_id, r.point_id, r.rank) for r in brute.collect())
    assert a == b


def test_raster_vector_overlay(spark, rects):
    raster = spark.range(64).select(
        (F.col("id") % 8).cast("int").alias("x"),
        (F.col("id") / 8).cast("int").alias("y"))
    polys = _rect_polys(rects).select(F.col("poly_id").alias("vec_id"),
                                      "pxs", "pys")
    ov = raster_vector_overlay(raster, polys, res=3)
    assert ov.count() > 0
    # every overlay pair's raster tile must intersect the vector bbox cover
    assert ov.select("vec_id").distinct().count() <= 20


@pytest.fixture()
def docs_with_dups(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clones = (docs.where(F.col("doc_id") < 20)
              .withColumn("doc_id", F.col("doc_id") + 100000))
    near = (docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" tail tweak"))))
    return docs.unionByName(clones).unionByName(near)


def test_exact_dedup_removes_planted_clones(spark, docs_with_dups):
    kept = exact_dedup(docs_with_dups)
    assert kept.count() == docs_with_dups.count() - 20
    assert kept.where(F.col("doc_id") >= 100000).where(
        F.col("doc_id") < 200000).count() == 0


def test_shingles_arrow_matches_column(spark):
    """The Arrow shingle path must equal the SQL-portable Column spec
    exactly — including Java-vs-Python whitespace class, space-only
    trim, and short/empty/degenerate texts."""
    import pandas as pd
    from geojson_vt_spark.operators import shingles_col

    texts = ["the quick brown fox jumps over the lazy dog",
             "a b", "", "   ", "one", "\tleading tab kept",
             "trailing spaces   ", "double  space", "a\nb\nc d e f",
             "x \x0b y \f z w", "Mixed CASE Text Repeat repeat REPEAT",
             "a b c a b c a b c"]
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))
    for n in (2, 3):
        got = {r.doc_id: r.sh for r in docs.select(
            "doc_id", shingles_col(F.col("text"), n).alias("sh")).collect()}
        want = {r.doc_id: r.sh for r in docs.select(
            "doc_id", shingles_col(F.col("text"), n,
                                   arrow=False).alias("sh")).collect()}
        assert got == want

    sf = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r.doc_id: r.sh for r in sf.select(
        "doc_id", shingles_col(F.col("text")).alias("sh")).collect()}
    want = {r.doc_id: r.sh for r in sf.select(
        "doc_id", shingles_col(F.col("text"),
                               arrow=False).alias("sh")).collect()}
    assert got == want


def test_word_ngrams_arrow_matches_column(spark):
    """The Arrow n-gram path must equal the SQL-portable Column spec
    exactly — order kept, duplicates kept, empty below n words, null
    text → null, Java whitespace class / space-only trim / trailing-
    empty split semantics mirrored."""
    import pandas as pd
    from geojson_vt_spark.operators.webtext import word_ngrams_col

    texts = ["the quick brown fox jumps over the lazy dog",
             "a b", "", "   ", "one", "\tleading tab kept",
             "trailing spaces   ", "trailing tab\t", "double  space",
             "a\nb\nc d e f", "x \x0b y \f z w",
             "a b c a b c a b c", None,
             "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string")
    for n in (2, 3, 8):
        got = {r.doc_id: r.g for r in docs.select(
            "doc_id", word_ngrams_col(F.col("text"), n).alias("g"))
            .collect()}
        want = {r.doc_id: r.g for r in docs.select(
            "doc_id", word_ngrams_col(F.col("text"), n,
                                      arrow=False).alias("g")).collect()}
        assert got == want

    sf = spark.read.parquet(f"{SF}/documents.parquet")
    got = {r.doc_id: r.g for r in sf.select(
        "doc_id", word_ngrams_col(F.col("text"), 8).alias("g")).collect()}
    want = {r.doc_id: r.g for r in sf.select(
        "doc_id", word_ngrams_col(F.col("text"), 8,
                                  arrow=False).alias("g")).collect()}
    assert got == want


def test_exact_dedup_no_text_in_exchange(spark, docs_with_dups):
    """The winner pass must shuffle (fp, id) only — never the document
    text — and get map-side partial aggregation (VERDICT r2 wrong #1)."""
    plan = exact_dedup(docs_with_dups)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "HashAggregate" in plan, plan
    # no exchange may carry the text column; text appears only in scans
    # and the final semi-joined output projection
    for chunk in plan.split("Exchange")[1:]:
        key_spec = chunk.split("\n", 1)[0]
        assert "text" not in key_spec, key_spec


def test_minhash_finds_planted_near_dups(spark, docs_with_dups):
    pairs = minhash_lsh_pairs(docs_with_dups, threshold=0.5)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    exact_clones = {(i, i + 100000) for i in range(20)}
    assert exact_clones <= found, "exact clones must be found (jaccard 1.0)"
    near = [p for p in found if p[1] >= 200000 and p[0] == p[1] - 200000]
    assert len(near) >= 15, f"most near-dup tails should pass LSH, got {len(near)}"


def test_minhash_agrees_with_exact_jaccard(spark, docs_with_dups):
    """Every minhash-passing pair must truly have jaccard >= threshold
    (the verify step is exact), cross-checked against the independent
    exact n-gram path."""
    pairs = minhash_lsh_pairs(docs_with_dups, threshold=0.5).collect()
    exact = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(
                 docs_with_dups, threshold=0.0,
                 block_col=F.lit(1)).collect()}
    for r in pairs:
        assert exact[(r.id_a, r.id_b)] == r.jaccard
        assert r.jaccard >= 0.5


def test_simhash_finds_planted_clones(spark, docs_with_dups):
    pairs = simhash_pairs(docs_with_dups, max_hamming=4)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + 100000) for i in range(20)} <= found


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    brute = cosine_topk(emb, qids, k=5)
    ivf = ivf_topk(emb, qids, k=5, n_centroids=8, nprobe=4)
    bt = {(r.query_id, r.nbr_id) for r in brute.collect()}
    iv = {(r.query_id, r.nbr_id) for r in ivf.collect()}
    recall = len(bt & iv) / len(bt)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_kmeans_recall_on_clustered_data(spark):
    """A trained quantizer must make IVF recall robust to id order: on a
    clustered synthetic set (where lowest-id centroids all land in one
    cluster), k-means centroids reach >=0.9 of brute-force recall at
    nprobe=2/8 (VERDICT r2 missing #3)."""
    import numpy as np
    import pandas as pd
    from geojson_vt_spark.operators import ivf_fit

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 64)) * 4
    # ids ordered by cluster: ids 0..59 are all cluster 0 — the
    # adversarial case for the lowest-id centroid pick
    vecs = np.concatenate([centers[c] + rng.standard_normal((60, 64)) * 0.3
                           for c in range(8)])
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(480), "embedding": list(vecs)}))

    qids = [0, 65, 130, 195, 260, 325, 390, 455]
    brute = {(r.query_id, r.nbr_id)
             for r in cosine_topk(emb, qids, k=5).collect()}

    model = ivf_fit(emb, n_centroids=8, iters=4)
    got = {(r.query_id, r.nbr_id)
           for r in ivf_topk(emb, qids, k=5, nprobe=2,
                             centroids=model).collect()}
    recall = len(brute & got) / len(brute)
    assert recall >= 0.9, f"k-means IVF recall too low: {recall}"

    # determinism: same fit twice -> same model
    assert model == ivf_fit(emb, n_centroids=8, iters=4)

    # trained path keeps the no-single-partition plan property
    plan = ivf_topk(emb, qids, k=5, nprobe=2, centroids=model) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_ivf_index_materialized_lists(spark, tmp_path):
    """ivf_topk over a materialized centroid_id-partitioned index must
    return exactly the per-call-assignment result, and the probe scan
    must be pruned to the probed partitions (partition filters on
    centroid_id reach the parquet source)."""
    from geojson_vt_spark.operators import ivf_fit, ivf_index
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    model = ivf_fit(emb, n_centroids=8, iters=2)
    idx = ivf_index(emb, model, str(tmp_path / "ivf_idx"))
    qids = [0, 1, 2, 3, 4]
    direct = ivf_topk(emb, qids, k=5, nprobe=2, centroids=model)
    via_idx = ivf_topk(emb, qids, k=5, nprobe=2, centroids=model,
                       assigned=idx)
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, via_idx.collect()))
    plan = via_idx._jdf.queryExecution().executedPlan().toString()
    assert any("centroid_id" in chunk[:200]
               for chunk in plan.split("PartitionFilters: [")[1:]), plan


def test_corpus_text_invariant_across_parallelism(spark):
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)
    p1 = synth_pages_df(spark, 200, seed=42, n_partitions=1)
    p8 = synth_pages_df(spark, 200, seed=42, n_partitions=8)
    m1 = {r.url: r.text for r in p1.collect()}
    m8 = {r.url: r.text for r in p8.collect()}
    assert m1 == m8, "extracted text must be byte-identical per url"

    f1 = {r.input_ord: r.feature_json
          for r in extract_geo_features_df(p1).collect()}
    f8 = {r.input_ord: r.feature_json
          for r in extract_geo_features_df(p8).collect()}
    assert f1 == f8
    assert len(f1) == 200


def test_multimodal_plumbing(spark):
    from geojson_vt_spark.operators.multimodal import (assets_from_documents,
                                                       extract_features_df,
                                                       frame_sample_df,
                                                       real_decode)
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    assets = assets_from_documents(docs)
    feats = extract_features_df(assets)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.features) == 16 for r in rows)
    # determinism across partitionings
    feats2 = extract_features_df(assets.repartition(7)).collect()
    assert {r.asset_id: r.features for r in rows} == \
           {r.asset_id: r.features for r in feats2}
    frames = frame_sample_df(assets, every_ms=2000)
    assert frames.count() > 0
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image")


def _bmp24(pixels):
    """Hand-rolled uncompressed 24-bit BI_RGB BMP bytes (bottom-up
    row order, 4-byte row padding) from an H×W×3 RGB uint8 array."""
    import struct
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    img = bytearray()
    for row in pixels[::-1]:
        line = bytearray()
        for (r, g, b) in row:
            line += bytes((int(b), int(g), int(r)))
        line += b"\x00" * (stride - len(line))
        img += line
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                      2835, 2835, 0, 0)
    return bytes(hdr + dib + img)


def test_real_bmp_decode_through_resize_and_ahash(spark):
    """Real-bytes image path (round-5): a hand-built uncompressed BMP
    decodes to known pixels through resize_df, ahash_df, and
    extract_features_df with fake=False; the sha256 fake stays the
    oracle path and non-BMP media still raise."""
    import numpy as np

    from geojson_vt_spark.operators.multimodal import (ASSET_SCHEMA,
                                                       ahash_df,
                                                       extract_features_df,
                                                       real_decode,
                                                       resize_df)

    # 8 rows × 16 cols; left half black, right half white (gray pixels,
    # so integer luminance == channel value exactly)
    px = np.zeros((8, 16, 3), np.uint8)
    px[:, 8:, :] = 255
    payload = _bmp24(px)
    want = np.zeros((8, 16), np.uint8)
    want[:, 8:] = 255
    assert (real_decode(payload, "image") == want).all()

    # bottom-up flip: distinct corners must come back top-down
    corners = np.array([[[10, 10, 10], [20, 20, 20]],
                        [[30, 30, 30], [40, 40, 40]]], np.uint8)
    assert (real_decode(_bmp24(corners), "image")
            == [[10, 20], [30, 40]]).all()

    # honesty: only BMP images decode from real bytes
    with pytest.raises(NotImplementedError):
        real_decode(payload, "video")
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG\r\n\x1a\n" + payload[8:], "image")

    assets = spark.createDataFrame(
        [(1, "image", bytearray(payload), 16, 8, None, "image/bmp")],
        schema=ASSET_SCHEMA)
    rs = {(r.ry, r.rx): r.value
          for r in resize_df(assets, fake=False).collect()}
    assert rs == {(ry, rx): (0.0 if rx < 4 else 1.0)
                  for ry in range(4) for rx in range(8)}
    ah = ahash_df(assets, fake=False).collect()[0]
    assert ah.ahash == "00ff" * 8
    assert ah.b0 == ah.b1 == ah.b2 == ah.b3 == 0x00FF00FF
    feats = extract_features_df(assets, fake=False).collect()[0].features
    assert feats == [0.0] * 8 + [1.0] * 8


def test_minhash_bucket_cap_stops_quadratic_blowup(spark):
    """A planted mega-cluster (one text duplicated 800×) must not turn
    the band join quadratic: with pre-collapse the cluster contributes
    ONE representative to the LSH stage, and survivors are exactly the
    non-duplicate docs plus the cluster's lowest id."""
    from geojson_vt_spark.operators import minhash_dedup, minhash_lsh_pairs

    base = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    mega = (spark.range(800)
            .select((F.col("id") + 500000).alias("doc_id"),
                    F.lit("mega cluster text repeated verbatim in every "
                          "copy of this planted document").alias("text")))
    docs = base.select("doc_id", "text").unionByName(mega)

    kept = minhash_dedup(docs, threshold=0.5, bucket_cap=100)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 500000 in kept_ids, "cluster keeps its lowest id"
    assert not any(i > 500000 for i in kept_ids), "other 799 copies drop"

    # raw pairs path: the cap drops the mega-bucket instead of emitting
    # ~320k pairs from it
    pairs = minhash_lsh_pairs(docs, threshold=0.5, bucket_cap=100)
    n = pairs.where(F.col("id_a") >= 500000).count()
    assert n == 0, f"capped mega-bucket must emit no pairs, got {n}"


def test_minhash_recall_unchanged_by_cap(spark, docs_with_dups):
    """Default cap (1000) must not change results on a normal corpus."""
    from geojson_vt_spark.operators import minhash_lsh_pairs
    capped = {(r.id_a, r.id_b)
              for r in minhash_lsh_pairs(docs_with_dups,
                                         threshold=0.5).collect()}
    uncapped = {(r.id_a, r.id_b)
                for r in minhash_lsh_pairs(docs_with_dups, threshold=0.5,
                                           bucket_cap=None).collect()}
    assert capped == uncapped


def test_ivf_topk_no_single_partition_exchange(spark):
    """The IVF plan must not funnel the vector table through one task:
    no global-sort / SinglePartition exchange anywhere (VERDICT r1 #3)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = ivf_topk(emb, [0, 1, 2], k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_md5_hash_variants_match_defaults_semantics(spark, docs_with_dups):
    """hash_fn='md5' changes bucketing, not verification: every emitted
    pair still carries the exact jaccard/hamming, and planted exact
    clones are still found."""
    from geojson_vt_spark.operators import minhash_lsh_pairs, simhash_pairs
    mh = {(r.id_a, r.id_b): r.jaccard
          for r in minhash_lsh_pairs(docs_with_dups, threshold=0.5,
                                     hash_fn="md5").collect()}
    assert {(i, i + 100000) for i in range(20)} <= set(mh)
    assert all(j >= 0.5 for j in mh.values())
    sh = {(r.id_a, r.id_b)
          for r in simhash_pairs(docs_with_dups, max_hamming=4,
                                 hash_fn="md5").collect()}
    assert {(i, i + 100000) for i in range(20)} <= sh


def test_winnow_fingerprints_robust_to_local_edits(spark):
    """Winnowing property: a doc with a small local edit shares most
    fingerprints with the original; an unrelated doc shares few."""
    from geojson_vt_spark.operators import winnow_fingerprints_df
    import pandas as pd
    base = ("the quick brown fox jumps over the lazy dog while the "
            "rain in spain stays mainly in the plain " * 3)
    edited = base.replace("lazy dog", "sleepy cat", 1)
    other = ("entirely different content about tile pyramids and "
             "mercator projections in distributed systems " * 3)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2],
                      "text": [base, edited, other]}))
    rows = winnow_fingerprints_df(docs).collect()
    fps = {i: set() for i in range(3)}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    j_edit = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    j_other = len(fps[0] & fps[2]) / len(fps[0] | fps[2])
    assert j_edit > 0.6, f"local edit should preserve fingerprints, {j_edit}"
    assert j_other < 0.1, f"unrelated docs should share few, {j_other}"


def test_cosine6_arrow_matches_column(spark):
    """cosine6_col (numpy dimension-order fold + HALF_UP replication)
    must be BIT-exact with F.round(cosine_col(...), 6) — the value the
    DuckDB oracle reproduces."""
    from geojson_vt_spark.operators.dedup import cosine_col
    from geojson_vt_spark.operators.similarity import cosine6_col

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("nbr_id"),
                      F.col("embedding").cast("array<double>").alias("v"))
    q = (emb.where(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").cast("array<double>").alias("qv")))
    pairs = q.crossJoin(base)
    got = pairs.select("query_id", "nbr_id",
                       cosine6_col(F.col("qv"), F.col("v")).alias("c")) \
        .collect()
    want = pairs.select("query_id", "nbr_id",
                        F.round(cosine_col("qv", "v"), 6).alias("c")) \
        .collect()
    gm = {(r.query_id, r.nbr_id): r.c for r in got}
    wm = {(r.query_id, r.nbr_id): r.c for r in want}
    assert len(gm) == len(wm) > 1000
    assert gm == wm


def test_near_dup_clusters_transitive_chain(spark):
    # A~B and B~C but never A~C: pairwise keep-lowest can't see the
    # chain; the component closure must put all three in one cluster
    from geojson_vt_spark.operators import near_dup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long")
    nodes = spark.range(1, 31).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r.rep
           for r in near_dup_clusters(pairs, nodes=nodes).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == 10
    assert out[20] == out[21] == out[22] == out[23] == 20
    # isolated docs represent themselves
    assert out[5] == 5 and out[30] == 30
    assert len(out) == 30


def test_near_dup_clusters_long_chain_converges(spark):
    # a 200-node path has diameter 199; min-label propagation alone
    # would need 199 rounds — pointer jumping must close it within the
    # 25-round cap (O(log diameter))
    from geojson_vt_spark.operators import near_dup_clusters
    pairs = spark.range(199).select(
        (F.col("id") + 1).alias("id_a"), (F.col("id") + 2).alias("id_b"))
    out = near_dup_clusters(pairs).groupBy("rep").count().collect()
    assert len(out) == 1 and out[0].rep == 1 and out[0]["count"] == 200


def test_near_dup_clusters_matches_union_find(spark):
    # randomized differential vs a driver-side union-find
    import random
    from geojson_vt_spark.operators import near_dup_clusters
    rng = random.Random(7)
    n = 400
    edges = sorted({tuple(sorted(rng.sample(range(n), 2)))
                    for _ in range(300)})
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {i: find(i) for i in range(n)}
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    got = {r.doc_id: r.rep
           for r in near_dup_clusters(pairs, nodes=nodes).collect()}
    assert got == expect


def test_minhash_dedup_transitive_collapses_bridge_doc(spark):
    # doc3 = doc1's block + doc2's block: it pairs with BOTH doc1 and
    # doc2, which never pair with each other.  Pairwise keep-lowest
    # keeps {1, 2} (doc3 is the only id_b loser); transitive closure
    # collapses the whole component to {1}
    from geojson_vt_spark.operators import minhash_dedup
    a_block = " ".join(f"alpha{i}" for i in range(12))
    b_block = " ".join(f"beta{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, a_block), (2, b_block), (3, a_block + " " + b_block)],
        "doc_id long, text string")
    kw = dict(num_hashes=64, bands=32, threshold=0.3)
    pairwise = sorted(r.doc_id for r in
                      minhash_dedup(docs, **kw).collect())
    chained = sorted(r.doc_id for r in
                     minhash_dedup(docs, transitive=True, **kw).collect())
    assert pairwise == [1, 2]
    assert chained == [1]


# ---------------------------------------------------------------- webtext

def test_canonicalize_url_variants_collapse(spark):
    from geojson_vt_spark.operators import canonicalize_url_col
    variants = [
        "HTTPS://WWW.News.Example.COM:443/Story-1?utm_source=x&id=7#top",
        "https://news.example.com/Story-1?id=7&gclid=abc123",
        "https://News.example.com/Story-1/?id=7",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    got = [r.c for r in
           df.select(canonicalize_url_col(F.col("url")).alias("c")).collect()]
    # first two collapse exactly; the third keeps its trailing-slash
    # path distinct (slash precedes the query, not at URL end)
    assert got[0] == got[1] == "https://news.example.com/Story-1?id=7"
    assert got[2] == "https://news.example.com/Story-1/?id=7"
    # dangling '?' after the only param is stripped
    one = spark.createDataFrame(
        [("http://a.com/x?sid=99",), ("http://a.com/x/",)], "url string")
    canon = [r.c for r in one.select(
        canonicalize_url_col(F.col("url")).alias("c")).collect()]
    assert canon == ["http://a.com/x", "http://a.com/x"]


def test_url_dedup_keeps_lowest_id(spark):
    from geojson_vt_spark.operators import url_dedup
    pages = spark.createDataFrame(
        [(5, "https://A.com/p?utm_x=1"), (2, "HTTPS://a.com/p"),
         (9, "https://a.com/p#frag"), (1, "https://b.com/q")],
        "doc_id long, url string")
    rows = {r.canon_url: (r.keep_id, r.n_dups)
            for r in url_dedup(pages, keys_only=False).collect()}
    assert rows == {"https://a.com/p": (2, 3), "https://b.com/q": (1, 1)}

    # keys_only scale path: identical winners, all-int64 schema
    slim = url_dedup(pages, keys_only=True)
    assert sorted((r.keep_id, r.n_dups) for r in slim.collect()) == \
        sorted(rows.values())
    assert all(f.dataType.simpleString() == "bigint"
               for f in slim.schema.fields)


def test_repetition_stats_flags_repetitive_doc(spark):
    from geojson_vt_spark.operators import repetition_stats_df
    clean = " ".join(f"word{i} filler{i}" for i in range(20))
    spam = "buy now " * 30
    short = "too short"
    df = spark.createDataFrame(
        [(1, clean), (2, spam.strip()), (3, short)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats_df(df).collect()}
    assert out[1].keep == 1
    assert out[2].keep == 0  # one bigram dominates
    assert out[2].top_bigram_frac > 0.45
    assert out[2].dup_trigram_frac > 0.9
    assert out[3].keep == 0  # fewer than 10 words
    assert out[1].dup_trigram_frac == 0.0


def test_decontaminate_drops_benchmark_overlap(spark):
    from geojson_vt_spark.operators import decontaminate_df
    bench_text = " ".join(f"eval{i}" for i in range(10))
    contaminated = "prefix words here " + " ".join(
        f"eval{i}" for i in range(8)) + " suffix"
    clean = " ".join(f"train{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, clean), (2, contaminated), (3, "tiny doc")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(100, bench_text)],
                                  "doc_id long, text string")
    kept = sorted(r.doc_id for r in
                  decontaminate_df(docs, bench, n=8).collect())
    # doc2 shares the 8-gram eval0..eval7; doc3 is under 8 words (clean)
    assert kept == [1, 3]


def test_tfidf_rare_term_outranks_common(spark):
    from geojson_vt_spark.operators import tfidf_topk_df
    df = spark.createDataFrame(
        [(1, "common zebra"),
         (2, "common filler words here"),
         (3, "common other stuff too")],
        "doc_id long, text string")
    top = {(r.doc_id, r.rank): r.term
           for r in tfidf_topk_df(df, k=2).collect()}
    # zebra (df=1) beats common (df=3) despite tf 1 vs 3
    assert top[(1, 1)] == "zebra"


def test_pii_redact_counts_and_masks(spark):
    from geojson_vt_spark.operators.webtext import pii_redact_df
    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@sub.example.org or jo@ex.io thanks"),
         (2, "server 192.168.1.250 then call +44 (020) 7946-0958 bye"),
         (3, "no pii here at all")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in pii_redact_df(df).collect()}
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (2, 0, 0)
    # the IP must be masked BEFORE phone matching, so exactly one phone
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 1, 1)
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (0, 0, 0)
    import hashlib
    want = hashlib.md5(b"no pii here at all").hexdigest()
    assert out[3].redacted_md5 == want


def test_pack_sequences_packs_contiguously(spark):
    from geojson_vt_spark.operators import pack_sequences_df
    # one shard (n_shards=1): 3 docs of 5/3/4 tokens, seq_len=6
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h"), (3, "i j k l")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           pack_sequences_df(df, seq_len=6, n_shards=1).collect()}
    # doc1: tokens [0,5) -> seq 0 only, offset 0
    assert (out[1].first_seq, out[1].last_seq, out[1].offset_in_seq) == (0, 0, 0)
    # doc2: tokens [5,8) -> spans the seq-0/1 boundary
    assert (out[2].first_seq, out[2].last_seq, out[2].offset_in_seq) == (0, 1, 5)
    # doc3: tokens [8,12) -> seq 1 only, offset 2
    assert (out[3].first_seq, out[3].last_seq, out[3].offset_in_seq) == (1, 1, 2)


def test_pack_sequences_shards_independent(spark):
    from geojson_vt_spark.operators import pack_sequences_df
    # same doc stream, 2 shards: each shard's packing starts at 0
    df = spark.createDataFrame(
        [(i, "w " * 10) for i in range(8)], "doc_id long, text string")
    out = pack_sequences_df(df, seq_len=100, n_shards=2).collect()
    per_shard_first = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        per_shard_first.setdefault(r.shard, r.offset_in_seq)
    assert per_shard_first == {0: 0, 1: 0}


def test_mixture_sample_respects_target_ratios(spark):
    from geojson_vt_spark.operators import mixture_sample_df
    import pyspark.sql.functions as F
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"))
    # en:de counts are 1000:2000 but target is 3:1 -> en is the
    # constraint; all 1000 en kept, ~333 de kept
    kept = mixture_sample_df(df, {"en": 3, "de": 1}).groupBy(
        "domain").count().collect()
    got = {r.domain: r["count"] for r in kept}
    assert got["en"] == 1000          # ppm hits 1e6 for the binding domain
    assert 280 <= got["de"] <= 390    # hash sampling around 333


def test_mixture_sample_drops_unweighted_domains(spark):
    from geojson_vt_spark.operators import mixture_sample_df
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, "en")], "doc_id long, lang string")
    out = mixture_sample_df(df, {"en": 1})
    assert {r.domain for r in out.collect()} == {"en"}


def test_substring_dedup_flags_planted_block(spark):
    from geojson_vt_spark.operators import substring_dedup_df
    import uuid
    shared = " ".join(f"s{i}" for i in range(24))
    rows = [(i, f"u{i}x " * 30 + shared) for i in range(4)]
    rows.append((9, " ".join(str(uuid.uuid4().hex) for _ in range(40))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           substring_dedup_df(df, span_len=8, stride=4).collect()}
    # docs 0-3 share a 24-token tail: aligned spans duplicate
    for i in range(4):
        assert out[i].n_dup_spans > 0, f"doc {i} saw no dup spans"
    assert out[9].n_dup_spans == 0 and out[9].keep == 1


def test_quality_classifier_deterministic_and_monotone(spark):
    from geojson_vt_spark.operators import quality_classifier_df
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in quality_classifier_df(df).collect()}
    # identical text -> identical score; empty doc -> zero row
    assert out[1].score_sum == out[2].score_sum
    assert out[1].n_tokens == 3
    assert (out[3].n_tokens, out[3].score_sum, out[3].keep) == (0, 0, 0)
    assert out[1].keep == int(out[1].score_sum > 0)


def test_repetition_stats_arrow_matches_column(spark):
    """The fused Arrow stats pass is row-identical to the Column/explode
    SPEC (which the DuckDB oracle replays), including Java-regex edge
    cases: tab-led text (trim strips spaces only), trailing whitespace
    (split keeps trailing empty tokens), repeated n-grams, and a
    too-short doc."""
    from geojson_vt_spark.operators import repetition_stats_df
    rows = [
        (1, "the cat sat on the mat the cat sat again today fine"),
        (2, "one one one one one one one one one one one one"),
        (3, "\tleading tab and  double  space here now ok yes sure\n"),
        (4, "tiny"),
        (5, "a b a b a b a b a b a b a b"),
        (6, "x" * 30 + " " + "y" * 30),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(repetition_stats_df(df, arrow=True).collect())
    b = sorted(repetition_stats_df(df, arrow=False).collect())
    for ra, rb in zip(a, b):
        assert ra.doc_id == rb.doc_id
        for f in ("n_words", "mean_word_len", "alpha_word_frac",
                  "top_bigram_frac", "dup_trigram_frac", "keep"):
            assert ra[f] == rb[f], (ra.doc_id, f, ra[f], rb[f])


def test_repetition_stats_arrow_matches_column_on_corpus(spark):
    from geojson_vt_spark.operators import repetition_stats_df
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(repetition_stats_df(docs, arrow=True).collect())
    b = sorted(repetition_stats_df(docs, arrow=False).collect())
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert tuple(ra) == tuple(rb)


def test_decontaminate_arrow_matches_column(spark):
    """Fused Arrow probe == explode/semi-join SPEC, on the corpus with
    a doc_id%7 benchmark (larger overlap than the driver's %97)."""
    import pyspark.sql.functions as F
    from geojson_vt_spark.operators import decontaminate_df
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    a = sorted(tuple(r) for r in
               decontaminate_df(docs, bench, n=8, arrow=True).collect())
    b = sorted(tuple(r) for r in
               decontaminate_df(docs, bench, n=8, arrow=False).collect())
    assert a == b and 0 < len(a) < docs.count()


def test_bm25_prefers_rare_term_match(spark):
    from geojson_vt_spark.operators import bm25_topk_df
    docs = spark.createDataFrame(
        [(1, "zebra runs far"), (2, "common words common words"),
         (3, "common zebra common and more filler words here"),
         (4, "common stuff only here")],
        "doc_id long, text string")
    q = spark.createDataFrame([("q", "zebra")],
                              "query_id string, qtext string")
    out = bm25_topk_df(docs, q, k=2).orderBy("rank").collect()
    # both zebra docs rank above everything; shorter doc 1 wins on
    # length normalization
    assert [r.doc_id for r in out] == [1, 3]
    assert out[0].score > out[1].score > 0


def test_bm25_multi_term_sums_contributions(spark):
    from geojson_vt_spark.operators import bm25_topk_df
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "delta gamma")],
        "doc_id long, text string")
    q = spark.createDataFrame([("q", "alpha beta")],
                              "query_id string, qtext string")
    out = bm25_topk_df(docs, q, k=3).collect()
    by_doc = {r.doc_id: r for r in out}
    assert by_doc[1].rank == 1          # matches both terms
    assert by_doc[2].rank == 2          # one term


def test_sessionize_splits_on_gap(spark):
    import datetime as dt
    from geojson_vt_spark.operators import sessionize_df, session_stats_df
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, 1.0),
        (2, t0 + dt.timedelta(minutes=10), 7, 2.0),
        (3, t0 + dt.timedelta(minutes=50), 7, 3.0),   # > 30 min gap
        (4, t0, 8, 4.0),                              # other user
        (5, t0 + dt.timedelta(minutes=50, seconds=0,
                              microseconds=1), 7, 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double")
    s = {r.event_id: r for r in sessionize_df(ev, 30).collect()}
    assert (s[1].session_seq, s[2].session_seq, s[3].session_seq) == (1, 1, 2)
    assert s[5].session_seq == 2        # 1 us gap stays in session
    assert s[4].session_seq == 1 and s[4].user_id == 8
    st = {(r.user_id, r.session_seq): r
          for r in session_stats_df(ev, 30).collect()}
    assert st[(7, 1)].n_events == 2
    assert st[(7, 1)].duration_us == 600_000_000
    assert st[(7, 2)].value_cents == 800


def test_domain_cap_keeps_lowest_ids(spark):
    from geojson_vt_spark.operators import domain_cap_df
    rows = [(i, f"https://site{'A' if i % 2 else 'B'}.com/p/{i}")
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = domain_cap_df(df, max_per_host=2).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r.doc_id)
    assert sorted(by_host["sitea.com"]) == [1, 3]
    assert sorted(by_host["siteb.com"]) == [0, 2]


def test_split_deterministic_and_proportional(spark):
    from geojson_vt_spark.operators import split_df
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    out = split_df(df).groupBy("split").count().collect()
    got = {r.split: r["count"] for r in out}
    assert 19200 <= got["train"] <= 19900
    assert 100 <= got["val"] <= 350 and 100 <= got["test"] <= 350
    # rerun == identical assignment (hash, not rand)
    a = sorted(tuple(r) for r in split_df(df).collect())
    b = sorted(tuple(r) for r in split_df(df).collect())
    assert a == b
    import pytest
    with pytest.raises(ValueError):
        split_df(df, {"train": 1, "val": 1})


def test_pagerank_star_graph(spark):
    # 4 spokes -> hub 0; hub -> node 1.  Replicate the integer
    # recurrence by hand for two rounds to pin the exact semantics.
    from geojson_vt_spark.operators.graph import pagerank_df
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)], "src long, dst long")
    got = {r["node"]: r["rank_micros"]
           for r in pagerank_df(edges, iters=2).collect()}
    # round 1: every node starts at 1_000_000, outdeg 1 everywhere
    r1 = {0: 150000 + (85 * 4 * 1000000) // 100,
          1: 150000 + (85 * 1000000) // 100,
          2: 150000, 3: 150000, 4: 150000}
    r2 = {0: 150000 + (85 * (3 * (r1[2] // 1) + r1[1])) // 100,
          1: 150000 + (85 * r1[0]) // 100,
          2: 150000, 3: 150000, 4: 150000}
    assert got == r2
    # mass never exceeds what was injected (sinks/floors only lose)
    assert sum(got.values()) <= 5 * 1000000


def test_pagerank_dedups_parallel_edges_and_self_loops(spark):
    from geojson_vt_spark.operators.graph import pagerank_df
    a = spark.createDataFrame([(1, 2), (1, 2), (2, 2), (2, 1)],
                              "src long, dst long")
    b = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    ra = {r["node"]: r["rank_micros"] for r in pagerank_df(a).collect()}
    rb = {r["node"]: r["rank_micros"] for r in pagerank_df(b).collect()}
    assert ra == rb


def test_semdedup_drops_planted_near_dups(spark):
    import numpy as np
    from geojson_vt_spark.operators.similarity import semdedup_df
    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 8)).astype(float)
    rows = [(i, base[i].tolist()) for i in range(40)]
    # plant: 50/51 duplicate vec 5, 52 duplicates vec 7 (tiny jitter)
    for nid, src in ((50, 5), (51, 5), (52, 7)):
        rows.append((nid, (base[src] + 1e-4 * rng.standard_normal(8))
                     .tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semdedup_df(df, threshold=0.95, n_clusters=4).collect()}
    assert len(out) == 43
    for nid, src in ((50, 5), (51, 5), (52, 7)):
        assert not out[nid]["keep"]
        assert out[nid]["dup_of"] == src
        # near-identical vectors land in the same cluster
        assert out[nid]["centroid_id"] == out[src]["centroid_id"]
    assert out[5]["keep"] and out[7]["keep"]
    dropped = {k for k, r in out.items() if not r["keep"]}
    assert dropped == {50, 51, 52}


def test_semdedup_accepts_kmeans_model(spark):
    import numpy as np
    from geojson_vt_spark.operators.similarity import ivf_fit, semdedup_df
    rng = np.random.RandomState(9)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(30)]
    rows.append((99, rows[4][1]))   # exact duplicate of vec 4
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = ivf_fit(df, n_centroids=4, iters=2, dim=8)
    out = {r["vec_id"]: r for r in
           semdedup_df(df, threshold=0.999, centroids=model).collect()}
    assert not out[99]["keep"] and out[99]["dup_of"] == 4
    assert sum(1 for r in out.values() if not r["keep"]) == 1


def test_lm_score_buckets_and_monotone(spark):
    from geojson_vt_spark.operators.webtext import lm_score_df
    # 90 docs of common words + 10 docs of rare gibberish: the
    # gibberish has high per-token nll and must land in the tail
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 90,
               # ids 0-44 get a unique rare suffix token (count 1);
               # ids 45-89 share the "45" suffix (count 45) — two
               # distinct nll levels among the common docs so the
               # terciles cut head/middle between them
               F.concat(F.lit("the quick brown fox jumps over the lazy "),
                        F.least(F.col("id"), F.lit(45)).cast("string")))
         .otherwise(F.concat(F.lit("zq"), F.col("id").cast("string"),
                             F.lit("x vlk"), (F.col("id") * 7).cast("string"),
                             F.lit("w qpb"), (F.col("id") * 13).cast("string")))
         .alias("text"))
    out = lm_score_df(docs, exact_terciles=True).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # every gibberish doc is in the tail; nll ordering head<=middle<=tail
    assert all(r.bucket == "tail" for r in out if r.doc_id >= 90)
    assert (max(r.nll for r in by_bucket["head"])
            <= min(r.nll for r in by_bucket["middle"]))
    assert (max(r.nll for r in by_bucket["middle"])
            <= min(r.nll for r in by_bucket["tail"]))
    # ppl is exp(nll) rounded; n_tokens matches whitespace tokens
    import math
    for r in out:
        assert abs(r.ppl - round(math.exp(r.nll), 6)) < 1e-6
        assert r.n_tokens == (9 if r.doc_id < 90 else 3)


def test_lm_score_approx_path_runs(spark):
    from geojson_vt_spark.operators.webtext import lm_score_df
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma doc "),
                 (F.col("id") % 7).cast("string")).alias("text"))
    out = lm_score_df(docs, exact_terciles=False, broadcast_vocab=False)
    rows = out.collect()
    assert len(rows) == 50 and {r.bucket for r in rows} <= {
        "head", "middle", "tail"}


def test_bbox_overlap_join_planted(spark):
    from geojson_vt_spark.operators.spatial_join import bbox_overlap_join
    rows = [
        # (id, xmin, ymin, xmax, ymax)
        (0, 0.0, 0.0, 10.0, 10.0),    # big box spanning many cells
        (1, 9.0, 9.0, 12.0, 12.0),    # overlaps 0 (and touches nothing else)
        (2, 10.0, 10.0, 11.0, 11.0),  # touches 0 at corner, overlaps 1
        (3, 50.0, 50.0, 51.0, 51.0),  # disjoint
        (4, -7.9, -3.1, 0.5, 0.5),    # negative coords, overlaps 0
    ]
    boxes = spark.createDataFrame(
        rows, "id long, xmin double, ymin double, xmax double, ymax double")
    got = {(r.id_a, r.id_b): r.inter_area
           for r in bbox_overlap_join(boxes, cell=2.0).collect()}
    assert set(got) == {(0, 1), (0, 2), (1, 2), (0, 4)}
    assert got[(0, 1)] == 1.0          # 9..10 x 9..10
    assert got[(0, 2)] == 0.0          # corner touch (closed intervals)
    assert got[(1, 2)] == 1.0
    assert got[(0, 4)] == 0.25         # 0..0.5 x 0..0.5
    # pair (0,1) shares cells yet is emitted exactly once: guaranteed by
    # the dict build above only if no duplicate keys — assert directly
    pairs = bbox_overlap_join(boxes, cell=2.0).collect()
    assert len(pairs) == len(got)


def test_bbox_overlap_join_two_tables(spark):
    from geojson_vt_spark.operators.spatial_join import bbox_overlap_join
    a = spark.createDataFrame(
        [(10, 0.0, 0.0, 5.0, 5.0)],
        "id long, xmin double, ymin double, xmax double, ymax double")
    b = spark.createDataFrame(
        [(1, 4.0, 4.0, 6.0, 6.0), (2, 9.0, 9.0, 10.0, 10.0)],
        "id long, xmin double, ymin double, xmax double, ymax double")
    got = bbox_overlap_join(a, b, cell=2.0).collect()
    # two-table mode keeps every (a, b) hit regardless of id order
    assert [(r.id_a, r.id_b, r.inter_area) for r in got] == [(10, 1, 1.0)]


def test_ahash_dedup_keep_lowest_and_determinism(spark):
    """Identical payloads decode to identical pixel grids, so their
    aHashes collide: the lowest asset_id is the representative and
    every other copy is flagged; output is partitioning-invariant."""
    from geojson_vt_spark.operators.multimodal import (ahash_dedup_df,
                                                       assets_from_documents)
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    clone = base.select((F.col("doc_id") + 900000).alias("doc_id"), "text",
                        "lang", "source", "n_chars")
    assets = assets_from_documents(base.unionByName(clone))
    out = ahash_dedup_df(assets).collect()
    flags = {r.asset_id: r for r in out}
    for r in out:
        if r.asset_id >= 900000:
            twin = flags[r.asset_id - 900000]
            assert r.ahash == twin.ahash
            assert r.rep_id == twin.rep_id == twin.asset_id
            assert r.is_dup == 1 and twin.is_dup == 0
    out2 = ahash_dedup_df(assets.repartition(7)).collect()
    assert {r.asset_id: tuple(r) for r in out} == \
           {r.asset_id: tuple(r) for r in out2}


def test_incremental_dedup_flags(spark):
    """Seen-in-base and first-in-batch semantics on a planted layout:
    incoming = [dup-of-base, new, within-batch-dup, new]."""
    from geojson_vt_spark.operators.webtext import incremental_dedup_df
    base = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text")], "doc_id long, text string")
    inc = spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text"),
         (12, "gamma text"), (13, "delta text")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            incremental_dedup_df(inc, base, fp=F.md5("text")).collect()}
    assert rows[10].in_base == 1 and rows[10].keep == 0
    assert rows[11].in_base == 0 and rows[11].keep == 1
    assert rows[12].in_base == 0 and rows[12].keep == 0   # 11 won the fp
    assert rows[13].in_base == 0 and rows[13].keep == 1


def test_corpus_profile_exact_quartiles(spark):
    """Quartiles are exact (sort-based percentile), not approximate:
    a known 5-value group must interpolate precisely."""
    from geojson_vt_spark.operators.webtext import corpus_profile_df
    docs = spark.createDataFrame(
        [("en", "s", n) for n in (10, 20, 30, 40, 100)],
        "lang string, source string, n_chars long")
    r = corpus_profile_df(docs).collect()[0]
    assert (r.n_docs, r.total_chars, r.min_chars, r.max_chars) == \
        (5, 200, 10, 100)
    assert (r.p25_chars, r.median_chars, r.p75_chars) == (20.0, 30.0, 40.0)
    assert r.avg_chars == 40.0


def test_ahash_near_dup_radius_and_cap(spark):
    """Planted clones pair at hamming 0; the verify filter drops
    band-colliding pairs beyond the radius; the bucket cap removes a
    planted mega-bucket instead of going quadratic on it."""
    from geojson_vt_spark.operators.multimodal import (
        ahash_near_dup_pairs, assets_from_documents)
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    clone = base.select((F.col("doc_id") + 900000).alias("doc_id"), "text",
                        "lang", "source", "n_chars")
    assets = assets_from_documents(base.unionByName(clone))
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in ahash_near_dup_pairs(assets, max_hamming=0).collect()}
    ids = [r.doc_id for r in base.select("doc_id").collect()]
    for i in ids:
        assert pairs.get((i, i + 900000)) == 0
    # a 50-copy mega-cluster with cap below its size contributes no
    # pairs from its own bucket (its dupes are exact_dedup's job)
    mega = spark.range(50).select(
        (F.col("id") + 500000).alias("doc_id"),
        F.lit("mega perceptual cluster payload").alias("text"),
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.lit(31).alias("n_chars"))
    capped = ahash_near_dup_pairs(
        assets_from_documents(mega), max_hamming=0, bucket_cap=10)
    assert capped.count() == 0


def test_nb_classifier_learns_planted_vocabulary(spark):
    """On data with a real lexical signal the NB model classifies
    held-out docs perfectly; priors break pure-noise ties toward the
    majority class; unseen terms take the class default (score drops
    but prediction holds)."""
    from geojson_vt_spark.operators.webtext import (nb_class_df,
                                                    nb_classify_df,
                                                    nb_train_df)
    rows = []
    for i in range(40):
        lab = ["alpha", "beta"][i % 2]
        word = {"alpha": "apfel", "beta": "birne"}[lab]
        rows.append((i, f"{word} {word} noise{i % 3} {word}", lab))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = docs.where(F.col("doc_id") < 30)
    test = docs.where(F.col("doc_id") >= 30)
    pred = nb_classify_df(test, train)
    got = {r.doc_id: r.pred for r in pred.collect()}
    assert all(got[i] == ["alpha", "beta"][i % 2] for i in range(30, 40))
    # model rows: every (label, term) pair seen in training, lp < 0
    m = nb_train_df(train).collect()
    assert all(r.lp < 0 for r in m)
    assert {(r.label, r.term) for r in m} >= {("alpha", "apfel"),
                                              ("beta", "birne")}
    # class table: 2 rows, priors equal (balanced split), def_lp < lp
    c = {r.label: r for r in nb_class_df(train).collect()}
    assert c["alpha"].prior == c["beta"].prior
    seen_lp = {r.term: r.lp for r in m if r.label == "alpha"}
    assert c["alpha"].def_lp < seen_lp["apfel"]
    # a doc of only unseen terms falls back to priors + defaults and
    # still yields a deterministic (tie-broken) prediction
    odd = spark.createDataFrame([(99, "zzz qqq", "alpha")],
                                "doc_id long, text string, lang string")
    p = nb_classify_df(odd, train).collect()[0]
    assert p.pred == "alpha"          # equal scores -> smallest label


def test_ahash_dedup_plan_decodes_once(spark):
    """Regression guard for the anti-scaling two-pass shape: the
    default (window) dedup plan must contain exactly ONE Arrow decode
    stage (MapInPandas) — the hash table is consumed, not recomputed."""
    from geojson_vt_spark.operators.multimodal import (ahash_dedup_df,
                                                       assets_from_documents)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (ahash_dedup_df(assets_from_documents(docs))
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("MapInPandas") == 1, plan


def test_nb_classify_plan_shape(spark):
    """Regression guards for the NB plan: the train-side term-count
    aggregate is shared between the model and the class table
    (ReusedExchange), nothing runs in Python, and the scoring
    aggregation's exchange input is the PARTIAL aggregate (map-side
    collapse of contiguous per-doc token rows — the fix that took the
    4x8 grid from 0.37 to 0.65 efficiency)."""
    from geojson_vt_spark.operators.webtext import nb_classify_df
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = nb_classify_df(docs.where(F.col("doc_id") % 3 == 0),
                        docs.where(F.col("doc_id") % 3 != 0))
    df.collect()          # ReuseExchange lands in the AQE final plan
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "MapInPandas" not in plan
    assert "ReusedExchange" in plan, plan
    # every hash-partitioned exchange is fed by a partial aggregate or
    # an aggregate result — never by raw exploded token rows
    import re
    assert not re.search(r"Exchange hashpartitioning\([^)]*doc_id[^)]*label"
                         r"[^)]*\)[^\n]*\n\s*\+- (Project|\*\(\d+\) Project)",
                         plan), plan


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token is covered, consecutive chunks overlap by exactly
    `overlap` tokens, short docs yield one chunk, and reassembling
    stride-prefixes reproduces the token stream."""
    from geojson_vt_spark.operators.webtext import chunk_documents_df
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(300))),
         (2, "only five tokens right here"),
         (3, " ".join(f"u{i}" for i in range(128)))],
        "doc_id long, text string")
    out = chunk_documents_df(docs, chunk_tokens=128, overlap=32)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.n_tokens for r in by_doc[1]] == [128, 128, 108]
    c = [r.chunk_text.split(" ") for r in by_doc[1]]
    assert c[0][96:] == c[1][:32] and c[1][96:] == c[2][:32]
    rebuilt = c[0][:96] + c[1][:96] + c[2]
    assert rebuilt == [f"t{i}" for i in range(300)]
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 5
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tokens == 128
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents_df(docs, chunk_tokens=32, overlap=32)


def test_hilbert_matches_reference_and_is_bijective(spark):
    """Spark Hilbert d-index == plain-Python reference on a random
    grid sample, and the full order-5 curve is a bijection whose
    consecutive steps are 4-neighbours (the locality property that
    makes key ranges spatially compact — Z-order fails this at every
    diagonal seam)."""
    from geojson_vt_spark.functions.hilbert import (hilbert_xy2d,
                                                    with_hilbert)
    n = 1 << 5
    full = {}
    for x in range(n):
        for y in range(n):
            full[hilbert_xy2d(5, x, y)] = (x, y)
    assert sorted(full) == list(range(n * n))  # bijection
    for d in range(1, n * n):                  # unit steps
        (x0, y0), (x1, y1) = full[d - 1], full[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1

    df = spark.range(0, 500).select(
        ((F.col("id") * 2654435761) % 4096).alias("x"),
        ((F.col("id") * 40503) % 4096).alias("y"))
    rows = with_hilbert(df, F.col("x"), F.col("y"), 12).collect()
    for r in rows:
        assert r["hilbert_d"] == hilbert_xy2d(12, r["x"], r["y"])


def test_hilbert_scratch_columns_never_clobber_caller_data(spark):
    """with_hilbert must not silently overwrite/drop caller columns
    that happen to be named like its per-level scratch (_hx/_hy/_hd/
    _rx/_ry) — withColumns replaces silently (ADVICE r3)."""
    from geojson_vt_spark.functions.hilbert import (hilbert_xy2d,
                                                    with_hilbert)
    df = spark.range(0, 50).select(
        (F.col("id") % 32).alias("x"), ((F.col("id") * 7) % 32).alias("y"),
        F.col("id").alias("_hx"), (-F.col("id")).alias("_rx"),
        F.lit("keep").alias("_hd"))
    out = with_hilbert(df, F.col("x"), F.col("y"), 5)
    assert {"_hx", "_rx", "_hd", "hilbert_d"} <= set(out.columns)
    rows = out.collect()
    for r in rows:
        assert r["hilbert_d"] == hilbert_xy2d(5, r["x"], r["y"])
        assert r["_hd"] == "keep"
    assert {(r["_hx"], r["_rx"]) for r in rows} == \
        {(i, -i) for i in range(50)}


def test_hilbert_bbox_ranges_tiny_max_cells_bottom_out():
    """max_cells < 4 bottoms the coarsening loop out at o == 0 and must
    yield ONE exact whole-keyspace range, not duplicate stale-coord
    ranges (ADVICE r3)."""
    from geojson_vt_spark.functions.hilbert import bbox_hilbert_ranges
    for mc in (1, 2, 3):
        r = bbox_hilbert_ranges(0.1, 0.1, 0.9, 0.9, 8, max_cells=mc)
        assert r == [(0, 4 ** 8 - 1)], r
    # and a cover that fits at a mid level is unaffected
    r = bbox_hilbert_ranges(0.40, 0.40, 0.41, 0.41, 8, max_cells=64)
    assert r and all(lo <= hi for lo, hi in r)


def test_hilbert_plan_is_narrow_and_linear(spark):
    """The per-level withColumns chain stays JVM-side: zero exchanges,
    no Python workers, and the executed-plan text grows linearly in
    curve order (Catalyst must not inline the levels into one
    exponential expression tree)."""
    from geojson_vt_spark.functions.hilbert import with_hilbert
    df = spark.range(0, 10).select((F.col("id") % 64).alias("x"),
                                   (F.col("id") % 32).alias("y"))
    plans = {}
    for order in (8, 16):
        out = with_hilbert(df, F.col("x"), F.col("y"), order)
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p
        assert "Python" not in p  # pure Column, no Arrow/UDF stage
        plans[order] = len(p)
    # doubling the order should roughly double plan size, not square it
    assert plans[16] < plans[8] * 3


def test_hilbert_range_partitions_are_spatially_compact(spark):
    """cluster_by_hilbert: every range partition's cells span a
    bounded x/y extent (compact region ⇒ parquet min/max row-group
    stats prune spatial scans).  The same points range-partitioned by
    the Z-order key leave at least one partition spanning nearly the
    whole grid — the diagonal seam Hilbert removes."""
    from geojson_vt_spark.functions.geo import cell_xy_cols, tile_id_col
    from geojson_vt_spark.functions.hilbert import cluster_by_hilbert
    pts = spark.range(0, 4000).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 17000) / 100.0 - 85.0).alias("lat"))
    order, nparts = 6, 16
    n = 1 << order

    def spans(df, key):
        cx, cy = cell_xy_cols(F.col("lon"), F.col("lat"), order)
        part = df.withColumns({"cx": cx, "cy": cy}).withColumn(
            "pid", F.spark_partition_id())
        agg = (part.groupBy("pid")
               .agg((F.max("cx") - F.min("cx")).alias("dx"),
                    (F.max("cy") - F.min("cy")).alias("dy"))
               .collect())
        return [max(r["dx"], r["dy"]) for r in agg]

    hil = cluster_by_hilbert(pts, F.col("lon"), F.col("lat"),
                             order=order, num_partitions=nparts)
    zord = (pts.withColumn("z", tile_id_col(
        order, *cell_xy_cols(F.col("lon"), F.col("lat"), order)))
        .repartitionByRange(nparts, F.col("z")))
    h_spans, z_spans = spans(hil, "hilbert_d"), spans(zord, "z")
    # Hilbert: every partition covers a compact block (≤ half the grid)
    assert max(h_spans) <= n // 2 + 1, h_spans
    # Z-order: the row-major key makes most partitions full-width rows
    assert max(z_spans) >= n - 1, z_spans


def test_latest_capture_keeps_newest_and_is_idempotent(spark):
    """Planted revisits: the newest warc_ts wins per canonical URL;
    equal timestamps break to the highest id (so re-ingesting the same
    WARC twice is a no-op); n_captures counts every revisit."""
    from geojson_vt_spark.operators.webtext import latest_capture_df
    rows = [
        (1, "https://WWW.a.example.com/p?utm_source=x", 100),
        (2, "https://a.example.com/p", 300),          # newest → wins
        (3, "https://a.example.com/p/", 200),
        (4, "https://b.example.com/q", 50),
        (5, "https://b.example.com/q#frag", 50),      # tie → higher id
    ]
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts long")
    got = {r["canon_url"]: r
           for r in latest_capture_df(pages, keys_only=False).collect()}
    assert got["https://a.example.com/p"]["keep_id"] == 2
    assert got["https://a.example.com/p"]["n_captures"] == 3
    assert got["https://b.example.com/q"]["keep_id"] == 5
    assert got["https://b.example.com/q"]["n_captures"] == 2

    # idempotence: re-ingesting the identical rows changes nothing
    twice = latest_capture_df(pages.unionAll(pages), keys_only=False)
    got2 = {r["canon_url"]: (r["keep_id"],) for r in twice.collect()}
    assert {k: (v["keep_id"],) for k, v in got.items()} == got2

    # plan: the exchange carries hashes, not URLs or bodies, and the
    # aggregate is partial (map-side combine present)
    plan = (latest_capture_df(pages, keys_only=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_min" in plan or "partial" in plan.lower()

    # the keys_only scale path picks identical winners — fp halves
    # join back to the canon rows one-to-one
    slim = latest_capture_df(pages, keys_only=True)
    full = latest_capture_df(pages, keys_only=False).withColumn(
        "_h", F.md5("canon_url")).select(
        F.conv(F.substring("_h", 1, 15), 16, 10).cast("long").alias("fp1"),
        F.conv(F.substring("_h", 16, 15), 16, 10).cast("long").alias("fp2"),
        "keep_id", "n_captures")
    assert sorted(map(tuple, slim.collect())) == \
        sorted(map(tuple, full.collect()))
    # numbers-only contract: nothing variable-width leaves the agg
    assert all(f.dataType.simpleString() == "bigint"
               for f in slim.schema.fields)


def test_hilbert_bbox_ranges_cover_and_prune(spark, tmp_path):
    """S2-style region covering: every point inside a projected bbox
    lands inside the returned key ranges (superset guarantee); a small
    region's ranges span a tiny fraction of key space; and after a
    cluster_by_hilbert parquet write the BETWEEN predicates reach the
    scan as PushedFilters, so row-group min/max stats prune it."""
    from geojson_vt_spark.functions.geo import cell_xy_cols
    from geojson_vt_spark.functions.hilbert import (
        bbox_hilbert_ranges, cluster_by_hilbert, filter_bbox_by_hilbert,
        hilbert_xy2d)
    from geojson_vt_spark.functions import project_x_col, project_y_col
    order = 10

    # pure covering property against the python reference
    import random
    rnd = random.Random(7)
    for _ in range(25):
        x0, y0 = rnd.random() * 0.9, rnd.random() * 0.9
        w, h = rnd.random() * 0.1, rnd.random() * 0.1
        ranges = bbox_hilbert_ranges(x0, y0, x0 + w, y0 + h, order)
        n = 1 << order
        for _ in range(40):
            px = x0 + rnd.random() * w
            py = y0 + rnd.random() * h
            d = hilbert_xy2d(order, min(int(px * n), n - 1),
                             min(int(py * n), n - 1))
            assert any(lo <= d <= hi for lo, hi in ranges), (px, py)
        covered = sum(hi - lo + 1 for lo, hi in ranges)
        assert covered <= max((int(w * n) + 2) * (int(h * n) + 2) * 4,
                              4 ** 5), "cover far looser than the bbox"

    # end-to-end: clustered write, pushed-down range scan, exact refine
    pts = spark.range(0, 5000).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 17000) / 100.0 - 85.0).alias("lat"))
    path = str(tmp_path / "hilkeyed")
    cluster_by_hilbert(pts, F.col("lon"), F.col("lat"),
                       order=order, num_partitions=8).write.parquet(path)
    keyed = spark.read.parquet(path)
    bbox = (0.30, 0.40, 0.34, 0.44)  # projected space
    cand = filter_bbox_by_hilbert(keyed, *bbox, order=order)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "hilbert_d" in plan
    exact = (cand
             .where((project_x_col(F.col("lon")).between(bbox[0], bbox[2]))
                    & (project_y_col(F.col("lat"))
                       .between(bbox[1], bbox[3]))))
    naive = (keyed
             .where((project_x_col(F.col("lon")).between(bbox[0], bbox[2]))
                    & (project_y_col(F.col("lat"))
                       .between(bbox[1], bbox[3]))))
    got = sorted(r["point_id"] for r in exact.collect())
    want = sorted(r["point_id"] for r in naive.collect())
    assert got == want and len(want) > 0


def test_asof_join_semantics(spark):
    """Tie (equal ts matches, <= semantics), no-preceding-build null,
    equal-ts build rows collapse deterministically to max."""
    import datetime as dt
    from geojson_vt_spark.operators import asof_join_df
    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    probe = spark.createDataFrame(
        [(1, ts(5), 7), (2, ts(10), 7), (3, ts(0), 7), (4, ts(10), 8)],
        "event_id long, ts timestamp_ntz, user_id long")
    build = spark.createDataFrame(
        [(ts(5), 7, 100), (ts(5), 7, 250),     # equal-ts pair -> max
         (ts(8), 7, 300), (ts(20), 8, 400)],
        "ts timestamp_ntz, user_id long, value_cents long")
    out = {r.event_id: r for r in asof_join_df(
        probe, build, probe_cols=("event_id",),
        build_values=("value_cents",)).collect()}
    assert len(out) == 4
    assert out[1].asof_value_cents == 250          # tie at ts(5): <= holds
    assert out[2].asof_value_cents == 300          # latest at-or-before 10
    assert out[3].asof_us is None                  # nothing precedes ts(0)
    assert out[3].asof_value_cents is None
    assert out[4].asof_us is None                  # user 8 build is later


def test_range_join_overlap_and_boundaries(spark):
    """Half-open [lo, hi), overlapping intervals, bucket-boundary
    values, and parity with a naive theta-join."""
    from pyspark.sql import functions as F
    from geojson_vt_spark.operators import range_join_df
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 9, 10, 15, 19, 20, 35, 99])],
        "pid long, v long")
    ranges = spark.createDataFrame(
        [(0, 0, 10), (1, 5, 25), (2, 10, 20), (3, 90, 100)],
        "range_id long, lo long, hi long")
    got = sorted((r.pid, r.range_id) for r in range_join_df(
        points, ranges, "v", "lo", "hi", bucket_width=7).collect())
    want = sorted((r.pid, r.range_id) for r in points.join(
        ranges, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .collect())
    assert got == want
    assert (0, 0) in got and (2, 0) not in got     # hi exclusive
    assert {(3, 1), (3, 2)} <= set(got)            # overlap: both match


def test_extract_links_parses_handwritten_html(spark):
    """The extractor must parse arbitrary html bytes (not just the
    bridge's), preserve document order, and pair href with its own
    anchor text."""
    from geojson_vt_spark.operators.webgraph import (extract_links_df,
                                                     extract_title_df)
    html = (b'<html><head><title>T one</title></head><body>'
            b'<a href="https://a.example/x">first</a> mid '
            b'<a href="https://b.example/y">second</a>'
            b'<a href="https://a.example/z"></a></body></html>')
    pages = spark.createDataFrame([("https://s.example/p/0", bytearray(html))],
                                  "url string, html binary")
    rows = extract_links_df(pages).orderBy("link_ord").collect()
    assert [(r.link_ord, r.href, r.anchor, r.title) for r in rows] == [
        (0, "https://a.example/x", "first", "T one"),
        (1, "https://b.example/y", "second", "T one"),
        (2, "https://a.example/z", "", "T one")]
    t = extract_title_df(pages).collect()
    assert [(r.url, r.title) for r in t] == [("https://s.example/p/0",
                                              "T one")]


def test_extract_links_shuffle_free_plan(spark):
    """Extraction is scan→project→generate in ONE stage: no Exchange,
    no Python (BatchEvalPython/ArrowEval) anywhere in the plan."""
    from geojson_vt_spark.operators.webgraph import extract_links_df
    from geojson_vt_spark.sources.corpus import html_pages_from_documents
    docs = spark.createDataFrame([(i, "w " * 10) for i in range(8)],
                                 "doc_id long, text string")
    plan = extract_links_df(html_pages_from_documents(docs)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan and "ArrowEval" not in plan, plan


def test_link_graph_matches_bridge_rule_and_feeds_pagerank(spark):
    """End-to-end: html bytes → links → host graph equals the bridge's
    integer link rule; exactly one slim-key exchange with map-side
    partial aggregation; pagerank runs on the result."""
    from geojson_vt_spark.operators.graph import pagerank_df
    from geojson_vt_spark.operators.webgraph import (extract_links_df,
                                                     host_link_graph_df)
    from geojson_vt_spark.sources.corpus import html_pages_from_documents
    docs = spark.createDataFrame([(i, f"text {i}") for i in range(200)],
                                 "doc_id long, text string")
    g = host_link_graph_df(extract_links_df(html_pages_from_documents(docs)))
    got = {(r.src_host, r.dst_host): r.n_links for r in g.collect()}
    want: dict = {}
    for i in range(200):
        for j in range(1 + i % 4):
            k = (f"h{i % 997:03d}.example",
                 f"h{(i * 31 + (j + 1) * 7) % 997:03d}.example")
            want[k] = want.get(k, 0) + 1
    assert got == want
    plan = g._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
    key_spec = plan.split("Exchange hashpartitioning")[1].split("\n", 1)[0]
    assert "html" not in key_spec and "text" not in key_spec
    assert "partial_count" in plan, plan  # map-side combine
    from geojson_vt_spark.operators.webgraph import host_pagerank_df
    ranks = {r.host: r.rank_micros for r in host_pagerank_df(g).collect()}
    assert len(ranks) == len({h for k in want for h in k})
    assert all(v > 0 for v in ranks.values())
