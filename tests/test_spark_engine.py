"""Distributed engine parity: the Spark pyramid must reproduce the
reference goldens tile-for-tile, byte-identically."""

import pytest

from geojson_vt_spark import TileOptions
from geojson_vt_spark.engine import SparkTileEngine

from .util_fixtures import load_fixture


def _gen_tiles_spark(spark, tmp_path, data, **opts):
    merged = {"index_max_zoom": 0, "index_max_points": 10000}
    merged.update(opts)
    eng = SparkTileEngine(spark, TileOptions(**merged), workdir=str(tmp_path))
    eng.build_from_geojson(data)
    return eng


@pytest.mark.parametrize("input_file,expected_file,opts", [
    ("feature.json", "feature-tiles.json", {}),
    ("collection.json", "collection-tiles.json", {}),
    ("single-geom.json", "single-geom-tiles.json", {}),
    ("dateline.json", "dateline-metrics-tiles.json", {"line_metrics": True}),
    ("ids.json", "ids-promote-id-tiles.json", {"promote_id": "prop0"}),
])
def test_spark_full_tiling_small(spark, tmp_path, input_file, expected_file, opts):
    eng = _gen_tiles_spark(spark, tmp_path, load_fixture(input_file), **opts)
    assert eng.enumerate_tiles() == load_fixture(expected_file)


@pytest.mark.slow
def test_spark_full_tiling_us_states(spark, tmp_path):
    eng = _gen_tiles_spark(spark, tmp_path, load_fixture("us-states.json"),
                           index_max_zoom=7, index_max_points=200)
    assert eng.enumerate_tiles() == load_fixture("us-states-tiles.json")


def test_spark_get_tile_drilldown(spark, tmp_path):
    eng = SparkTileEngine(spark, TileOptions(), workdir=str(tmp_path))
    eng.build_from_geojson(load_fixture("us-states.json"))

    expected = load_fixture("us-states-z7-37-48.json")
    assert eng.get_tile(7, 37, 48)["features"] == expected
    assert eng.get_tile("7", "37", "48")["features"] == expected

    square = [{
        "geometry": [[[-64, 4160], [-64, -64], [4160, -64],
                      [4160, 4160], [-64, 4160]]],
        "type": 3,
        "tags": {"name": "Pennsylvania", "density": 284.3},
        "id": "42",
    }]
    assert eng.get_tile(9, 148, 192)["features"] == square

    assert eng.get_tile(11, 800, 400) is None
    assert eng.get_tile(-5, 123, 400) is None
    assert eng.get_tile(25, 200, 200) is None

    assert eng.total_tiles() == 37


def test_spark_resume_mid_pyramid(spark, tmp_path):
    """Kill-and-resume: lineage checkpoints let a new engine continue
    without recomputing finished zooms (north_rule requirement)."""
    from geojson_vt_spark.pipeline import (features_from_json_df,
                                           geojson_to_input_rows, wrap_df)
    data = load_fixture("us-states.json")
    opts = TileOptions(index_max_zoom=4, index_max_points=200)

    full = SparkTileEngine(spark, opts, workdir=str(tmp_path / "full"))
    full.build_from_geojson(data)

    # simulate a killed run: copy checkpoints of zooms 0..2 only
    import json as _json
    import shutil
    part_dir = tmp_path / "part"
    for sub in ("frontier", "tiles", "tilefeat", "sources"):
        for zdir in sorted((tmp_path / "full" / sub).glob("z=*")):
            zv = int(zdir.name.split("=")[1])
            if zv <= 3 if sub == "frontier" else zv <= 2:
                shutil.copytree(zdir, part_dir / sub / zdir.name)
    lines = [_json.loads(ln) for ln in
             (tmp_path / "full" / "lineage.json").read_text().splitlines()]
    (part_dir / "lineage.json").write_text(
        "\n".join(_json.dumps(r) for r in lines if r.get("zoom", 99) <= 2) + "\n")

    resumed = SparkTileEngine(spark, opts, workdir=str(part_dir))
    df = features_from_json_df(
        spark.createDataFrame(geojson_to_input_rows(data),
                              "input_ord long, gen_index long, feature_json string"),
        opts)
    resumed.build(wrap_df(df, opts), resume=True)

    assert resumed.enumerate_tiles() == full.enumerate_tiles()


def test_spark_get_tiles_batch(spark, tmp_path):
    """get_tiles resolves a mixed batch (hits, drill-downs, misses)
    identically to per-request get_tile."""
    eng = SparkTileEngine(spark, TileOptions(), workdir=str(tmp_path))
    eng.build_from_geojson(load_fixture("us-states.json"))

    coords = [(0, 0, 0), (7, 37, 48), (9, 148, 192), (11, 800, 400),
              (25, 200, 200)]
    batch = eng.get_tiles(coords)

    ref = SparkTileEngine(spark, TileOptions(), workdir=str(tmp_path / "b"))
    ref.build_from_geojson(load_fixture("us-states.json"))
    for c in coords:
        one = ref.get_tile(*c)
        if one is None:
            assert batch[c] is None
        else:
            assert batch[c]["features"] == one["features"]


def test_spark_tile_coords_matches_reference_order(spark, tmp_path):
    """SparkTileEngine.tile_coords() must enumerate in the reference's
    insertion order (index.js tileCoords) — pinned by the kernel index,
    which is itself fixture-verified against the live reference —
    including tiles appended by drill-down getTile calls."""
    from geojson_vt_spark.kernel import LocalTileIndex

    data = load_fixture("us-states.json")
    opts = TileOptions(index_max_zoom=4, index_max_points=500)
    eng = SparkTileEngine(spark, opts, workdir=str(tmp_path))
    eng.build_from_geojson(data)
    ref = LocalTileIndex(data, opts)
    assert eng.tile_coords() == ref.tile_coords

    for c in [(7, 37, 48), (9, 148, 192), (6, 20, 30)]:
        eng.get_tile(*c)
        ref.get_tile(*c)
    assert eng.tile_coords() == ref.tile_coords


def test_spark_get_tiles_all_hit_two_jobs(spark, tmp_path):
    """An all-hit batch (distributed + subtree tiles, several zooms)
    must resolve in at most 2 Spark jobs (VERDICT r1 #7)."""
    eng = SparkTileEngine(spark, TileOptions(index_max_zoom=3,
                                             index_max_points=200),
                          workdir=str(tmp_path))
    eng.build_from_geojson(load_fixture("us-states.json"))

    coords = [(z, x, y) for (z, x, y) in eng.tile_coords()][:12]
    assert len(coords) >= 6
    eng.warm()  # open the stores once, like a serving process would

    sc = spark.sparkContext
    sc.setJobGroup("gvt-batch-hit", "all-hit batch")
    batch = eng.get_tiles(coords)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("gvt-batch-hit"))
    sc.setJobGroup(None, None)
    assert n_jobs <= 2, f"all-hit batch ran {n_jobs} Spark jobs"
    for c in coords:
        one = eng.get_tile(*c)
        assert batch[c]["features"] == one["features"]


def test_spark_batch_deep_drill_bounded_jobs(spark, tmp_path):
    """A get_tiles batch of 100+ drill-down descendants of one retained
    source must resolve in a BOUNDED number of Spark jobs (existence
    fetch + the 2-job drill prefetch — VERDICT r2 #8), with outputs
    identical to the reference kernel per-call path."""
    from geojson_vt_spark.kernel import LocalTileIndex

    data = load_fixture("us-states.json")
    opts = TileOptions(index_max_zoom=3, index_max_points=200)
    eng = SparkTileEngine(spark, opts, workdir=str(tmp_path))
    eng.build_from_geojson(data)
    eng.warm()

    # pick a built leaf that retains a source, then enumerate its
    # descendants three levels down (4^3 = 64 per leaf; two leaves
    # give 128 requests)
    leaves = [r for r in eng.tiles()
              .where("has_source AND num_features > 0")
              .select("z", "x", "y").collect()][:2]
    assert len(leaves) == 2
    coords = []
    for r in leaves:
        dz = 3
        for dx in range(1 << dz):
            for dy in range(1 << dz):
                coords.append((r["z"] + dz, (r["x"] << dz) + dx,
                               (r["y"] << dz) + dy))
    assert len(coords) >= 100

    sc = spark.sparkContext
    sc.setJobGroup("gvt-batch-drill", "deep drill batch")
    batch = eng.get_tiles(coords)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("gvt-batch-drill"))
    sc.setJobGroup(None, None)
    assert n_jobs <= 4, f"deep-drill batch ran {n_jobs} Spark jobs"

    ref = LocalTileIndex(data, opts)
    for c in coords:
        want = ref.get_tile(*c)
        if want is None:
            assert batch[c] is None, c
        else:
            assert batch[c]["features"] == want["features"], c


def test_spark_resume_view_mode_corpus(spark, tmp_path):
    """Kill-and-resume through build_from_converted's no-wrap fast path,
    where the z0 frontier is a VIEW over the features checkpoint (no
    frontier/z=0 directory exists on disk)."""
    import json as _json
    import shutil

    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=4, index_max_points=200)
    pages = synth_pages_df(spark, 2000, seed=5)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    full = SparkTileEngine(spark, opts, workdir=str(tmp_path / "full"),
                           subtree_max_points=500)
    full.build_from_converted(feats)
    assert not (tmp_path / "full" / "frontier" / "z=0").exists(), \
        "no-wrap corpus build must use the z0 view"

    # simulate a kill after zoom 1: features + early checkpoints only
    part = tmp_path / "part"
    shutil.copytree(tmp_path / "full" / "features", part / "features")
    for sub in ("frontier", "tiles", "tilefeat", "sources"):
        src = tmp_path / "full" / sub
        if not src.exists():
            continue
        for zdir in sorted(src.glob("z=*")):
            zv = int(zdir.name.split("=")[1])
            if (zv <= 2 if sub == "frontier" else zv <= 1):
                shutil.copytree(zdir, part / sub / zdir.name)
    lines = [_json.loads(ln) for ln in
             (tmp_path / "full" / "lineage.json").read_text().splitlines()]
    (part / "lineage.json").write_text(
        "\n".join(_json.dumps(r) for r in lines
                  if r.get("zoom", 99) <= 1) + "\n")

    resumed = SparkTileEngine(spark, opts, workdir=str(part),
                              subtree_max_points=500)
    resumed.build_from_converted(feats, resume=True)
    assert resumed.enumerate_tiles() == full.enumerate_tiles()


def test_one_wave_matches_loop_layout(spark, tmp_path):
    """The one-wave fast path (router → clip-from-parent kernel groups,
    no per-zoom rounds) must produce byte-identical tiles, stats,
    insertion order and drill-down behavior to the distributed loop on
    the same corpus — including z1 roots classified by the in-kernel
    stop rule and the split root's empty children."""
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=500)
    pages = synth_pages_df(spark, 2500, seed=11)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    wave = SparkTileEngine(spark, opts, workdir=str(tmp_path / "w"),
                           one_wave=True)
    wave.build_from_converted(feats, approx_rows=2500)
    loop = SparkTileEngine(spark, opts, workdir=str(tmp_path / "l"),
                           one_wave=False)
    loop.build_from_converted(feats)

    # the wave layout really is one-wave (no z1 frontier, no z1 render)
    assert not (tmp_path / "w" / "frontier").exists()
    assert not (tmp_path / "w" / "tilefeat" / "z=1").exists()
    assert (tmp_path / "l" / "frontier" / "z=1").exists()

    a, b = wave.enumerate_tiles(), loop.enumerate_tiles()
    assert set(a) == set(b)
    assert not [k for k in a if a[k] != b[k]]
    assert wave.tile_coords() == loop.tile_coords()
    ra = {(r["z"], r["x"], r["y"]): r for r in wave.tiles().collect()}
    rb = {(r["z"], r["x"], r["y"]): r for r in loop.tiles().collect()}
    assert ra == rb
    for zxy in [(0, 0, 0), (1, 0, 0), (1, 1, 1), (4, 3, 7),
                (9, 137, 190), (12, 1100, 1500)]:
        ta, tb = wave.get_tile(*zxy), loop.get_tile(*zxy)
        assert (ta is None) == (tb is None), zxy
        if ta is not None:
            assert ta["features"] == tb["features"], zxy
    assert wave.verify_snapshot() == []


def test_one_wave_resume_rebuilds_missing_wave(spark, tmp_path):
    """Kill-and-resume on the one-wave path: a missing subtree batch is
    re-run from the durable features checkpoint (there is no z1
    frontier store to replay), and a completed build resumes as a
    no-op."""
    import shutil

    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=5, index_max_points=300)
    pages = synth_pages_df(spark, 1500, seed=23)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    eng = SparkTileEngine(spark, opts, workdir=str(tmp_path / "e"),
                          one_wave=True)
    eng.build_from_converted(feats, approx_rows=1500)
    want = eng.enumerate_tiles()
    lineage = (tmp_path / "e" / "lineage.json").read_text()
    assert '"one_wave": true' in lineage

    # no-op resume: nothing to redo
    again = SparkTileEngine(spark, opts, workdir=str(tmp_path / "e"))
    again.build_from_converted(feats, resume=True)
    assert again.enumerate_tiles() == want

    # killed mid-wave: subtree batch gone, lineage intact → the resume
    # path re-runs the fused wave from the features checkpoint
    shutil.rmtree(tmp_path / "e" / "subtree")
    resumed = SparkTileEngine(spark, opts, workdir=str(tmp_path / "e"))
    resumed.build_from_converted(feats, resume=True)
    assert resumed.enumerate_tiles() == want


def test_deep_wave_matches_loop_layout(spark, tmp_path):
    """Deep one-wave (heavy z1 children subdivided into a root-only z1
    task + four z2 grandchild subtree tasks + driver-side empty
    back-fill) must be indistinguishable from the distributed loop:
    same tiles, stats, insertion order, drill-downs, snapshot
    integrity.  _DEEP_WAVE_PTS is forced to 1 so every
    guaranteed-split child takes the deep path."""
    import os as _os

    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=100)
    pages = synth_pages_df(spark, 2500, seed=11)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    deep = SparkTileEngine(spark, opts, workdir=str(tmp_path / "d"),
                           one_wave=True)
    deep._DEEP_WAVE_PTS = 1
    deep.build_from_converted(feats, approx_rows=2500)
    loop = SparkTileEngine(spark, opts, workdir=str(tmp_path / "l"),
                           one_wave=False)
    loop.build_from_converted(feats)

    # the wave really subdivided: z2 subtree parts + root-only z1 parts
    parts = _os.listdir(tmp_path / "d" / "subtree" / "b=1")
    assert any(p.startswith("part-z2-") for p in parts), parts
    assert any(p.startswith("part-z1-") for p in parts), parts

    a, b = deep.enumerate_tiles(), loop.enumerate_tiles()
    assert set(a) == set(b)
    assert not [k for k in a if a[k] != b[k]]
    assert deep.tile_coords() == loop.tile_coords()
    ra = {(r["z"], r["x"], r["y"]): r for r in deep.tiles().collect()}
    rb = {(r["z"], r["x"], r["y"]): r for r in loop.tiles().collect()}
    assert ra == rb
    for zxy in [(0, 0, 0), (1, 0, 0), (2, 1, 2), (4, 3, 7),
                (9, 137, 190), (12, 1100, 1500)]:
        ta, tb = deep.get_tile(*zxy), loop.get_tile(*zxy)
        assert (ta is None) == (tb is None), zxy
        if ta is not None:
            assert ta["features"] == tb["features"], zxy
    assert deep.verify_snapshot() == []

    # kill-and-resume: the deep wave re-runs deterministically
    import shutil as _sh
    _sh.rmtree(tmp_path / "d" / "subtree")
    resumed = SparkTileEngine(spark, opts, workdir=str(tmp_path / "d"))
    resumed._DEEP_WAVE_PTS = 1
    resumed.build_from_converted(feats, resume=True)
    assert resumed.enumerate_tiles() == a


def test_forest_wave_matches_loop_layout(spark, tmp_path):
    """Forest wave (bounded quadtree cut: leaf subtree tasks + narrow
    distributed renders of internal cells + driver empty back-fill)
    must be indistinguishable from the per-zoom loop: same tiles,
    stats, insertion order, drill-downs.  _KERNEL_PTS_PER_TASK is
    shrunk so the one-wave is ineligible and the cut recurses deep."""
    import json as _json
    import shutil as _sh

    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=100)
    pages = synth_pages_df(spark, 2500, seed=11)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    forest = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                             one_wave=True)
    forest._KERNEL_PTS_PER_TASK = 2000
    forest.build_from_converted(feats, approx_rows=2500)
    lin = [_json.loads(ln)
           for ln in open(tmp_path / "f" / "lineage.json")]
    assert any(r.get("forest") for r in lin), lin
    st = [r for r in lin if r.get("subtree_batch")][0]["steps"]
    assert st["n_leaves"] and st["n_internal"], st

    loop = SparkTileEngine(spark, opts, workdir=str(tmp_path / "l"),
                           one_wave=False)
    loop.build_from_converted(feats)

    a, b = forest.enumerate_tiles(), loop.enumerate_tiles()
    assert set(a) == set(b)
    assert not [k for k in a if a[k] != b[k]]
    assert forest.tile_coords() == loop.tile_coords()
    ra = {(r["z"], r["x"], r["y"]): r for r in forest.tiles().collect()}
    rb = {(r["z"], r["x"], r["y"]): r for r in loop.tiles().collect()}
    assert ra == rb
    for zxy in [(0, 0, 0), (1, 0, 0), (2, 1, 2), (4, 3, 7),
                (9, 137, 190), (12, 1100, 1500)]:
        ta, tb = forest.get_tile(*zxy), loop.get_tile(*zxy)
        assert (ta is None) == (tb is None), zxy
        if ta is not None:
            assert ta["features"] == tb["features"], zxy
    assert forest.verify_snapshot() == []

    # kill-and-resume: no lineage → clean rebuild from the checkpoint
    _sh.rmtree(tmp_path / "f" / "subtree")
    (tmp_path / "f" / "lineage.json").unlink()
    resumed = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                              one_wave=True)
    resumed._KERNEL_PTS_PER_TASK = 2000
    resumed.build_from_converted(feats, resume=True)
    assert resumed.enumerate_tiles() == a


def test_forest_wave_line_metrics_parity(spark, tmp_path):
    """Forest parity on the lineMetrics + nondefault tolerance/buffer
    surface (the clip-start/end tag injection rides the shared render
    kernel inside the narrow internal-cell render)."""
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=5, index_max_points=60,
                       line_metrics=True, tolerance=2, buffer=96)
    pages = synth_pages_df(spark, 1500, seed=23)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)
    forest = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                             one_wave=True)
    forest._KERNEL_PTS_PER_TASK = 1500
    forest.build_from_converted(feats, approx_rows=1500)
    loop = SparkTileEngine(spark, opts, workdir=str(tmp_path / "l"),
                           one_wave=False)
    loop.build_from_converted(feats)
    a, b = forest.enumerate_tiles(), loop.enumerate_tiles()
    assert set(a) == set(b)
    assert not [k for k in a if a[k] != b[k]]
    ra = {(r["z"], r["x"], r["y"]): r for r in forest.tiles().collect()}
    rb = {(r["z"], r["x"], r["y"]): r for r in loop.tiles().collect()}
    assert ra == rb
    assert forest.tile_coords() == loop.tile_coords()


def test_tile_count_matches_tiles_count(spark, tmp_path):
    """tile_count() (parquet-footer metadata, no Spark job) must equal
    tiles().count() on every build layout: loop, one-wave, forest."""
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=100)
    pages = synth_pages_df(spark, 2500, seed=11)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    wave = SparkTileEngine(spark, opts, workdir=str(tmp_path / "w"),
                           one_wave=True)
    wave.build_from_converted(feats, approx_rows=2500)
    assert wave.tile_count() == wave.tiles().count()

    loop = SparkTileEngine(spark, opts, workdir=str(tmp_path / "l"),
                           one_wave=False)
    loop.build_from_converted(feats)
    assert loop.tile_count() == loop.tiles().count()

    forest = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                             one_wave=True)
    forest._KERNEL_PTS_PER_TASK = 2000
    forest.build_from_converted(feats, approx_rows=2500)
    assert forest.tile_count() == forest.tiles().count()


def test_forest_straggler_matches_loop_layout(spark, tmp_path):
    """Forest wave with STRAGGLER leaves: a giant boundary-crossing
    polygon gives cut cells huge candidate mass with zero
    guaranteed-inside mass, so the subdivision-soundness rule cannot
    split them.  The probe + partition-spread render path (round-5)
    must make them bit-identical to the per-zoom loop — tiles, stats,
    insertion order, and drill-down THROUGH a straggler stop tile's
    task-written per-feature source parts."""
    import json as _json
    import math as _math

    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=100)
    pages = synth_pages_df(spark, 2500, seed=11)
    ring = [(60.0 * _math.cos(2 * _math.pi * i / 2000),
             60.0 * _math.sin(2 * _math.pi * i / 2000))
            for i in range(2000)]
    ring.append(ring[0])
    giant = _json.dumps({
        "type": "Feature", "id": 999999,
        "properties": {"url": "https://example.test/giant"},
        "geometry": {"type": "Polygon",
                     "coordinates": [[[round(x, 6), round(y, 6)]
                                      for x, y in ring]]},
    }, separators=(",", ":"))
    ingest = extract_geo_features_df(pages).unionByName(
        spark.createDataFrame(
            [(999999, 999999, giant)],
            "input_ord long, gen_index long, feature_json string"))
    feats = features_from_json_df(ingest, opts)

    forest = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                             one_wave=True)
    forest._KERNEL_PTS_PER_TASK = 2000
    forest.build_from_converted(feats, approx_rows=2501)
    lin = [_json.loads(ln) for ln in open(tmp_path / "f" / "lineage.json")]
    assert any(r.get("forest") for r in lin), lin
    st = [r for r in lin if r.get("subtree_batch")][0]["steps"]
    assert st.get("n_stragglers", 0) >= 1, st
    assert st.get("n_stops", 0) >= 1, st

    loop = SparkTileEngine(spark, opts, workdir=str(tmp_path / "l"),
                           one_wave=False)
    loop.build_from_converted(feats)

    a, b = forest.enumerate_tiles(), loop.enumerate_tiles()
    assert set(a) == set(b)
    assert not [k for k in a if a[k] != b[k]]
    assert forest.tile_coords() == loop.tile_coords()
    ra = {(r["z"], r["x"], r["y"]): r for r in forest.tiles().collect()}
    rb = {(r["z"], r["x"], r["y"]): r for r in loop.tiles().collect()}
    assert ra == rb
    # drill through the straggler region (stop-tile sources) and beyond
    stops = sorted(k for k, r in ra.items()
                   if r["has_source"] and not r["is_split"]
                   and r["num_points"] > 0)
    deep = []
    for z, x, y in stops[:3] + stops[-3:]:
        deep.append((z + 2, 4 * x + 1, 4 * y + 2))
        deep.append((z + 3, 8 * x + 3, 8 * y + 5))
    for zxy in deep + [(0, 0, 0), (9, 255, 255), (12, 2047, 2047)]:
        ta, tb = forest.get_tile(*zxy), loop.get_tile(*zxy)
        assert (ta is None) == (tb is None), zxy
        if ta is not None:
            assert ta["features"] == tb["features"], zxy


def test_forest_kill_resume_into_loop_leaves_no_phantoms(spark, tmp_path):
    """A kill mid-forest-wave leaves partial TASK-side store parts
    (subtree b=1, tilefeat z=N) with no lineage.  If the resume then
    runs the per-zoom LOOP (different handoff/render levels), the
    stale parts must not surface as phantom/duplicate tiles — resume
    with zero complete lineage rows performs the fresh-build store
    cleanup."""
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=100)
    pages = synth_pages_df(spark, 2500, seed=11)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    # loop-only oracle in a separate workdir
    loop = SparkTileEngine(spark, opts, workdir=str(tmp_path / "l"),
                           one_wave=False)
    loop.build_from_converted(feats)
    want = loop.enumerate_tiles()

    # forest build, then simulate the kill: all stores on disk but the
    # lineage (which the forest writes LAST) never landed
    forest = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                             one_wave=True)
    forest._KERNEL_PTS_PER_TASK = 2000
    forest.build_from_converted(feats, approx_rows=2500)
    (tmp_path / "f" / "lineage.json").unlink()
    assert (tmp_path / "f" / "subtree" / "b=1").exists()

    # resume through the LOOP path on the same workdir
    resumed = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                              one_wave=False)
    resumed.build_from_converted(feats, resume=True)
    got = resumed.enumerate_tiles()
    assert set(got) == set(want)
    assert not [k for k in got if got[k] != want[k]]
    assert resumed.tile_coords() == loop.tile_coords()


def test_forest_resume_recreates_lost_subtree_store(spark, tmp_path):
    """A completed forest build whose subtree store is lost (deleted /
    disk swap) must re-create it on resume from the leaf cut keys
    recorded in the forest lineage row — not silently return 'build
    already finished' with most tiles missing."""
    import json as _json
    import shutil as _sh

    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=100)
    pages = synth_pages_df(spark, 2500, seed=11)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    forest = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                             one_wave=True)
    forest._KERNEL_PTS_PER_TASK = 2000
    forest.build_from_converted(feats, approx_rows=2500)
    want = forest.enumerate_tiles()
    lin = [_json.loads(ln) for ln in open(tmp_path / "f" / "lineage.json")]
    final = [r for r in lin if r.get("final")][0]
    assert final.get("forest") and final.get("handoff"), final

    _sh.rmtree(tmp_path / "f" / "subtree")
    resumed = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                              one_wave=True)
    resumed._KERNEL_PTS_PER_TASK = 2000
    resumed.build_from_converted(feats, resume=True)
    got = resumed.enumerate_tiles()
    assert set(got) == set(want)
    assert not [k for k in got if got[k] != want[k]]


def test_full_kill_resume_reenters_forest_path(spark, tmp_path):
    """A crash-resume with nothing durable except the features
    checkpoint must re-enter the same build path the original attempt
    took: the resume agg re-derives the z0 classification stats in the
    same pass as the wrap counts, so a forest-eligible corpus rebuilds
    through the forest wave, not the per-zoom loop."""
    import json as _json
    import shutil as _sh

    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=100)
    pages = synth_pages_df(spark, 2500, seed=11)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    forest = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                             one_wave=True)
    forest._KERNEL_PTS_PER_TASK = 2000
    forest.build_from_converted(feats, approx_rows=2500)
    want = forest.enumerate_tiles()

    # kill everything but the features checkpoint
    for store in ("tiles", "tilefeat", "subtree", "sources", "frontier"):
        p = tmp_path / "f" / store
        if p.exists():
            _sh.rmtree(p)
    (tmp_path / "f" / "lineage.json").unlink()

    resumed = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                              one_wave=True)
    resumed._KERNEL_PTS_PER_TASK = 2000
    resumed.build_from_converted(feats, resume=True)
    lin = [_json.loads(ln) for ln in open(tmp_path / "f" / "lineage.json")]
    assert any(r.get("forest") for r in lin), lin  # same path, not loop
    got = resumed.enumerate_tiles()
    assert set(got) == set(want)
    assert not [k for k in got if got[k] != want[k]]


def test_vertex_probe_proves_boundary_cluster_split(spark, tmp_path):
    """A dense cluster STRADDLING a cell edge defeats the bbox gate's
    fully-inside proof (every bbox crosses the boundary, i == 0) but
    not the vertex-survival prover: strictly-inside vertices survive
    the clip, so their per-cell count is an exact lower bound on
    post-clip num_points.  The cut must subdivide the boundary cells
    (internal, no funneled mega-task), the probe counts must equal a
    driver-side recount with the same window floats, and the forest
    output must stay loop-identical."""
    import json as _json
    import math

    from geojson_vt_spark.pipeline import (features_from_json_df,
                                           forest_vertex_probe_df)

    # 300 hexagons crossing the x=0.5 meridian line, each wider than
    # 2x the buffer margin so NO z1 buffered window fully contains it
    rows = []
    for i in range(300):
        cx_lon = (0.47 + (i % 60) * 0.001 - 0.5 + 0.03) * 360.0
        cy_lat = (i % 7 - 3) * 2.0
        ring = []
        for k in range(6):
            a = 2 * math.pi * k / 6
            ring.append([round(cx_lon + 11.0 * math.cos(a), 5),
                         round(cy_lat + 5.0 * math.sin(a), 5)])
        ring.append(ring[0])
        fj = ('{"type":"Feature","properties":{},"geometry":'
              '{"type":"Polygon","coordinates":[' +
              _json.dumps(ring) + ']}}')
        rows.append((i, None, fj))
    src = spark.createDataFrame(
        rows, "input_ord long, gen_index long, feature_json string")

    opts = TileOptions(index_max_zoom=5, index_max_points=100)
    feats = features_from_json_df(src, opts)

    eng = SparkTileEngine(spark, opts, workdir=str(tmp_path / "f"),
                          one_wave=True)
    eng._KERNEL_PTS_PER_TASK = 500
    fr0 = eng._frontier0_view(feats)

    # exact-count check: probe == driver-side recount on the same
    # strict window floats
    roots = [(1, 0, 0), (1, 1, 0), (1, 0, 1), (1, 1, 1)]
    got = {(r["lvl"], r["x"], r["y"]): r["v"]
           for r in forest_vertex_probe_df(fr0, opts, roots,
                                           [1, 2]).collect()}
    k1c = 0.5 * opts.buffer / opts.extent
    k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c

    def window(lvl, c):
        z2l = float(1 << (lvl - 1))
        par = float(c >> 1)
        if c & 1:
            return (par + k2c) / z2l, (par + k4c) / z2l
        return (par - k1c) / z2l, (par + k3c) / z2l

    want = {}
    for row in fr0.select("coords").collect():
        cs = row["coords"]
        for j in range(0, len(cs), 3):
            vx, vy = cs[j], cs[j + 1]
            for lvl in (1, 2):
                for cx in range(1 << lvl):
                    xlo, xhi = window(lvl, cx)
                    if not (xlo < vx < xhi):
                        continue
                    for cy in range(1 << lvl):
                        ylo, yhi = window(lvl, cy)
                        if ylo < vy < yhi:
                            k = (lvl, cx, cy)
                            want[k] = want.get(k, 0) + 1
    assert got == want

    # the bbox gate alone cannot prove the straddling cells split
    from geojson_vt_spark.pipeline import forest_gate_df
    gate = forest_gate_df(fr0, opts, eng._FOREST_MAX_LEVEL).collect()
    z1 = {(r["lvl"], r["x"], r["y"]): (r["m"], r["i"])
          for r in gate if r["lvl"] == 1}
    budget = eng._KERNEL_PTS_PER_TASK
    imz = opts.index_max_zoom
    blind = [k for k, (m, i) in z1.items()
             if m * (imz - 1) > budget and i <= opts.index_max_points]
    assert blind, z1  # the scenario really is i-blind

    # full build: the cut must subdivide (vprobe ran, internals exist)
    eng.build_from_converted(feats, approx_rows=300)
    lin = [_json.loads(ln) for ln in open(tmp_path / "f" / "lineage.json")]
    st = [r for r in lin if r.get("subtree_batch")][0]["steps"]
    assert st.get("vprobe") is not None, st
    assert st["n_internal"] >= 1, st

    loop = SparkTileEngine(spark, opts, workdir=str(tmp_path / "l"),
                           one_wave=False)
    loop.build_from_converted(feats)
    a, b = eng.enumerate_tiles(), loop.enumerate_tiles()
    assert set(a) == set(b)
    assert not [k for k in a if a[k] != b[k]]
    assert eng.tile_coords() == loop.tile_coords()


def test_slot_wave_matches_group_wave(spark, tmp_path, monkeypatch):
    """The driver-packed slot wave (LPT bins, driver-chosen slot ints)
    and the group-keyed wave must write identical stores: per-cell
    part names, tiles, stats, insertion order.  Also pins
    _slot_values: the driver's chosen ints must hash onto distinct
    shuffle buckets (the whole point of the trick)."""
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    opts = TileOptions(index_max_zoom=6, index_max_points=100)
    pages = synth_pages_df(spark, 2500, seed=11)
    feats = features_from_json_df(extract_geo_features_df(pages), opts)

    a = SparkTileEngine(spark, opts, workdir=str(tmp_path / "slot"),
                        one_wave=True)
    a._KERNEL_PTS_PER_TASK = 2000
    vals = a._slot_values(13)
    from pyspark.sql import functions as F
    got = (spark.createDataFrame([(v,) for v in vals], "v int")
           .select(F.pmod(F.hash("v"), F.lit(13)).alias("b")).collect())
    assert sorted(r["b"] for r in got) == list(range(13))
    a.build_from_converted(feats, approx_rows=2500)

    monkeypatch.setenv("GVT_NO_SLOTPACK", "1")
    b = SparkTileEngine(spark, opts, workdir=str(tmp_path / "grp"),
                        one_wave=True)
    b._KERNEL_PTS_PER_TASK = 2000
    b.build_from_converted(feats, approx_rows=2500)

    ta, tb = a.enumerate_tiles(), b.enumerate_tiles()
    assert set(ta) == set(tb)
    assert not [k for k in ta if ta[k] != tb[k]]
    assert a.tile_coords() == b.tile_coords()
    import os as _os
    pa_ = sorted(_os.listdir(tmp_path / "slot" / "subtree" / "b=1"))
    pb_ = sorted(_os.listdir(tmp_path / "grp" / "subtree" / "b=1"))
    assert pa_ == pb_  # per-cell deterministic names, wave-shape oblivious
