"""Randomized differential testing: the kernel index must match the
live reference engine (running under node) on arbitrary generated
GeoJSON and option combinations — beyond what the fixed fixtures pin."""

import json
import random
import subprocess

import pytest

from geojson_vt_spark import TileOptions
from geojson_vt_spark.kernel import LocalTileIndex

NODE_HARNESS = r"""
import('/root/reference/src/index.js').then(m => {
  const fs = require('fs');
  const cases = JSON.parse(fs.readFileSync(0, 'utf8'));
  const out = cases.map(c => {
    try {
      const index = m.default(c.data, c.options);
      const tiles = {};
      for (const id in index.tiles) {
        const t = index.tiles[id];
        tiles[`z${t.z}-${t.x}-${t.y}`] = index.getTile(t.z, t.x, t.y).features;
      }
      for (const [z, x, y] of c.probes || []) {
        const r = index.getTile(z, x, y);
        tiles[`probe-${z}-${x}-${y}`] = r ? r.features : null;
      }
      return {tiles};
    } catch (e) { return {error: String(e.message)}; }
  });
  process.stdout.write(JSON.stringify(out));
});
"""


def _rand_coord(rng, wild=False):
    if wild and rng.random() < 0.15:
        lon = rng.choice([-540, -180, 180, 540, 0]) + rng.uniform(-5, 5)
    else:
        lon = rng.uniform(-180, 180)
    lat = rng.uniform(-85, 85)
    return [round(lon, 6), round(lat, 6)]


def _rand_line(rng, n_min=2, n_max=12, wild=False):
    return [_rand_coord(rng, wild) for _ in range(rng.randint(n_min, n_max))]


def _rand_ring(rng, wild=False):
    pts = _rand_line(rng, 3, 10, wild)
    return pts + [pts[0]]


def _rand_geometry(rng, depth=0):
    kinds = ["Point", "MultiPoint", "LineString", "MultiLineString",
             "Polygon", "MultiPolygon"]
    if depth == 0:
        kinds.append("GeometryCollection")
    k = rng.choice(kinds)
    wild = rng.random() < 0.3
    if k == "Point":
        return {"type": k, "coordinates": _rand_coord(rng, wild)}
    if k == "MultiPoint":
        return {"type": k, "coordinates": _rand_line(rng, 1, 6, wild)}
    if k == "LineString":
        return {"type": k, "coordinates": _rand_line(rng, 2, 15, wild)}
    if k == "MultiLineString":
        return {"type": k, "coordinates":
                [_rand_line(rng, 2, 8, wild) for _ in range(rng.randint(1, 3))]}
    if k == "Polygon":
        return {"type": k, "coordinates":
                [_rand_ring(rng, wild) for _ in range(rng.randint(1, 3))]}
    if k == "MultiPolygon":
        return {"type": k, "coordinates":
                [[_rand_ring(rng, wild)] for _ in range(rng.randint(1, 3))]}
    return {"type": "GeometryCollection",
            "geometries": [_rand_geometry(rng, 1) for _ in range(rng.randint(1, 3))]}


def _rand_case(rng):
    n = rng.randint(1, 8)
    feats = []
    for i in range(n):
        fid = rng.choice([None, i, str(i), f"id-{i}"])
        f = {"type": "Feature",
             "properties": {"p": rng.randint(0, 9), "prop0": f"v{i}"},
             "geometry": _rand_geometry(rng)}
        if fid is not None:
            f["id"] = fid
        feats.append(f)
    data = {"type": "FeatureCollection", "features": feats}
    options = {
        "maxZoom": rng.randint(2, 6),
        "indexMaxZoom": rng.randint(0, 3),
        "indexMaxPoints": rng.choice([1, 5, 50, 100000]),
        "tolerance": rng.choice([0, 1, 3, 10]),
        "buffer": rng.choice([0, 16, 64, 512]),
        "lineMetrics": rng.random() < 0.3,
    }
    if rng.random() < 0.2:
        options["promoteId"] = "prop0"
    elif rng.random() < 0.2:
        options["generateId"] = True
    probes = [[rng.randint(0, options["maxZoom"]),
               rng.randint(-4, 12), rng.randint(0, 12)] for _ in range(3)]
    return {"data": data, "options": options, "probes": probes}


def _py_options(o):
    return TileOptions(
        max_zoom=o["maxZoom"], index_max_zoom=o["indexMaxZoom"],
        index_max_points=o["indexMaxPoints"], tolerance=o["tolerance"],
        buffer=o["buffer"], line_metrics=o["lineMetrics"],
        promote_id=o.get("promoteId"), generate_id=o.get("generateId", False))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_cases_match_reference(seed):
    rng = random.Random(seed)
    cases = [_rand_case(rng) for _ in range(60)]

    ref = json.loads(subprocess.run(
        ["node", "-e", NODE_HARNESS], input=json.dumps(cases),
        capture_output=True, text=True, check=True).stdout)

    for i, (case, expected) in enumerate(zip(cases, ref)):
        assert "error" not in expected, expected
        index = LocalTileIndex(case["data"], _py_options(case["options"]))
        got = {}
        for tile in list(index.tiles.values()):
            got[f"z{tile.z}-{tile.x}-{tile.y}"] = \
                index.get_tile(tile.z, tile.x, tile.y)["features"]
        for z, x, y in case["probes"]:
            r = index.get_tile(z, x, y)
            got[f"probe-{z}-{x}-{y}"] = r["features"] if r else None
        assert got == expected["tiles"], \
            f"case {i} seed {seed}: options={case['options']}"


@pytest.mark.slow
@pytest.mark.parametrize("promote_id", [False, True])
def test_spark_engine_matches_live_node_on_corpus(spark, tmp_path,
                                                  promote_id):
    """The FULL distributed engine (convert → wrap → per-zoom loop →
    subtree handoff → serving) must match the live reference engine
    tile-for-tile on corpus-extracted polygons and an unpinned config —
    the strongest end-to-end oracle, previously only run by hand."""
    import shutil as _shutil

    if _shutil.which("node") is None:
        pytest.skip("node not available")

    from geojson_vt_spark.engine import SparkTileEngine
    from geojson_vt_spark.pipeline import features_from_json_df
    from geojson_vt_spark.sources.corpus import (extract_geo_features_df,
                                                 synth_pages_df)

    pages = synth_pages_df(spark, 3000, seed=11)
    rows = sorted(extract_geo_features_df(pages).collect(),
                  key=lambda r: r.input_ord)
    options = {"maxZoom": 9, "indexMaxZoom": 5, "indexMaxPoints": 300,
               "tolerance": 3, "buffer": 64, "lineMetrics": False}
    if promote_id:
        options["promoteId"] = "url"  # string feature ids end-to-end
    data = {"type": "FeatureCollection",
            "features": [json.loads(r.feature_json) for r in rows]}
    probes = [[7, 40, 50], [8, 100, 90], [9, 200, 180], [6, 20, 25]]

    ref = json.loads(subprocess.run(
        ["node", "-e", NODE_HARNESS],
        input=json.dumps([{"data": data, "options": options,
                           "probes": probes}]),
        capture_output=True, text=True, check=True).stdout)[0]
    assert "error" not in ref, ref

    eng = SparkTileEngine(spark, _py_options(options),
                          workdir=str(tmp_path))
    df = spark.createDataFrame(
        [(r.input_ord, r.gen_index, r.feature_json) for r in rows],
        "input_ord long, gen_index long, feature_json string")
    eng.build_from_converted(features_from_json_df(df, _py_options(options)))

    got = eng.enumerate_tiles()
    want = {k: v for k, v in ref["tiles"].items()
            if not k.startswith("probe-")}
    assert set(got) == set(want), (
        f"tile sets differ: {len(got)} vs {len(want)}")
    mism = [k for k in want if got[k] != want[k]]
    assert not mism, f"{len(mism)} tiles differ, e.g. {mism[:3]}"
    assert len(want) > 100

    for (z, x, y) in probes:
        want_t = ref["tiles"][f"probe-{z}-{x}-{y}"]
        got_t = eng.get_tile(z, x, y)
        if want_t is None:
            assert got_t is None, (z, x, y)
        else:
            assert got_t["features"] == want_t, (z, x, y)
