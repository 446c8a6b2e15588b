"""Distributed split-path differential: the per-zoom loop (whose
crossing features run the Arrow-native split kernel in
pipeline.split_children_df) must match the object kernel — itself
pinned to the live reference by test_property_parity — on corpora
mixing every geometry kind, id shape, and lineMetrics, with a tiny
handoff budget so splits happen at every zoom instead of fusing into
one wave."""

import random

from geojson_vt_spark import TileOptions
from geojson_vt_spark.engine import SparkTileEngine
from geojson_vt_spark.kernel import LocalTileIndex

from .test_property_parity import _rand_geometry


def _mixed_collection(seed: int, n: int) -> dict:
    rng = random.Random(seed)
    feats = []
    for i in range(n):
        f = {"type": "Feature",
             "properties": {"p": rng.randint(0, 9), "prop0": f"v{i}"},
             "geometry": _rand_geometry(rng)}
        fid = rng.choice([None, i, str(i), f"id-{i}"])
        if fid is not None:
            f["id"] = fid
        feats.append(f)
    return {"type": "FeatureCollection", "features": feats}


def test_split_arrow_loop_matches_object_kernel(spark, tmp_path):
    data = _mixed_collection(77, 48)
    for lm in (False, True):
        opts = TileOptions(max_zoom=5, index_max_zoom=3,
                           index_max_points=8, tolerance=1, buffer=64,
                           line_metrics=lm)
        eng = SparkTileEngine(spark, opts,
                              workdir=str(tmp_path / f"lm{int(lm)}"),
                              one_wave=False, subtree_max_points=40)
        eng.build_from_geojson(data)
        idx = LocalTileIndex(data, opts)
        expected = {}
        for t in list(idx.tiles.values()):
            expected[f"z{t.z}-{t.x}-{t.y}"] = \
                idx.get_tile(t.z, t.x, t.y)["features"]
        got = eng.enumerate_tiles()
        assert set(got) == set(expected), lm
        bad = [k for k in expected if got[k] != expected[k]]
        assert not bad, (lm, bad[:5])
        # drill past the built pyramid on both sides
        for zxy in [(5, 15, 15), (4, 7, 8), (5, 0, 17)]:
            a = eng.get_tile(*zxy)
            b = idx.get_tile(*zxy)
            assert (a is None) == (b is None), zxy
            if a is not None:
                assert a["features"] == b["features"], zxy
