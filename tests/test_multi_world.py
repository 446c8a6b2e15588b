"""Antimeridian world-copy parity (/root/reference/test/test-multi-world.js)."""

from geojson_vt_spark import TileOptions
from geojson_vt_spark.kernel import LocalTileIndex, to_id

LEFT_POINT = {
    "type": "Feature", "properties": {},
    "geometry": {"coordinates": [-540, 0], "type": "Point"},
}
RIGHT_POINT = {
    "type": "Feature", "properties": {},
    "geometry": {"coordinates": [540, 0], "type": "Point"},
}


def _tile0(index):
    return index.tiles[to_id(0, 0, 0)]


def test_point_only_in_rightside_world():
    vt = LocalTileIndex(RIGHT_POINT, TileOptions())
    f = _tile0(vt).features[0]
    assert f.geometry[0][0] == 1
    assert f.geometry[0][1] == 0.5


def test_point_only_in_leftside_world():
    vt = LocalTileIndex(LEFT_POINT, TileOptions())
    f = _tile0(vt).features[0]
    assert f.geometry[0][0] == 0
    assert f.geometry[0][1] == 0.5


def test_points_in_both_worlds():
    vt = LocalTileIndex({
        "type": "FeatureCollection",
        "features": [LEFT_POINT, RIGHT_POINT],
    }, TileOptions())
    feats = _tile0(vt).features
    assert feats[0].geometry[0][0] == 0
    assert feats[0].geometry[0][1] == 0.5
    assert feats[1].geometry[0][0] == 1
    assert feats[1].geometry[0][1] == 0.5
