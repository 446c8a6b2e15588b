"""getTile drill-down parity (/root/reference/test/test-get-tile.js)."""

from geojson_vt_spark import TileOptions
from geojson_vt_spark.kernel import LocalTileIndex

from .util_fixtures import load_fixture

SQUARE = [{
    "geometry": [[[-64, 4160], [-64, -64], [4160, -64], [4160, 4160], [-64, 4160]]],
    "type": 3,
    "tags": {"name": "Pennsylvania", "density": 284.3},
    "id": "42",
}]


def test_get_tile_us_states():
    index = LocalTileIndex(load_fixture("us-states.json"), TileOptions())

    expected = load_fixture("us-states-z7-37-48.json")
    assert index.get_tile(7, 37, 48)["features"] == expected
    assert index.get_tile("7", "37", "48")["features"] == expected, "string z/x/y"

    assert index.get_tile(9, 148, 192)["features"] == SQUARE, "clipped square"

    assert index.get_tile(11, 800, 400) is None, "non-existing tile"
    assert index.get_tile(-5, 123, 400) is None, "invalid tile"
    assert index.get_tile(25, 200, 200) is None, "invalid tile"

    assert index.total == 37


def test_unbuffered_tile_left_right_edges():
    index = LocalTileIndex({
        "type": "LineString",
        "coordinates": [[0, 90], [0, -90]],
    }, TileOptions(buffer=0))

    assert index.get_tile(2, 1, 1) is None
    assert index.get_tile(2, 2, 1)["features"] == [
        {"geometry": [[[0, 0], [0, 4096]]], "type": 2, "tags": None}]


def test_unbuffered_tile_top_bottom_edges():
    index = LocalTileIndex({
        "type": "LineString",
        "coordinates": [[-90, 66.51326044311188], [90, 66.51326044311188]],
    }, TileOptions(buffer=0))

    assert index.get_tile(2, 1, 0)["features"] == [
        {"geometry": [[[0, 4096], [4096, 4096]]], "type": 2, "tags": None}]
    assert index.get_tile(2, 1, 1)["features"] == []


def test_polygon_clipping_on_boundary():
    index = LocalTileIndex({
        "type": "Polygon",
        "coordinates": [[
            [42.1875, 57.32652122521708],
            [47.8125, 57.32652122521708],
            [47.8125, 54.16243396806781],
            [42.1875, 54.16243396806781],
            [42.1875, 57.32652122521708],
        ]],
    }, TileOptions(buffer=1024))

    assert index.get_tile(5, 19, 9)["features"] == [{
        "geometry": [[[3072, 3072], [5120, 3072], [5120, 5120],
                      [3072, 5120], [3072, 3072]]],
        "type": 3,
        "tags": None,
    }]
