"""Golden full-pyramid parity vs the reference fixtures
(/root/reference/test/test-full.js)."""

import pytest

from geojson_vt_spark.kernel.convert import INVALID_GEOJSON_MSG

from .util_fixtures import gen_tiles, load_fixture


@pytest.mark.parametrize("input_file,expected_file,opts", [
    ("us-states.json", "us-states-tiles.json",
     {"index_max_zoom": 7, "index_max_points": 200}),
    ("dateline.json", "dateline-tiles.json",
     {"index_max_zoom": 0, "index_max_points": 10000}),
    ("dateline.json", "dateline-metrics-tiles.json",
     {"index_max_zoom": 0, "index_max_points": 10000, "line_metrics": True}),
    ("feature.json", "feature-tiles.json",
     {"index_max_zoom": 0, "index_max_points": 10000}),
    ("collection.json", "collection-tiles.json",
     {"index_max_zoom": 0, "index_max_points": 10000}),
    ("single-geom.json", "single-geom-tiles.json",
     {"index_max_zoom": 0, "index_max_points": 10000}),
    ("ids.json", "ids-promote-id-tiles.json",
     {"index_max_zoom": 0, "promote_id": "prop0"}),
    ("ids.json", "ids-generate-id-tiles.json",
     {"index_max_zoom": 0, "generate_id": True}),
])
def test_full_tiling(input_file, expected_file, opts):
    actual = gen_tiles(load_fixture(input_file), **opts)
    expected = load_fixture(expected_file)
    assert actual == expected


def test_throws_on_invalid_geojson():
    with pytest.raises(ValueError, match="not a valid GeoJSON"):
        gen_tiles({"type": "Pologon"})
    assert INVALID_GEOJSON_MSG  # imported symbol stays referenced


def test_empty_geojson():
    assert gen_tiles(load_fixture("empty.json")) == {}


def test_null_geometry():
    assert gen_tiles(load_fixture("feature-null-geometry.json")) == {}


def test_empty_coordinates():
    assert gen_tiles(load_fixture("empty-coords.json")) == {}
