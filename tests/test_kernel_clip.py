"""Clip-operator unit parity (/root/reference/test/test-clip.js)."""

import math

import numpy as np

from geojson_vt_spark.kernel import Ring, VTFeature, clip_features

GEOM1 = [0,0,0,50,0,0,50,10,0,20,10,0,20,20,0,30,20,0,30,30,0,50,30,0,50,40,0,
         25,40,0,25,50,0,0,50,0,0,60,0,25,60,0]
GEOM2 = [0,0,0,50,0,0,50,10,0,0,10,0]


def _line_feature(flat, tags, maxx, maxy, size=None, start=None, end=None):
    ring = Ring(np.asarray(flat, dtype=np.float64), size=size, start=start, end=end)
    return VTFeature(None, "LineString", ring, tags, 0, 0, maxx, maxy)


def _ring_list(f):
    g = f.geometry
    if isinstance(g, Ring):
        return [g.xyz.tolist()]
    return [r.xyz.tolist() for r in g]


def test_clips_polylines():
    clipped = clip_features([
        _line_feature(GEOM1, 1, 50, 60),
        _line_feature(GEOM2, 2, 50, 10),
    ], 1, 10, 40, 0, -math.inf, math.inf, False)

    assert len(clipped) == 2
    f1, f2 = clipped
    assert f1.type == "MultiLineString"
    assert _ring_list(f1) == [
        [10,0,1,40,0,1],
        [40,10,1,20,10,0,20,20,0,30,20,0,30,30,0,40,30,1],
        [40,40,1,25,40,0,25,50,0,10,50,1],
        [10,60,1,25,60,0]]
    assert f1.tags == 1
    assert (f1.minx, f1.miny, f1.maxx, f1.maxy) == (10, 0, 40, 60)
    assert f2.type == "MultiLineString"
    assert _ring_list(f2) == [[10,0,1,40,0,1], [40,10,1,10,10,1]]
    assert (f2.minx, f2.miny, f2.maxx, f2.maxy) == (10, 0, 40, 10)


def test_clips_lines_with_metrics():
    size = 0.0
    for i in range(0, len(GEOM1) - 3, 3):
        dx = GEOM1[i + 3] - GEOM1[i]
        dy = GEOM1[i + 4] - GEOM1[i + 1]
        size += math.sqrt(dx * dx + dy * dy)

    clipped = clip_features(
        [_line_feature(GEOM1, None, 50, 60, size=size, start=0.0, end=size)],
        1, 10, 40, 0, -math.inf, math.inf, True)

    assert [[f.geometry.start, f.geometry.end] for f in clipped] == \
        [[10, 40], [70, 130], [160, 200], [230, 245]]


def _closed(flat):
    return flat + flat[:3]


def test_clips_polygons():
    def poly_feature(flat, tags, maxx, maxy):
        ring = Ring(np.asarray(_closed(flat), dtype=np.float64))
        return VTFeature(None, "Polygon", [ring], tags, 0, 0, maxx, maxy)

    clipped = clip_features([
        poly_feature(GEOM1, 1, 50, 60),
        poly_feature(GEOM2, 2, 50, 10),
    ], 1, 10, 40, 0, -math.inf, math.inf, False)

    f1, f2 = clipped
    assert f1.type == "Polygon"
    assert _ring_list(f1) == [[10,0,1,40,0,1,40,10,1,20,10,0,20,20,0,30,20,0,
                               30,30,0,40,30,1,40,40,1,25,40,0,25,50,0,10,50,1,
                               10,60,1,25,60,0,10,24,1,10,0,1]]
    assert f2.type == "Polygon"
    assert _ring_list(f2) == [[10,0,1,40,0,1,40,10,1,10,10,1,10,0,1]]


def test_clips_points():
    def pts_feature(flat, tags, maxx, maxy):
        return VTFeature(None, "MultiPoint",
                         Ring(np.asarray(flat, dtype=np.float64)),
                         tags, 0, 0, maxx, maxy)

    clipped = clip_features([
        pts_feature(GEOM1, 1, 50, 60),
        pts_feature(GEOM2, 2, 50, 10),
    ], 1, 10, 40, 0, -math.inf, math.inf, False)

    assert len(clipped) == 1
    f = clipped[0]
    assert f.type == "MultiPoint"
    assert f.geometry.xyz.tolist() == [20,10,0,20,20,0,30,20,0,30,30,0,
                                       25,40,0,25,50,0,25,60,0]
    assert (f.minx, f.miny, f.maxx, f.maxy) == (20, 10, 30, 60)
