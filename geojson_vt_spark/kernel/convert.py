"""GeoJSON → projected vt-feature conversion.

Reproduces /root/reference/src/convert.js: Web-Mercator projection to the
unit square, per-ring size metric (shoelace area / polyline length), the
one-shot Douglas-Peucker importance pass at max-zoom tolerance, and
id promotion/generation — vectorized with numpy per ring.

Float-parity notes: every expression keeps the reference's operation
order (JS doubles == numpy float64 for identically-ordered IEEE ops);
running sums use ``np.cumsum`` which accumulates in the same sequential
order as the JS ``+=`` loops.
"""

from __future__ import annotations

import math

import numpy as np

from ..options import TileOptions
from .feature import Ring, VTFeature, create_feature
from .jsmath import js_log, js_sin
from .simplify import simplify

INVALID_GEOJSON_MSG = "Input data is not a valid GeoJSON object."


def project_x(lon):
    """Unit-square Web-Mercator x (/root/reference/src/convert.js:131-133)."""
    return lon / 360 + 0.5


def project_y(lat):
    """Unit-square Web-Mercator y, clamped to [0,1]
    (/root/reference/src/convert.js:135-139)."""
    s = js_sin(lat * np.pi / 180)
    with np.errstate(divide="ignore", invalid="ignore"):
        y = 0.5 - 0.25 * js_log((1 + s) / (1 - s)) / np.pi
    return np.where(y < 0, 0.0, np.where(y > 1, 1.0, y))


def convert(data: dict, options: TileOptions) -> list[VTFeature]:
    """Normalize FeatureCollection / Feature / bare geometry into a flat
    projected feature list (/root/reference/src/convert.js:7-23)."""
    features: list[VTFeature] = []
    t = data.get("type")
    if t == "FeatureCollection":
        for i, f in enumerate(data["features"]):
            _convert_feature(features, f, options, i)
    elif t == "Feature":
        _convert_feature(features, data, options, None)
    else:
        # single geometry or a geometry collection
        _convert_feature(features, {"geometry": data}, options, None)
    return features


def _convert_feature(features, geojson, options, index) -> None:
    geometry = geojson.get("geometry")
    if not geometry:
        return  # silently drop null-geometry features (convert.js:26)

    coords = geometry.get("coordinates")
    if coords is not None and len(coords) == 0:
        return  # silently drop empty-coordinate features (convert.js:29)

    gtype = geometry.get("type")
    tolerance = (options.tolerance / ((1 << options.max_zoom) * options.extent)) ** 2

    fid = geojson.get("id")
    if options.promote_id:
        fid = (geojson.get("properties") or {}).get(options.promote_id)
    elif options.generate_id:
        fid = index if index else 0  # reference quirk: `id = index || 0`

    if gtype == "Point":
        geom = _convert_point(coords)
    elif gtype == "MultiPoint":
        geom = _convert_points(coords)
    elif gtype == "LineString":
        geom = _convert_line(coords, tolerance, False)
    elif gtype == "MultiLineString":
        if options.line_metrics:
            # explode into single LineStrings so metrics can be tracked
            for line in coords:
                features.append(create_feature(
                    fid, "LineString",
                    _convert_line(line, tolerance, False),
                    geojson.get("properties"),
                ))
            return
        geom = [_convert_line(line, tolerance, False) for line in coords]
    elif gtype == "Polygon":
        geom = [_convert_line(ring, tolerance, True) for ring in coords]
    elif gtype == "MultiPolygon":
        geom = [[_convert_line(r, tolerance, True) for r in poly] for poly in coords]
    elif gtype == "GeometryCollection":
        for single in geometry["geometries"]:
            _convert_feature(features, {
                "id": fid,
                "geometry": single,
                "properties": geojson.get("properties"),
            }, options, index)
        return
    else:
        raise ValueError(INVALID_GEOJSON_MSG)

    features.append(create_feature(fid, gtype, geom, geojson.get("properties")))


def _convert_point(coords) -> Ring:
    x = float(project_x(np.float64(coords[0])))
    y = float(project_y(np.float64(coords[1])))
    return Ring(np.array([x, y, 0.0]))


def _convert_points(coords) -> Ring:
    arr = np.asarray([[p[0], p[1]] for p in coords], dtype=np.float64)
    xyz = np.zeros(len(coords) * 3)
    xyz[0::3] = project_x(arr[:, 0])
    xyz[1::3] = project_y(arr[:, 1])
    return Ring(xyz)


def _convert_line(line_coords, tolerance: float, is_polygon: bool) -> Ring:
    """Project one ring/line, compute its size metric and importances
    (/root/reference/src/convert.js:92-121)."""
    n = len(line_coords)
    arr = np.asarray([[p[0], p[1]] for p in line_coords], dtype=np.float64)
    x = project_x(arr[:, 0]) if n else np.empty(0)
    y = project_y(arr[:, 1]) if n else np.empty(0)
    xyz = np.zeros(n * 3)
    xyz[0::3] = x
    xyz[1::3] = y

    if n > 1:
        if is_polygon:
            terms = (x[:-1] * y[1:] - x[1:] * y[:-1]) / 2  # signed area halves
        else:
            terms = np.sqrt((x[1:] - x[:-1]) ** 2 + (y[1:] - y[:-1]) ** 2)
        size = float(np.cumsum(terms)[-1])
    else:
        size = 0.0

    if n > 0:
        last = (n - 1) * 3
        xyz[2] = 1.0  # endpoints forced kept (convert.js:114,116)
        simplify(xyz, 0, last, tolerance)
        xyz[last + 2] = 1.0

    size = math.fabs(size)
    return Ring(xyz, size=size, start=0.0, end=size)
