"""Tile assembly: per-zoom tolerance filtering, tiny-ring dropping,
winding-order normalization and stats.

Reproduces /root/reference/src/tile.js.  Simplification here is just a
threshold filter over the importance scores precomputed at ingest — the
reference's core performance trick (SURVEY.md §4) — so it vectorizes to
a numpy boolean mask per ring.
"""

from __future__ import annotations

import numpy as np

from ..options import TileOptions
from .feature import Ring, VTFeature


class Tile:
    __slots__ = ("features", "num_points", "num_simplified", "num_features",
                 "source", "x", "y", "z", "minx", "miny", "maxx", "maxy")

    def __init__(self, z, x, y, num_features):
        self.features = []
        self.num_points = 0
        self.num_simplified = 0
        self.num_features = num_features
        self.source = None
        self.x = x
        self.y = y
        self.z = z
        # sentinel bbox (/root/reference/src/tile.js:14-17)
        self.minx = 2.0
        self.miny = 1.0
        self.maxx = -1.0
        self.maxy = 0.0


class TileFeature:
    __slots__ = ("geometry", "type", "tags", "id", "has_id")

    def __init__(self, geometry, type, tags, id, has_id):
        self.geometry = geometry  # type 1: (k,2) array; else list[(k,2) array]
        self.type = type          # 1=point, 2=line, 3=polygon
        self.tags = tags
        self.id = id
        self.has_id = has_id


def create_tile(features, z, tx, ty, options: TileOptions) -> Tile:
    tolerance = 0.0 if z == options.max_zoom else (
        options.tolerance / ((1 << z) * options.extent))
    tile = Tile(z, tx, ty, len(features))
    for f in features:
        _add_feature(tile, f, tolerance, options)
    return tile


def _add_feature(tile: Tile, f: VTFeature, tolerance: float,
                 options: TileOptions) -> None:
    t = f.type

    # tile bbox grows even when the feature simplifies away entirely
    # (/root/reference/src/tile.js:30-33)
    tile.minx = min(tile.minx, f.minx)
    tile.miny = min(tile.miny, f.miny)
    tile.maxx = max(tile.maxx, f.maxx)
    tile.maxy = max(tile.maxy, f.maxy)

    if t in ("Point", "MultiPoint"):
        pts = f.geometry.xyz.reshape(-1, 3)
        simplified = pts[:, :2].copy()
        tile.num_points += pts.shape[0]
        tile.num_simplified += pts.shape[0]
        geometry = simplified if simplified.size else None
    elif t == "LineString":
        rings = [_filter_ring(tile, f.geometry, tolerance, False, False)]
        geometry = [r for r in rings if r is not None]
    elif t in ("MultiLineString", "Polygon"):
        is_poly = t == "Polygon"
        geometry = []
        for i, ring in enumerate(f.geometry):
            r = _filter_ring(tile, ring, tolerance, is_poly, i == 0)
            if r is not None:
                geometry.append(r)
    else:  # MultiPolygon
        geometry = []
        for poly in f.geometry:
            for i, ring in enumerate(poly):
                r = _filter_ring(tile, ring, tolerance, True, i == 0)
                if r is not None:
                    geometry.append(r)

    if geometry is not None and (
            (t in ("Point", "MultiPoint") and geometry.size) or
            (t not in ("Point", "MultiPoint") and len(geometry))):
        tags = f.tags if f.tags is not None else None

        if t == "LineString" and options.line_metrics:
            tags = dict(f.tags) if f.tags else {}
            tags["mapbox_clip_start"] = f.geometry.start / f.geometry.size
            tags["mapbox_clip_end"] = f.geometry.end / f.geometry.size

        type_code = 3 if t in ("Polygon", "MultiPolygon") else (
            2 if t in ("LineString", "MultiLineString") else 1)
        tile.features.append(TileFeature(
            geometry, type_code, tags, f.id, f.id is not None))


def _filter_ring(tile: Tile, ring: Ring, tolerance: float,
                 is_polygon: bool, is_outer: bool):
    """Per-ring tolerance filter + rewind
    (/root/reference/src/tile.js:85-106).  Returns an (k,2) array of the
    surviving vertices, or None when the whole ring is dropped as tiny."""
    sq_tolerance = tolerance * tolerance
    n = ring.n_vertices

    if tolerance > 0 and ring.size < (sq_tolerance if is_polygon else tolerance):
        tile.num_points += n
        return None  # drop tiny polygons / polylines early

    pts = ring.xyz.reshape(-1, 3)
    if tolerance == 0:
        kept = pts[:, :2].copy()
        tile.num_simplified += n
    else:
        mask = pts[:, 2] > sq_tolerance
        kept = pts[mask][:, :2]
        tile.num_simplified += int(mask.sum())
    tile.num_points += n

    if is_polygon:
        kept = _rewind(kept, is_outer)
    return kept


def _rewind(ring2: np.ndarray, clockwise: bool) -> np.ndarray:
    """Force outer rings clockwise, inner counter-clockwise in y-down tile
    space (/root/reference/src/tile.js:108-123)."""
    if ring2.shape[0] == 0:
        return ring2
    x = ring2[:, 0]
    y = ring2[:, 1]
    xj = np.roll(x, 1)
    yj = np.roll(y, 1)
    terms = (x - xj) * (y + yj)
    area = float(np.cumsum(terms)[-1])
    if (area > 0) == clockwise:
        return ring2[::-1].copy()
    return ring2
