"""Feature model for the geometry kernel.

The reference attaches scalar metrics to plain flat JS arrays
(``[x, y, importance, ...]`` with ``.size/.start/.end``,
/root/reference/src/convert.js:100,113-121 and
/root/reference/src/clip.js:172-178).  Here a ring is a numpy float64
array (stride 3) wrapped with those metrics — the same SoA layout Arrow
uses, so the identical code path serves both the local kernel and the
Spark pandas-UDF batches.
"""

from __future__ import annotations

import numpy as np

# geometry nesting per type (mirrors /root/reference/src/feature.js:14-31):
#   Point / MultiPoint / LineString      -> Ring
#   MultiLineString / Polygon            -> list[Ring]
#   MultiPolygon                         -> list[list[Ring]]


class Ring:
    __slots__ = ("xyz", "size", "start", "end")

    def __init__(self, xyz, size=None, start=None, end=None):
        self.xyz = np.asarray(xyz, dtype=np.float64)
        self.size = size
        self.start = start
        self.end = end

    @property
    def n_vertices(self) -> int:
        return self.xyz.shape[0] // 3

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ring({self.xyz.tolist()}, size={self.size})"


class VTFeature:
    __slots__ = ("id", "type", "geometry", "tags", "minx", "miny", "maxx", "maxy")

    def __init__(self, id, type, geometry, tags, minx, miny, maxx, maxy):
        self.id = id
        self.type = type
        self.geometry = geometry
        self.tags = tags
        self.minx = minx
        self.miny = miny
        self.maxx = maxx
        self.maxy = maxy

    def rings(self):
        """Iterate all rings regardless of nesting depth."""
        t = self.type
        if t in ("Point", "MultiPoint", "LineString"):
            yield self.geometry
        elif t in ("MultiLineString", "Polygon"):
            yield from self.geometry
        else:  # MultiPolygon
            for poly in self.geometry:
                yield from poly

    @property
    def n_vertices(self) -> int:
        return sum(r.n_vertices for r in self.rings())


def create_feature(id, type, geom, tags) -> VTFeature:
    """Build a feature and compute its bbox.

    Bbox semantics follow /root/reference/src/feature.js:2-43: for
    (Multi)Polygon only the *outer* rings participate (the outer ring
    contains all inner rings).
    """
    f = VTFeature(
        id=id, type=type, geometry=geom, tags=tags,
        minx=float("inf"), miny=float("inf"),
        maxx=float("-inf"), maxy=float("-inf"),
    )
    if type in ("Point", "MultiPoint", "LineString"):
        _grow_bbox(f, geom)
    elif type == "Polygon":
        _grow_bbox(f, geom[0])
    elif type == "MultiLineString":
        for line in geom:
            _grow_bbox(f, line)
    elif type == "MultiPolygon":
        for poly in geom:
            _grow_bbox(f, poly[0])
    return f


def _grow_bbox(f: VTFeature, ring: Ring) -> None:
    xyz = ring.xyz
    if xyz.size == 0:
        return
    xs = xyz[0::3]
    ys = xyz[1::3]
    f.minx = min(f.minx, float(xs.min()))
    f.miny = min(f.miny, float(ys.min()))
    f.maxx = max(f.maxx, float(xs.max()))
    f.maxy = max(f.maxy, float(ys.max()))
