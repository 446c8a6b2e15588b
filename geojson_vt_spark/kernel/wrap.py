"""Antimeridian (dateline) handling.

Reproduces /root/reference/src/wrap.js: clip the projected world into
left/center/right copies, shift the side copies by ±1 world width, and
concatenate left ++ center ++ right (the concat order is observable in
golden tile feature ordering).
"""

from __future__ import annotations

import numpy as np

from ..options import TileOptions
from .clip import clip_features
from .feature import Ring, create_feature


def wrap(features, options: TileOptions):
    buffer = options.buffer / options.extent
    merged = features
    lm = options.line_metrics
    left = clip_features(features, 1, -1 - buffer, buffer, 0, -1, 2, lm)
    right = clip_features(features, 1, 1 - buffer, 2 + buffer, 0, -1, 2, lm)

    if left or right:
        merged = clip_features(features, 1, -buffer, 1 + buffer, 0, -1, 2, lm) or []
        if left:
            merged = shift_features(left, 1.0) + merged
        if right:
            merged = merged + shift_features(right, -1.0)
    return merged


def shift_features(features, offset: float):
    """Shift every x coordinate by ±1 world width, preserving metrics
    (/root/reference/src/wrap.js:21-68)."""
    out = []
    for f in features:
        t = f.type
        if t in ("Point", "MultiPoint", "LineString"):
            geom = _shift_ring(f.geometry, offset)
        elif t in ("MultiLineString", "Polygon"):
            geom = [_shift_ring(r, offset) for r in f.geometry]
        else:  # MultiPolygon
            geom = [[_shift_ring(r, offset) for r in poly] for poly in f.geometry]
        out.append(create_feature(f.id, t, geom, f.tags))
    return out


def _shift_ring(ring: Ring, offset: float) -> Ring:
    xyz = ring.xyz.copy()
    xyz[0::3] = xyz[0::3] + offset
    new = Ring(xyz, size=ring.size)
    if ring.start is not None:
        new.start = ring.start
        new.end = ring.end
    return new
