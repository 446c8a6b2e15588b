"""Axis-parallel stripe clipping.

Reproduces /root/reference/src/clip.js semantics exactly: trivial bbox
accept/reject, Sutherland-Hodgman-style stripe walk with interpolated
crossings (importance forced to 1), line slicing on exit, polygon ring
re-closing, type demotion, and line-metrics tracking.

Implementation strategy (Spark-first, not a translation): vertex
classifications, crossing-segment detection and cumulative lengths are
computed vectorized with numpy; Python only touches the (few) segments
that actually cross a boundary, while homogeneous interior runs are
bulk-copied — so cost is O(vertices) numpy + O(crossings) Python per
ring, which is what makes the pandas-UDF split stage cheap at scale.
"""

from __future__ import annotations

import numpy as np

from .feature import Ring, VTFeature, create_feature


def clip_features(features, scale, k1, k2, axis, min_all, max_all, line_metrics):
    """Clip a feature list between two parallel lines on one axis.

    Returns None when nothing survives (/root/reference/src/clip.js:14-86).
    """
    k1 /= scale
    k2 /= scale

    if min_all >= k1 and max_all < k2:
        return features  # trivial accept
    if max_all < k1 or min_all >= k2:
        return None  # trivial reject

    clipped = []
    for f in features:
        clipped.extend(clip_feature(f, k1, k2, axis, line_metrics))
    return clipped if clipped else None


def clip_feature(f: VTFeature, k1, k2, axis, line_metrics) -> list[VTFeature]:
    """Clip a single feature; may explode into several (lineMetrics)."""
    fmin = f.minx if axis == 0 else f.miny
    fmax = f.maxx if axis == 0 else f.maxy

    if fmin >= k1 and fmax < k2:
        return [f]  # trivial accept: feature passes through unchanged
    if fmax < k1 or fmin >= k2:
        return []  # trivial reject

    t = f.type
    if t in ("Point", "MultiPoint"):
        new_xyz = _clip_points(f.geometry.xyz, k1, k2, axis)
        if new_xyz.size == 0:
            return []
        new_type = "Point" if new_xyz.size == 3 else "MultiPoint"
        return [create_feature(f.id, new_type, Ring(new_xyz), f.tags)]

    if t == "LineString":
        slices = clip_ring(f.geometry, k1, k2, axis, False, line_metrics)
        if not slices:
            return []
        if line_metrics:
            # explode each clipped slice into its own LineString feature
            # so per-slice start/end metrics survive (clip.js:62-67)
            return [create_feature(f.id, "LineString", s, f.tags) for s in slices]
        if len(slices) == 1:
            return [create_feature(f.id, "LineString", slices[0], f.tags)]
        return [create_feature(f.id, "MultiLineString", slices, f.tags)]

    if t == "MultiLineString":
        slices = []
        for line in f.geometry:
            slices.extend(clip_ring(line, k1, k2, axis, False, False))
        if not slices:
            return []
        if len(slices) == 1:  # demotion (clip.js:69-76)
            return [create_feature(f.id, "LineString", slices[0], f.tags)]
        return [create_feature(f.id, "MultiLineString", slices, f.tags)]

    if t == "Polygon":
        rings = []
        for ring in f.geometry:
            rings.extend(clip_ring(ring, k1, k2, axis, True, False))
        if not rings:
            return []
        return [create_feature(f.id, "Polygon", rings, f.tags)]

    if t == "MultiPolygon":
        polys = []
        for poly in f.geometry:
            new_rings = []
            for ring in poly:
                new_rings.extend(clip_ring(ring, k1, k2, axis, True, False))
            if new_rings:
                polys.append(new_rings)
        if not polys:
            return []
        return [create_feature(f.id, "MultiPolygon", polys, f.tags)]

    return []


def _clip_points(xyz: np.ndarray, k1, k2, axis) -> np.ndarray:
    """Keep vertices with k1 <= coord <= k2 (inclusive both ends,
    /root/reference/src/clip.js:88-96)."""
    pts = xyz.reshape(-1, 3)
    a = pts[:, axis]
    return pts[(a >= k1) & (a <= k2)].reshape(-1)


def clip_ring(ring: Ring, k1, k2, axis, is_polygon, track_metrics) -> list[Ring]:
    """Clip one flat ring/line into 0..n slices
    (/root/reference/src/clip.js:98-170)."""
    pts = ring.xyz.reshape(-1, 3)
    n = pts.shape[0]
    if n == 0:
        return []

    a_all = pts[:, axis]
    low = a_all < k1
    high = a_all > k2

    # segments where the in/low/high classification changes — the only
    # places crossings can occur; runs between them are homogeneous
    if n > 1:
        events = np.nonzero((low[:-1] != low[1:]) | (high[:-1] != high[1:]))[0]
    else:
        events = np.empty(0, dtype=np.int64)

    if track_metrics:
        ddx = pts[:-1, 0] - pts[1:, 0]
        ddy = pts[:-1, 1] - pts[1:, 1]
        seg_len = np.sqrt(ddx * ddx + ddy * ddy)
        # cumulative length entering each segment, seeded with the
        # slice's inherited start offset (clip.js:103,115,149)
        cum = np.cumsum(np.concatenate(([ring.start], seg_len)))
    else:
        seg_len = cum = None

    out: list[Ring] = []
    cur: list[np.ndarray] = []  # pieces of the slice being built
    cur_start = ring.start
    cur_end = ring.end

    def flush():
        nonlocal cur, cur_start, cur_end
        out.append(_make_slice(cur, ring, cur_start, cur_end))
        cur = []
        cur_start = ring.start
        cur_end = ring.end

    pos = 0
    inside = ~(low | high)
    for e in events:
        e = int(e)
        # bulk-emit the homogeneous run of vertices [pos..e]
        if inside[e] and e >= pos:
            cur.append(pts[pos:e + 1])
        ax, ay = pts[e, 0], pts[e, 1]
        bx, by = pts[e + 1, 0], pts[e + 1, 1]
        a = ax if axis == 0 else ay
        b = bx if axis == 0 else by
        exited = False
        t = 0.0

        if a < k1:
            if b > k1:  # enters from the low side
                t, p = _intersect(ax, ay, bx, by, k1, axis)
                cur.append(p)
                if track_metrics:
                    cur_start = cum[e] + seg_len[e] * t
        elif a > k2:
            if b < k2:  # enters from the high side
                t, p = _intersect(ax, ay, bx, by, k2, axis)
                cur.append(p)
                if track_metrics:
                    cur_start = cum[e] + seg_len[e] * t
        # (vertex a itself was emitted by the bulk run when inside)
        if b < k1 and a >= k1:  # exits on the low side
            t, p = _intersect(ax, ay, bx, by, k1, axis)
            cur.append(p)
            exited = True
        if b > k2 and a <= k2:  # exits on the high side
            t, p = _intersect(ax, ay, bx, by, k2, axis)
            cur.append(p)
            exited = True

        if not is_polygon and exited:
            if track_metrics:
                cur_end = cum[e] + seg_len[e] * t
            flush()
        pos = e + 1

    # trailing homogeneous run over vertices [pos..n-2]
    if n > 1 and pos <= n - 2 and inside[pos]:
        cur.append(pts[pos:n - 1])

    # add the last point if it is within [k1, k2] (clip.js:152-158)
    if inside[n - 1]:
        cur.append(pts[n - 1:n])

    arr = _concat(cur)

    # close the polygon if its endpoints diverged after clipping
    if is_polygon and arr.shape[0] >= 2 and (
            arr[-1, 0] != arr[0, 0] or arr[-1, 1] != arr[0, 1]):
        arr = np.concatenate((arr, arr[0:1]))

    if arr.shape[0]:
        out.append(Ring(arr.reshape(-1), size=ring.size,
                        start=cur_start, end=cur_end))
    return out


def _make_slice(pieces, parent: Ring, start, end) -> Ring:
    return Ring(_concat(pieces).reshape(-1), size=parent.size, start=start, end=end)


def _concat(pieces) -> np.ndarray:
    if not pieces:
        return np.empty((0, 3))
    if len(pieces) == 1:
        return np.asarray(pieces[0]).reshape(-1, 3)
    return np.concatenate([np.asarray(p).reshape(-1, 3) for p in pieces])


def _intersect(ax, ay, bx, by, k, axis):
    """Interpolated boundary crossing with importance forced to 1
    (/root/reference/src/clip.js:190-200)."""
    if axis == 0:
        t = (k - ax) / (bx - ax)
        return t, np.array([[k, ay + (by - ay) * t, 1.0]])
    t = (k - ay) / (by - ay)
    return t, np.array([[ax + (bx - ax) * t, k, 1.0]])
