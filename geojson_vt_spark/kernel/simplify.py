"""Vertex-importance scoring (Douglas-Peucker, precompute-once).

Reproduces /root/reference/src/simplify.js exactly, but iteratively with
an explicit span stack and numpy-vectorized point→segment distances per
span, so it runs efficiently over Arrow batches inside pandas UDFs.

The reference's key trick (SURVEY.md §4): importance scores are computed
ONCE at ingest with the max-zoom tolerance; every zoom level afterwards
simplifies by a cheap threshold filter on the precomputed score.
"""

from __future__ import annotations

import numpy as np


def simplify(xyz: np.ndarray, first: int, last: int, sq_tolerance: float) -> None:
    """Write squared-DP-distance importances into slot 2 of ``xyz`` in place.

    ``first``/``last`` are raw offsets into the stride-3 array (multiples
    of 3), matching the reference call convention
    (/root/reference/src/convert.js:115).
    """
    stack = [(first, last)]
    while stack:
        first, last = stack.pop()
        if last - first < 6:  # no interior vertex
            continue
        offs = np.arange(first + 3, last, 3)
        px = xyz[offs]
        py = xyz[offs + 1]
        d = _sq_seg_dist(px, py, xyz[first], xyz[first + 1], xyz[last], xyz[last + 1])
        dmax = float(d.max())
        if dmax > sq_tolerance:
            occ = offs[d == dmax]
            if occ.size == 1:
                index = int(occ[0])
            else:
                # pivot-near-middle tie-break for degenerate inputs
                # (/root/reference/src/simplify.js:22-31).  The
                # reference's minPosToMid persists across running-max
                # updates (and across d === sqTolerance hits, since
                # maxSqDist starts there), so a repeated-max span must
                # be replayed sequentially — rare (bit-equal distances).
                mid = first + ((last - first) >> 1)
                maxd = sq_tolerance
                minpos = last - first
                index = -1
                for j in range(d.size):
                    dj = d[j]
                    if dj > maxd:
                        index = int(offs[j])
                        maxd = dj
                    elif dj == maxd:
                        pos = abs(int(offs[j]) - mid)
                        if pos < minpos:
                            index = int(offs[j])
                            minpos = pos
            xyz[index + 2] = dmax
            if index - first > 3:
                stack.append((first, index))
            if last - index > 3:
                stack.append((index, last))


def _sq_seg_dist(px, py, x, y, bx, by):
    """Squared distance from points to segment (a=(x,y), b=(bx,by)).

    Matches /root/reference/src/simplify.js:42-65 branch-for-branch so
    float64 results are bit-identical.
    """
    dx = bx - x
    dy = by - y
    if dx != 0 or dy != 0:
        t = ((px - x) * dx + (py - y) * dy) / (dx * dx + dy * dy)
        qx = np.where(t > 1, bx, np.where(t > 0, x + dx * t, x))
        qy = np.where(t > 1, by, np.where(t > 0, y + dy * t, y))
    else:
        qx = np.full_like(px, x)
        qy = np.full_like(py, y)
    ddx = px - qx
    ddy = py - qy
    return ddx * ddx + ddy * ddy
