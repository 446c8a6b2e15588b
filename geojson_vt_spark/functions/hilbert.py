"""Hilbert-curve (S2-style) locality-preserving cell ids.

The north rule names an "H3/S2 cell index" for the spatial-join suite.
The join itself only needs an equi-joinable cell key, which the
quadtree Z-cells in functions/geo.py provide — but Z-order has long
diagonal seams where 2-D neighbours land 2^k apart in key space.  S2's
core primitive is the Hilbert curve (a Hilbert walk over each cube
face): every curve step moves to a 2-D neighbour, so a contiguous key
RANGE is a spatially compact region.  That is what makes range
partitioning, parquet row-group pruning on key min/max, and
range-bounded neighbour scans work for spatial data at 100-TB scale.

This module provides the Hilbert d-index as BOTH
  * a Spark plan fragment (`with_hilbert`) — pure Column integer
    arithmetic, one narrow Project per curve level, no Python, no
    shuffle, whole-stage-codegen friendly; and
  * a DuckDB SQL twin (`hilbert_sql`) — the identical per-level
    transition emitted as nested SELECTs,
generated from ONE transition description so the driver oracle checks
the real operator, not a reimplementation.

Why per-level Projects instead of a single Column expression: the
classic xy→d walk (Hamilton's iterative rotation) references the
running (x, y) twice per level, so inlining all levels into one
expression tree doubles its size per level — 2^order nodes.  Chained
`withColumns` keep it linear; Catalyst's CollapseProject declines to
inline non-cheap expressions used more than once, so the plan stays
linear too (asserted by tests/test_operators.py::test_hilbert_plan).

Algorithm: standard iterative Hilbert xy→d (public domain, e.g.
Wikipedia "Hilbert curve", Hamilton 2006 compact Hilbert indices) —
per level s = 2^(order-1) … 1:

    rx = (x & s) > 0;  ry = (y & s) > 0
    d += s · s · ((3·rx) XOR ry)
    if not ry:  (x, y) = (s-1-y, s-1-x) if rx else (y, x)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .geo import project_x_col, project_y_col, tile_coord_col


def _levels(order: int) -> list[int]:
    return [1 << i for i in range(order - 1, -1, -1)]


def with_hilbert(df: DataFrame, x: Column, y: Column, order: int,
                 out: str = "hilbert_d") -> DataFrame:
    """Append column ``out`` = Hilbert d-index of integer cell (x, y)
    on the 2^order × 2^order grid.  One narrow Project per level —
    linear plan size, JVM-side end to end."""
    # withColumns REPLACES silently, so the per-level scratch columns
    # must not collide with caller data: suffix until free
    suffix = ""
    existing = set(df.columns)
    while any(f"_{c}{suffix}" in existing for c in ("hx", "hy", "hd",
                                                    "rx", "ry")):
        suffix += "_"
    hx, hy, hd, rxc, ryc = (f"_{c}{suffix}" for c in ("hx", "hy", "hd",
                                                      "rx", "ry"))
    df = df.withColumns({hx: x.cast("long"), hy: y.cast("long"),
                         hd: F.lit(0).cast("long")})
    for s in _levels(order):
        rx = F.when((F.col(hx).bitwiseAND(F.lit(s))) > 0, F.lit(1)) \
             .otherwise(F.lit(0)).cast("long")
        ry = F.when((F.col(hy).bitwiseAND(F.lit(s))) > 0, F.lit(1)) \
             .otherwise(F.lit(0)).cast("long")
        df = df.withColumns({rxc: rx, ryc: ry})
        nx = (F.when(F.col(ryc) == 1, F.col(hx))
              .when(F.col(rxc) == 1, F.lit(s - 1) - F.col(hy))
              .otherwise(F.col(hy)))
        ny = (F.when(F.col(ryc) == 1, F.col(hy))
              .when(F.col(rxc) == 1, F.lit(s - 1) - F.col(hx))
              .otherwise(F.col(hx)))
        nd = (F.col(hd)
              + F.lit(s) * F.lit(s)
              * (F.lit(3) * F.col(rxc)).bitwiseXOR(F.col(ryc)))
        df = df.withColumns({hx: nx, hy: ny, hd: nd})
    return (df.withColumn(out, F.col(hd))
            .drop(hx, hy, hd, rxc, ryc))


def with_hilbert_cell(df: DataFrame, lon: Column, lat: Column,
                      order: int, out: str = "hilbert_d") -> DataFrame:
    """lon/lat → Web-Mercator cell (x, y) at resolution ``order`` →
    Hilbert d-index.  The S2-style point→cell-key path."""
    px, py = project_x_col(lon), project_y_col(lat)
    return with_hilbert(df, tile_coord_col(px, order),
                        tile_coord_col(py, order), order, out)


def hilbert_sql(order: int, x_expr: str, y_expr: str,
                source_sql: str, carry_cols: str = "") -> str:
    """DuckDB twin of `with_hilbert`: the same per-level transition as
    nested SELECTs over ``source_sql`` (a FROM-able subquery/view).
    ``carry_cols`` (e.g. ``"id, lon, lat"``) ride through unchanged;
    the result exposes them plus ``hilbert_d``."""
    carry = (carry_cols + ", ") if carry_cols else ""
    q = (f"SELECT {carry}CAST({x_expr} AS BIGINT) AS hx, "
         f"CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
         f"FROM {source_sql}")
    for s in _levels(order):
        q = (
            f"SELECT {carry}"
            f"  CASE WHEN hry = 1 THEN hx"
            f"       WHEN hrx = 1 THEN {s - 1} - hy ELSE hy END AS hx,"
            f"  CASE WHEN hry = 1 THEN hy"
            f"       WHEN hrx = 1 THEN {s - 1} - hx ELSE hx END AS hy,"
            f"  hd + {s * s} * xor(3 * hrx, hry) AS hd "
            f"FROM (SELECT {carry}hx, hy, hd,"
            f"  CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS hrx,"
            f"  CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS hry"
            f" FROM ({q}))"
        )
    return (f"SELECT {carry}hd AS hilbert_d FROM ({q})")


def hilbert_xy2d(order: int, x: int, y: int) -> int:
    """Plain-Python reference for property tests (same transition)."""
    d = 0
    for s in _levels(order):
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - y, s - 1 - x
            else:
                x, y = y, x
    return d


def bbox_hilbert_ranges(minx: float, miny: float, maxx: float,
                        maxy: float, order: int,
                        max_cells: int = 1024) -> list[tuple[int, int]]:
    """S2-style region covering: the Hilbert key ranges (inclusive)
    whose union contains every order-``order`` cell intersecting the
    projected-space bbox.  Driver-side pure Python over the cover
    cells — bounded by ``max_cells``: when the bbox covers more cells
    than that, the cover is computed at a coarser level and scaled
    exactly (the curve is hierarchical: a level-o cell is
    4^(order-o) CONSECUTIVE fine keys — containment asserted by
    tests).  Consecutive keys merge, so a compact query region yields
    a handful of ranges regardless of order.

    These ranges are what make `cluster_by_hilbert` layouts prunable:
    ``hilbert_d BETWEEN lo AND hi`` predicates reach the parquet scan
    and row-group min/max stats skip everything outside the region."""
    if not (0 < max_cells):
        raise ValueError("max_cells must be positive")
    o = order
    while True:
        # coords are recomputed at every level, including the last one
        # taken, so `ds` below always uses cell coords that match `o`
        # (a max_cells < 4 bottoms out at o == 0: one whole-keyspace
        # range, still a correct cover — never stale level-1 coords)
        n = 1 << o
        x0 = min(max(int(minx * n), 0), n - 1)
        x1 = min(max(int(maxx * n), 0), n - 1)
        y0 = min(max(int(miny * n), 0), n - 1)
        y1 = min(max(int(maxy * n), 0), n - 1)
        if (x1 - x0 + 1) * (y1 - y0 + 1) <= max_cells or o == 0:
            break
        o -= 1
    ds = sorted(hilbert_xy2d(o, x, y)
                for x in range(x0, x1 + 1) for y in range(y0, y1 + 1))
    scale = 4 ** (order - o)
    ranges: list[tuple[int, int]] = []
    for d in ds:
        lo, hi = d * scale, (d + 1) * scale - 1
        if ranges and ranges[-1][1] + 1 == lo:
            ranges[-1] = (ranges[-1][0], hi)
        else:
            ranges.append((lo, hi))
    return ranges


def filter_bbox_by_hilbert(df: DataFrame, minx: float, miny: float,
                           maxx: float, maxy: float, order: int,
                           key_col: str = "hilbert_d",
                           max_cells: int = 1024) -> DataFrame:
    """Candidate filter for a projected-space bbox over a
    Hilbert-keyed table: OR of BETWEEN predicates from
    `bbox_hilbert_ranges` — pure Column, pushed to the parquet scan,
    so a `cluster_by_hilbert`-written table reads only the row groups
    whose key range intersects the region.  A superset of the exact
    bbox rows (cell granularity); refine on x/y afterwards."""
    ranges = bbox_hilbert_ranges(minx, miny, maxx, maxy, order,
                                 max_cells)
    pred = None
    for lo, hi in ranges:
        p = F.col(key_col).between(F.lit(lo), F.lit(hi))
        pred = p if pred is None else pred | p
    return df.where(pred) if pred is not None else df


def cluster_by_hilbert(df: DataFrame, lon: Column, lat: Column,
                       order: int = 12, num_partitions: int | None = None,
                       out: str = "hilbert_d") -> DataFrame:
    """Spatially cluster a DataFrame for writing: compute the Hilbert
    key and range-partition + sort on it, so each output file covers a
    compact region and parquet min/max row-group stats prune spatial
    range scans.  (Z-order keys leave diagonal seams in every file's
    key range; Hilbert ranges are compact by construction.)"""
    keyed = with_hilbert_cell(df, lon, lat, order, out)
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, F.col(out))
    else:
        keyed = keyed.repartitionByRange(F.col(out))
    return keyed.sortWithinPartitions(out)
