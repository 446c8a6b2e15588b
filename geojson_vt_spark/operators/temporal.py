"""Temporal join operators Spark lacks natively: as-of join and
range (interval) join — both expressed as compositions of existing
DataFrame ops, never a theta-join blowup.

These are the two classic "Spark has no operator for this" joins
(DuckDB ships both natively — ``ASOF JOIN`` and IEJoin — which makes
it a genuinely independent oracle for them).

As-of join (``asof_join_df``)
-----------------------------
For every probe row, find the single most recent build row with
``build.ts <= probe.ts`` on the same key (DuckDB ``ASOF LEFT JOIN``
semantics).  The naive formulation is a range self-join (quadratic
per key); the scale-correct shape used here is the union-tag +
carry-forward window:

1. pre-collapse the build side to ONE row per (key, ts) so equal
   timestamps cannot make the carry-forward order-dependent,
2. union build and probe rows with a side tag (build sorts before
   probe at equal timestamps, giving ``<=`` semantics),
3. one window per key ordered by (ts, side) carries the latest
   build values forward with ``last(..., ignorenulls=True)``,
4. keep the probe rows.

Plan (100-TB posture): two slim exchanges, both linear — the
pre-collapse is a map-side-combined partial agg on (key, ts) that
shrinks the build side before it moves, then the union window
shuffles once on the key; no range explosion, no per-key quadratic
term, rows carry only the requested build columns (verified
`.explain`: both scans push their event_type filters down).  Key
cardinality at crawl scale (users, hosts) is huge, so partitions
balance; a single pathological hot key is the known skew case and
is bounded by that key's own row count (linear), never by a cross
product.

Range join (``range_join_df``)
------------------------------
Join points to intervals (``lo <= v < hi``), intervals may overlap.
The scale path is the standard binning decomposition: each interval
is exploded to the fixed-width buckets it overlaps, each point maps
to exactly ONE bucket, and an equi-join on the bucket id plus the
exact refine predicate reproduces the range predicate.  Each
(point, interval) pair can meet in at most one bucket — the point's
— so no post-join dedup is needed.

Plan (100-TB posture): the exploded interval table grows by
``ceil(span / bucket_width)`` per interval — pick ``bucket_width``
near the median interval span so the blowup is ~2×.  Small interval
tables broadcast (the common dimension-table case, default on);
large ones fall back to an equi-shuffle on the bucket id, which
also spreads hot value regions across buckets.  This is the same
cell-grid trick the spatial joins use in one dimension
(`operators/spatial_join.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_df(probe: DataFrame, build: DataFrame,
                 on: str = "user_id", ts_col: str = "ts",
                 probe_cols: tuple[str, ...] = ("event_id",),
                 build_values: tuple[str, ...] = ("value_cents",),
                 prefix: str = "asof_") -> DataFrame:
    """Most-recent-at-or-before join: one output row per probe row
    with ``{prefix}us`` (matched build timestamp, integer
    microseconds, null when no build row precedes) and
    ``{prefix}<col>`` for each requested build value column.

    ``build`` must already carry the value columns; equal-timestamp
    build rows per key are collapsed with ``max`` so the result is
    deterministic across engines (DuckDB's ASOF leaves the pick
    unspecified otherwise).
    """
    us = F.expr(f"timestampdiff(MICROSECOND,"
                f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})")
    # the side tag rides the LOW BIT of the sort key (_k = us*2 + side,
    # build=0 sorts before probe=1 at equal timestamps -> <= semantics):
    # one int64 key instead of (ts, side) shaves a column off the
    # exchange and leaves the window a single-key sort.  Safe for any
    # realistic epoch (|us|*2 << 2^63; arithmetic shiftright restores
    # us exactly for negative pre-1970 stamps too).
    b = (build
         .select(F.col(on), us.alias("_us"),
                 *[F.col(c) for c in build_values])
         .groupBy(on, "_us")
         .agg(*[F.max(c).alias(c) for c in build_values])
         .select(F.col(on), (F.col("_us") * 2).alias("_k"),
                 *[F.col(c) for c in build_values]))
    p = (probe
         .select(F.col(on), (us * 2 + 1).alias("_k"),
                 *[F.col(c) for c in probe_cols]))
    for c in probe_cols:
        b = b.withColumn(c, F.lit(None).cast(p.schema[c].dataType))
    for c in build_values:
        p = p.withColumn(c, F.lit(None).cast(b.schema[c].dataType))
    u = b.unionByName(p)
    is_build = (F.col("_k") % 2) == 0
    w = (Window.partitionBy(on).orderBy("_k")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(F.when(is_build, F.shiftright(F.col("_k"), 1)),
                      ignorenulls=True).over(w).alias(f"{prefix}us")]
    carried += [F.last(F.when(is_build, F.col(c)),
                       ignorenulls=True).over(w).alias(f"{prefix}{c}")
                for c in build_values]
    return (u.select(on, "_k", *probe_cols, *carried)
            .filter(~is_build)
            .select(*probe_cols, on,
                    F.shiftright(F.col("_k"), 1).alias("us"),
                    f"{prefix}us",
                    *[f"{prefix}{c}" for c in build_values]))


def range_join_df(points: DataFrame, ranges: DataFrame,
                  v_col: str, lo_col: str = "lo", hi_col: str = "hi",
                  bucket_width: int = 2500,
                  broadcast_ranges: bool = True) -> DataFrame:
    """Interval join ``lo <= v < hi`` (half-open, integer domain):
    all point columns plus all range columns, one row per matching
    (point, interval) pair.  Intervals may overlap — a point matches
    every interval containing it.
    """
    w = int(bucket_width)
    r = ranges.withColumn(
        "_bk",
        F.explode(F.sequence(
            (F.col(lo_col) / w).cast("long"),
            # hi is exclusive: the last covered bucket holds hi - 1
            ((F.col(hi_col) - 1) / w).cast("long"))))
    if broadcast_ranges:
        r = F.broadcast(r)
    p = points.withColumn("_bk", (F.col(v_col) / w).cast("long"))
    joined = p.join(r, on="_bk", how="inner").filter(
        (F.col(v_col) >= F.col(lo_col)) & (F.col(v_col) < F.col(hi_col)))
    return joined.drop("_bk")
