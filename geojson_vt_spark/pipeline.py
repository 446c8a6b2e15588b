"""Distributed DataFrame stages of the tile pyramid.

Spark-first design (SURVEY.md §7): the reference's recursive splitTile
(/root/reference/src/index.js:66-156) becomes a per-zoom *narrow* map —
no shuffle in the split itself.  The trivial bbox accept/reject that
geojson-vt performs per feature (/root/reference/src/clip.js:18-19,
30-34) is expressed as pure Column predicates, so features that land
wholly inside or outside a child window never leave the JVM; only
boundary-crossing features reach the Arrow/pandas clip kernel.

Per-tile statistics that drive the stop rules (numPoints/numFeatures,
/root/reference/src/index.js:107) are plain SQL aggregations —
``sum(size(coords)/3)`` — so Catalyst handles them with map-side
partial aggregation.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .kernel.clip import clip_features
from .kernel.convert import convert
from .kernel.tile import create_tile
from .kernel.transform import transform_tile
from .model import (FEATURE_SCHEMA, TILED_COLUMNS, TILED_FEATURE_SCHEMA,
                    feature_to_record, pdf_rows, record_to_feature,
                    records_to_pdf)
from .options import TileOptions

# ---------------------------------------------------------------- ingest


def features_from_json_df(df: DataFrame, options: TileOptions) -> DataFrame:
    """Distributed convert stage: rows of (input_ord, gen_index, feature_json)
    → FEATURE_SCHEMA rows with ord_path = [input_ord, convert_ord].

    feature_json is a single GeoJSON Feature (or bare geometry wrapped as
    {"geometry": ...}); gen_index feeds generateId (null for non-collection
    inputs, matching /root/reference/src/convert.js:11,15,19).
    """
    def run(batches):
        for pdf in batches:
            records = []
            for ordv, gen_index, fjson in zip(
                    pdf["input_ord"].to_numpy(),
                    pdf["gen_index"].to_numpy(),
                    pdf["feature_json"].to_numpy()):
                gi = None if gen_index is None or pd.isna(gen_index) else int(gen_index)
                feats = convert_single(json.loads(fjson), options, gi)
                for ci, f in enumerate(feats):
                    records.append(feature_to_record((int(ordv), ci), f))
            yield records_to_pdf(records)

    return df.mapInPandas(run, FEATURE_SCHEMA)


def convert_single(feature_dict, options, gen_index):
    """Convert one pre-split GeoJSON feature via the kernel."""
    from .kernel.convert import _convert_feature
    out = []
    _convert_feature(out, feature_dict, options, gen_index)
    return out


def geojson_to_input_rows(data: dict):
    """Split a top-level GeoJSON document into per-feature ingest rows
    (input_ord, gen_index, feature_json) mirroring convert()'s dispatch."""
    t = data.get("type")
    if t == "FeatureCollection":
        return [(i, i, json.dumps(f)) for i, f in enumerate(data["features"])]
    if t == "Feature":
        return [(0, None, json.dumps(data))]
    return [(0, None, json.dumps({"geometry": data}))]


# ---------------------------------------------------------------- wrap

def _ord_extend(world: int | None, idx_col):
    cols = []
    if world is not None:
        cols.append(F.array(F.lit(world).cast("long")))
    cols.append(F.col("ord_path"))
    cols.append(F.array(idx_col.cast("long")))
    return F.concat(*cols)


def _clip_df(df: DataFrame, k1: float, k2: float, axis: int,
             options: TileOptions, world: int) -> DataFrame:
    """Clip every feature to [k1,k2] on ``axis`` (scale 1), prepending
    ``world`` and appending the within-feature slice index to ord_path.

    Column-level trivial accept/reject; only crossing features hit the
    pandas kernel."""
    lo, hi = ("minx", "maxx") if axis == 0 else ("miny", "maxy")
    accept = (F.col(lo) >= k1) & (F.col(hi) < k2)
    reject = (F.col(hi) < k1) | (F.col(lo) >= k2)

    passed = df.where(accept).withColumn(
        "ord_path", _ord_extend(world, F.lit(0)))

    crossing = df.where(~accept & ~reject)
    lm = options.line_metrics

    def run(batches):
        for pdf in batches:
            records = []
            for rec in pdf_rows(pdf):
                ord_path, f = record_to_feature(rec)
                res = clip_features([f], 1, k1, k2, axis, rec["minx"] if axis == 0 else rec["miny"],
                                    rec["maxx"] if axis == 0 else rec["maxy"], lm)
                for i, nf in enumerate(res or []):
                    records.append(feature_to_record(
                        (world, *ord_path, i), nf))
            yield records_to_pdf(records)

    clipped = crossing.mapInPandas(run, FEATURE_SCHEMA)
    return passed.unionByName(clipped)


def _shift_df(df: DataFrame, offset: float) -> DataFrame:
    """World-copy x shift as pure Column ops
    (/root/reference/src/wrap.js:21-68): adding a constant commutes with
    min/max, so the bbox shifts exactly too."""
    return (df
            .withColumn("coords", F.expr(
                f"transform(coords, (v, i) -> IF(i % 3 == 0, v + {offset!r}D, v))"))
            .withColumn("minx", F.col("minx") + offset)
            .withColumn("maxx", F.col("maxx") + offset))


def wrap_df(df: DataFrame, options: TileOptions) -> DataFrame:
    """Distributed dateline wrap (/root/reference/src/wrap.js:5-19).

    ord_path gains a [world, ..., slice] envelope; world 0/1/2 =
    left/center/right reproduces the reference's concat order."""
    b = options.buffer / options.extent

    left = _shift_df(_clip_df(df, -1 - b, b, 0, options, 0), 1.0)
    right = _shift_df(_clip_df(df, 1 - b, 2 + b, 0, options, 2), -1.0)

    # cheap candidate prefilter decides whether any side copies exist
    has_left = not df.where(F.col("minx") < b).isEmpty() and not left.isEmpty()
    has_right = (not df.where(F.col("maxx") >= 1 - b).isEmpty()
                 and not right.isEmpty())

    if not has_left and not has_right:
        return df.withColumn("ord_path", _ord_extend(1, F.lit(0)))

    center = _clip_df(df, -b, 1 + b, 0, options, 1)
    parts = []
    if has_left:
        parts.append(left)
    parts.append(center)
    if has_right:
        parts.append(right)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------- split

def split_children_df(frontier: DataFrame, z: int,
                      options: TileOptions) -> DataFrame:
    """One pyramid step: features of splitting tiles at zoom z → features
    of their ≤4 buffered children at z+1 (/root/reference/src/index.js:123-154).

    Narrow map: per (feature, quadrant) a Column-level router decides
    PASS (fully inside the buffered child window — new tile coords via
    arithmetic only), DROP (fully outside), or KERNEL (crossing → Arrow
    batch into the numpy clip)."""
    z2 = 1 << z
    k1c = 0.5 * options.buffer / options.extent
    k2c = 0.5 - k1c
    k3c = 0.5 + k1c
    k4c = 1 + k1c
    lm = options.line_metrics

    outputs = []
    udf_mask = F.lit(0)
    for q in range(4):
        dx, dy = q & 1, q >> 1
        xlo = (F.col("x") + (k2c if dx else -k1c)) / z2
        xhi = (F.col("x") + (k4c if dx else k3c)) / z2
        ylo = (F.col("y") + (k2c if dy else -k1c)) / z2
        yhi = (F.col("y") + (k4c if dy else k3c)) / z2
        acc_x = (F.col("minx") >= xlo) & (F.col("maxx") < xhi)
        rej_x = (F.col("maxx") < xlo) | (F.col("minx") >= xhi)
        acc_y = (F.col("miny") >= ylo) & (F.col("maxy") < yhi)
        rej_y = (F.col("maxy") < ylo) | (F.col("miny") >= yhi)

        passed = (frontier
                  .where(acc_x & acc_y)
                  .withColumn("z", F.lit(z + 1))
                  .withColumn("x", F.col("x") * 2 + dx)
                  .withColumn("y", F.col("y") * 2 + dy)
                  .withColumn("ord_path", F.concat(
                      F.col("ord_path"),
                      F.array(F.lit(0).cast("long"), F.lit(0).cast("long")))))
        outputs.append(passed.select(*TILED_COLUMNS))
        needs_udf = ~(acc_x & acc_y) & ~(rej_x | rej_y)
        udf_mask = udf_mask + F.when(needs_udf, F.lit(1 << q)).otherwise(F.lit(0))

    crossing = (frontier
                .withColumn("udf_mask", udf_mask)
                .where(F.col("udf_mask") > 0))

    def run(batches):
        for pdf in batches:
            records = []
            for rec in pdf_rows(pdf):
                ord_path, f = record_to_feature(rec)
                x, y = int(rec["x"]), int(rec["y"])
                mask = int(rec["udf_mask"])
                xclips = {}
                for q in range(4):
                    if not mask & (1 << q):
                        continue
                    dx, dy = q & 1, q >> 1
                    if dx not in xclips:
                        xk1 = (x + k2c) if dx else (x - k1c)
                        xk2 = (x + k4c) if dx else (x + k3c)
                        xclips[dx] = clip_features(
                            [f], z2, xk1, xk2, 0, f.minx, f.maxx, lm)
                    side = xclips[dx]
                    if not side:
                        continue
                    yk1 = (y + k2c) if dy else (y - k1c)
                    yk2 = (y + k4c) if dy else (y + k3c)
                    for i, sf in enumerate(side):
                        res = clip_features([sf], z2, yk1, yk2, 1,
                                            sf.miny, sf.maxy, lm)
                        for j, nf in enumerate(res or []):
                            records.append({
                                "z": z + 1, "x": x * 2 + dx, "y": y * 2 + dy,
                                **feature_to_record((*ord_path, i, j), nf)})
            yield records_to_pdf(records, columns=TILED_COLUMNS)

    clipped = crossing.mapInPandas(run, TILED_FEATURE_SCHEMA)
    out = outputs[0]
    for p in outputs[1:]:
        out = out.unionByName(p)
    return out.unionByName(clipped.select(*TILED_COLUMNS))


# ---------------------------------------------------------------- stats / assembly

def tile_stats_df(frontier: DataFrame) -> DataFrame:
    """Pure-SQL per-tile stats driving the stop rules
    (numPoints counts every vertex incl. later-dropped rings,
    /root/reference/src/tile.js:89,100)."""
    return (frontier
            .groupBy("z", "x", "y")
            .agg(F.count(F.lit(1)).alias("num_features"),
                 (F.sum(F.size("coords")) / 3).cast("long").alias("num_points"),
                 F.min("minx").alias("minx"), F.min("miny").alias("miny"),
                 F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy")))


ASSEMBLED_SCHEMA = ("z int, x int, y int, num_features long, num_points long, "
                    "num_simplified long, features_json string, "
                    "minx double, miny double, maxx double, maxy double")


def assemble_tiles_df(frontier: DataFrame, options: TileOptions) -> DataFrame:
    """Tile assembly + transform: groupBy(z,x,y) → per-group kernel
    create_tile (tolerance filter, rewind, stats) and integer transform
    (/root/reference/src/tile.js, /root/reference/src/transform.js).

    Features are ordered inside the group by ord_path — Spark group
    iterators guarantee no order, the reference guarantees insertion
    order (SURVEY.md §2.6 A1)."""
    def assemble(key, pdf: pd.DataFrame):
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        feats = sorted((record_to_feature(rec) for rec in pdf_rows(pdf)),
                       key=lambda t: t[0])
        tile = create_tile([f for _, f in feats], z, x, y, options)
        transformed = transform_tile(tile, options.extent)
        return pd.DataFrame([{
            "z": z, "x": x, "y": y,
            "num_features": tile.num_features,
            "num_points": tile.num_points,
            "num_simplified": tile.num_simplified,
            "features_json": json.dumps(transformed["features"]),
            "minx": tile.minx, "miny": tile.miny,
            "maxx": tile.maxx, "maxy": tile.maxy,
        }])

    return (frontier
            .groupBy("z", "x", "y")
            .applyInPandas(assemble, ASSEMBLED_SCHEMA))
