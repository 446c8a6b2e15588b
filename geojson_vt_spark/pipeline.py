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
from pyspark.sql import DataFrame, functions as F, types as T

from .kernel.clip import clip_features
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
    left/center/right reproduces the reference's concat order.

    One tiny agg decides whether side copies exist: the left clip
    window is [-1-b, b] and projected x ≥ 0 > -1-b always, so the clip
    output is non-empty iff some feature bbox reaches x ≤ b (point clip
    keeps x == k2 inclusively, clip.js:92, hence <=); a candidate whose
    clip comes out empty only adds an empty union branch — harmless —
    so the bbox test errs exclusively on the safe side."""
    b = options.buffer / options.extent

    counts = df.agg(
        F.sum((F.col("minx") <= b).cast("long")).alias("l"),
        F.sum((F.col("maxx") >= 1 - b).cast("long")).alias("r")).first()
    has_left = bool(counts["l"])
    has_right = bool(counts["r"])

    if not has_left and not has_right:
        return df.withColumn("ord_path", _ord_extend(1, F.lit(0)))

    left = _shift_df(_clip_df(df, -1 - b, b, 0, options, 0), 1.0)
    right = _shift_df(_clip_df(df, 1 - b, 2 + b, 0, options, 2), -1.0)
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

    quad_exprs = []
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

        quad_exprs.append(F.when(acc_x & acc_y, F.struct(
            F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))))
        needs_udf = ~(acc_x & acc_y) & ~(rej_x | rej_y)
        udf_mask = udf_mask + F.when(needs_udf, F.lit(1 << q)).otherwise(F.lit(0))

    # one scan emits all trivially-accepted (feature, quadrant) child rows
    passed = (frontier
              .withColumn("q", F.explode(
                  F.filter(F.array(*quad_exprs), lambda s: s.isNotNull())))
              .withColumn("z", F.lit(z + 1))
              .withColumn("x", F.col("x") * 2 + F.col("q.dx"))
              .withColumn("y", F.col("y") * 2 + F.col("q.dy"))
              .withColumn("ord_path", F.concat(
                  F.col("ord_path"),
                  F.array(F.lit(0).cast("long"), F.lit(0).cast("long"))))
              .select(*TILED_COLUMNS))

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
    return passed.unionByName(clipped.select(*TILED_COLUMNS))


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

_MAPPED_SCHEMA = ("z int, x int, y int, ord_path array<long>, fjson string, "
                  "n_points long, n_simplified long, "
                  "minx double, miny double, maxx double, maxy double")


def _assemble_record(rec, z, x, y, options: TileOptions):
    """Lean single-feature assembly on raw SoA arrays — identical
    semantics to kernel create_tile + transform (tile.js, transform.js)
    without per-feature kernel-object construction.

    Returns (feature_json | None, num_points_contrib, num_simplified)."""
    gtype = rec["gtype"]
    extent = options.extent
    z2 = 1 << z
    tolerance = 0.0 if z == options.max_zoom else (
        options.tolerance / (z2 * extent))
    sq_tol = tolerance * tolerance

    coords = np.asarray(rec["coords"], dtype=np.float64)
    pts = coords.reshape(-1, 3)
    # one vectorized tile-space transform for the whole feature
    # (JS Math.round == floor(v + 0.5))
    txi = np.floor(extent * (pts[:, 0] * z2 - x) + 0.5).astype(np.int64)
    tyi = np.floor(extent * (pts[:, 1] * z2 - y) + 0.5).astype(np.int64)

    n_all = pts.shape[0]
    if gtype in ("Point", "MultiPoint"):
        if n_all == 0:
            return None, 0, 0
        geom = np.stack((txi, tyi), axis=1).tolist()
        fjson = (f'{{"geometry":{json.dumps(geom, separators=(",", ":"))},'
                 f'"type":1,"tags":{rec["tags_json"] or "null"}'
                 + (f',"id":{rec["fid_json"]}' if rec["fid_json"] is not None else "")
                 + "}")
        return fjson, n_all, n_all

    ring_lens = np.asarray(rec["ring_lens"], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(ring_lens))) // 3
    sizes = np.asarray(rec["ring_size"], dtype=np.float64)
    is_poly = gtype in ("Polygon", "MultiPolygon")

    # which rings are outer rings (index 0 within their polygon)
    n_rings = len(ring_lens)
    if gtype == "MultiPolygon":
        outer = np.zeros(n_rings, dtype=bool)
        at = 0
        for pl in rec["poly_lens"]:
            outer[at] = True
            at += int(pl)
    else:
        outer = np.zeros(n_rings, dtype=bool)
        if n_rings:
            outer[0] = True  # Polygon: ring 0 is outer; lines: unused

    if tolerance > 0:
        keep_all = pts[:, 2] > sq_tol
    else:
        keep_all = np.ones(n_all, dtype=bool)

    n_points = 0
    n_simplified = 0
    ring_jsons = []
    threshold = sq_tol if is_poly else tolerance
    for r in range(n_rings):
        lo, hi = int(offs[r]), int(offs[r + 1])
        nv = hi - lo
        if tolerance > 0 and sizes[r] < threshold:
            n_points += nv  # tiny ring dropped early (tile.js:88-91)
            continue
        mask = keep_all[lo:hi]
        kx = txi[lo:hi][mask]
        ky = tyi[lo:hi][mask]
        k = kx.shape[0]
        n_simplified += k
        n_points += nv
        if is_poly and k:
            # rewind on projected floats (decision precedes transform;
            # reversal commutes with the per-point transform)
            fx = pts[lo:hi, 0][mask]
            fy = pts[lo:hi, 1][mask]
            terms = (fx - np.roll(fx, 1)) * (fy + np.roll(fy, 1))
            area = float(np.cumsum(terms)[-1]) if k else 0.0
            if (area > 0) == bool(outer[r]):
                kx = kx[::-1]
                ky = ky[::-1]
        ring_jsons.append(json.dumps(
            np.stack((kx, ky), axis=1).tolist(), separators=(",", ":")))

    if not ring_jsons:
        return None, n_points, n_simplified

    tags_json = rec["tags_json"]
    if gtype == "LineString" and options.line_metrics:
        tags = json.loads(tags_json) if tags_json else {}
        size = float(rec["ring_size"][0])
        tags["mapbox_clip_start"] = float(rec["ring_start"][0]) / size
        tags["mapbox_clip_end"] = float(rec["ring_end"][0]) / size
        tags_json = json.dumps(tags)

    type_code = 3 if is_poly else 2
    fjson = (f'{{"geometry":[{",".join(ring_jsons)}],'
             f'"type":{type_code},"tags":{tags_json or "null"}'
             + (f',"id":{rec["fid_json"]}' if rec["fid_json"] is not None else "")
             + "}")
    return fjson, n_points, n_simplified


def assemble_tiles_df(frontier: DataFrame, options: TileOptions) -> DataFrame:
    """Tile assembly + transform (/root/reference/src/tile.js,
    /root/reference/src/transform.js), restructured for scale:

    addFeature is a strictly per-feature operation and the tile stats
    are sums, so assembly = a *narrow* per-feature map (tolerance
    filter, rewind, integer transform, JSON render) followed by a pure
    SQL aggregation with map-side partial combine.  No grouped-map UDF:
    the giant low-zoom tiles (z0 holds everything) never serialize into
    a single Python task — the only single-point work left is the JVM
    string concat of the final features array, ordered by the explicit
    ord_path key (Spark guarantees no row order; the reference
    guarantees insertion order, SURVEY.md §2.6 A1)."""
    def per_feature(batches):
        for pdf in batches:
            rows = {k: [] for k in ("z", "x", "y", "ord_path", "fjson",
                                    "n_points", "n_simplified",
                                    "minx", "miny", "maxx", "maxy")}
            for rec in pdf_rows(pdf):
                z, x, y = int(rec["z"]), int(rec["x"]), int(rec["y"])
                fjson, n_pts, n_simpl = _assemble_record(rec, z, x, y, options)
                rows["z"].append(z)
                rows["x"].append(x)
                rows["y"].append(y)
                rows["ord_path"].append(list(rec["ord_path"]))
                rows["fjson"].append(fjson)
                rows["n_points"].append(n_pts)
                rows["n_simplified"].append(n_simpl)
                rows["minx"].append(rec["minx"])
                rows["miny"].append(rec["miny"])
                rows["maxx"].append(rec["maxx"])
                rows["maxy"].append(rec["maxy"])
            yield pd.DataFrame(rows)

    mapped = frontier.mapInPandas(per_feature, _MAPPED_SCHEMA)
    kept = F.when(F.col("fjson").isNotNull(),
                  F.struct(F.col("ord_path"), F.col("fjson")))
    return (mapped
            .groupBy("z", "x", "y")
            .agg(F.count(F.lit(1)).alias("num_features"),
                 F.sum("n_points").alias("num_points"),
                 F.sum("n_simplified").alias("num_simplified"),
                 F.concat(
                     F.lit("["),
                     F.array_join(F.transform(
                         F.array_sort(F.collect_list(kept)),
                         lambda s: s.getField("fjson")), ","),
                     F.lit("]")).alias("features_json"),
                 F.min("minx").alias("minx"), F.min("miny").alias("miny"),
                 F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy")))


# ---------------------------------------------------------------- subtree

SUBTREE_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType(), False),
    T.StructField("z", T.IntegerType(), False),
    T.StructField("x", T.IntegerType(), False),
    T.StructField("y", T.IntegerType(), False),
    T.StructField("tile_id", T.LongType(), True),
    T.StructField("num_features", T.LongType(), True),
    T.StructField("num_points", T.LongType(), True),
    T.StructField("num_simplified", T.LongType(), True),
    T.StructField("features_json", T.StringType(), True),
    T.StructField("is_split", T.BooleanType(), True),
    T.StructField("has_source", T.BooleanType(), True),
    T.StructField("ord_path", T.ArrayType(T.LongType()), True),
    T.StructField("fid_json", T.StringType(), True),
    T.StructField("tags_json", T.StringType(), True),
    T.StructField("gtype", T.StringType(), True),
    T.StructField("coords", T.ArrayType(T.DoubleType()), True),
    T.StructField("ring_lens", T.ArrayType(T.IntegerType()), True),
    T.StructField("poly_lens", T.ArrayType(T.IntegerType()), True),
    T.StructField("ring_size", T.ArrayType(T.DoubleType()), True),
    T.StructField("ring_start", T.ArrayType(T.DoubleType()), True),
    T.StructField("ring_end", T.ArrayType(T.DoubleType()), True),
    T.StructField("minx", T.DoubleType(), True),
    T.StructField("miny", T.DoubleType(), True),
    T.StructField("maxx", T.DoubleType(), True),
    T.StructField("maxy", T.DoubleType(), True),
])

_SUBTREE_COLUMNS = [f.name for f in SUBTREE_SCHEMA.fields]


def split_subtree(features, z0: int, x0: int, y0: int, options: TileOptions):
    """Run the reference split loop (/root/reference/src/index.js:66-156,
    first-pass stop rules) over one tile's entire subtree in-process.

    The root (z0,x0,y0) is a tile the distributed loop already assembled
    and classified as splitting, so the root tile itself is NOT emitted;
    returns (tiles, sources) for every descendant, where tiles is a list
    of (Tile, is_split) and sources maps leaf (z,x,y) → feature list."""
    from .kernel.clip import clip_features
    from .kernel.tile import create_tile

    tiles_out: list[tuple] = []
    sources_out: list[tuple] = []
    stack = [(features, z0, x0, y0)]
    while stack:
        feats, z, x, y = stack.pop()
        tile = create_tile(feats, z, x, y, options)
        is_root = z == z0
        splits = not (z == options.index_max_zoom or
                      tile.num_points <= options.index_max_points)
        if is_root:
            splits = True  # classified by the distributed stop rule
        else:
            tiles_out.append((tile, splits))
        if not splits:
            sources_out.append((z, x, y, feats))
            continue
        if not feats:
            continue
        z2 = 1 << z
        k1 = 0.5 * options.buffer / options.extent
        k2, k3, k4 = 0.5 - k1, 0.5 + k1, 1 + k1
        lm = options.line_metrics
        tl = bl = tr = br = None
        left = clip_features(feats, z2, x - k1, x + k3, 0,
                             tile.minx, tile.maxx, lm)
        right = clip_features(feats, z2, x + k2, x + k4, 0,
                              tile.minx, tile.maxx, lm)
        if left:
            tl = clip_features(left, z2, y - k1, y + k3, 1,
                               tile.miny, tile.maxy, lm)
            bl = clip_features(left, z2, y + k2, y + k4, 1,
                               tile.miny, tile.maxy, lm)
        if right:
            tr = clip_features(right, z2, y - k1, y + k3, 1,
                               tile.miny, tile.maxy, lm)
            br = clip_features(right, z2, y + k2, y + k4, 1,
                               tile.miny, tile.maxy, lm)
        stack.append((tl or [], z + 1, x * 2, y * 2))
        stack.append((bl or [], z + 1, x * 2, y * 2 + 1))
        stack.append((tr or [], z + 1, x * 2 + 1, y * 2))
        stack.append((br or [], z + 1, x * 2 + 1, y * 2 + 1))
    return tiles_out, sources_out


def subtree_stage_df(frontier: DataFrame, options: TileOptions) -> DataFrame:
    """Grouped-map handoff: each light splitting tile's features become
    one Arrow batch; the whole descendant pyramid of that tile is built
    inside the task with the parity-exact local kernel.

    This is the scale hinge of the engine (SURVEY.md §4): the
    distributed per-zoom loop runs only while tiles are heavy (few,
    skewed), then 4^z-way tile parallelism takes over with zero further
    driver coordination — per-task work is bounded by the handoff
    threshold, so no group can exceed executor memory."""
    from .kernel.index import to_id
    from .kernel.transform import transform_tile

    def run(key, pdf):
        z0, x0, y0 = int(key[0]), int(key[1]), int(key[2])
        recs = sorted((record_to_feature(r) for r in pdf_rows(pdf)),
                      key=lambda t: t[0])
        feats = [f for _, f in recs]
        tiles_out, sources_out = split_subtree(feats, z0, x0, y0, options)

        rows = {c: [] for c in _SUBTREE_COLUMNS}

        def emit(vals: dict):
            for c in _SUBTREE_COLUMNS:
                rows[c].append(vals.get(c))

        for tile, splits in tiles_out:
            tf = transform_tile(tile, options.extent)
            emit({
                "kind": "tile", "z": tile.z, "x": tile.x, "y": tile.y,
                "tile_id": to_id(tile.z, tile.x, tile.y),
                "num_features": tile.num_features,
                "num_points": tile.num_points,
                "num_simplified": tile.num_simplified,
                "features_json": json.dumps(tf["features"],
                                            separators=(",", ":")),
                "is_split": splits, "has_source": not splits,
                "minx": tile.minx, "miny": tile.miny,
                "maxx": tile.maxx, "maxy": tile.maxy,
            })
        for sz, sx, sy, sfeats in sources_out:
            for i, f in enumerate(sfeats):
                emit({"kind": "source", "z": sz, "x": sx, "y": sy,
                      **feature_to_record((i,), f)})
        return pd.DataFrame(rows, columns=_SUBTREE_COLUMNS)

    return frontier.groupBy("z", "x", "y").applyInPandas(run, SUBTREE_SCHEMA)
