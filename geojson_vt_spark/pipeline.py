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
import os
import time

from .kernel.fastjson import dumps as _jdumps, loads as _jloads

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .kernel.clip import clip_features
from .model import (FEATURE_COLUMNS, FEATURE_SCHEMA, TILED_COLUMNS,
                    TILED_FEATURE_SCHEMA, feature_to_record, pdf_rows,
                    record_to_feature, records_to_pdf)
from .options import TileOptions

# ---------------------------------------------------------------- ingest


def features_from_json_df(df: DataFrame, options: TileOptions) -> DataFrame:
    """Distributed convert stage: rows of (input_ord, gen_index, feature_json)
    → FEATURE_SCHEMA rows with ord_path = [input_ord, convert_ord].

    feature_json is a single GeoJSON Feature (or bare geometry wrapped as
    {"geometry": ...}); gen_index feeds generateId (null for non-collection
    inputs, matching /root/reference/src/convert.js:11,15,19).
    """
    from .kernel.vec import convert_rows_to_records

    def run(batches):
        for pdf in batches:
            rows = [(int(o), None if g is None or pd.isna(g) else int(g), j)
                    for o, g, j in zip(pdf["input_ord"].to_numpy(),
                                       pdf["gen_index"].to_numpy(),
                                       pdf["feature_json"].to_numpy())]
            yield records_to_pdf(convert_rows_to_records(rows, options))

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
        from .kernel.vec import batch_clip
        for pdf in batches:
            (rags, gcodes, mnx, mny, mxx, mxy,
             fids, tagss, ords_in) = _pdf_state(pdf)
            n = len(gcodes)
            res = batch_clip(rags, gcodes, mnx, mny, mxx, mxy,
                             np.full(n, k1), np.full(n, k2), axis, lm)
            ords = [[world, *ords_in[int(sr)], int(i)]
                    for sr, i in zip(res.src, res.sub_ord)]
            yield _clip_out_pdf(res, fids, tagss, ords)

    clipped = crossing.mapInPandas(run, FEATURE_SCHEMA)
    return passed.unionByName(clipped)




def _pdf_state(pdf):
    """One Arrow batch of FEATURE/TILED rows → (rags, gcodes, bboxes,
    fids, tags, ords), fully vectorized at the boundary."""
    from .kernel.vec import GT_CODE, arrays_to_rags
    gtypes = pdf["gtype"].to_numpy()
    n = len(gtypes)
    gcodes = np.fromiter((GT_CODE[g] for g in gtypes), dtype=np.int64,
                         count=n)
    rags = arrays_to_rags(
        pdf["coords"].to_numpy(), pdf["ring_lens"].to_numpy(), gcodes,
        pdf["poly_lens"].to_numpy(), pdf["ring_size"].to_numpy(),
        pdf["ring_start"].to_numpy(), pdf["ring_end"].to_numpy())
    return (rags, gcodes,
            pdf["minx"].to_numpy(dtype=np.float64),
            pdf["miny"].to_numpy(dtype=np.float64),
            pdf["maxx"].to_numpy(dtype=np.float64),
            pdf["maxy"].to_numpy(dtype=np.float64),
            pdf["fid_json"].to_numpy(), pdf["tags_json"].to_numpy(),
            pdf["ord_path"].to_numpy())


def _clip_out_pdf(res, fids, tagss, ords, extra=None,
                  src=None) -> pd.DataFrame:
    """ClipResult → FEATURE_SCHEMA pandas batch via np.split columns.

    ``src`` maps each output feature to the index space of fids/tagss
    (defaults to res.src — pass the composed mapping when the result
    came from a chained clip)."""
    from .kernel.vec import GTYPES, rags_split_columns
    if src is None:
        src = res.src
    coords, ring_lens, poly_lens, sizes, starts, ends = \
        rags_split_columns(res.rags, res.gcodes)
    data = {}
    if extra:
        data.update(extra)
    data.update({
        "ord_path": ords,
        "fid_json": [fids[int(i)] for i in src],
        "tags_json": [tagss[int(i)] for i in src],
        "gtype": [GTYPES[int(c)] for c in res.gcodes],
        "coords": coords, "ring_lens": ring_lens, "poly_lens": poly_lens,
        "ring_size": sizes, "ring_start": starts, "ring_end": ends,
        "minx": res.minx, "miny": res.miny,
        "maxx": res.maxx, "maxy": res.maxy,
    })
    cols = (list(extra) if extra else []) + FEATURE_COLUMNS
    return pd.DataFrame(data, columns=cols)


def _clip_out_geometry_arrays(res) -> dict:
    """ClipResult → Arrow arrays for the FEATURE geometry columns
    (gtype/coords/ring_lens/poly_lens/ring metrics/bbox), built
    straight from the rag flats with ``pa.ListArray.from_arrays`` —
    the Arrow egress twin of _clip_out_pdf, with zero per-feature
    object boxing.  poly_lens regrouping is a flat bincount over
    global (feature, poly) ids instead of the per-MultiPolygon loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .kernel.vec import GT_MPOLY, GTYPES, rags_to_feature_arrays
    rg = res.rags
    n = res.n_feats
    f_roff, xyz = rags_to_feature_arrays(rg)

    def _list(offs, values):
        return pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32, copy=False), pa.int32()),
            values)

    f_roff32 = f_roff
    coords = _list(3 * rg.roff[f_roff], pa.array(xyz, pa.float64()))
    lens3 = (rg.ring_lens() * 3).astype(np.int32)
    ring_lens = _list(f_roff32, pa.array(lens3, pa.int32()))
    ring_size = _list(f_roff32, pa.array(rg.rsize, pa.float64()))
    ring_start = _list(f_roff32, pa.array(rg.rstart, pa.float64()))
    ring_end = _list(f_roff32, pa.array(rg.rend, pa.float64()))

    gcodes = np.asarray(res.gcodes, dtype=np.int64)
    mp = gcodes == GT_MPOLY
    nr_f = f_roff[1:] - f_roff[:-1]
    npoly = np.zeros(n, dtype=np.int64)
    hasr = mp & (nr_f > 0)
    if hasr.any():
        # rpoly is 0-based and monotone within a feature: the last
        # ring's poly index + 1 is the feature's polygon count
        npoly[hasr] = rg.rpoly[f_roff[1:][hasr] - 1] + 1
    poff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(npoly, out=poff[1:])
    if poff[-1]:
        valid = mp[rg.rfeat]
        gid = (poff[rg.rfeat] + rg.rpoly)[valid]
        pl_flat = np.bincount(gid, minlength=int(poff[-1])).astype(
            np.int32)
    else:
        pl_flat = np.empty(0, dtype=np.int32)
    poly_lens = pa.ListArray.from_arrays(
        pa.array(poff.astype(np.int32),
                 mask=np.concatenate([~mp, [False]])),
        pa.array(pl_flat, pa.int32()))

    gtype = pc.take(pa.array(list(GTYPES), pa.string()),
                    pa.array(gcodes))
    return {
        "gtype": gtype, "coords": coords, "ring_lens": ring_lens,
        "poly_lens": poly_lens, "ring_size": ring_size,
        "ring_start": ring_start, "ring_end": ring_end,
        "minx": pa.array(res.minx, pa.float64()),
        "miny": pa.array(res.miny, pa.float64()),
        "maxx": pa.array(res.maxx, pa.float64()),
        "maxy": pa.array(res.maxy, pa.float64()),
    }


def clip_result_records(res, srcs_by_out, ords) -> list[dict]:
    """Materialize a ClipResult into FEATURE records; fid/tags come from
    the per-output source records (aligned with output features),
    ord_path from the caller's bookkeeping."""
    from .kernel.vec import GT_MPOLY, GTYPES, rags_to_feature_arrays
    rg = res.rags
    f_roff, xyz = rags_to_feature_arrays(rg)
    lens3 = (rg.ring_lens() * 3).astype(np.int32)
    out = []
    for oi in range(res.n_feats):
        r0, r1 = int(f_roff[oi]), int(f_roff[oi + 1])
        v0 = int(rg.roff[r0])
        v1 = int(rg.roff[r1])
        src = srcs_by_out[oi]
        code = int(res.gcodes[oi])
        poly_lens = None
        if code == GT_MPOLY:
            poly_lens = np.bincount(rg.rpoly[r0:r1]).astype(np.int32)
        out.append({
            "ord_path": [int(v) for v in ords[oi]],
            "fid_json": src["fid_json"],
            "tags_json": src["tags_json"],
            "gtype": GTYPES[code],
            "coords": xyz[3 * v0:3 * v1],
            "ring_lens": lens3[r0:r1],
            "poly_lens": poly_lens,
            "ring_size": rg.rsize[r0:r1],
            "ring_start": rg.rstart[r0:r1],
            "ring_end": rg.rend[r0:r1],
            "minx": float(res.minx[oi]), "miny": float(res.miny[oi]),
            "maxx": float(res.maxx[oi]), "maxy": float(res.maxy[oi]),
        })
    return out


def _shift_df(df: DataFrame, offset: float) -> DataFrame:
    """World-copy x shift as pure Column ops
    (/root/reference/src/wrap.js:21-68): adding a constant commutes with
    min/max, so the bbox shifts exactly too."""
    return (df
            .withColumn("coords", F.expr(
                f"transform(coords, (v, i) -> IF(i % 3 == 0, v + {offset!r}D, v))"))
            .withColumn("minx", F.col("minx") + offset)
            .withColumn("maxx", F.col("maxx") + offset))


def wrap_df(df: DataFrame, options: TileOptions,
            counts: tuple[int, int] | None = None) -> DataFrame:
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

    if counts is None:
        row = df.agg(
            F.sum((F.col("minx") <= b).cast("long")).alias("l"),
            F.sum((F.col("maxx") >= 1 - b).cast("long")).alias("r")).first()
        counts = (row["l"] or 0, row["r"] or 0)
    has_left = bool(counts[0])
    has_right = bool(counts[1])

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

    def run_arrow(batches):
        """Arrow-native crossing kernel: list columns flatten straight
        into the rag flats (_arrow_state) and the clip results emit as
        pa.ListArray batches (_clip_out_geometry_arrays); fid/tags
        pass through as Arrow strings via pc.take — no pandas object
        boxing on either side of the kernel.  Byte-identical to the
        retired mapInPandas run — pinned against the object kernel on
        mixed geometry by tests/test_pipeline.py::
        test_split_arrow_loop_matches_object_kernel and against the
        wave kernel by test_one_wave_matches_loop_layout."""
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(TILED_FEATURE_SCHEMA)
        for rb in batches:
            if not rb.num_rows:
                continue
            tbl = pa.Table.from_batches([rb])
            mask = tbl.column("udf_mask").to_numpy(
                zero_copy_only=False).astype(np.int64, copy=False)
            for t in _split_crossing_tables(tbl, z, options, mask):
                yield t.cast(pa.schema(out_schema)).to_batches()[0]

    clipped = crossing.mapInArrow(run_arrow, TILED_FEATURE_SCHEMA)
    return passed.unionByName(clipped.select(*TILED_COLUMNS))


def _split_crossing_tables(tbl, z: int, options: TileOptions, mask):
    """The loop-split crossing kernel over one Arrow table: for each
    child quadrant flagged in ``mask`` (bit q = dy*2+dx), clip the
    row's geometry against the buffered child window and yield one
    pa.Table of TILED_COLUMNS per non-empty (dx, dy) pass.  Shared by
    split_children_df's mapInArrow task and the direct per-file split
    (split_files_direct) — both paths emit byte-identical rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .kernel.vec import batch_clip, take_features

    z2 = 1 << z
    k1c = 0.5 * options.buffer / options.extent
    k2c = 0.5 - k1c
    k3c = 0.5 + k1c
    k4c = 1 + k1c
    lm = options.line_metrics
    n = tbl.num_rows
    if not n:
        return
    (rags, gcodes, mnx, mny, mxx, mxy,
     _, _) = _arrow_state(tbl, sort=False, strings=False)
    tbl = tbl.combine_chunks()
    fid_col = tbl.column("fid_json").chunk(0)
    tags_col = tbl.column("tags_json").chunk(0)
    ord_lens = pc.fill_null(
        pc.list_value_length(tbl.column("ord_path")),
        0).to_numpy(zero_copy_only=False).astype(np.int64)
    ord_flat = pc.list_flatten(tbl.column("ord_path")).to_numpy(
        zero_copy_only=False).astype(np.int64, copy=False)
    fixed = ord_lens.min() == ord_lens.max()
    if fixed:
        w = int(ord_lens[0])
        ords_mat = ord_flat.reshape(n, w)
    else:  # mixed-depth ord groups (never produced by one build)
        ooffs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ord_lens, out=ooffs[1:])

    def _np(name, dtype):
        return tbl.column(name).to_numpy(
            zero_copy_only=False).astype(dtype, copy=False)

    tx = _np("x", np.int64)
    ty = _np("y", np.int64)
    for dx in (0, 1):
        selx = np.nonzero(mask & ((1 << dx) | (1 << (dx + 2))))[0]
        if not len(selx):
            continue
        xk1 = (tx[selx] + (k2c if dx else -k1c)) / z2
        xk2 = (tx[selx] + (k4c if dx else k3c)) / z2
        side = batch_clip(take_features(rags, selx), gcodes[selx],
                          mnx[selx], mny[selx], mxx[selx], mxy[selx],
                          xk1, xk2, 0, lm)
        if side.n_feats == 0:
            continue
        side_orig = selx[side.src]  # original record index
        for dy in (0, 1):
            q = dy * 2 + dx
            keep = np.nonzero(mask[side_orig] & (1 << q))[0]
            if not len(keep):
                continue
            sub = take_features(side.rags, keep)
            yk1 = (ty[side_orig[keep]] + (k2c if dy else -k1c)) / z2
            yk2 = (ty[side_orig[keep]] + (k4c if dy else k3c)) / z2
            resq = batch_clip(sub, side.gcodes[keep],
                              side.minx[keep], side.miny[keep],
                              side.maxx[keep], side.maxy[keep],
                              yk1, yk2, 1, lm)
            k = resq.n_feats
            if k == 0:
                continue
            orig = side_orig[keep][resq.src]
            xi = side.sub_ord[keep][resq.src]
            if fixed:
                out_mat = np.empty((k, w + 2), dtype=np.int64)
                out_mat[:, :w] = ords_mat[orig]
                out_mat[:, w] = xi
                out_mat[:, w + 1] = resq.sub_ord
                ord_arr = pa.ListArray.from_arrays(
                    pa.array((np.arange(k + 1) * (w + 2)).astype(
                        np.int32), pa.int32()),
                    pa.array(out_mat.ravel(), pa.int64()))
            else:
                ord_arr = pa.array(
                    [[*ord_flat[ooffs[o]:ooffs[o + 1]],
                      int(i), int(j)]
                     for o, i, j in zip(orig, xi, resq.sub_ord)],
                    pa.list_(pa.int64()))
            geo = _clip_out_geometry_arrays(resq)
            idx = pa.array(orig)
            arrays = [
                pa.array(np.full(k, z + 1, dtype=np.int32),
                         pa.int32()),
                pa.array((tx[orig] * 2 + dx).astype(np.int32),
                         pa.int32()),
                pa.array((ty[orig] * 2 + dy).astype(np.int32),
                         pa.int32()),
                ord_arr,
                pc.take(fid_col, idx),
                pc.take(tags_col, idx),
                geo["gtype"], geo["coords"], geo["ring_lens"],
                geo["poly_lens"], geo["ring_size"],
                geo["ring_start"], geo["ring_end"],
                geo["minx"], geo["miny"], geo["maxx"], geo["maxy"],
            ]
            yield pa.Table.from_arrays(arrays, names=TILED_COLUMNS)


# ----------------------------------------------------- direct split

def _tiled_arrow_schema():
    """Spark's Arrow schema for TILED_FEATURE_SCHEMA + n_verts — the
    on-disk frontier layout both split paths produce."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema
    base = to_arrow_schema(TILED_FEATURE_SCHEMA)
    return base.append(pa.field("n_verts", pa.int64()))


def _quadrant_route(tbl, z: int, options: TileOptions):
    """numpy twin of split_children_df's Column router: per row, the
    per-quadrant trivial-accept booleans (a row may be accepted by
    several overlapping buffered windows, matching the Column array
    explode) and the crossing bit-mask (bit q = dy*2+dx)."""
    z2 = 1 << z
    k1c = 0.5 * options.buffer / options.extent
    k2c = 0.5 - k1c
    k3c = 0.5 + k1c
    k4c = 1 + k1c

    def _np(name, dtype):
        return tbl.column(name).to_numpy(
            zero_copy_only=False).astype(dtype, copy=False)

    tx = _np("x", np.int64)
    ty = _np("y", np.int64)
    mnx = _np("minx", np.float64)
    mny = _np("miny", np.float64)
    mxx = _np("maxx", np.float64)
    mxy = _np("maxy", np.float64)
    n = tbl.num_rows
    acc = np.zeros((4, n), dtype=bool)
    mask = np.zeros(n, dtype=np.int64)
    for q in range(4):
        dx, dy = q & 1, q >> 1
        xlo = (tx + (k2c if dx else -k1c)) / z2
        xhi = (tx + (k4c if dx else k3c)) / z2
        ylo = (ty + (k2c if dy else -k1c)) / z2
        yhi = (ty + (k4c if dy else k3c)) / z2
        acc_q = (mnx >= xlo) & (mxx < xhi) & (mny >= ylo) & (mxy < yhi)
        rej_q = (mxx < xlo) | (mnx >= xhi) | (mxy < ylo) | (mny >= yhi)
        acc[q] = acc_q
        mask |= np.where(~acc_q & ~rej_q, np.int64(1 << q), np.int64(0))
    return acc, mask


def _pass_table(tbl, z: int, acc):
    """Trivially-accepted (feature, quadrant) child rows as one Arrow
    table: geometry columns pass through untouched (pc.take), the ord
    path appends the same [0, 0] marker the Column branch appends."""
    import pyarrow as pa
    import pyarrow.compute as pc

    idx_parts, dx_parts, dy_parts = [], [], []
    for q in range(4):
        iq = np.nonzero(acc[q])[0]
        if len(iq):
            idx_parts.append(iq)
            dx_parts.append(np.full(len(iq), q & 1, dtype=np.int64))
            dy_parts.append(np.full(len(iq), q >> 1, dtype=np.int64))
    if not idx_parts:
        return None
    idx = np.concatenate(idx_parts)
    dxs = np.concatenate(dx_parts)
    dys = np.concatenate(dy_parts)
    k = len(idx)
    tbl = tbl.combine_chunks()
    ord_lens = pc.fill_null(
        pc.list_value_length(tbl.column("ord_path")),
        0).to_numpy(zero_copy_only=False).astype(np.int64)
    ord_flat = pc.list_flatten(tbl.column("ord_path")).to_numpy(
        zero_copy_only=False).astype(np.int64, copy=False)
    if ord_lens.min() == ord_lens.max():
        w = int(ord_lens[0]) if len(ord_lens) else 0
        out_mat = np.zeros((k, w + 2), dtype=np.int64)
        out_mat[:, :w] = ord_flat.reshape(-1, w)[idx]
        ord_arr = pa.ListArray.from_arrays(
            pa.array((np.arange(k + 1) * (w + 2)).astype(np.int32),
                     pa.int32()),
            pa.array(out_mat.ravel(), pa.int64()))
    else:  # mixed-depth ord groups (never produced by one build)
        offs = np.zeros(len(ord_lens) + 1, dtype=np.int64)
        np.cumsum(ord_lens, out=offs[1:])
        ord_arr = pa.array(
            [[*ord_flat[offs[i]:offs[i + 1]], 0, 0] for i in idx],
            pa.list_(pa.int64()))
    take = pa.array(idx)
    tx = tbl.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
    ty = tbl.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
    arrays = [
        pa.array(np.full(k, z + 1, dtype=np.int32), pa.int32()),
        pa.array((tx[idx] * 2 + dxs).astype(np.int32), pa.int32()),
        pa.array((ty[idx] * 2 + dys).astype(np.int32), pa.int32()),
        ord_arr,
    ]
    for name in TILED_COLUMNS[4:]:
        arrays.append(pc.take(tbl.column(name).chunk(0), take))
    return pa.Table.from_arrays(arrays, names=TILED_COLUMNS)


def _direct_split_file(fi: int, path: str, z: int, heavy: list,
                       options: TileOptions, out_dir: str,
                       codec: str, shard_rows: int | None = None) -> dict:
    """One direct-split task: read ONE frontier parquet file with
    pyarrow, keep rows of heavy parents, route + clip to z+1 children
    with the shared crossing kernel, and write the output parquet
    shards straight from the task (tmp + rename under deterministic
    names, so a retry overwrites rather than duplicates — the same
    committer-free pattern as _write_subtree_part).  Returns a slim
    ack dict whose per-child aggregates ARE the next round's
    classification stats, so the driver never re-scans the store.

    Scale rationale (measured, BENCH/SCALING.md round 4): the
    mapInArrow form of this stage spent most of its wall moving
    geometry JVM→Python→JVM around a fast numpy kernel — JVM parquet
    decode, two Arrow pipe crossings, a full-geometry repartition
    exchange, and the JVM writer.  Task-side Arrow-native I/O removes
    every crossing: the only bytes that touch the JVM are the file
    path in and the ack out.  Balance is preserved without the
    exchange by sharding each task's output to ≤ its input row count
    (next-round tasks = files, so parallelism tracks data volume),
    and the heavy-parent filter prunes at the row level exactly like
    the pushed-down isin."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t0 = time.monotonic()
    tbl = pq.read_table(path)
    rows_in = tbl.num_rows
    ack = {"file": fi, "rows_in": rows_in, "rows_kept": 0,
           "rows_out": 0, "stats": [], "secs": 0.0}
    if rows_in:
        tx = tbl.column("x").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        ty = tbl.column("y").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        want = np.fromiter(((int(x) << 32) + int(y) for x, y in heavy),
                           dtype=np.int64, count=len(heavy))
        m = np.isin((tx << 32) + ty, want)
        if not m.all():
            tbl = tbl.take(pa.array(np.nonzero(m)[0])).combine_chunks()
    if not tbl.num_rows:
        ack["secs"] = time.monotonic() - t0
        return ack
    ack["rows_kept"] = tbl.num_rows
    acc, mask = _quadrant_route(tbl, z, options)
    parts = []
    pt = _pass_table(tbl, z, acc)
    if pt is not None:
        parts.append(pt)
    cross = np.nonzero(mask > 0)[0]
    if len(cross):
        ct = tbl.take(pa.array(cross)).combine_chunks()
        parts.extend(_split_crossing_tables(ct, z, options, mask[cross]))
    if not parts:
        ack["secs"] = time.monotonic() - t0
        return ack
    out = pa.concat_tables(parts).combine_chunks()
    nv = pc.cast(pc.divide(pc.list_value_length(out.column("coords")),
                           3), pa.int64())
    out = (out.append_column("n_verts", nv)
           .cast(_tiled_arrow_schema()))
    n_out = out.num_rows
    ack["rows_out"] = n_out

    agg = out.select(["x", "y", "n_verts", "minx", "miny",
                      "maxx", "maxy"]).group_by(["x", "y"]).aggregate([
        ("n_verts", "count"), ("n_verts", "sum"),
        ("minx", "min"), ("miny", "min"),
        ("maxx", "max"), ("maxy", "max")])
    cols = {name: agg[name].to_pylist() for name in agg.column_names}
    ack["stats"] = [
        {"x": int(cols["x"][i]), "y": int(cols["y"][i]),
         "num_features": int(cols["n_verts_count"][i]),
         "num_points": int(cols["n_verts_sum"][i] or 0),
         "minx": float(cols["minx_min"][i]),
         "miny": float(cols["miny_min"][i]),
         "maxx": float(cols["maxx_max"][i]),
         "maxy": float(cols["maxy_max"][i])}
        for i in range(agg.num_rows)]

    if shard_rows is None:
        shard_rows = max(4096, rows_in)
    n_shards = max(1, -(-n_out // shard_rows))
    per = -(-n_out // n_shards)
    for si in range(n_shards):
        part = out.slice(si * per, per)
        if not part.num_rows:
            continue
        final = os.path.join(out_dir, f"part-f{fi:05d}-s{si:03d}.parquet")
        tmp = final + ".inprogress"
        pq.write_table(part, tmp, compression=codec)
        os.replace(tmp, final)
    ack["secs"] = time.monotonic() - t0
    return ack


def split_files_direct(spark, z: int, heavy: list, options: TileOptions,
                       in_dir: str, out_dir: str,
                       shard_rows: int | None = None) -> tuple[list, list]:
    """Direct per-file split job: one Spark task per frontier parquet
    file, each reading/clipping/writing via pyarrow in the task (see
    _direct_split_file).  Returns (stats, acks): stats rows are the
    z+1 classification aggregates merged across files — identical to
    the groupBy the blocking stats agg would compute — and acks carry
    per-task (rows, secs) for the lineage record.

    Spark here provides scheduling, retries and locality only; the
    geometry never crosses the JVM.  The fallback mapInArrow path
    (split_children_df) remains for frontiers that are not local
    parquet directories."""
    import shutil

    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet parts under {in_dir}")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    codec = os.environ.get("GVT_CODEC", "zstd")
    heavy_keys = [(int(x), int(y)) for x, y in heavy]
    opts = options
    zz, od = z, out_dir
    sr = shard_rows
    acks = (spark.sparkContext
            .parallelize(list(enumerate(files)), len(files))
            .map(lambda t: _direct_split_file(
                t[0], t[1], zz, heavy_keys, opts, od, codec, sr))
            .collect())
    if not any(a["rows_out"] for a in acks):
        # keep the store readable: one empty file with the full schema
        import pyarrow.parquet as pq
        schema = _tiled_arrow_schema()
        pq.write_table(schema.empty_table(),
                       os.path.join(out_dir, "part-empty.parquet"),
                       compression=codec)
    open(os.path.join(out_dir, "_SUCCESS"), "w").close()
    merged: dict = {}
    for a in acks:
        for s in a["stats"]:
            key = (s["x"], s["y"])
            cur = merged.get(key)
            if cur is None:
                merged[key] = dict(s)
            else:
                cur["num_features"] += s["num_features"]
                cur["num_points"] += s["num_points"]
                cur["minx"] = min(cur["minx"], s["minx"])
                cur["miny"] = min(cur["miny"], s["miny"])
                cur["maxx"] = max(cur["maxx"], s["maxx"])
                cur["maxy"] = max(cur["maxy"], s["maxy"])
    return list(merged.values()), acks


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


# per-(feature, tile) rendered rows: geometry rides as flat integer
# pair arrays (gtype 0 = feature dropped by the tolerance filter but
# kept for the stats sums); JSON/object form is built at read time
_MAPPED_SCHEMA = ("z int, x int, y int, ord_path array<long>, gtype int, "
                  "coords array<int>, rlens array<int>, "
                  "tags_json string, fid_json string, "
                  "n_points long, n_simplified long, "
                  "minx double, miny double, maxx double, maxy double")


def rendered_features_df(frontier: DataFrame,
                         options: TileOptions) -> DataFrame:
    """Tile assembly + transform (/root/reference/src/tile.js,
    /root/reference/src/transform.js), restructured for scale:

    addFeature is a strictly per-feature operation and the tile stats
    are sums, so assembly = a *narrow* per-feature map (tolerance
    filter, rewind, integer transform, JSON render) producing one
    rendered row per (feature, tile).  No shuffle, no grouped-map UDF,
    and no per-tile string concat: the z0 tile that holds the whole
    corpus stays spread across its input partitions, and a tile's
    features array is materialized lazily at read time ordered by the
    explicit ord_path key (Spark guarantees no row order; the reference
    guarantees insertion order, SURVEY.md §2.6 A1)."""
    def per_feature(batches):
        import pyarrow as pa
        for rb in batches:
            yield _render_batch(pa.Table.from_batches([rb]), options)

    return frontier.mapInArrow(per_feature, _MAPPED_SCHEMA)


def _mapped_arrow_schema():
    """Arrow twin of _MAPPED_SCHEMA, built without a SparkContext so
    direct-render worker tasks can cast to it."""
    import pyarrow as pa
    return pa.schema([
        ("z", pa.int32()), ("x", pa.int32()), ("y", pa.int32()),
        ("ord_path", pa.list_(pa.int64())),
        ("gtype", pa.int32()),
        ("coords", pa.list_(pa.int32())),
        ("rlens", pa.list_(pa.int32())),
        ("tags_json", pa.string()), ("fid_json", pa.string()),
        ("n_points", pa.int64()), ("n_simplified", pa.int64()),
        ("minx", pa.float64()), ("miny", pa.float64()),
        ("maxx", pa.float64()), ("maxy", pa.float64()),
    ])


def _render_batch(tbl, options: TileOptions):
    """Render one Arrow table of TILED rows (z/x/y + FEATURE columns)
    to a _MAPPED_SCHEMA RecordBatch — the kernel body shared by
    rendered_features_df's mapInArrow task and the direct per-file
    render (render_files_direct)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .kernel.vec import GT_LINE, batch_assemble
    lm = options.line_metrics
    (rags, gcodes, mnx, mny, mxx, mxy,
     _f, tagss) = _arrow_state(tbl, sort=False, strings=lm)
    tbl = tbl.combine_chunks()
    col = {nm: tbl.column(nm).chunk(0) if tbl.num_rows else
           pa.array([], tbl.schema.field(nm).type)
           for nm in ("z", "x", "y", "ord_path",
                      "tags_json", "fid_json")}
    tz = col["z"].to_numpy(zero_copy_only=False).astype(np.int64)
    tx = col["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    ty = col["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    geom, n_pts, n_sim = batch_assemble(rags, gcodes, tz, tx, ty,
                                        options)
    fb, pb = geom.feature_offsets()
    flat = geom.pairs.reshape(-1).astype(np.int32)
    rl32 = geom.r_len.astype(np.int32)
    # rendered geometry leaves the task as flat Arrow list
    # buffers — no per-row numpy slicing, no object columns
    coords_arr = pa.ListArray.from_arrays(
        pa.array((2 * pb).astype(np.int32), pa.int32()),
        pa.array(flat, pa.int32()))
    rlens_arr = pa.ListArray.from_arrays(
        pa.array(fb.astype(np.int32), pa.int32()),
        pa.array(rl32, pa.int32()))
    tags_arr = col["tags_json"]
    if lm:
        hit = np.nonzero((geom.ftype > 0) &
                         (gcodes == GT_LINE))[0]
        if len(hit):
            sizes = pc.list_flatten(tbl.column("ring_size")) \
                .to_numpy(zero_copy_only=False)
            starts = pc.list_flatten(tbl.column("ring_start")) \
                .to_numpy(zero_copy_only=False)
            ends = pc.list_flatten(tbl.column("ring_end")) \
                .to_numpy(zero_copy_only=False)
            roffs = np.zeros(len(gcodes) + 1, dtype=np.int64)
            np.cumsum(pc.fill_null(pc.list_value_length(
                tbl.column("ring_size")), 0).to_numpy(
                zero_copy_only=False), out=roffs[1:])
            tags_col = list(tagss)
            for fi in hit:
                tags = (_jloads(tags_col[fi])
                        if tags_col[fi] else {})
                at = int(roffs[fi])
                size = float(sizes[at])
                tags["mapbox_clip_start"] = float(starts[at]) / size
                tags["mapbox_clip_end"] = float(ends[at]) / size
                tags_col[fi] = _jdumps(tags)
            tags_arr = pa.array(tags_col, type=pa.string())
    return pa.RecordBatch.from_arrays([
        col["z"], col["x"], col["y"], col["ord_path"],
        pa.array(geom.ftype.astype(np.int32), pa.int32()),
        coords_arr, rlens_arr, tags_arr, col["fid_json"],
        pa.array(n_pts.astype(np.int64), pa.int64()),
        pa.array(n_sim.astype(np.int64), pa.int64()),
        pa.array(mnx, pa.float64()), pa.array(mny, pa.float64()),
        pa.array(mxx, pa.float64()), pa.array(mxy, pa.float64()),
    ], names=["z", "x", "y", "ord_path", "gtype", "coords",
              "rlens", "tags_json", "fid_json", "n_points",
              "n_simplified", "minx", "miny", "maxx", "maxy"])


def _direct_render_file(fi: int, path: str, z: int, parents,
                        options: TileOptions, out_dir: str,
                        codec: str, z0_seed: bool) -> dict:
    """One direct-render task: read ONE frontier parquet file with
    pyarrow, render with the shared batch kernel, write the tilefeat
    shard task-side (tmp + deterministic rename), and return per-tile
    n_simplified sums so the zoom finalizer never re-scans the store.
    ``z0_seed`` reads a FEATURES checkpoint file instead, synthesizing
    the (z=0, x=0, y=0) literals and the [1, …, 0] ord wrapper that
    engine._frontier0_view adds Column-side."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    t0 = time.monotonic()
    tbl = pq.read_table(path)
    ack = {"file": fi, "rows": 0, "nsim": [], "secs": 0.0}
    if z0_seed and tbl.num_rows:
        tbl = tbl.select(FEATURE_COLUMNS).combine_chunks()
        n = tbl.num_rows
        ord_lens = pc.fill_null(
            pc.list_value_length(tbl.column("ord_path")),
            0).to_numpy(zero_copy_only=False).astype(np.int64)
        ord_flat = pc.list_flatten(tbl.column("ord_path")).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(ord_lens, out=offs[1:])
        new_lens = ord_lens + 2
        noffs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_lens, out=noffs[1:])
        flat = np.zeros(int(noffs[-1]), dtype=np.int64)
        flat[noffs[:-1]] = 1          # world prefix
        put = (np.arange(int(offs[-1]))
               + np.repeat(noffs[:-1] + 1 - offs[:-1], ord_lens))
        flat[put] = ord_flat          # original path; trailing 0 stays
        ord_arr = pa.ListArray.from_arrays(
            pa.array(noffs.astype(np.int32), pa.int32()),
            pa.array(flat, pa.int64()))
        zeros = pa.array(np.zeros(n, dtype=np.int32), pa.int32())
        tbl = (tbl.set_column(tbl.schema.get_field_index("ord_path"),
                              "ord_path", ord_arr)
               .add_column(0, "y", zeros)
               .add_column(0, "x", zeros)
               .add_column(0, "z", zeros))
    elif parents is not None and tbl.num_rows:
        tx = tbl.column("x").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        ty = tbl.column("y").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        want = np.fromiter(((int(x) << 32) + int(y) for x, y in parents),
                           dtype=np.int64, count=len(parents))
        m = np.isin(((tx >> 1) << 32) + (ty >> 1), want)
        if not m.all():
            tbl = tbl.take(pa.array(np.nonzero(m)[0])).combine_chunks()
    if not tbl.num_rows:
        ack["secs"] = time.monotonic() - t0
        return ack
    out = pa.Table.from_batches([_render_batch(tbl, options)])
    out = out.cast(_mapped_arrow_schema()).drop_columns(["z"])
    ack["rows"] = out.num_rows
    agg = (out.select(["x", "y", "n_simplified"])
           .group_by(["x", "y"]).aggregate([("n_simplified", "sum")]))
    ack["nsim"] = [[int(a), int(b), int(c or 0)] for a, b, c in zip(
        agg["x"].to_pylist(), agg["y"].to_pylist(),
        agg["n_simplified_sum"].to_pylist())]
    final = os.path.join(out_dir, f"part-f{fi:05d}.parquet")
    tmp = final + ".inprogress"
    pq.write_table(out, tmp, compression=codec)
    os.replace(tmp, final)
    ack["secs"] = time.monotonic() - t0
    return ack


def render_files_direct(spark, z: int, parents, options: TileOptions,
                        in_dir: str, out_dir: str,
                        z0_seed: bool = False) -> dict:
    """Direct per-file render job (the tilefeat twin of
    split_files_direct): one task per frontier file, pyarrow I/O
    task-side, slim acks back.  Returns {(x, y): n_simplified_sum} —
    the aggregate the zoom finalizer previously recomputed with a
    second scan of the store it had just written."""
    import shutil

    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet parts under {in_dir}")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    codec = os.environ.get("GVT_CODEC", "zstd")
    par = None if parents is None else [(int(x), int(y))
                                        for x, y in parents]
    opts, zz, od, seed = options, z, out_dir, z0_seed
    acks = (spark.sparkContext
            .parallelize(list(enumerate(files)), len(files))
            .map(lambda t: _direct_render_file(
                t[0], t[1], zz, par, opts, od, codec, seed))
            .collect())
    if not any(a["rows"] for a in acks):
        import pyarrow as pa
        import pyarrow.parquet as pq
        schema = _mapped_arrow_schema()
        schema = pa.schema([f for f in schema if f.name != "z"])
        pq.write_table(schema.empty_table(),
                       os.path.join(out_dir, "part-empty.parquet"),
                       compression=codec)
    open(os.path.join(out_dir, "_SUCCESS"), "w").close()
    nsim: dict = {}
    for a in acks:
        for x, y, s in a["nsim"]:
            nsim[(x, y)] = nsim.get((x, y), 0) + s
    return nsim


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
    # tile feature pack (kind=tile): per emitted feature a type code,
    # ring count, per-ring pair counts, flat int pairs, tags/fid JSON —
    # the read side materializes objects from these (no build-time JSON)
    T.StructField("ftypes", T.ArrayType(T.IntegerType()), True),
    T.StructField("fnrings", T.ArrayType(T.IntegerType()), True),
    T.StructField("frlens", T.ArrayType(T.IntegerType()), True),
    T.StructField("fcoords", T.ArrayType(T.IntegerType()), True),
    T.StructField("ftags", T.ArrayType(T.StringType(), True), True),
    T.StructField("ffids", T.ArrayType(T.StringType(), True), True),
    T.StructField("is_split", T.BooleanType(), True),
    T.StructField("has_source", T.BooleanType(), True),
    # retained-source pack (kind=source): ONE row per leaf tile holding
    # every source feature in flat concatenated arrays.  A per-feature
    # row layout here was the measured straggler term of the handoff
    # stage (a budget-sized group emits ~1M nested rows); the pack is a
    # handful of big flat arrays instead — O(1) rows per tile
    T.StructField("sp_gcode", T.ArrayType(T.IntegerType()), True),
    T.StructField("sp_fids", T.ArrayType(T.StringType(), True), True),
    T.StructField("sp_tags", T.ArrayType(T.StringType(), True), True),
    T.StructField("sp_nrings", T.ArrayType(T.IntegerType()), True),
    T.StructField("sp_ringlens", T.ArrayType(T.IntegerType()), True),
    T.StructField("sp_npoly", T.ArrayType(T.IntegerType()), True),
    T.StructField("sp_polylens", T.ArrayType(T.IntegerType()), True),
    T.StructField("sp_coords", T.ArrayType(T.DoubleType()), True),
    T.StructField("sp_rsize", T.ArrayType(T.DoubleType()), True),
    T.StructField("sp_rstart", T.ArrayType(T.DoubleType()), True),
    T.StructField("sp_rend", T.ArrayType(T.DoubleType()), True),
    T.StructField("sp_minx", T.ArrayType(T.DoubleType()), True),
    T.StructField("sp_miny", T.ArrayType(T.DoubleType()), True),
    T.StructField("sp_maxx", T.ArrayType(T.DoubleType()), True),
    T.StructField("sp_maxy", T.ArrayType(T.DoubleType()), True),
    T.StructField("minx", T.DoubleType(), True),
    T.StructField("miny", T.DoubleType(), True),
    T.StructField("maxx", T.DoubleType(), True),
    T.StructField("maxy", T.DoubleType(), True),
])

_SUBTREE_COLUMNS = [f.name for f in SUBTREE_SCHEMA.fields]

SOURCE_PACK_COLUMNS = [f.name for f in SUBTREE_SCHEMA.fields
                       if f.name.startswith("sp_")]


def unpack_source_pack(row) -> list[dict]:
    """kind=source subtree row (flat sp_* arrays) → per-feature FEATURE
    record dicts, ord_path = emission position.  Read-side twin of
    pack_leaves; runs per drill-target tile, so plain Python slicing
    is fine here."""
    from .kernel.vec import GTYPES
    gcodes = row["sp_gcode"] or []
    nrings = row["sp_nrings"] or []
    ringlens = row["sp_ringlens"] or []
    npoly = row["sp_npoly"] or []
    polylens = row["sp_polylens"] or []
    out = []
    ri = ci = pi = 0
    for i, code in enumerate(gcodes):
        nr = int(nrings[i])
        rl = ringlens[ri:ri + nr]
        c2 = int(sum(rl))
        npl = int(npoly[i])
        out.append({
            "ord_path": [i],
            "fid_json": row["sp_fids"][i],
            "tags_json": row["sp_tags"][i],
            "gtype": GTYPES[int(code)],
            "coords": row["sp_coords"][ci:ci + c2],
            "ring_lens": rl,
            "poly_lens": polylens[pi:pi + npl] if npl else None,
            "ring_size": row["sp_rsize"][ri:ri + nr],
            "ring_start": row["sp_rstart"][ri:ri + nr],
            "ring_end": row["sp_rend"][ri:ri + nr],
            "minx": row["sp_minx"][i], "miny": row["sp_miny"][i],
            "maxx": row["sp_maxx"][i], "maxy": row["sp_maxy"][i],
        })
        ri += nr
        ci += c2
        pi += npl
    return out


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


def batch_split_subtree(records, z0: int, x0: int, y0: int,
                        options: TileOptions, state=None,
                        root_forced_split: bool = True,
                        stop_after_root: bool = False):
    """Vectorized subtree build: one batch_clip / batch_assemble pass per
    LEVEL covering every tile at that level at once — the per-feature
    clip windows come from each feature's tile assignment, so the whole
    level's 4-way split costs six flat-numpy clips regardless of tile
    count.  Output semantics identical to split_subtree (index.js
    splitTile, first-pass stop rules).

    ``root_forced_split=True`` (the distributed-handoff contract): the
    root was already classified as splitting by the driver's stop rule
    and its own tile row was rendered by the distributed tilefeat
    stage, so the root level only fans out (index.js skips the parent
    tile inside splitTile the same way).  With ``False`` (the one-wave
    fast path) the root is a freshly-clipped child whose stop rule has
    NOT been evaluated: it is classified by the normal rule and its
    tile row (and leaf source, when it stops) IS emitted.

    ``stop_after_root=True`` (the deep-wave root-only task): emit the
    root's tile row exactly as above, then stop instead of recursing —
    the root's descendant subtrees are built by sibling tasks one
    level deeper (SparkTileEngine deep one-wave).  If the root turns
    out to be a leaf this degenerates to the full build (no recursion
    would have happened anyway).

    Returns (tile_rows, sources) where tile_rows are dicts of the
    subtree 'tile' kind and sources maps leaf (z,x,y) → a packed-array
    dict (see pack_leaves / SUBTREE_SCHEMA sp_* columns).
    """
    import numpy as np

    from .kernel.index import to_id
    from .kernel.vec import (GT_LINE, batch_assemble, batch_clip,
                             concat_rags, ragged_arange, records_to_rags,
                             take_features)

    if state is not None:
        (rags, gcodes, fminx, fminy, fmaxx, fmaxy,
         fids, tagss, _ords) = state
    else:
        rags, gcodes, fminx, fminy, fmaxx, fmaxy = records_to_rags(records)
        fids = [r["fid_json"] for r in records]
        tagss = [r["tags_json"] for r in records]
    # object arrays: the per-level fid/tag re-gathers become C-speed
    # fancy indexing instead of Python list comprehensions (measured
    # ~0.6 s of the 30k-page single-core split)
    fids = np.asarray(fids, dtype=object)
    tagss = np.asarray(tagss, dtype=object)
    n = rags.n_feats
    tilex = np.full(n, x0, dtype=np.int64)
    tiley = np.full(n, y0, dtype=np.int64)

    k1c = 0.5 * options.buffer / options.extent
    k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c
    lm = options.line_metrics

    tile_rows = []
    sources = {}
    pending = [(x0, y0)]  # tiles existing at the current level
    z = z0

    def pack_leaves(leaf_list, perm, gstart, gend):
        """All of a level's leaf tiles' retained-source features packed
        in ONE set of index-math gathers (the kind=source subtree
        rows); per tile only slicing of the shared tables remains.
        Hot path at scale: every feature lands here once per build,
        and a deep level holds 4^z leaf tiles — per-tile numpy calls
        were a measured straggler term."""
        from .kernel.vec import GT_MPOLY, rags_to_feature_arrays
        f_roff_, xyz_ = rags_to_feature_arrays(rags)
        lens3 = (rags.ring_lens() * 3).astype(np.int32)
        roff = rags.roff
        fcnt = np.asarray([gend[gi] - gstart[gi] for _, gi in leaf_list],
                          dtype=np.int64)
        lidx = np.concatenate([perm[gstart[gi]:gend[gi]]
                               for _, gi in leaf_list])
        fnr_l = (f_roff_[lidx + 1] - f_roff_[lidx]).astype(np.int64)
        rsrc = np.repeat(f_roff_[lidx], fnr_l) + ragged_arange(fnr_l)
        rl = lens3[rsrc]
        rl64 = rl.astype(np.int64)
        csrc = np.repeat(3 * roff[rsrc], rl64) + ragged_arange(rl64)
        coords_l = xyz_[csrc]
        rsize_l = rags.rsize[rsrc]
        rstart_l = rags.rstart[rsrc]
        rend_l = rags.rend[rsrc]
        gsel = gcodes[lidx]
        npoly_l = np.zeros(len(lidx), dtype=np.int32)
        pl_chunks = []
        rpoly = rags.rpoly
        for k in np.nonzero(gsel == GT_MPOLY)[0]:
            fi = int(lidx[k])
            pl = np.bincount(
                rpoly[f_roff_[fi]:f_roff_[fi + 1]]).astype(np.int32)
            npoly_l[k] = len(pl)
            pl_chunks.append(pl)
        polyflat = (np.concatenate(pl_chunks) if pl_chunks
                    else np.empty(0, dtype=np.int32))
        f_off = np.zeros(len(leaf_list) + 1, dtype=np.int64)
        np.cumsum(fcnt, out=f_off[1:])
        roff_l = np.concatenate(([0], np.cumsum(fnr_l)))
        coff_l = np.concatenate(([0], np.cumsum(rl64)))
        poff_l = np.concatenate(([0], np.cumsum(npoly_l,
                                                dtype=np.int64)))
        gsel32 = gsel.astype(np.int32)
        fnr32 = fnr_l.astype(np.int32)
        fid_l = fids[lidx]
        tag_l = tagss[lidx]
        mnx_l, mny_l = fminx[lidx], fminy[lidx]
        mxx_l, mxy_l = fmaxx[lidx], fmaxy[lidx]
        for li, (key, _) in enumerate(leaf_list):
            a, b2 = int(f_off[li]), int(f_off[li + 1])
            ra, rb = int(roff_l[a]), int(roff_l[b2])
            ca, cb = int(coff_l[ra]), int(coff_l[rb])
            pa_, pb_ = int(poff_l[a]), int(poff_l[b2])
            sources[key] = {
                "n": b2 - a,
                "sp_gcode": gsel32[a:b2],
                "sp_fids": fid_l[a:b2].tolist(),
                "sp_tags": tag_l[a:b2].tolist(),
                "sp_nrings": fnr32[a:b2],
                "sp_ringlens": rl[ra:rb],
                "sp_npoly": npoly_l[a:b2],
                "sp_polylens": polyflat[pa_:pb_],
                "sp_coords": coords_l[ca:cb],
                "sp_rsize": rsize_l[ra:rb],
                "sp_rstart": rstart_l[ra:rb],
                "sp_rend": rend_l[ra:rb],
                "sp_minx": mnx_l[a:b2], "sp_miny": mny_l[a:b2],
                "sp_maxx": mxx_l[a:b2], "sp_maxy": mxy_l[a:b2],
            }

    while pending:
        z2 = 1 << z
        geom, n_pts, n_simpl = batch_assemble(
            rags, gcodes, np.full(len(gcodes), z), tilex, tiley, options)
        fb, pb = geom.feature_offsets()
        rl32 = geom.r_len.astype(np.int32)
        flat32 = geom.pairs.reshape(-1).astype(np.int32)

        # stable grouping by tile (original feature order kept within
        # each tile) — one lexsort instead of a per-feature Python loop
        nfe = len(gcodes)
        perm = np.lexsort((tiley, tilex)) if nfe else \
            np.empty(0, dtype=np.int64)
        ptx_ = tilex[perm]
        pty_ = tiley[perm]
        if nfe:
            gcut = np.nonzero((ptx_[1:] != ptx_[:-1]) |
                              (pty_[1:] != pty_[:-1]))[0] + 1
            gstart = np.concatenate(([0], gcut))
            gend = np.concatenate((gcut, [nfe]))
            span = {(int(ptx_[s]), int(pty_[s])): (int(s), int(e))
                    for s, e in zip(gstart, gend)}
        else:
            span = {}

        split_keys = []
        if z == z0 and root_forced_split:
            # root level: exactly one pending tile, classified upstream,
            # never re-emitted (index.js skips the root in splitTile)
            split_keys = [(x0, y0)]
        else:
            # ---- per-GROUP aggregates + ONE global emitted-feature
            # table for the whole level: a deep build emits 4^z tiles,
            # so per-tile numpy calls (the previous shape) became the
            # measured straggler term — here every array op runs once
            # per level and tiles take slices of the shared tables
            if nfe:
                g_npts = np.add.reduceat(n_pts[perm], gstart).astype(np.int64)
                g_nsim = np.add.reduceat(n_simpl[perm], gstart).astype(np.int64)
                g_minx = np.minimum.reduceat(fminx[perm], gstart)
                g_miny = np.minimum.reduceat(fminy[perm], gstart)
                g_maxx = np.maximum.reduceat(fmaxx[perm], gstart)
                g_maxy = np.maximum.reduceat(fmaxy[perm], gstart)
                g_cnt = gend - gstart
                g_index = {(int(ptx_[s]), int(pty_[s])): gi
                           for gi, s in enumerate(gstart)}
                em_mask = geom.ftype[perm] > 0
                em = perm[em_mask]
                ecnt = np.add.reduceat(em_mask.astype(np.int64), gstart)
                e_off = np.concatenate(([0], np.cumsum(ecnt)))
                fnr_all = (fb[em + 1] - fb[em]).astype(np.int64)
                rsrc_all = np.repeat(fb[em], fnr_all) + ragged_arange(fnr_all)
                plen2_all = 2 * (pb[em + 1] - pb[em]).astype(np.int64)
                csrc_all = np.repeat(2 * pb[em], plen2_all) \
                    + ragged_arange(plen2_all)
                ftypes_all = geom.ftype[em].astype(np.int32)
                fnr32_all = fnr_all.astype(np.int32)
                frlens_all = rl32[rsrc_all]
                fcoords_all = flat32[csrc_all]
                ftags_all = tagss[em]  # fancy index copies — safe to edit
                ffids_all = fids[em]
                roff_em = np.concatenate(([0], np.cumsum(fnr_all)))
                coff_em = np.concatenate(([0], np.cumsum(plen2_all)))
                if lm:
                    for k in np.nonzero((ftypes_all == 2) &
                                        (gcodes[em] == GT_LINE))[0]:
                        fi = int(em[k])
                        tags = (_jloads(ftags_all[k])
                                if ftags_all[k] else {})
                        r0 = int(np.searchsorted(rags.rfeat, fi, "left"))
                        size = float(rags.rsize[r0])
                        tags["mapbox_clip_start"] = \
                            float(rags.rstart[r0]) / size
                        tags["mapbox_clip_end"] = \
                            float(rags.rend[r0]) / size
                        ftags_all[k] = _jdumps(tags)
            else:
                g_index = {}
            _empty32 = np.empty(0, dtype=np.int32)
            leaf_list = []
            for (gx, gy) in pending:
                gi = g_index.get((gx, gy))
                if gi is None:
                    npts = nsim = cnt = 0
                    bb = (2.0, 1.0, -1.0, 0.0)
                else:
                    npts = int(g_npts[gi])
                    nsim = int(g_nsim[gi])
                    cnt = int(g_cnt[gi])
                    bb = (float(g_minx[gi]), float(g_miny[gi]),
                          float(g_maxx[gi]), float(g_maxy[gi]))
                splits = not (z == options.index_max_zoom or
                              npts <= options.index_max_points)
                if gi is None:
                    ftypes = fnr32 = frlens = fcoords = _empty32
                    ftags = ffids = []
                else:
                    e0, e1 = int(e_off[gi]), int(e_off[gi + 1])
                    r0_, r1_ = int(roff_em[e0]), int(roff_em[e1])
                    c0_, c1_ = int(coff_em[e0]), int(coff_em[e1])
                    ftypes = ftypes_all[e0:e1]
                    fnr32 = fnr32_all[e0:e1]
                    frlens = frlens_all[r0_:r1_]
                    fcoords = fcoords_all[c0_:c1_]
                    ftags = ftags_all[e0:e1].tolist()
                    ffids = ffids_all[e0:e1].tolist()
                tile_rows.append({
                    "z": z, "x": gx, "y": gy,
                    "tile_id": to_id(z, gx, gy),
                    "num_features": cnt,
                    "num_points": npts, "num_simplified": nsim,
                    "ftypes": ftypes, "fnrings": fnr32,
                    "frlens": frlens, "fcoords": fcoords,
                    "ftags": ftags, "ffids": ffids,
                    "is_split": splits, "has_source": not splits,
                    "minx": bb[0], "miny": bb[1],
                    "maxx": bb[2], "maxy": bb[3],
                })
                if splits:
                    split_keys.append((gx, gy))
                elif gi is not None:
                    leaf_list.append(((z, gx, gy), gi))
            if leaf_list:
                pack_leaves(leaf_list, perm, gstart, gend)

        if not split_keys or (stop_after_root and z == z0):
            break

        skeys = np.sort(np.asarray([(gx << 32) | gy
                                    for gx, gy in split_keys],
                                   dtype=np.int64))
        fkeys = (tilex << 32) | tiley
        pos = np.searchsorted(skeys, fkeys)
        pos[pos == len(skeys)] = 0
        sel = np.nonzero(skeys[pos] == fkeys)[0].astype(np.int64)
        next_pending = [(2 * gx + dx, 2 * gy + dy)
                        for gx, gy in split_keys
                        for dx, dy in ((0, 0), (0, 1), (1, 0), (1, 1))]

        out_states = []
        if len(sel):
            s_rags = take_features(rags, sel)
            s_g = gcodes[sel]
            s_mnx, s_mny = fminx[sel], fminy[sel]
            s_mxx, s_mxy = fmaxx[sel], fmaxy[sel]
            s_fids = fids[sel]
            s_tags = tagss[sel]
            s_tx = tilex[sel]
            s_ty = tiley[sel]

            for dx in (0, 1):
                xk1 = (s_tx + (k2c if dx else -k1c)) / z2
                xk2 = (s_tx + (k4c if dx else k3c)) / z2
                side = batch_clip(s_rags, s_g, s_mnx, s_mny, s_mxx, s_mxy,
                                  xk1, xk2, 0, lm)
                if side.n_feats == 0:
                    continue
                side_tx = s_tx[side.src]
                side_ty = s_ty[side.src]
                side_fids = s_fids[side.src]
                side_tags = s_tags[side.src]
                for dy in (0, 1):
                    yk1 = (side_ty + (k2c if dy else -k1c)) / z2
                    yk2 = (side_ty + (k4c if dy else k3c)) / z2
                    q = batch_clip(side.rags, side.gcodes, side.minx,
                                   side.miny, side.maxx, side.maxy,
                                   yk1, yk2, 1, lm)
                    if q.n_feats == 0:
                        continue
                    out_states.append((
                        q,
                        side_fids[q.src],
                        side_tags[q.src],
                        side_tx[q.src] * 2 + dx,
                        side_ty[q.src] * 2 + dy,
                    ))

        pending = next_pending
        z += 1
        if not out_states:
            rags, gcodes = _empty_state()
            fids = tagss = np.empty(0, dtype=object)
            fminx = fminy = fmaxx = fmaxy = np.empty(0)
            tilex = tiley = np.empty(0, dtype=np.int64)
            continue
        rags = concat_rags([q.rags for q, *_ in out_states])
        gcodes = np.concatenate([q.gcodes for q, *_ in out_states])
        fminx = np.concatenate([q.minx for q, *_ in out_states])
        fminy = np.concatenate([q.miny for q, *_ in out_states])
        fmaxx = np.concatenate([q.maxx for q, *_ in out_states])
        fmaxy = np.concatenate([q.maxy for q, *_ in out_states])
        fids = np.concatenate([fd for _, fd, _, _, _ in out_states])
        tagss = np.concatenate([tg for _, _, tg, _, _ in out_states])
        tilex = np.concatenate([tx for *_, tx, _ in out_states])
        tiley = np.concatenate([ty for *_, ty in out_states])

    return tile_rows, sources


def _empty_state():
    import numpy as np

    from .kernel.vec import Rags
    rags = Rags(np.empty(0), np.empty(0), np.empty(0),
                np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int64),
                np.empty(0), np.empty(0), np.empty(0),
                np.empty(0, dtype=np.int64), 0)
    rags.router = np.empty(0, dtype=bool)
    return rags, np.empty(0, dtype=np.int64)


def _subtree_out_pdf(tile_rows, sources) -> pd.DataFrame:
    """(tile_rows, sources) from batch_split_subtree → one SUBTREE_SCHEMA
    pandas batch.  Retained sources are ONE packed row per leaf tile
    (the flat arrays were built by pack_leaves; a per-feature row
    layout here was the handoff stage's measured straggler term)."""
    rows = {c: [] for c in _SUBTREE_COLUMNS}

    def emit(vals: dict):
        for c in _SUBTREE_COLUMNS:
            rows[c].append(vals.get(c))

    for t in tile_rows:
        emit({"kind": "tile", **t})
    for (sz, sx, sy), pack in sources.items():
        if pack["n"] == 0:
            continue
        emit({"kind": "source", "z": sz, "x": sx, "y": sy,
              **{k: v for k, v in pack.items() if k != "n"}})
    return pd.DataFrame(rows, columns=_SUBTREE_COLUMNS)


SUBTREE_ACK_SCHEMA = ("z int, x int, y int, n long, "
                      "n_cand long, secs double")


def _write_subtree_part(out_pdf: pd.DataFrame, out_dir: str,
                        z: int, x: int, y: int) -> None:
    """Write one group's subtree rows straight from the kernel task via
    pyarrow, atomically (tmp + rename; a task retry overwrites the same
    deterministic name, so duplicate attempts cannot double rows).

    Rationale (measured, 30k-page wave): returning the packed rows
    through the grouped-map Arrow pipe and letting Spark's writer
    persist them costs ~1 s of pure pandas→Arrow→JVM boxing tax per
    wave, vs ~0.2 s writing the same bytes task-side — the store is
    engine-private, its _SUCCESS marker is written by the driver after
    the job, and the lineage row remains the real commit point.  On
    object storage the per-file rename becomes a single PUT, the same
    direct-write pattern cloud committers use."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema
    os.makedirs(out_dir, exist_ok=True)
    codec = os.environ.get("GVT_CODEC", "zstd")
    path = os.path.join(out_dir, f"part-z{z}-x{x}-y{y}.parquet")
    tmp = path + ".inprogress"
    pq.write_table(
        pa.Table.from_pandas(out_pdf, schema=to_arrow_schema(SUBTREE_SCHEMA),
                             preserve_index=False),
        tmp, compression=codec)
    os.replace(tmp, path)


def subtree_stage_df(frontier: DataFrame, options: TileOptions,
                     out_dir: str | None = None) -> DataFrame:
    """Grouped-map handoff: each light splitting tile's features become
    one Arrow batch; the whole descendant pyramid of that tile is built
    inside the task with the parity-exact local kernel.

    This is the scale hinge of the engine (SURVEY.md §4): the
    distributed per-zoom loop runs only while tiles are heavy (few,
    skewed), then 4^z-way tile parallelism takes over with zero further
    driver coordination — per-task work is bounded by the handoff
    threshold, so no group can exceed executor memory.

    With ``out_dir`` set, each task writes its own parquet part there
    (see _write_subtree_part) and the returned frame carries one slim
    ack row per group instead of the packed rows."""
    def run(key, pdf):
        t0 = time.monotonic()
        z0, x0, y0 = int(key[0]), int(key[1]), int(key[2])
        # materialize sort keys once — a per-comparison .iloc lambda
        # costs ~10µs/row and was a visible slice of the task wall
        ords = [tuple(v) for v in pdf["ord_path"]]
        order = sorted(range(len(ords)), key=ords.__getitem__)
        pdf = pdf.iloc[order].reset_index(drop=True)
        state = _pdf_state(pdf)
        tile_rows, sources = batch_split_subtree(None, z0, x0, y0, options,
                                                 state=state)
        out = _subtree_out_pdf(tile_rows, sources)
        if out_dir is None:
            return out
        _write_subtree_part(out, out_dir, z0, x0, y0)
        return pd.DataFrame({"z": [z0], "x": [x0], "y": [y0],
                             "n": [len(out)], "n_cand": [len(pdf)],
                             "secs": [time.monotonic() - t0]})

    return frontier.groupBy("z", "x", "y").applyInPandas(
        run, SUBTREE_ACK_SCHEMA if out_dir is not None else SUBTREE_SCHEMA)


# --------------------------------------------------------------- wave

def wave_children_df(frontier: DataFrame, z: int,
                     options: TileOptions) -> DataFrame:
    """Tiles-at-zoom-z frontier → candidate (feature, z+1 child) rows:
    each feature is routed to every quadrant of ITS OWN tile that its
    bbox is not trivially rejected from (the same rejection windows
    splitTile's clip uses, /root/reference/src/index.js:123-140 +
    clip.js:13-20).

    Pure Column explode — NO map-side Python and NO clipping here: the
    wave kernel clips each group against its child window itself, so
    geometry crosses the Arrow pipe exactly once.  Features are NOT
    modified (ord_path, coords, clip bookkeeping all ride unchanged);
    a feature spanning several quadrants is duplicated per quadrant,
    exactly the candidate set the parent clip would hand each child.

    Grouping handoff batches by CHILD instead of parent quarters the
    straggler task and quadruples wave parallelism — the round-4
    2M-page grid profile measured the tail batch (10 parent tasks on
    32 cores) gating the build for ~30 s of mostly-idle fleet."""
    z2 = 1 << z
    k1c = 0.5 * options.buffer / options.extent
    k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c
    quads = []
    for q in range(4):
        dx, dy = q & 1, q >> 1
        xlo = (F.col("x") + (k2c if dx else -k1c)) / z2
        xhi = (F.col("x") + (k4c if dx else k3c)) / z2
        ylo = (F.col("y") + (k2c if dy else -k1c)) / z2
        yhi = (F.col("y") + (k4c if dy else k3c)) / z2
        rej = ((F.col("maxx") < xlo) | (F.col("minx") >= xhi) |
               (F.col("maxy") < ylo) | (F.col("miny") >= yhi))
        quads.append(F.when(~rej, F.struct(
            F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))))
    return (frontier
            .withColumn("q", F.explode(
                F.filter(F.array(*quads), lambda s: s.isNotNull())))
            .withColumn("z", F.lit(z + 1))
            .withColumn("x", F.col("x") * 2 + F.col("q.dx"))
            .withColumn("y", F.col("y") * 2 + F.col("q.dy"))
            .select(*TILED_COLUMNS))


def one_wave_children_df(frontier0: DataFrame,
                         options: TileOptions) -> DataFrame:
    """z0 frontier → candidate (feature, z1 child) rows for the one-wave
    fast path (the z=0 case of wave_children_df)."""
    return wave_children_df(frontier0, 0, options)


def deep_wave_route_df(frontier0: DataFrame, options: TileOptions,
                       deep1: list[tuple[int, int]],
                       deep2: list[tuple[int, int]]) -> DataFrame:
    """One-pass deep-wave router: z0 frontier → candidate rows for
    every wave group — the 4 z1 cells, the z2 children of subdivided
    z1 cells, and the z3 children of subdivided z2 cells — in a single
    projection + explode (the chained wave_children_df form rescanned
    the frontier once per extra level; measured ~0.5 s/wave of pure
    re-route at 30k pages).

    Emits exactly the same rows: a cell's buffered window is contained
    in its parent's for any buffer (child bounds (p + const)/2z2l lie
    inside [parent - k1c, parent + k3c]/z2l), so testing each cell's
    own window against the feature's original bbox reproduces the
    route-then-reroute set, and the window floats are the identical
    (parent + const) / z2l sequence wave_stage_df clips against.
    role=1 marks root-only groups (subdivided cells), role=0 subtree
    groups, matching SparkTileEngine._one_wave_subtree_job."""
    k1c = 0.5 * options.buffer / options.extent
    k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c
    d1, d2 = set(deep1), set(deep2)

    def _accept(z: int, cx: int, cy: int):
        z2l = 1 << (z - 1)
        px, py = cx >> 1, cy >> 1
        xlo = (px + (k2c if cx & 1 else -k1c)) / z2l
        xhi = (px + (k4c if cx & 1 else k3c)) / z2l
        ylo = (py + (k2c if cy & 1 else -k1c)) / z2l
        yhi = (py + (k4c if cy & 1 else k3c)) / z2l
        rej = ((F.col("maxx") < xlo) | (F.col("minx") >= xhi) |
               (F.col("maxy") < ylo) | (F.col("miny") >= yhi))
        return ~rej

    targets = []
    for cx, cy in ((x, y) for y in (0, 1) for x in (0, 1)):
        role = 1 if (cx, cy) in d1 else 0
        targets.append((1, cx, cy, role))
    for px, py in deep1:
        for dy in (0, 1):
            for dx in (0, 1):
                cx, cy = 2 * px + dx, 2 * py + dy
                targets.append((2, cx, cy, 1 if (cx, cy) in d2 else 0))
    for px, py in deep2:
        for dy in (0, 1):
            for dx in (0, 1):
                targets.append((3, 2 * px + dx, 2 * py + dy, 0))
    cells = [F.when(_accept(z, cx, cy), F.struct(
        F.lit(z).cast("int").alias("z"),
        F.lit(cx).cast("int").alias("x"),
        F.lit(cy).cast("int").alias("y"),
        F.lit(role).cast("int").alias("role")))
        for z, cx, cy, role in targets]
    return (frontier0
            .withColumn("t", F.explode(
                F.filter(F.array(*cells), lambda s: s.isNotNull())))
            .withColumn("z", F.col("t.z"))
            .withColumn("x", F.col("t.x"))
            .withColumn("y", F.col("t.y"))
            .withColumn("role", F.col("t.role"))
            .select(*TILED_COLUMNS, "role"))


def _arrow_state(tbl, sort=True, strings=True):
    """One Arrow table → kernel state (ord-sorted when ``sort``), zero
    pandas boxing: list columns flatten to their backing buffers
    (pyarrow list_flatten / list_value_length are C++), the ord sort is
    one np.lexsort over the reshaped fixed-width ord_path matrix, and
    the rags build goes through the shared flats_to_rags constructor.
    With ``strings=False`` the fid/tags object arrays are skipped (the
    caller passes the Arrow columns through unchanged).  The pandas
    map paths paid ~60 µs/feature in Arrow→object-column conversion +
    tuple sorts — ~70% of a dense handoff task's wall at 2M pages
    (measured round 4; the kernel itself was the other 30%)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .kernel.vec import GT_CODE, flats_to_rags
    tbl = tbl.combine_chunks()
    n = tbl.num_rows

    def _flat(name, dtype):
        return pc.list_flatten(tbl.column(name)).to_numpy(
            zero_copy_only=False).astype(dtype, copy=False)

    def _lens(name):
        # null lists (e.g. poly_lens on non-MultiPolygon rows) count 0,
        # matching the pandas path where they are simply never touched
        return pc.fill_null(
            pc.list_value_length(tbl.column(name)), 0).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)

    if sort and n:
        ord_lens = _lens("ord_path")
        ord_vals = _flat("ord_path", np.int64)
        if ord_lens.min() == ord_lens.max():
            mat = ord_vals.reshape(n, int(ord_lens[0]))
            order = np.lexsort(mat.T[::-1])
        else:  # mixed-depth groups (never produced by one build)
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(ord_lens, out=offs[1:])
            ords = [tuple(ord_vals[offs[i]:offs[i + 1]])
                    for i in range(n)]
            order = np.asarray(
                sorted(range(n), key=ords.__getitem__), dtype=np.int64)
        if not np.array_equal(order, np.arange(n)):
            tbl = tbl.take(pa.array(order)).combine_chunks()

    gt = tbl.column("gtype")
    if isinstance(gt, pa.ChunkedArray):
        gt = (gt.chunk(0) if gt.num_chunks == 1
              else pa.concat_arrays(
                  [c.cast(gt.type) for c in gt.chunks])
              if gt.num_chunks else pa.array([], gt.type))
    enc = gt.dictionary_encode()
    code_map = np.asarray([GT_CODE[s] for s in enc.dictionary.to_pylist()],
                          dtype=np.int64)
    gcodes = (code_map[enc.indices.to_numpy(zero_copy_only=False)]
              if n else np.empty(0, dtype=np.int64))

    nr = _lens("ring_lens")
    pl_lens = _lens("poly_lens")
    pl_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(pl_lens, out=pl_off[1:])
    pl_flat = _flat("poly_lens", np.int64)

    rags = flats_to_rags(
        _flat("coords", np.float64), nr, _flat("ring_lens", np.int64),
        _flat("ring_size", np.float64), _flat("ring_start", np.float64),
        _flat("ring_end", np.float64), gcodes,
        lambda fi: pl_flat[pl_off[fi]:pl_off[fi + 1]])

    def _np(name):
        return tbl.column(name).to_numpy(zero_copy_only=False)

    return (rags, gcodes,
            _np("minx").astype(np.float64, copy=False),
            _np("miny").astype(np.float64, copy=False),
            _np("maxx").astype(np.float64, copy=False),
            _np("maxy").astype(np.float64, copy=False),
            _np("fid_json") if strings else None,
            _np("tags_json") if strings else None)


def _wave_cell_kernel(tbl, cz: int, cx: int, cy: int, root_only: bool,
                      options: TileOptions, out_dir: str | None,
                      from_zoom: int | None):
    """The per-CELL wave task body, shared verbatim by the group-keyed
    wave (wave_stage_df) and the driver-packed slot wave
    (forest_slot_wave_df): clip the candidate rows from their origin
    zoom down to the cell, one x-then-y level at a time with the exact
    (parent + const)/z2 float sequence, then build the whole
    descendant pyramid in-task and write the cell's subtree part.
    Returns (n_rows_written, subtree_table_or_None)."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from .kernel.vec import batch_clip

    fz = cz - 1 if from_zoom is None else from_zoom
    (rags, gcodes, mnx, mny, mxx, mxy,
     fids, tagss) = _arrow_state(tbl)
    k1c = 0.5 * options.buffer / options.extent
    k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c
    lm = options.line_metrics
    # clip the candidates down from their origin zoom to the cell, one
    # x-then-y level at a time — for level l the windows use the cell's
    # zoom-l ancestor coordinates with EXACTLY the (parent + const)/z2
    # float sequence of the single-level case, so a multi-level wave
    # clip is bit-identical to the in-task recursion's clip-of-clip
    # (routing is a superset by original bbox; trivially-rejected
    # features emit nothing)
    for lvl in range(fz + 1, cz + 1):
        z2l = 1 << (lvl - 1)
        axl, ayl = cx >> (cz - lvl), cy >> (cz - lvl)
        pxl, pyl = axl >> 1, ayl >> 1
        n = rags.n_feats
        xk1 = np.full(n, (pxl + (k2c if axl & 1 else -k1c)) / z2l)
        xk2 = np.full(n, (pxl + (k4c if axl & 1 else k3c)) / z2l)
        side = batch_clip(rags, gcodes, mnx, mny, mxx, mxy,
                          xk1, xk2, 0, lm)
        fid_s = fids[side.src]
        tag_s = tagss[side.src]
        m = side.n_feats
        yk1 = np.full(m, (pyl + (k2c if ayl & 1 else -k1c)) / z2l)
        yk2 = np.full(m, (pyl + (k4c if ayl & 1 else k3c)) / z2l)
        q = batch_clip(side.rags, side.gcodes, side.minx, side.miny,
                       side.maxx, side.maxy, yk1, yk2, 1, lm)
        rags, gcodes = q.rags, q.gcodes
        mnx, mny, mxx, mxy = q.minx, q.miny, q.maxx, q.maxy
        fids, tagss = fid_s[q.src], tag_s[q.src]
    state = (rags, gcodes, mnx, mny, mxx, mxy,
             fids.tolist(), tagss.tolist(), None)
    tile_rows, sources = batch_split_subtree(
        None, cz, cx, cy, options, state=state,
        root_forced_split=False, stop_after_root=root_only)
    out = _subtree_out_pdf(tile_rows, sources)
    if out_dir is None:
        return len(out), pa.Table.from_pandas(
            out, schema=to_arrow_schema(SUBTREE_SCHEMA),
            preserve_index=False)
    _write_subtree_part(out, out_dir, cz, cx, cy)
    return len(out), None


def wave_stage_df(candidates: DataFrame, options: TileOptions,
                  out_dir: str | None = None,
                  from_zoom: int | None = None) -> DataFrame:
    """Wave handoff: candidate rows from wave_children_df, grouped by
    CHILD tile; each group task clips its candidates against the
    child's buffered window (the exact x-then-y clip sequence
    splitTile applies, /root/reference/src/index.js:134-147) and then
    builds the whole descendant pyramid with the batch kernel — the
    root classified by the NORMAL stop rule and emitted, since no
    distributed round ever touched it.

    Window floats are computed as (parent + const) / parent_z2 —
    bit-identical to split_children_df and the reference's
    (x ± k)/z2, so child-grouped and parent-grouped handoffs emit
    byte-identical tiles.

    Scale posture: per-task work is bounded by a quarter of the
    handoff threshold, and a wave of B parent keys yields up to 4B
    concurrent tasks — the shape that keeps a 4N-executor fleet busy
    on the tail batches (grid-measured; see BENCH/SCALING.md round 4)."""
    def run(key, tbl):
        import pyarrow as pa

        t0 = time.monotonic()
        cz, cx, cy = (int(key[0].as_py()), int(key[1].as_py()),
                      int(key[2].as_py()))
        root_only = len(key) > 3 and int(key[3].as_py()) == 1
        # clip-to-cell + descendant pyramid + part write: shared
        # per-cell body (post-clip-empty children still flow through —
        # the kernel emits the empty leaf tile row, index.js:151-154)
        n_out, packed = _wave_cell_kernel(tbl, cz, cx, cy, root_only,
                                          options, out_dir, from_zoom)
        if out_dir is None:
            return packed
        return pa.table(
            {"z": [cz], "x": [cx], "y": [cy], "n": [n_out],
             "n_cand": [tbl.num_rows],
             "secs": [time.monotonic() - t0]},
            schema=pa.schema([("z", pa.int32()), ("x", pa.int32()),
                              ("y", pa.int32()), ("n", pa.int64()),
                              ("n_cand", pa.int64()),
                              ("secs", pa.float64())]))

    grp = (["z", "x", "y", "role"] if "role" in candidates.columns
           else ["z", "x", "y"])
    return candidates.groupBy(*grp).applyInArrow(
        run, SUBTREE_ACK_SCHEMA if out_dir is not None else SUBTREE_SCHEMA)


def one_wave_stage_df(candidates: DataFrame, options: TileOptions,
                      out_dir: str | None = None,
                      from_zoom: int | None = None) -> DataFrame:
    """One-wave handoff (the z0→z1 case of wave_stage_df): runs when
    the driver's observed z0 stats prove the whole remaining pyramid
    fits one wave of budget-sized tasks (SparkTileEngine
    ._build_one_wave) — above that bound the per-zoom distributed
    loop takes over, handing off via the same wave shape per batch."""
    return wave_stage_df(candidates, options, out_dir=out_dir,
                         from_zoom=from_zoom)


def forest_slot_wave_df(candidates: DataFrame, options: TileOptions,
                        out_dir: str, from_zoom: int = 0) -> DataFrame:
    """Driver-packed leaf wave: candidates carry a ``slot`` column (an
    int whose Spark murmur3 bucket the DRIVER chose — see
    SparkTileEngine._slot_values — so hash-partitioning places each
    slot in its own task).  One task = one LPT-packed bin of cut
    cells; inside the task the rows are sliced per cell and each cell
    runs the SAME per-cell kernel as the group-keyed wave
    (_wave_cell_kernel: clip-from-z0 chain, descendant pyramid,
    per-cell part write), emitting one ack row per cell.

    Why not groupBy(z,x,y): group→task placement is then
    hash-partitioned, so (a) two hot cells can collide into one task
    (birthday collisions at ~2 cells/partition are common) and (b) the
    driver cannot bin-pack — wave wall = max task is THE term the
    cluster pays, and with per-cell work estimates from the gate the
    driver can pack bins to the kernel budget (LPT), which no hash can
    do.  The on-disk layout (per-CELL deterministic part names) and
    the ack schema are unchanged, so resume and every reader are
    oblivious to which wave shape ran."""
    def run(key, tbl):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        acks = {"z": [], "x": [], "y": [], "n": [], "n_cand": [],
                "secs": []}
        if tbl.num_rows:
            order = pc.sort_indices(
                tbl, sort_keys=[("z", "ascending"), ("x", "ascending"),
                                ("y", "ascending")])
            tbl = tbl.take(order).combine_chunks()
            zs = tbl.column("z").to_numpy(zero_copy_only=False)
            xs = tbl.column("x").to_numpy(zero_copy_only=False)
            ys = tbl.column("y").to_numpy(zero_copy_only=False)
            packed = ((zs.astype(np.int64) << 50)
                      | (xs.astype(np.int64) << 25) | ys.astype(np.int64))
            bounds = np.flatnonzero(np.diff(packed)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(packed)]))
            for s, e in zip(starts, ends):
                t0 = time.monotonic()
                cz, cx, cy = int(zs[s]), int(xs[s]), int(ys[s])
                sub = tbl.slice(s, e - s)
                n_out, _ = _wave_cell_kernel(sub, cz, cx, cy, False,
                                             options, out_dir,
                                             from_zoom)
                acks["z"].append(cz)
                acks["x"].append(cx)
                acks["y"].append(cy)
                acks["n"].append(n_out)
                acks["n_cand"].append(e - s)
                acks["secs"].append(time.monotonic() - t0)
        return pa.table(
            acks,
            schema=pa.schema([("z", pa.int32()), ("x", pa.int32()),
                              ("y", pa.int32()), ("n", pa.int64()),
                              ("n_cand", pa.int64()),
                              ("secs", pa.float64())]))

    return candidates.groupBy("slot").applyInArrow(
        run, SUBTREE_ACK_SCHEMA)


# ---------------------------------------------------------------- forest wave

def _cell_window_cols(lvl_col, c_col, k1c: float, k2c: float,
                      k3c: float, k4c: float):
    """Exact buffered-window bounds for cell coordinate ``c_col`` at
    zoom ``lvl_col``, as Columns — the SAME float sequence the kernel
    clips against: (parent + const) / z2l with z2l = 2^(lvl-1) (an
    exact power of two, so the division is exact in IEEE double and
    the add is the only rounding step, identical to the scalar
    Python/numpy computation)."""
    z2l = F.pow(F.lit(2.0), (lvl_col - 1).cast("double"))
    par = F.floor(c_col / 2).cast("double")
    odd = (c_col % 2) == 1
    lo = (par + F.when(odd, F.lit(k2c)).otherwise(F.lit(-k1c))) / z2l
    hi = (par + F.when(odd, F.lit(k4c)).otherwise(F.lit(k3c))) / z2l
    return lo, hi


def _cand_range_cols(lo_col, hi_col, u, cmax, b):
    """Tight arithmetic candidate-cell range for the buffered windows:
    cell c's exact window is [(c-b)/2^l, (c+1+b)/2^l] up to the ≤2-ulp
    rounding of the (parent + const)/z2l float sequence, so the cells
    a bbox [lo,hi] is not trivially rejected from lie in
    floor(lo·u - b - eps) .. floor(hi·u + b + eps) — eps absorbs the
    window rounding (|err| ≤ ulp((c+1+b))·u ≈ 1e-14 for l ≤ 7).  The
    former whole-cell slack (±(1+b)·cell per side) tripled the explode
    volume per axis for point-sized inputs; downstream the exact float
    window filter keeps the emitted row set identical.  Degenerate
    clamped ranges (multi-world copies far outside [0,1]) collapse to
    ONE bogus candidate via greatest() — branch-free, and the exact
    filter drops it — instead of a descending sequence() blow-up."""
    eps = 1e-9
    lo = F.greatest(F.lit(0).cast("long"),
                    F.floor(lo_col * u - F.lit(b + eps)).cast("long"))
    hi = F.least(cmax,
                 F.floor(hi_col * u + F.lit(b + eps)).cast("long"))
    return F.sequence(lo, F.greatest(lo, hi))


def forest_gate_df(frontier0: DataFrame, options: TileOptions,
                   max_level: int) -> DataFrame:
    """Per-cell candidate + guaranteed-inside vertex masses for EVERY
    quadtree cell at zooms 1..max_level, in one slim job: arithmetic
    candidate rectangles (tight bbox × 2^lvl ranges, _cand_range_cols)
    are explode()d, then filtered with the cell's EXACT window floats,
    and a partial-agg groupBy collapses to ≤4^lvl rows per level before
    the exchange.  Output: (lvl, x, y, m, i) — m is the mass the cell's
    wave task would receive (bbox-overlap superset, the same row set
    forest_route_df emits), i is the mass of features whose bbox lies
    FULLY INSIDE the window (an exact lower bound on post-clip
    num_points: such features survive the clip intact, so
    i > index_max_points proves the stop rule splits the cell)."""
    k1c = 0.5 * options.buffer / options.extent
    k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c
    b = 2 * k1c
    nv = (F.size("coords") / 3).cast("long")
    lvl = F.col("_lvl")
    u = F.pow(F.lit(2.0), lvl.cast("double"))
    cmax = F.pow(F.lit(2.0), lvl.cast("double")).cast("long") - 1

    df = (frontier0
          .select(F.col("minx"), F.col("miny"), F.col("maxx"),
                  F.col("maxy"), nv.alias("_nv"))
          .withColumn("_lvl", F.explode(F.array(
              *[F.lit(z) for z in range(1, max_level + 1)])))
          .withColumn("_cx", F.explode(_cand_range_cols(
              F.col("minx"), F.col("maxx"), u, cmax, b)))
          .withColumn("_cy", F.explode(_cand_range_cols(
              F.col("miny"), F.col("maxy"), u, cmax, b))))
    xlo, xhi = _cell_window_cols(lvl, F.col("_cx"), k1c, k2c, k3c, k4c)
    ylo, yhi = _cell_window_cols(lvl, F.col("_cy"), k1c, k2c, k3c, k4c)
    rej = ((F.col("maxx") < xlo) | (F.col("minx") >= xhi) |
           (F.col("maxy") < ylo) | (F.col("miny") >= yhi))
    inside = ((F.col("minx") >= xlo) & (F.col("maxx") <= xhi) &
              (F.col("miny") >= ylo) & (F.col("maxy") <= yhi))
    return (df.where(~rej)
            .groupBy(F.col("_lvl").alias("lvl"),
                     F.col("_cx").alias("x"), F.col("_cy").alias("y"))
            .agg(F.sum("_nv").alias("m"),
                 F.sum(F.when(inside, F.col("_nv"))
                       .otherwise(F.lit(0).cast("long"))).alias("i")))


def _cell_window(lvl: int, c: int, k1c: float, k2c: float,
                 k3c: float, k4c: float) -> tuple[float, float]:
    """Scalar twin of _cell_window_cols: the exact (parent + const) /
    2^(lvl-1) float pair the kernel clips cell ``c`` at zoom ``lvl``
    against."""
    z2l = float(1 << (lvl - 1))
    par = float(c >> 1)
    if c & 1:
        return (par + k2c) / z2l, (par + k4c) / z2l
    return (par - k1c) / z2l, (par + k3c) / z2l


def forest_vertex_probe_df(frontier0: DataFrame, options: TileOptions,
                           roots: list, levels: list) -> DataFrame:
    """Vertex-survival masses for the forest cut where the bbox
    gate's fully-inside proof goes blind: for every quadtree cell at
    the given ``levels``, count the frontier VERTICES strictly inside
    the cell's buffered clip window, over only the features whose
    bbox overlaps one of the ``roots``' windows.

    A vertex strictly inside the window survives the axis-aligned
    clip for every geometry type (points are kept inclusively,
    /root/reference/src/clip.js:88-96; line/ring slicing keeps
    interior vertices and only replaces boundary crossings with
    intersection points, clip.js:110-164), and the reference's stop
    rule counts every stored vertex of the clipped tile
    (src/tile.js numPoints, including rings later dropped by the
    tolerance filter) — so the strict-inside count is an exact lower
    bound on the cell tile's post-clip num_points, and
    count > index_max_points PROVES the stop rule splits the cell
    (src/index.js:105-107).  The bbox gate's ``i`` (fully-inside
    bboxes, forest_gate_df) proves nothing for a dense cluster
    STRADDLING a cell edge — every bbox crosses the boundary, i == 0,
    yet millions of vertices sit inside; this probe closes exactly
    that gap (the measured round-4/5 forest skew: twin over-budget
    boundary cells with identical duplicated candidate mass).

    Child windows are contained in their parents' (the forest-wave
    routing invariant), so restricting to bbox-overlap of the ROOT
    windows loses no vertex of any descendant cell: the returned
    (lvl, x, y, v) counts are exact for every cell under a root.

    100-TB posture: one narrow job — Column bbox prefilter at the
    scan, JVM-side vertex explode (no Python), arithmetic candidate
    cells per vertex, exact strict window filter, partial-agg groupBy
    collapsing to ≤4^lvl rows per level before the only exchange."""
    k1c = 0.5 * options.buffer / options.extent
    k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c
    b = 2 * k1c

    overlap = F.lit(False)
    for (rl, rx, ry) in roots:
        xlo, xhi = _cell_window(rl, rx, k1c, k2c, k3c, k4c)
        ylo, yhi = _cell_window(rl, ry, k1c, k2c, k3c, k4c)
        overlap = overlap | ~((F.col("maxx") < xlo)
                              | (F.col("minx") >= xhi)
                              | (F.col("maxy") < ylo)
                              | (F.col("miny") >= yhi))

    verts = F.expr(
        "transform(sequence(0, cast(size(coords)/3 as int) - 1), "
        "k -> struct(coords[3*k] AS vx, coords[3*k+1] AS vy))")
    lvl = F.col("_lvl")
    u = F.pow(F.lit(2.0), lvl.cast("double"))
    cmax = F.pow(F.lit(2.0), lvl.cast("double")).cast("long") - 1

    df = (frontier0
          .where(overlap)
          .select(F.explode(verts).alias("_v"))
          .select(F.col("_v.vx").alias("vx"), F.col("_v.vy").alias("vy"))
          .withColumn("_lvl", F.explode(F.array(
              *[F.lit(int(z)) for z in sorted(levels)])))
          .withColumn("_cx", F.explode(_cand_range_cols(
              F.col("vx"), F.col("vx"), u, cmax, b)))
          .withColumn("_cy", F.explode(_cand_range_cols(
              F.col("vy"), F.col("vy"), u, cmax, b))))
    xlo, xhi = _cell_window_cols(lvl, F.col("_cx"), k1c, k2c, k3c, k4c)
    ylo, yhi = _cell_window_cols(lvl, F.col("_cy"), k1c, k2c, k3c, k4c)
    inside = ((F.col("vx") > xlo) & (F.col("vx") < xhi) &
              (F.col("vy") > ylo) & (F.col("vy") < yhi))
    return (df.where(inside)
            .groupBy(F.col("_lvl").alias("lvl"),
                     F.col("_cx").alias("x"), F.col("_cy").alias("y"))
            .agg(F.count(F.lit(1)).alias("v")))


def forest_route_df(frontier0: DataFrame, options: TileOptions,
                    cells: dict) -> DataFrame:
    """Route z0 frontier rows to every cut cell they overlap, in one
    pass: explode the levels present in the cut, explode the
    arithmetic candidate rectangle per level, filter with the exact
    window floats, then keep only (lvl, x, y) ∈ cut (InSet over packed
    int keys — scales to thousands of cells where the per-cell struct
    router of deep_wave_route_df would blow up codegen).  ``cells``
    maps (z, x, y) → role (1 = internal/root-render, 0 = leaf
    subtree).  Feature columns ride unchanged; emitted row sets match
    the level-by-level reroute exactly (child windows are contained in
    their parents')."""
    k1c = 0.5 * options.buffer / options.extent
    k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c
    b = 2 * k1c
    levels = sorted({z for z, _, _ in cells})
    keys = {(z << 50) | (x << 25) | y: r
            for (z, x, y), r in cells.items()}
    internal = [k for k, r in keys.items() if r == 1]
    lvl = F.col("_lvl")
    u = F.pow(F.lit(2.0), lvl.cast("double"))
    cmax = F.pow(F.lit(2.0), lvl.cast("double")).cast("long") - 1

    df = (frontier0
          .withColumn("_lvl", F.explode(F.array(
              *[F.lit(z) for z in levels])))
          .withColumn("_cx", F.explode(_cand_range_cols(
              F.col("minx"), F.col("maxx"), u, cmax, b)))
          .withColumn("_cy", F.explode(_cand_range_cols(
              F.col("miny"), F.col("maxy"), u, cmax, b))))
    xlo, xhi = _cell_window_cols(lvl, F.col("_cx"), k1c, k2c, k3c, k4c)
    ylo, yhi = _cell_window_cols(lvl, F.col("_cy"), k1c, k2c, k3c, k4c)
    rej = ((F.col("maxx") < xlo) | (F.col("minx") >= xhi) |
           (F.col("maxy") < ylo) | (F.col("miny") >= yhi))
    key = ((lvl.cast("long") * F.lit(1 << 50).cast("long"))
           + (F.col("_cx") * F.lit(1 << 25).cast("long"))
           + F.col("_cy"))
    return (df.where(~rej)
            .where(key.isin(*[int(k) for k in keys]))
            .withColumn("role", F.when(
                key.isin(*[int(k) for k in internal]) if internal
                else F.lit(False), F.lit(1)).otherwise(F.lit(0)))
            .withColumn("z", F.col("_lvl"))
            .withColumn("x", F.col("_cx").cast("int"))
            .withColumn("y", F.col("_cy").cast("int"))
            .select(*TILED_COLUMNS, "role"))


def _empty_tiled_table():
    import pyarrow as pa
    sch = _tiled_arrow_schema()
    return pa.Table.from_arrays(
        [pa.array([], f.type) for f in sch if f.name != "n_verts"],
        names=[f.name for f in sch if f.name != "n_verts"]
    ).select(TILED_COLUMNS)


def clip_table_to_cell(tbl, cz: int, cx: int, cy: int,
                       options: TileOptions, from_zoom: int = 0):
    """Clip TILED rows (z/x/y = the from_zoom ancestor of the target
    cell) down to (cz, cx, cy) one level at a time, reproducing the
    loop split's accept/clip dispatch EXACTLY — trivially-accepted
    rows pass through _pass_table (ord appends [0, 0]), crossing rows
    go through _split_crossing_tables (ord appends the clip sub_ords)
    — so the surviving rows are byte-identical to the rows
    frontier/z=cz would hold for this tile after cz split rounds."""
    import pyarrow as pa
    for lvl in range(from_zoom, cz):
        if not tbl.num_rows:
            return _empty_tiled_table()
        ax, ay = cx >> (cz - lvl - 1), cy >> (cz - lvl - 1)
        q = (ay & 1) * 2 + (ax & 1)
        acc, mask = _quadrant_route(tbl, lvl, options)
        acc_t = np.zeros_like(acc)
        acc_t[q] = acc[q]
        mask_t = mask & (1 << q)
        parts = []
        pt = _pass_table(tbl, lvl, acc_t)
        if pt is not None:
            parts.append(pt)
        cross = np.nonzero(mask_t > 0)[0]
        if len(cross):
            ct = tbl.take(pa.array(cross)).combine_chunks()
            parts.extend(_split_crossing_tables(ct, lvl, options,
                                                mask_t[cross]))
        if not parts:
            return _empty_tiled_table()
        tbl = pa.concat_tables(parts).combine_chunks()
    return tbl


FOREST_ACK_SCHEMA = ("z int, x int, y int, n_feats long, n_points long, "
                     "n_sim long, minx double, miny double, "
                     "maxx double, maxy double")

PROBE_ACK_SCHEMA = "z int, x int, y int, n_points long"


def straggler_probe_stats(fr0: DataFrame, probes: list,
                          options: TileOptions) -> DataFrame:
    """Exact stop-boundary probe for over-budget forest cut cells whose
    split the bbox gate cannot prove ('stragglers' — typically giant
    boundary-crossing polygons: huge candidate mass, zero
    guaranteed-inside mass).  One narrow mapInArrow job: each task
    clips ITS partition of the z0 frontier down to each straggler root
    (clip_table_to_cell, the loop split's exact dispatch) and then
    descends OPTIMISTICALLY — every non-empty child, one clip level
    per node, until index_max_zoom — returning slim
    (z, x, y, num_points) partials.  The driver sums the partials and
    applies the reference stop rule (src/index.js:105-107:
    numPoints <= indexMaxPoints or z == indexMaxZoom stops) on the
    EXACT totals to place the boundary; everything below a stop node
    is pruned before any render/store work happens.

    100-TB posture: the giant feature set stays spread across the
    scan partitions (the whole point — a leaf wave task would funnel
    it into ONE task), per-task work is (partition share of the
    straggler mass) x levels, and only 4-byte-per-node stats cross
    back to the driver.  The heavy spine above the boundary is
    clipped twice (probe + render); the fringe below a stop node
    carries <= index_max_points vertices per node per level."""
    import pyarrow as pa

    opts = options
    imz = opts.index_max_zoom
    roots = [tuple(int(v) for v in c) for c in probes]

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        parts = [pa.Table.from_batches([rb]) for rb in batches]
        acc: dict = {}
        if parts:
            tbl0 = pa.concat_tables(parts).combine_chunks()
            for (pz, px, py) in roots:
                rt = clip_table_to_cell(tbl0, pz, px, py, opts,
                                        from_zoom=0)
                stack = [(pz, px, py, rt)]
                while stack:
                    z, x, y, tbl = stack.pop()
                    if not tbl.num_rows:
                        continue
                    n = int(pc.sum(pc.divide(pc.list_value_length(
                        tbl.column("coords")), 3)).as_py() or 0)
                    acc[(z, x, y)] = acc.get((z, x, y), 0) + n
                    if z >= imz:
                        continue
                    for dy in (0, 1):
                        for dx in (0, 1):
                            stack.append((
                                z + 1, 2 * x + dx, 2 * y + dy,
                                clip_table_to_cell(
                                    tbl, z + 1, 2 * x + dx, 2 * y + dy,
                                    opts, from_zoom=z)))
        rows = sorted(acc.items())
        yield pa.RecordBatch.from_arrays(
            [pa.array([k[0] for k, _ in rows], pa.int32()),
             pa.array([k[1] for k, _ in rows], pa.int32()),
             pa.array([k[2] for k, _ in rows], pa.int32()),
             pa.array([n for _, n in rows], pa.int64())],
            names=["z", "x", "y", "n_points"])

    return fr0.mapInArrow(run, PROBE_ACK_SCHEMA)


def internal_tree_direct(fr0: DataFrame, internals: list,
                         options: TileOptions,
                         tilefeat_root: str, stops: list = (),
                         sources_root: str | None = None) -> list:
    """Single-job render of the forest cut's INTERNAL cells: each
    mapInArrow task materializes its partition of the z0 frontier and
    walks it down the internal-cell tree IN-TASK — clip ONE level from
    the parent state per node (clip_table_to_cell, the loop split's
    exact accept/clip dispatch and ord extension), render the node
    through the shared kernel, recurse into its internal children on
    the shrinking clipped state.  No shuffle, no inter-level job
    barrier: the level-chained form re-introduced a 5-round spine
    (~8-10 s of fixed job latency per level on the 4x8 grid, 53 s of
    a 67 s wall at 2M pages), and the clip-from-z0 form before it
    re-clipped every cell from the root (68 s).  An internal tile's
    features stay spread across scan partitions exactly like the z0
    render; tilefeat parts are written task-side (tmp + rename,
    deterministic per-task names) and per-(task, cell) stat partials
    come back as the job's only output.

    ``stops``: STOP-boundary cells under probed stragglers (see
    straggler_probe_stats) — rendered exactly like internal cells but
    never recursed into, and their retained SOURCE (the clipped
    feature rows at the node, the loop's row-per-feature sources/z=N
    layout) is written task-side next to the tilefeat part; readers
    union the per-task partials and re-order by ord, the same
    contract the multi-part tilefeat store already has."""
    import pyarrow as pa

    kids: dict = {}
    for z, x, y in list(internals) + list(stops):
        kids.setdefault((z - 1, x >> 1, y >> 1), []).append((z, x, y))
    stop_set = {tuple(int(v) for v in c) for c in stops}
    opts = options

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        parts = [pa.Table.from_batches([rb]) for rb in batches]
        acc: dict = {}
        rendered: dict = {}
        sources: dict = {}
        if parts:
            tbl0 = pa.concat_tables(parts).combine_chunks()
            stack = [(0, 0, 0, tbl0)]
            while stack:
                z, x, y, tbl = stack.pop()
                for (cz, cx, cy) in kids.get((z, x, y), []):
                    if not tbl.num_rows:
                        continue
                    clipped = clip_table_to_cell(tbl, cz, cx, cy,
                                                 opts, from_zoom=z)
                    if not clipped.num_rows:
                        continue
                    nvs = pc.cast(pc.divide(pc.list_value_length(
                        clipped.column("coords")), 3), pa.int64())
                    # ±inf init, NOT the empty-tile sentinel
                    # [2,1,-1,0]: an entry only exists once a non-empty
                    # clip merges real values, and the sentinel would
                    # clamp bboxes that legitimately leave [0,1]
                    # (multi-world x shifts project past the unit
                    # square); zero-row cells never reach acc and keep
                    # sentinel bboxes via the driver-side empty rows
                    st = acc.setdefault(
                        (cz, cx, cy),
                        [0, 0, 0, float("inf"), float("inf"),
                         float("-inf"), float("-inf")])
                    st[0] += clipped.num_rows
                    st[1] += int(pc.sum(nvs).as_py() or 0)
                    st[3] = min(st[3], pc.min(
                        clipped.column("minx")).as_py())
                    st[4] = min(st[4], pc.min(
                        clipped.column("miny")).as_py())
                    st[5] = max(st[5], pc.max(
                        clipped.column("maxx")).as_py())
                    st[6] = max(st[6], pc.max(
                        clipped.column("maxy")).as_py())
                    rend = pa.Table.from_batches(
                        [_render_batch(clipped, opts)])
                    st[2] += int(pc.sum(
                        rend.column("n_simplified")).as_py() or 0)
                    rendered.setdefault(cz, []).append(
                        rend.drop_columns(["z"]))
                    if (cz, cx, cy) in stop_set:
                        sources.setdefault(cz, []).append(
                            clipped.drop_columns(["z"]))
                    else:
                        stack.append((cz, cx, cy, clipped))
        pid = TaskContext.get().partitionId()
        codec = os.environ.get("GVT_CODEC", "zstd")
        for root, by_z in ((tilefeat_root, rendered),
                           (sources_root, sources)):
            for cz, tables in by_z.items():
                out_dir = os.path.join(root, f"z={cz}")
                os.makedirs(out_dir, exist_ok=True)
                final = os.path.join(out_dir, f"part-i{pid:05d}.parquet")
                pq.write_table(
                    pa.concat_tables(tables).combine_chunks(),
                    final + ".inprogress", compression=codec)
                os.replace(final + ".inprogress", final)
        rows = [(z, x, y, *st) for (z, x, y), st in acc.items()]
        yield pa.RecordBatch.from_arrays(
            [pa.array([r[i] for r in rows],
                      [pa.int32(), pa.int32(), pa.int32(),
                       pa.int64(), pa.int64(), pa.int64(),
                       pa.float64(), pa.float64(), pa.float64(),
                       pa.float64()][i])
             for i in range(10)],
            names=["z", "x", "y", "n_feats", "n_points", "n_sim",
                   "minx", "miny", "maxx", "maxy"])

    return fr0.mapInArrow(run, FOREST_ACK_SCHEMA).collect()
