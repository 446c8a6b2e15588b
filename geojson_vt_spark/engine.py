"""SparkTileEngine — the distributed tile pyramid.

Re-expresses the reference driver (/root/reference/src/index.js) as a
bounded per-zoom DataFrame loop:

    frontier(z)  --narrow split map-->  frontier(z+1)
        |--SQL agg--> stop rules (indexMaxZoom / indexMaxPoints)
        |--groupBy applyInPandas--> assembled tiles (parquet, partition z)
        |--leaf filter--> retained sources (parquet, partition z)
        '--lineage row (zoom, counts, wall) --> resumable checkpoints

Scale design notes (SURVEY.md §4/§7):
- the split is shuffle-free; the only shuffles are the tiny per-zoom
  stats agg and tile assembly (keyed by tile, the natural output key);
- every zoom's frontier is checkpointed to parquet, cutting lineage
  (the iterative-DataFrame plan-blowup trap) and enabling mid-pyramid
  resume: a killed build restarts from the last complete zoom;
- frontier partition count is re-derived per zoom from the measured
  vertex count, so partitions stay ~even as tiles multiply 4× per level;
- lazy drill-down (getTile miss) replays the same split stages over the
  retained source of the nearest ancestor, pruned to the target path.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .kernel.index import to_id
from .model import TILED_COLUMNS
from .options import TileOptions
from .pipeline import (assemble_tiles_df, features_from_json_df,
                       geojson_to_input_rows, split_children_df, wrap_df)

class SparkTileEngine:
    def __init__(self, spark: SparkSession, options: TileOptions | None = None,
                 workdir: str | None = None,
                 target_points_per_partition: int = 2_000_000):
        self.spark = spark
        self.options = options or TileOptions()
        if workdir is None:
            import tempfile
            workdir = tempfile.mkdtemp(prefix="gvt_spark_")
        self.workdir = workdir
        self.target_points_per_partition = target_points_per_partition
        os.makedirs(workdir, exist_ok=True)
        # drill-down overlay: tiles/sources created by get_tile after build
        self._drill_tiles: dict[int, dict] = {}
        self._drill_sources: dict[int, list] = {}
        self._consumed_sources: set[int] = set()

    # ------------------------------------------------------------ paths

    def _p(self, *parts) -> str:
        return os.path.join(self.workdir, *parts)

    def _read_frontier(self, z: int) -> DataFrame:
        return self.spark.read.parquet(self._p("frontier", f"z={z}"))

    def _lineage_path(self) -> str:
        return self._p("lineage.json")

    def _read_lineage(self) -> list[dict]:
        try:
            with open(self._lineage_path()) as fh:
                return [json.loads(line) for line in fh if line.strip()]
        except FileNotFoundError:
            return []

    def _append_lineage(self, row: dict) -> None:
        with open(self._lineage_path(), "a") as fh:
            fh.write(json.dumps(row) + "\n")

    # ------------------------------------------------------------ build

    def build_from_geojson(self, data: dict, n_input_partitions: int = 0) -> None:
        rows = geojson_to_input_rows(data)
        n = n_input_partitions or self.spark.sparkContext.defaultParallelism
        df = self.spark.createDataFrame(
            rows, "input_ord long, gen_index long, feature_json string")
        if len(rows) > 64:
            df = df.repartition(min(n, max(1, len(rows) // 16)))
        features = features_from_json_df(df, self.options)
        features = wrap_df(features, self.options)
        self.build(features)

    def build(self, features_df: DataFrame, resume: bool = False) -> None:
        """First-pass pyramid (cz == null path of splitTile).

        features_df: FEATURE_SCHEMA rows, already converted + wrapped.
        With resume=True, restarts after the last zoom whose lineage row
        is complete, reusing the checkpointed frontier.
        """
        opts = self.options
        start_z = 0
        if resume:
            done = [r for r in self._read_lineage() if r.get("complete")]
            if done:
                last = max(r["zoom"] for r in done)
                if any(r["zoom"] == last and r.get("final") for r in done):
                    return  # build already finished
                start_z = last + 1
        if not resume and os.path.exists(self._lineage_path()):
            os.remove(self._lineage_path())

        if start_z == 0:
            frontier = (features_df
                        .withColumn("z", F.lit(0))
                        .withColumn("x", F.lit(0))
                        .withColumn("y", F.lit(0))
                        .select(*TILED_COLUMNS))
            frontier.write.mode("overwrite").parquet(self._p("frontier", "z=0"))

        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=3)

        z = start_z
        while True:
            t0 = time.monotonic()
            frontier = self._read_frontier(z)

            # assembly already yields per-tile stats + bbox (the kernel
            # computes numPoints/numFeatures, tile.js:4-8), so no
            # separate stats aggregation is needed
            assembled = assemble_tiles_df(frontier, opts)
            if z > 0:
                # all 4 children of every tile split at z-1 exist as
                # tiles, including empty ones (index.js:151-154 pushes
                # `tl || []`); empty = no frontier rows for that key
                parents = (self.spark.read.parquet(self._p("tiles", f"z={z-1}"))
                           .where("is_split").select("x", "y"))
                children = (parents
                            .select((F.col("x") * 2).alias("x2"),
                                    (F.col("y") * 2).alias("y2"))
                            .crossJoin(self.spark.range(4).select(
                                (F.col("id") % 2).cast("int").alias("dx"),
                                (F.col("id") / 2).cast("int").alias("dy")))
                            .select((F.col("x2") + F.col("dx")).cast("int").alias("x"),
                                    (F.col("y2") + F.col("dy")).cast("int").alias("y")))
                present = frontier.select("x", "y").distinct()
                empties = (children.join(present, ["x", "y"], "left_anti")
                           .select(F.lit(z).alias("z"), "x", "y",
                                   F.lit(0).cast("long").alias("num_features"),
                                   F.lit(0).cast("long").alias("num_points"),
                                   F.lit(0).cast("long").alias("num_simplified"),
                                   F.lit("[]").alias("features_json"),
                                   F.lit(2.0).alias("minx"), F.lit(1.0).alias("miny"),
                                   F.lit(-1.0).alias("maxx"), F.lit(0.0).alias("maxy")))
                assembled = assembled.unionByName(empties)

            is_split = ~((F.lit(z) == opts.index_max_zoom) |
                         (F.col("num_points") <= opts.index_max_points))
            assembled = (assembled
                         .withColumn("is_split", is_split)
                         .withColumn("has_source", ~is_split)
                         .withColumn("tile_id", F.expr(
                             "(shiftleft(1L, z) * y + x) * CAST(32 AS BIGINT) + z"))
                         .persist())

            # drop z before writing into the z=N dir so partition
            # discovery over the parent dir doesn't see a duplicate column
            # (cached-partition locking lets the concurrent agg reuse the
            # write job's assembly work instead of recomputing it)
            t_assembled = time.monotonic()
            fut_tiles = pool.submit(
                lambda: assembled.drop("z").write.mode("overwrite")
                .parquet(self._p("tiles", f"z={z}")))
            agg = assembled.agg(
                F.count(F.lit(1)).alias("n_tiles"),
                F.sum(F.col("is_split").cast("long")).alias("n_split"),
                F.sum("num_points").alias("n_points")).collect()[0]
            n_tiles = int(agg["n_tiles"])
            n_split = int(agg["n_split"] or 0)
            n_points = int(agg["n_points"] or 0)
            fut_tiles.result()
            t_tiles_done = time.monotonic()

            split_keys = (assembled.where("is_split")
                          .select(F.lit(z).alias("z"), "x", "y"))

            # leaf tiles retain their source features for drill-down;
            # runs concurrently with the next-frontier split write
            fut_sources = pool.submit(
                lambda: frontier.join(split_keys, ["z", "x", "y"], "left_anti")
                .drop("z").write.mode("overwrite")
                .parquet(self._p("sources", f"z={z}")))

            final = n_split == 0
            if not final:
                nxt = split_children_df(
                    frontier.join(split_keys.hint("broadcast"),
                                  ["z", "x", "y"]), z, opts)
                # partition budget scales with measured vertex count;
                # the passed∪clipped union doubles the partition list,
                # so shrink narrowly (coalesce) unless real growth is
                # needed — a shuffle only when tiles actually multiplied
                cur_parts = frontier.rdd.getNumPartitions()
                n_parts = max(self.spark.sparkContext.defaultParallelism,
                              min(4096, n_points // self.target_points_per_partition + 1))
                if n_parts > cur_parts:
                    nxt = nxt.repartition(n_parts, "x", "y")
                else:
                    nxt = nxt.coalesce(max(n_parts, cur_parts // 2 + 1))
                nxt.write.mode("overwrite").parquet(self._p("frontier", f"z={z+1}"))
            fut_sources.result()
            assembled.unpersist()

            self._append_lineage({
                "zoom": z, "n_tiles": n_tiles, "n_split": n_split,
                "n_points": n_points, "wall_sec": time.monotonic() - t0,
                "assemble_sec": t_tiles_done - t_assembled,
                "split_sec": time.monotonic() - t_tiles_done,
                "complete": True, "final": final,
            })
            if final:
                break
            z += 1
        pool.shutdown()

    # ------------------------------------------------------------ read side

    def tiles(self) -> DataFrame:
        return self.spark.read.parquet(self._p("tiles"))

    def enumerate_tiles(self) -> dict[str, list]:
        """genTiles equivalent (/root/reference/test/test-full.js:49-64):
        every generated tile's transformed features keyed z{z}-{x}-{y}."""
        out = {}
        if not self._read_lineage():
            return out
        for row in self.tiles().collect():
            out[f"z{row['z']}-{row['x']}-{row['y']}"] = json.loads(row["features_json"])
        for tid, tile in self._drill_tiles.items():
            out[f"z{tile['z']}-{tile['x']}-{tile['y']}"] = tile["features"]
        return out

    def total_tiles(self) -> int:
        base = self.tiles().count() if self._read_lineage() else 0
        return base + len(self._drill_tiles)

    # ------------------------------------------------------------ getTile

    def get_tile(self, z, x, y):
        """Tile lookup with lazy drill-down
        (/root/reference/src/index.js:158-199)."""
        z, x, y = int(float(z)), int(float(x)), int(float(y))
        if z < 0 or z > 24:
            return None
        z2 = 1 << z
        x = (x + z2) & (z2 - 1)
        tid = to_id(z, x, y)

        hit = self._lookup(tid, z, x, y)
        if hit is not None:
            return hit

        # walk ancestors to the nearest tile retaining source
        z0, x0, y0 = z, x, y
        parent = None
        while parent is None and z0 > 0:
            z0 -= 1
            x0 >>= 1
            y0 >>= 1
            parent = self._lookup_source(z0, x0, y0)
        if parent is None:
            return None
        self._drill(parent, z0, x0, y0, z, x, y)
        return self._lookup(tid, z, x, y)

    def _lookup(self, tid, z, x, y):
        if tid in self._drill_tiles:
            t = self._drill_tiles[tid]
            return {"features": t["features"], "z": z, "x": x, "y": y}
        if not self._read_lineage():
            return None
        rows = (self.tiles()
                .where((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))
                .select("features_json").collect())
        if not rows:
            return None
        return {"features": json.loads(rows[0]["features_json"]),
                "z": z, "x": x, "y": y}

    def _lookup_source(self, z, x, y):
        """Return kernel features of the retained source for (z,x,y), or None."""
        tid = to_id(z, x, y)
        if tid in self._consumed_sources:
            return None
        if tid in self._drill_sources:
            feats = self._drill_sources[tid]
            return feats if feats else None
        if not self._read_lineage():
            return None
        exists = (self.tiles()
                  .where((F.col("z") == z) & (F.col("x") == x) &
                         (F.col("y") == y) & F.col("has_source"))
                  .count())
        if not exists:
            return None
        from .model import record_to_feature
        rows = (self.spark.read.parquet(self._p("sources", f"z={z}"))
                .where((F.col("x") == x) & (F.col("y") == y))
                .collect())
        feats = sorted((record_to_feature(r.asDict()) for r in rows),
                       key=lambda t: t[0])
        return feats if feats else None

    def _drill(self, parent_feats, z0, x0, y0, cz, cx, cy):
        """Targeted split from the ancestor to the requested tile using
        the same kernel; new tiles/sources land in the in-memory overlay.

        parent_feats: sorted list of (ord_path, VTFeature).  At cluster
        scale this path runs the distributed split stages with the
        ancestor-chain predicate; source size here is driver-bounded."""
        from .kernel.clip import clip_features
        from .kernel.tile import create_tile
        from .kernel.transform import transform_tile
        opts = self.options

        feats = [f for _, f in parent_feats]
        self._consumed_sources.add(to_id(z0, x0, y0))
        stack = [(feats, z0, x0, y0, list(range(len(parent_feats))))]
        # keep parallel ord tracking so assembly order matches; kernel
        # clip preserves list order so ordinals stay aligned implicitly
        while stack:
            features, z, x, y, _ords = stack.pop()
            tid = to_id(z, x, y)
            known = self._tile_exists(tid, z, x, y)
            if not known:
                tile = create_tile(features, z, x, y, opts)
                transformed = transform_tile(tile, opts.extent)
                self._drill_tiles[tid] = {
                    "z": z, "x": x, "y": y,
                    "features": transformed["features"],
                    "num_points": tile.num_points,
                    "minx": tile.minx, "miny": tile.miny,
                    "maxx": tile.maxx, "maxy": tile.maxy,
                }

            if z == opts.max_zoom or z == cz:
                self._drill_sources[tid] = list(zip(range(len(features)), features))
                continue
            zoom_steps = cz - z
            if x != cx >> zoom_steps or y != cy >> zoom_steps:
                self._drill_sources[tid] = list(zip(range(len(features)), features))
                continue

            self._consumed_sources.add(tid)
            self._drill_sources.pop(tid, None)
            if not features:
                continue

            bbox = self._tile_bbox(tid, z, x, y)
            z2 = 1 << z
            k1 = 0.5 * opts.buffer / opts.extent
            k2, k3, k4 = 0.5 - k1, 0.5 + k1, 1 + k1
            lm = opts.line_metrics
            left = clip_features(features, z2, x - k1, x + k3, 0,
                                 bbox[0], bbox[2], lm)
            right = clip_features(features, z2, x + k2, x + k4, 0,
                                  bbox[0], bbox[2], lm)
            tl = bl = tr = br = None
            if left:
                tl = clip_features(left, z2, y - k1, y + k3, 1, bbox[1], bbox[3], lm)
                bl = clip_features(left, z2, y + k2, y + k4, 1, bbox[1], bbox[3], lm)
            if right:
                tr = clip_features(right, z2, y - k1, y + k3, 1, bbox[1], bbox[3], lm)
                br = clip_features(right, z2, y + k2, y + k4, 1, bbox[1], bbox[3], lm)
            stack.append((tl or [], z + 1, x * 2, y * 2, None))
            stack.append((bl or [], z + 1, x * 2, y * 2 + 1, None))
            stack.append((tr or [], z + 1, x * 2 + 1, y * 2, None))
            stack.append((br or [], z + 1, x * 2 + 1, y * 2 + 1, None))

    def _tile_exists(self, tid, z, x, y) -> bool:
        if tid in self._drill_tiles:
            return True
        if not self._read_lineage():
            return False
        return bool(self.tiles()
                    .where((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))
                    .count())

    def _tile_bbox(self, tid, z, x, y):
        if tid in self._drill_tiles:
            t = self._drill_tiles[tid]
            return (t["minx"], t["miny"], t["maxx"], t["maxy"])
        row = (self.tiles()
               .where((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))
               .select("minx", "miny", "maxx", "maxy").collect())
        if row:
            r = row[0]
            return (r["minx"], r["miny"], r["maxx"], r["maxy"])
        return (2.0, 1.0, -1.0, 0.0)
