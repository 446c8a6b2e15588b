"""SparkTileEngine — the distributed tile pyramid.

Re-expresses the reference driver (/root/reference/src/index.js) as a
bounded per-zoom DataFrame loop with a subtree handoff:

    frontier(z)  --narrow split map-->  frontier(z+1)      [heavy tiles]
        |--per-feature map + SQL agg--> assembled tiles (parquet, z dir)
        |--driver stop rules----------> heavy / light / leaf per tile
        |--leaf filter----------------> retained sources (parquet)
        |--light groupBy applyInPandas> whole descendant subtrees
        '--lineage row (zoom, keys, counts, wall) --> resumable

Scale design notes (SURVEY.md §4/§7):
- the split and assembly maps are shuffle-free; the only shuffles are
  the per-zoom tile aggregation (keyed by tile, the natural output key)
  and the round-robin rebalance of the next frontier;
- the driver loop runs only while tiles are HEAVY (num_points above an
  adaptive threshold ~ total/4·parallelism).  Everything below is handed
  off per-tile to a grouped Arrow task that builds the tile's entire
  descendant pyramid with the parity-exact local kernel — tile counts
  grow 4× per zoom, so parallelism comes free while per-task work stays
  bounded by the threshold (no group outgrows executor memory);
- per-zoom state (tile keys + stats) collected to the driver is
  O(heavy tiles) = O(total_points / threshold) = O(parallelism) — it
  does NOT grow with the 4^z tile count;
- every zoom's frontier/tiles/sources land in parquet, cutting lineage
  (the iterative-DataFrame plan-blowup trap) and enabling mid-pyramid
  resume: a killed build restarts from the last complete zoom, and
  pending subtree batches are re-run from their recorded keys;
- lazy drill-down (getTile miss) replays the same split stages over the
  retained source of the nearest ancestor, pruned to the target path.

Run the session with ``spark.scheduler.mode=FAIR``: the build overlaps
small classification jobs with long subtree-batch stages, and FIFO
queues the small jobs behind them (measured ~2x the wall on a 480k-page
build).
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .kernel.index import to_id
from .model import FEATURE_COLUMNS, TILED_COLUMNS
from .options import TileOptions
from .pipeline import (_subtree_out_pdf, _write_subtree_part,
                       render_files_direct, split_files_direct,
                       batch_split_subtree, deep_wave_route_df,
                       features_from_json_df, forest_gate_df,
                       forest_route_df,
                       geojson_to_input_rows, internal_tree_direct,
                       one_wave_children_df,
                       one_wave_stage_df,
                       rendered_features_df,
                       split_children_df, straggler_probe_stats,
                       wave_children_df,
                       wave_stage_df, wrap_df)

TILE_COLUMNS = ["z", "x", "y", "tile_id", "num_features", "num_points",
                "num_simplified", "minx", "miny",
                "maxx", "maxy", "is_split", "has_source"]

_TILE_STATS_SCHEMA = T.StructType([
    T.StructField("x", T.IntegerType(), False),
    T.StructField("y", T.IntegerType(), False),
    T.StructField("num_features", T.LongType(), False),
    T.StructField("num_points", T.LongType(), False),
    T.StructField("num_simplified", T.LongType(), False),
    T.StructField("minx", T.DoubleType(), False),
    T.StructField("miny", T.DoubleType(), False),
    T.StructField("maxx", T.DoubleType(), False),
    T.StructField("maxy", T.DoubleType(), False),
    T.StructField("is_split", T.BooleanType(), False),
    T.StructField("has_source", T.BooleanType(), False),
    T.StructField("tile_id", T.LongType(), False),
])


def _has_parquet(path: str) -> bool:
    """True when ``path`` is a local dir holding ≥1 parquet part —
    the eligibility gate for the direct (task-side pyarrow) stages."""
    try:
        return any(f.endswith(".parquet") for f in os.listdir(path))
    except OSError:
        return False


def _pack_xy(x: int, y: int) -> int:
    return (x << 25) | y


def _pack_col():
    return (F.shiftleft(F.col("x").cast("long"), 25)
            + F.col("y").cast("long"))


class SparkTileEngine:
    def __init__(self, spark: SparkSession, options: TileOptions | None = None,
                 workdir: str | None = None,
                 target_points_per_partition: int = 2_000_000,
                 subtree_max_points: int | None = None,
                 one_wave: bool | None = None):
        self.spark = spark
        self.options = options or TileOptions()
        if workdir is None:
            import tempfile
            workdir = tempfile.mkdtemp(prefix="gvt_spark_")
        self.workdir = workdir
        self.target_points_per_partition = target_points_per_partition
        self.subtree_max_points = subtree_max_points
        # one-wave fast path (small corpora): None → env default (set
        # GVT_ONE_WAVE=0 to force the per-zoom distributed loop; the
        # differential tests build both layouts and compare)
        if one_wave is None:
            one_wave = os.environ.get("GVT_ONE_WAVE", "1") != "0"
        self.one_wave = one_wave
        os.makedirs(workdir, exist_ok=True)
        # drill-down overlay: tiles/sources created by get_tile after build
        self._drill_tiles: dict[int, dict] = {}
        self._drill_sources: dict[int, list] = {}
        self._consumed_sources: set[int] = set()
        # driver-side cache of the DISTRIBUTED-zoom tile stats (bounded
        # by the driver-loop frontier, O(parallelism), NOT by the 4^z
        # subtree output): existence, has_source and bbox checks become
        # dict lookups instead of one Spark job per getTile.  Subtree
        # tiles resolve through keyed parquet lookups, memoized below.
        self._stats_cache: dict | None = None
        self._sub_meta_cache: dict = {}
        # batched-drill source cache: (z,x,y) → list of FEATURE record
        # dicts, filled by _prefetch_drill so a miss-driven get_tiles
        # batch drills entirely on warm caches (O(ancestors asked
        # about), not data-proportional)
        self._source_rows_cache: dict = {}
        # memoized store readers: parquet listing/schema discovery runs
        # once per engine lifetime, not once per lookup call
        self._df_cache: dict = {}
        self._kernel_session = None
        import threading
        self._lineage_lock = threading.Lock()

    def _kernel_spark(self) -> SparkSession:
        """Session clone for the grouped-map handoff jobs (shared JVM,
        independent SQL conf).  AQE partition coalescing folds the small
        handoff shuffle into ~1MB-floor partitions, gluing kernel groups
        into the same task and serializing them — with a handful of
        CPU-heavy groups, partitions must track GROUPS, not bytes.  The
        clone turns coalescing off and widens the shuffle so each light
        tile's subtree build is its own task."""
        if self._kernel_session is None:
            s = self.spark.newSession()
            s.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       "false")
            par = self.spark.sparkContext.defaultParallelism
            s.conf.set("spark.sql.shuffle.partitions", str(max(4 * par, 256)))
            self._kernel_session = s
        return self._kernel_session

    # ------------------------------------------------------------ paths

    def _p(self, *parts) -> str:
        return os.path.join(self.workdir, *parts)

    @staticmethod
    def _write_local_parquet(pdf, path: str) -> None:
        """Overwrite ``path`` with a single parquet file holding the
        (driver-local, small) pandas frame — spark-readable, no job."""
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(path, "part-00000.parquet"))
        open(os.path.join(path, "_SUCCESS"), "w").close()

    def _read_frontier(self, z: int, session: SparkSession | None = None) -> DataFrame:
        """Frontier DataFrame for zoom z.  z=0 has a zero-copy mode: when
        no dateline wrap is needed, the z0 frontier IS the converted
        features checkpoint plus constant columns, served as a view —
        the whole corpus is not rewritten a second time just to gain
        (z=0, x=0, y=0) literals."""
        spark = session or self.spark
        path = self._p("frontier", f"z={z}")
        if z == 0 and not os.path.isdir(path):
            return self._frontier0_view(
                spark.read.parquet(self._p("features")))
        return spark.read.parquet(path)

    def _set_pool(self, name: str) -> None:
        """Assign the CURRENT THREAD's jobs to a FAIR scheduler pool.
        With ``spark.scheduler.mode=FAIR``, pools are created on demand
        (weight 1) and the task scheduler round-robins slots BETWEEN
        pools — without this, every concurrent build job lands in the
        one default pool, whose internal order is FIFO, so a wide
        subtree wave monopolizes the fleet while the critical-path
        split (and the next round with it) waits for leftovers: the
        round-4 grid profile measured renders queueing 12-19 s behind
        handoff batches.  Properties are thread-local; every pooled job
        sets its class at entry because executor threads are reused."""
        self.spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", name)

    def _lineage_path(self) -> str:
        return self._p("lineage.json")

    def _read_lineage(self) -> list[dict]:
        try:
            with open(self._lineage_path()) as fh:
                return [json.loads(line) for line in fh if line.strip()]
        except FileNotFoundError:
            return []

    def _append_lineage(self, row: dict) -> None:
        with self._lineage_lock:
            with open(self._lineage_path(), "a") as fh:
                fh.write(json.dumps(row) + "\n")
            self._commit_snapshot(row)

    # ------------------------------------------------ snapshot metadata

    def _snap_dir(self) -> str:
        return self._p("snapshots")

    def _version_path(self) -> str:
        return self._p("VERSION.json")

    def current_snapshot_id(self) -> int:
        try:
            with open(self._version_path()) as fh:
                return int(json.load(fh)["snapshot_id"])
        except (FileNotFoundError, ValueError, KeyError):
            return 0

    def _commit_snapshot(self, row: dict) -> None:
        """Iceberg-style commit metadata, written per lineage append
        (caller holds the lineage lock).

        Each commit records WHICH store directories it made durable and
        their exact file manifests (name + byte size), then atomically
        advances VERSION.json (write-temp + rename — the same
        single-pointer commit protocol Iceberg's version-hint uses).
        A reader that follows VERSION → snapshot → manifests sees only
        complete commits; ``verify_snapshot`` audits the manifests
        against the filesystem, catching truncated or deleted files
        that a bare directory listing would miss.  The container has no
        Iceberg runtime (BENCH notes); this reproduces the metadata
        semantics the north rule needs — snapshot isolation for
        resume — on plain parquet dirs."""
        if "zoom" in row:
            z = row["zoom"]
            op = "append-zoom"
            stores = [f"tiles/z={z}", f"tilefeat/z={z}",
                      f"frontier/z={z}", f"sources/z={z}", "features"]
        elif "subtree_batch" in row:
            op = "subtree-batch"
            stores = [f"subtree/b={row['subtree_batch']}"]
        else:
            op = "misc"
            stores = []
        manifests = {}
        for s in stores:
            p = self._p(*s.split("/"))
            if not os.path.isdir(p):
                continue
            manifests[s] = [
                {"name": fn, "bytes": os.path.getsize(os.path.join(p, fn))}
                for fn in sorted(os.listdir(p))]
        prev = self.current_snapshot_id()
        sid = prev + 1
        os.makedirs(self._snap_dir(), exist_ok=True)
        snap = {
            "snapshot_id": sid,
            "parent_id": prev or None,
            "operation": op,
            "committed_at": time.time(),
            "commit": {k: v for k, v in row.items()
                       if k in ("zoom", "subtree_batch", "n_tiles",
                                "n_split", "n_points", "n_keys",
                                "complete", "final")},
            "manifests": manifests,
        }
        with open(os.path.join(self._snap_dir(), f"v{sid:06d}.json"),
                  "w") as fh:
            json.dump(snap, fh)
        tmp = self._version_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"snapshot_id": sid}, fh)
        os.replace(tmp, self._version_path())

    def snapshots(self) -> list[dict]:
        """All committed snapshots up to the current VERSION pointer,
        oldest first."""
        cur = self.current_snapshot_id()
        out = []
        for sid in range(1, cur + 1):
            try:
                with open(os.path.join(self._snap_dir(),
                                       f"v{sid:06d}.json")) as fh:
                    out.append(json.load(fh))
            except FileNotFoundError:
                continue
        return out

    def verify_snapshot(self, snapshot_id: int | None = None) -> list[str]:
        """Audit a snapshot's manifests against the filesystem; returns
        a list of problems (empty = intact).  Run before trusting a
        workdir for resume or serving."""
        sid = snapshot_id or self.current_snapshot_id()
        problems = []
        seen = False
        for snap in self.snapshots():
            if snap["snapshot_id"] > sid:
                break
            seen = True
            for store, files in snap["manifests"].items():
                base = self._p(*store.split("/"))
                for f in files:
                    p = os.path.join(base, f["name"])
                    if not os.path.exists(p):
                        problems.append(f"{store}/{f['name']}: missing")
                    elif os.path.getsize(p) != f["bytes"]:
                        problems.append(
                            f"{store}/{f['name']}: size "
                            f"{os.path.getsize(p)} != {f['bytes']}")
        if not seen and sid:
            problems.append(f"snapshot v{sid} not found")
        return problems

    # ------------------------------------------------------------ build

    def build_from_geojson(self, data: dict, n_input_partitions: int = 0) -> None:
        rows = geojson_to_input_rows(data)
        n = n_input_partitions or self.spark.sparkContext.defaultParallelism
        df = self.spark.createDataFrame(
            rows, "input_ord long, gen_index long, feature_json string")
        if len(rows) > 64:
            df = df.repartition(min(n, max(1, len(rows) // 16)))
        # route through the converted-features checkpoint: the wrap
        # decision + z0 stats ride the checkpoint write, and small
        # inputs take the one-wave fast path exactly like corpus builds
        self.build_from_converted(features_from_json_df(df, self.options),
                                  approx_rows=len(rows))

    # the handoff threshold targets ~1.5-2s tasks at the measured batch-
    # kernel rate (~300-500k vertex-levels/sec per core after the round-2
    # vectorization): T(z) = budget / levels_remaining.  Small inputs
    # hand off near the root (the whole pyramid is a few core-seconds);
    # big inputs keep distributing until per-tile subtrees shrink to
    # task size — the formula self-balances, and a smaller budget also
    # bounds the skew straggler (the hottest metro tile's subtree task)
    _KERNEL_PTS_PER_TASK = 600_000

    # handoff budget for the per-zoom loop: round-4 lineage profiling
    # at 2M pages / 4×8 executors measured ~9-15 s of wall per
    # distributed round against ~2 s subtree tasks — every avoided
    # round buys far more than a longer straggler task costs, so the
    # LOOP hands off at ~3× the kernel task unit (≈4-6 s tasks).  The
    # one-wave eligibility and the low-zoom parallelism guard keep the
    # smaller unit: task sizing inside a single fused wave is still
    # latency-bound by the slowest task alone.
    _HANDOFF_PTS_PER_TASK = 1_800_000

    # skew guard: a split tile that holds > _SKEW_FACTOR x the mean
    # split-tile mass stays in the distributed loop even when it fits
    # the task budget — otherwise the hottest metro tile becomes the
    # one straggler task that gates the whole subtree wave
    _SKEW_FACTOR = 4

    def _subtree_threshold(self, z: int, n_points: int | None = None) -> int:
        if self.subtree_max_points is not None:
            return self.subtree_max_points
        levels_left = max(1, self.options.index_max_zoom - z)
        budget = self._HANDOFF_PTS_PER_TASK // levels_left
        par = self.spark.sparkContext.defaultParallelism
        if (n_points is not None and (1 << (2 * z)) < par
                and n_points * levels_left > par * self._HANDOFF_PTS_PER_TASK):
            # parallelism guard: handing off a handful of fat subtrees
            # starves the executors (4 tasks on 32 cores), so while the
            # zoom can't yet hold one tile per core (4^z < parallelism)
            # keep distributing — tile count grows 4× per level, so the
            # guard expires after log4(cores) zooms and never chases
            # skewed hot tiles into deep, sync-round-dominated loops.
            # It only pays when the REMAINING work exceeds one fleet
            # wave of budget-sized tasks (par × task budget): below
            # that, the whole rest of the pyramid completes in a single
            # handoff wave, and every extra distributed round is a pure
            # ~2s sync cost that no added parallelism can win back —
            # the round-3 profile showed a 30k-page build spending 8 of
            # its 14 s on exactly those guard-forced rounds
            fair = n_points // (2 * par)
            budget = min(budget, fair)
        # floor keeps tasks from going microscopic (per-task Arrow +
        # scheduling overhead dominates under ~20k vertex-levels)
        return max(20_000, budget)

    def _stats_via_pyarrow(self, z: int, heavy_prev) -> list | None:
        """Per-tile classification stats read straight off the frontier
        parquet's slim columns on the driver (no executor slots, no
        queueing behind subtree tasks).  Exact same aggregation the
        Spark fallback computes; returns None when the store is not a
        readable local parquet dir (remote workdirs keep the fleet
        path)."""
        path = self._p("frontier", f"z={z}")
        if not os.path.isdir(path):
            return None
        try:
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.dataset as pads
            parts = [os.path.join(path, f) for f in os.listdir(path)
                     if f.endswith(".parquet")]  # skip _SUCCESS markers
            if not parts:
                return None
            tbl = pads.dataset(parts, format="parquet").to_table(
                columns=["x", "y", "n_verts",
                         "minx", "miny", "maxx", "maxy"])
            if heavy_prev is not None:
                xs = tbl["x"].to_numpy(zero_copy_only=False)
                ys = tbl["y"].to_numpy(zero_copy_only=False)
                packed = (xs >> 1).astype("int64") * (1 << 25) + (ys >> 1)
                want = np.fromiter(
                    ((int(px) << 25) + int(py) for px, py in heavy_prev),
                    dtype="int64", count=len(heavy_prev))
                tbl = tbl.filter(pc.is_in(pa.array(packed),
                                          value_set=pa.array(want)))
            agg = tbl.group_by(["x", "y"]).aggregate([
                ("n_verts", "count"), ("n_verts", "sum"),
                ("minx", "min"), ("miny", "min"),
                ("maxx", "max"), ("maxy", "max")])
            out = []
            cols = {name: agg[name].to_pylist() for name in agg.column_names}
            for i in range(agg.num_rows):
                out.append({
                    "x": int(cols["x"][i]), "y": int(cols["y"][i]),
                    "num_features": int(cols["n_verts_count"][i]),
                    "num_points": int(cols["n_verts_sum"][i] or 0),
                    "minx": float(cols["minx_min"][i]),
                    "miny": float(cols["miny_min"][i]),
                    "maxx": float(cols["maxx_max"][i]),
                    "maxy": float(cols["maxy_max"][i])})
            return out
        except Exception:
            return None

    def _submit_subtree(self, pool, futures, z: int, keys: list) -> None:
        """Async: build the whole descendant pyramid of each light tile.

        The batch is CHILD-grouped (wave shape): features route to the
        z+1 children of their handoff tile Column-side, each child's
        subtree builds in its own task — 4× the tasks at a quarter of
        the straggler size vs grouping by parent (the round-4 grid
        profile measured a 10-parent tail batch idling 2/3 of a
        4×8-core fleet for ~30 s).  Children that receive no candidate
        rows still exist as tiles (index.js:151-154 pushes ``tl ||
        []``): the driver back-fills their empty rows with the same
        kernel call, so the subtree store's contract is unchanged."""
        if not keys:
            return
        packed = [_pack_xy(int(x), int(y)) for x, y in keys]

        def job(z=z, packed=packed, keys=keys):
            import shutil
            t0 = time.monotonic()
            self._set_pool("gvt-subtree")
            # x/y isin conjuncts are parquet-pushdownable (row-group
            # pruning); the packed-pair filter alone is an expression
            # over two columns and forces a full scan of the frontier
            sel = self._read_frontier(z, self._kernel_spark()).where(
                F.col("x").isin([int(x) for x, _ in keys]) &
                F.col("y").isin([int(y) for _, y in keys]) &
                _pack_col().isin(packed))
            out = self._p("subtree", f"b={z}")
            if os.path.isdir(out):
                shutil.rmtree(out)  # overwrite semantics incl. partials
            acks = wave_stage_df(
                wave_children_df(sel, z, self.options), self.options,
                out_dir=out).collect()
            got = {(r["x"], r["y"]) for r in acks}
            empties = [(cx, cy)
                       for x, y in keys
                       for cx in (2 * int(x), 2 * int(x) + 1)
                       for cy in (2 * int(y), 2 * int(y) + 1)
                       if (cx, cy) not in got]
            for cx, cy in empties:
                tile_rows, srcs = batch_split_subtree(
                    [], z + 1, cx, cy, self.options,
                    root_forced_split=False)
                _write_subtree_part(_subtree_out_pdf(tile_rows, srcs),
                                    out, z + 1, cx, cy)
            os.makedirs(out, exist_ok=True)
            open(os.path.join(out, "_SUCCESS"), "w").close()
            tasks = sorted(((float(r["secs"]), int(r["n_cand"]),
                             int(r["x"]), int(r["y"])) for r in acks),
                           reverse=True)
            self._append_lineage({
                "subtree_batch": z, "n_keys": len(packed),
                "wall_sec": round(time.monotonic() - t0, 2),
                "n_tasks": len(tasks),
                "task_secs_sum": round(sum(s for s, *_ in tasks), 2),
                "top_tasks": [[x, y, nc, round(s, 2)]
                              for s, nc, x, y in tasks[:5]]})

        futures.append(pool.submit(job))

    def _ensure_subtrees(self, lineage_rows, pool, futures) -> None:
        """Resume path: re-run any handoff batch whose output is missing
        (killed mid-write) from its recorded keys — the frontier
        checkpoint it reads is still on disk.  One-wave rows re-run the
        fused wave from the features checkpoint instead (there is no
        materialized z1 frontier on that path)."""
        for row in lineage_rows:
            keys = row.get("handoff") or []
            if not keys:
                continue
            if row.get("forest"):
                # forest leaf waves always write subtree b=1; the keys
                # are the leaf cut cells, re-routable from the features
                # checkpoint at any time
                marker = self._p("subtree", "b=1", "_SUCCESS")
                if not os.path.exists(marker):
                    futures.append(pool.submit(
                        self._forest_leaf_wave,
                        [tuple(k) for k in keys]))
                continue
            marker = self._p("subtree", f"b={row['zoom']}", "_SUCCESS")
            if not os.path.exists(marker):
                if row.get("one_wave"):
                    futures.append(pool.submit(self._one_wave_subtree_job))
                else:
                    self._submit_subtree(pool, futures, row["zoom"], keys)

    # deep-wave gate: a cell whose candidate vertex mass x the levels
    # below it exceeds this is subdivided into its four child subtree
    # tasks (plus a root-only task for the cell itself) INSIDE the
    # same fused wave — the one-wave's skew lever.  Half the kernel
    # task budget: only cells carrying at least half a task of work
    # are worth the extra group overhead (measured: subdividing past
    # this point trades a solved straggler for pure per-group pipe +
    # scheduling cost — a 44-task wave ran 2x the 12-task wall on the
    # same corpus once the hottest task was already under 0.5 s).
    _DEEP_WAVE_PTS = 300_000

    def _deep_plan_aggs(self, nv) -> list:
        """Agg expressions for the deep-wave plan: candidate vertex
        mass (bbox not trivially rejected) and guaranteed-inside
        vertex mass for the 4 z1 cells and 16 z2 cells, window floats
        identical to wave_stage_df's (parent + const) / z2l clips.
        ``nv`` is the per-feature vertex-count Column.  These ride an
        existing stats job (cache-first path) or a one-off gate agg
        (resume path) — see _deep_plan_decide."""
        opts = self.options
        k1c = 0.5 * opts.buffer / opts.extent
        k2c, k3c, k4c = 0.5 - k1c, 0.5 + k1c, 1 + k1c
        aggs = []
        z = F.lit(0).cast("long")
        for tag, z2l, n in (("a", 1, 2), ("b", 2, 4)):
            for cy in range(n):
                for cx in range(n):
                    xlo = ((cx >> 1) + (k2c if cx & 1 else -k1c)) / z2l
                    xhi = ((cx >> 1) + (k4c if cx & 1 else k3c)) / z2l
                    ylo = ((cy >> 1) + (k2c if cy & 1 else -k1c)) / z2l
                    yhi = ((cy >> 1) + (k4c if cy & 1 else k3c)) / z2l
                    rej = ((F.col("maxx") < xlo) |
                           (F.col("minx") >= xhi) |
                           (F.col("maxy") < ylo) |
                           (F.col("miny") >= yhi))
                    inside = ((F.col("minx") >= xlo) &
                              (F.col("maxx") <= xhi) &
                              (F.col("miny") >= ylo) &
                              (F.col("maxy") <= yhi))
                    aggs.append(F.sum(F.when(~rej, nv).otherwise(z))
                                .alias(f"m{tag}{cx}_{cy}"))
                    aggs.append(F.sum(F.when(inside, nv).otherwise(z))
                                .alias(f"i{tag}{cx}_{cy}"))
        return aggs

    def _deep_plan_decide(self, row) -> tuple[list[tuple[int, int]],
                                              list[tuple[int, int]]]:
        """(z1 cells, z2 cells) to subdivide from a _deep_plan_aggs
        row: candidate mass × levels below over the task budget AND
        guaranteed-split (the fully-inside vertex mass is an exact
        lower bound on post-clip num_points — such features survive
        the clip intact — so > index_max_points proves the stop rule
        will split the cell; the child subtree tasks, root-only tasks
        and empty-child back-fill are then exactly what the in-task
        recursion would have emitted).  A z2 cell is only considered
        under a subdivided z1 parent."""
        opts = self.options
        imz = opts.index_max_zoom
        budget = self._DEEP_WAVE_PTS
        deep1 = [(x, y) for y in (0, 1) for x in (0, 1)
                 if (int(row[f"ma{x}_{y}"] or 0) * (imz - 1) > budget
                     and int(row[f"ia{x}_{y}"] or 0)
                     > opts.index_max_points)]
        deep2 = []
        if imz >= 3 and deep1:
            d1 = set(deep1)
            deep2 = [(x, y) for y in range(4) for x in range(4)
                     if ((x >> 1, y >> 1) in d1
                         and int(row[f"mb{x}_{y}"] or 0) * (imz - 2)
                         > budget
                         and int(row[f"ib{x}_{y}"] or 0)
                         > opts.index_max_points)]
        return deep1, deep2

    def _deep_wave_plan(
            self, fr0: DataFrame) -> tuple[list[tuple[int, int]],
                                           list[tuple[int, int]]]:
        """One-off gate agg over the z0 frontier (resume path; the
        cache-first path rides these aggs on the stats job instead and
        hands the decided plan down as _deep_plan_hint)."""
        if self.options.index_max_zoom < 2:
            return [], []
        row = fr0.agg(*self._deep_plan_aggs(F.col("n_verts"))).first()
        return self._deep_plan_decide(row)

    def _one_wave_subtree_job(
            self, fr0: DataFrame | None = None,
            n_points: int | None = None) -> list[tuple[int, int]]:
        """The fused one-wave handoff: Column router (no map-side
        Python) → group by z1 child → in-task clip-from-parent + whole
        descendant pyramid (see pipeline.one_wave_stage_df).  Reads the
        z0 frontier view (features checkpoint, or the caller-supplied
        cached frontier); returns the z1 children that received
        candidate rows (their tiles live in the subtree store — the
        rest are the split root's empty children).

        Heavy z1 children (see _deep_wave_plan) are subdivided in
        the SAME wave job: a root-only z1 task emits the child's own
        tile row from the full clipped state, and four z2 tasks build
        the grandchild subtrees (clipping z0→z1→z2 in-task, level by
        level — bit-identical to the recursion, pipeline.wave_stage_df);
        z2 cells still over the budget recurse once more into a
        root-only z2 task + four z3 subtree tasks.  Children that
        received no candidates are back-filled driver-side as empty
        stats rows, exactly like the z1 case (index.js:151-154 pushes
        ``tl || []``)."""
        restore: dict[str, str] = {}
        if fr0 is None:
            # resume / checkpoint mode: the kernel-session clone keeps
            # AQE from gluing the handful of CPU-heavy groups together
            fr0 = self._read_frontier(0, self._kernel_spark())
        else:
            # cached mode: the persisted frontier is bound to the main
            # session, so flip the same two knobs there for this one
            # job (the only concurrent job, the z0 render, shuffles
            # nothing and is unaffected)
            conf = self.spark.conf
            for k, v in (
                    ("spark.sql.adaptive.coalescePartitions.enabled",
                     "false"),
                    ("spark.sql.shuffle.partitions", "64")):
                restore[k] = conf.get(k)
                conf.set(k, v)
        try:
            import shutil
            self._set_pool("gvt-subtree")
            _t0 = time.monotonic()
            # the deep plan normally arrives precomputed (its aggs rode
            # the cache-first stats job, _deep_plan_hint); the resume
            # path pays one tiny gate agg over the checkpoint — and
            # both are skipped when the caller's exact z0 point count
            # proves no child can exceed the budget holding ALL the mass
            hint = self.__dict__.pop("_deep_plan_hint", None)
            deep1: list[tuple[int, int]] = []
            deep2: list[tuple[int, int]] = []
            if hint is not None:
                deep1, deep2 = hint
            elif (n_points is None or n_points
                    * (self.options.index_max_zoom - 1)
                    > self._DEEP_WAVE_PTS):
                deep1, deep2 = self._deep_wave_plan(fr0)
            _t1 = time.monotonic()
            if deep1:
                # single-pass router: every wave group's candidate rows
                # (z1 cells + subdivided children down to z3, roles
                # tagged) from ONE projection + explode over the cached
                # frontier — no per-level rescan
                cands = deep_wave_route_df(fr0, self.options,
                                           deep1, deep2)
            else:
                cands = one_wave_children_df(fr0, self.options)
            out = self._p("subtree", "b=1")
            if os.path.isdir(out):
                shutil.rmtree(out)  # overwrite semantics incl. partials
            acks = one_wave_stage_df(
                cands, self.options, out_dir=out,
                from_zoom=0 if deep1 else None).collect()
            _t2 = time.monotonic()
            self._last_wave_steps = {
                "gate": round(_t1 - _t0, 2),
                "stage": round(_t2 - _t1, 2),
                "n_tasks": len(acks),
                "n_deep1": len(deep1), "n_deep2": len(deep2),
                "task_secs_sum": round(sum(r["secs"] for r in acks), 2),
                "task_secs_max": round(max(
                    (r["secs"] for r in acks), default=0.0), 2)}
            os.makedirs(out, exist_ok=True)
            open(os.path.join(out, "_SUCCESS"), "w").close()
            for z, parents in ((2, deep1), (3, deep2)):
                if not parents:
                    continue
                got = {(r["x"], r["y"]) for r in acks if r["z"] == z}
                missing = [(2 * px + dx, 2 * py + dy)
                           for px, py in parents
                           for dx in (0, 1) for dy in (0, 1)
                           if (2 * px + dx, 2 * py + dy) not in got]
                if missing:
                    self._write_empty_tiles(z, missing)
        finally:
            for k, v in restore.items():
                self.spark.conf.set(k, v)
        return sorted({(r["x"], r["y"]) for r in acks if r["z"] == 1}
                      | {(r["x"] >> 1, r["y"] >> 1)
                         for r in acks if r["z"] == 2}
                      | {(r["x"] >> 2, r["y"] >> 2)
                         for r in acks if r["z"] == 3})

    def _frontier0_view(self, src: DataFrame) -> DataFrame:
        """z0 frontier view over an already-converted features frame
        (same shape _read_frontier(0) serves from the checkpoint)."""
        from .pipeline import _ord_extend
        n_verts = (F.size("coords") / 3).cast("long").alias("n_verts")
        return (src
                .withColumn("ord_path", _ord_extend(1, F.lit(0)))
                .withColumn("z", F.lit(0))
                .withColumn("x", F.lit(0))
                .withColumn("y", F.lit(0))
                .select(*TILED_COLUMNS, n_verts))

    def _write_empty_tiles(self, z: int, coords: list) -> None:
        """Stats-only empty tile rows (a split tile's children all
        exist, index.js:151-154) for wave children that received no
        candidates — sentinel bbox, leaf, no source pack."""
        import pandas as pd
        n_e = len(coords)
        self._write_local_parquet(pd.DataFrame({
            "x": pd.Series([c[0] for c in coords], dtype="int32"),
            "y": pd.Series([c[1] for c in coords], dtype="int32"),
            "num_features": pd.Series([0] * n_e, dtype="int64"),
            "num_points": pd.Series([0] * n_e, dtype="int64"),
            "num_simplified": pd.Series([0] * n_e, dtype="int64"),
            "minx": pd.Series([2.0] * n_e, dtype="float64"),
            "miny": pd.Series([1.0] * n_e, dtype="float64"),
            "maxx": pd.Series([-1.0] * n_e, dtype="float64"),
            "maxy": pd.Series([0.0] * n_e, dtype="float64"),
            "is_split": pd.Series([False] * n_e, dtype="bool"),
            "has_source": pd.Series([True] * n_e, dtype="bool"),
            "tile_id": pd.Series([to_id(z, cx, cy)
                                  for cx, cy in coords],
                                 dtype="int64"),
        }), self._p("tiles", f"z={z}"))

    def _build_one_wave(self, r0: dict, pool, futures,
                        cached: DataFrame | None = None) -> None:
        """Small-corpus fast path: the whole pyramid below z0 in ONE
        fused wave, replacing the per-zoom distributed loop.

        Engaged only when the z0 stats observed during the features
        checkpoint write prove the remaining work fits one wave of
        budget-sized kernel tasks (n_points × index_max_zoom ≤
        parallelism × _KERNEL_PTS_PER_TASK) — the regime where every
        extra distributed round is pure sync latency that added
        parallelism cannot win back (the round-3 profile measured ~2 s
        of fixed cost per round against ~1.2 core-seconds of total
        kernel work at 30k pages).  Above the bound, build() keeps
        distributing per zoom unchanged, so the 100-TB path never
        enters here.

        Output contract is identical to the loop path: tilefeat/z=0
        holds the z0 render, the subtree store holds every z≥1 tile
        (roots classified by the normal stop rule inside the kernel,
        index.js:103-121), the tiles store carries z0 + the split
        root's empty children (index.js:151-154 pushes ``tl || []``),
        and lineage rows land only after every store is durable, so a
        kill anywhere before that restarts the build cleanly."""
        import pandas as pd
        opts = self.options
        from pyspark.sql import Observation
        t0 = time.monotonic()
        fut_ck = None
        if cached is not None:
            fr0 = self._frontier0_view(cached)
            # the durable features checkpoint rides CONCURRENTLY with
            # the wave (both read the warm cache); it must only be on
            # disk before the lineage commit below
            def ck_job():
                self._set_pool("gvt-sources")
                cached.write.mode("overwrite").parquet(self._p("features"))
            fut_ck = pool.submit(ck_job)
        else:
            fr0 = self._read_frontier(0)
        obs_r = Observation()

        def render_job():
            self._set_pool("gvt-render")
            (rendered_features_df(fr0, opts).drop("z")
             .observe(obs_r, F.sum("n_simplified").alias("ns"))
             .write.mode("overwrite")
             .parquet(self._p("tilefeat", "z=0")))

        fut_render = pool.submit(render_job)
        t1 = time.monotonic()
        present = self._one_wave_subtree_job(
            fr0 if cached is not None else None,
            n_points=int(r0["num_points"]))
        wave_sec = time.monotonic() - t1
        missing = [(x, y) for x in (0, 1) for y in (0, 1)
                   if (x, y) not in set(present)]
        _t = time.monotonic()
        fut_render.result()
        if fut_ck is not None:
            fut_ck.result()
        render_wait = time.monotonic() - _t
        ns0 = int(obs_r.get["ns"] or 0)

        self._write_local_parquet(pd.DataFrame({
            "x": pd.Series([0], dtype="int32"),
            "y": pd.Series([0], dtype="int32"),
            "num_features": pd.Series([r0["num_features"]], dtype="int64"),
            "num_points": pd.Series([r0["num_points"]], dtype="int64"),
            "num_simplified": pd.Series([ns0], dtype="int64"),
            "minx": pd.Series([r0["minx"]], dtype="float64"),
            "miny": pd.Series([r0["miny"]], dtype="float64"),
            "maxx": pd.Series([r0["maxx"]], dtype="float64"),
            "maxy": pd.Series([r0["maxy"]], dtype="float64"),
            "is_split": pd.Series([True], dtype="bool"),
            "has_source": pd.Series([False], dtype="bool"),
            "tile_id": pd.Series([to_id(0, 0, 0)], dtype="int64"),
        }), self._p("tiles", "z=0"))
        if missing:
            self._write_empty_tiles(1, missing)

        # lineage lands LAST, in zoom order — "complete" implies every
        # store is durable (the resume contract); a kill before this
        # point rebuilds from the features checkpoint
        self._append_lineage({
            "zoom": 0, "n_tiles": 1, "n_split": 1,
            "n_points": int(r0["num_points"]), "heavy": [],
            "handoff": [], "one_wave": True,
            "wall_sec": time.monotonic() - t0,
            "steps": {"render_wait": round(render_wait, 2)},
            "complete": True, "final": False})
        self._append_lineage({"subtree_batch": 1, "n_keys": len(present),
                              "one_wave": True,
                              "wall_sec": round(wave_sec, 2),
                              "steps": getattr(self, "_last_wave_steps",
                                               None)})
        self._append_lineage({
            "zoom": 1, "n_tiles": 4, "heavy": [],
            "handoff": [list(k) for k in present], "one_wave": True,
            "wall_sec": time.monotonic() - t0,
            "complete": True, "final": True})

    # cache-first gate: below this many (hinted) feature rows, a small
    # build materializes the converted features into the block-manager
    # cache instead of a serial parquet checkpoint — the durable
    # checkpoint is then written CONCURRENTLY with the one-wave handoff
    # (still before the lineage commit, so the resume contract holds).
    # Big corpora keep the checkpoint-first contract: caching 100 TB of
    # converted features is exactly the anti-pattern the per-zoom loop
    # avoids.
    _CACHE_FIRST_MAX_ROWS = 2_000_000

    def build_from_converted(self, features_df: DataFrame,
                             resume: bool = False,
                             approx_rows: int | None = None) -> None:
        """Checkpoint the (expensive) converted-features stage to parquet
        before the wrap decision, so ingest/convert executes exactly once.

        The wrap-candidate counts ride the SAME write job as observed
        metrics (no separate agg pass), and in the common no-wrap case
        the z0 frontier is served as a view over this checkpoint
        (``_read_frontier``) — one materialization of the corpus
        total, not two.

        ``approx_rows``: caller-known rough feature count.  Small
        hinted inputs take the cache-first route (see
        ``_CACHE_FIRST_MAX_ROWS``); the hint only picks HOW the stats
        pass runs — eligibility for the one-wave path itself is decided
        from the exact observed stats either way."""
        from pyspark.sql import Observation

        opts = self.options
        b = opts.buffer / opts.extent
        path = self._p("features")
        counts = z0_stats = None
        if (not resume and approx_rows is not None
                and approx_rows <= self._CACHE_FIRST_MAX_ROWS
                and self.one_wave and self.subtree_max_points is None
                and opts.index_max_zoom >= 1):
            cached = features_df.persist()
            # the deep-wave plan aggs ride this same stats job (they
            # would otherwise cost a separate gate-agg job inside the
            # wave, measured ~1-1.5 s of pure pool-contended latency)
            deep_aggs = (self._deep_plan_aggs(
                (F.size("coords") / 3).cast("long"))
                if opts.index_max_zoom >= 2 else [])
            row = cached.agg(
                F.sum((F.col("minx") <= b).cast("long")).alias("l"),
                F.sum((F.col("maxx") >= 1 - b).cast("long")).alias("r"),
                F.count(F.lit(1)).alias("num_features"),
                F.sum((F.size("coords") / 3).cast("long"))
                .alias("num_points"),
                F.min("minx").alias("minx"), F.min("miny").alias("miny"),
                F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
                *deep_aggs
            ).first()
            counts = (int(row["l"] or 0), int(row["r"] or 0))
            if row["num_features"]:
                z0_stats = [{"x": 0, "y": 0,
                             "num_features": int(row["num_features"]),
                             "num_points": int(row["num_points"]),
                             "minx": float(row["minx"]),
                             "miny": float(row["miny"]),
                             "maxx": float(row["maxx"]),
                             "maxy": float(row["maxy"])}]
            if (not (counts[0] or counts[1]) and z0_stats
                    and self._one_wave_eligible(
                        z0_stats[0]["num_points"])):
                self._deep_plan_hint = (self._deep_plan_decide(row)
                                        if deep_aggs else ([], []))
                try:
                    self.build(None, z0_stats=z0_stats,
                               cached_features=cached)
                finally:
                    self.__dict__.pop("_deep_plan_hint", None)
                    cached.unpersist()
                return
            # mis-hinted (wraps, or too big for one wave): durable
            # checkpoint from the warm cache, then exactly as today
            cached.write.mode("overwrite").parquet(path)
            feats = self.spark.read.parquet(path)
            cached.unpersist()
            if counts[0] or counts[1]:
                self.build(wrap_df(feats, opts, counts=counts))
            else:
                self.build(None, z0_stats=z0_stats)
            return
        if not (resume and os.path.exists(os.path.join(path, "_SUCCESS"))):
            obs = Observation()
            (features_df.observe(
                obs,
                F.sum((F.col("minx") <= b).cast("long")).alias("l"),
                F.sum((F.col("maxx") >= 1 - b).cast("long")).alias("r"),
                # z0 holds exactly one tile, so its classification stats
                # are global aggregates — free in this same write job
                F.count(F.lit(1)).alias("num_features"),
                F.sum((F.size("coords") / 3).cast("long")).alias("num_points"),
                F.min("minx").alias("minx"), F.min("miny").alias("miny"),
                F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"))
             .write.mode("overwrite").parquet(path))
            got = obs.get
            counts = (int(got["l"] or 0), int(got["r"] or 0))
            if got["num_features"]:
                z0_stats = [{"x": 0, "y": 0,
                             "num_features": int(got["num_features"]),
                             "num_points": int(got["num_points"]),
                             "minx": float(got["minx"]),
                             "miny": float(got["miny"]),
                             "maxx": float(got["maxx"]),
                             "maxy": float(got["maxy"])}]
        feats = self.spark.read.parquet(path)
        if counts is None:
            # resume path: re-aggregate the z0 classification stats in
            # the SAME pass as the wrap counts, so a crash-resume of a
            # forest-/one-wave-eligible corpus re-enters the same build
            # path instead of silently falling back to the per-zoom loop
            row = feats.agg(
                F.sum((F.col("minx") <= b).cast("long")).alias("l"),
                F.sum((F.col("maxx") >= 1 - b).cast("long")).alias("r"),
                F.count(F.lit(1)).alias("num_features"),
                F.sum((F.size("coords") / 3).cast("long"))
                .alias("num_points"),
                F.min("minx").alias("minx"), F.min("miny").alias("miny"),
                F.max("maxx").alias("maxx"),
                F.max("maxy").alias("maxy")).first()
            counts = (row["l"] or 0, row["r"] or 0)
            if row["num_features"]:
                z0_stats = [{"x": 0, "y": 0,
                             "num_features": int(row["num_features"]),
                             "num_points": int(row["num_points"]),
                             "minx": float(row["minx"]),
                             "miny": float(row["miny"]),
                             "maxx": float(row["maxx"]),
                             "maxy": float(row["maxy"])}]
        if counts[0] or counts[1]:
            self.build(wrap_df(feats, opts, counts=counts), resume=resume)
        else:
            self.build(None, resume=resume, z0_stats=z0_stats)

    def _one_wave_eligible(self, n_points: int) -> bool:
        """True when the whole pyramid below z0 fits ONE wave of
        budget-sized kernel tasks — the regime where every distributed
        round is pure sync latency (see _build_one_wave).

        The bound is a QUARTER of the fleet's kernel budget: the
        one-wave's skew lever subdivides at most two levels (z1
        root-only + z2/z3 subtrees), so past ~par×budget/4 of total
        work its hottest task stops shrinking while the forest cut
        keeps subdividing — measured on the 120k-page imz-10 build:
        one-wave 17.7-21.8 s (hottest task 13.0 s) vs forest
        12.9-15.3 s (hottest 7.0 s) on the same warm session."""
        opts = self.options
        return (self.one_wave and self.subtree_max_points is None
                and opts.index_max_zoom >= 1
                and n_points > opts.index_max_points
                and n_points * opts.index_max_zoom * 4
                <= self.spark.sparkContext.defaultParallelism
                * self._KERNEL_PTS_PER_TASK)

    # forest-wave cut: deepest subdivision level (gate cells grow 4^L;
    # past z6 the cut bookkeeping stops paying), leaf task budget in
    # vertex-levels, and the straggler factor past which the cut is
    # declared infeasible and the per-zoom loop keeps the job.
    _FOREST_MAX_LEVEL = 6
    # leaves above this many task budgets of estimated work are probed
    # and rendered partition-spread instead of becoming one wave task;
    # 2x keeps every wave task within ~2x the median budget-sized task
    # (round-4 residual: 19/119 over-budget leaves, one 13 s straggler).
    # Env-tunable for same-boot A/B (the sandbox VM drifts 2-3x
    # boot-to-boot, so cross-boot comparisons of this knob are noise).
    _FOREST_STRAGGLER = int(os.environ.get("GVT_FOREST_STRAGGLER", "2"))

    def _forest_eligible(self, n_points: int) -> bool:
        """True when the corpus is too big for ONE wave but a bounded
        quadtree cut of subtree tasks plausibly exists: the gate job
        then decides for real (see _forest_cut)."""
        opts = self.options
        return (self.one_wave and self.subtree_max_points is None
                and opts.index_max_zoom >= 2
                and n_points > opts.index_max_points
                and n_points * opts.index_max_zoom
                <= (4 ** self._FOREST_MAX_LEVEL)
                * self._KERNEL_PTS_PER_TASK)

    def _forest_cut(self, gate_rows, fr0=None) -> tuple | None:
        """Quadtree cut from the gate masses: walk from the 4 z1 cells;
        a cell subdivides (INTERNAL — distributed narrow render of its
        own tile) while it is guaranteed-split, still above the leaf
        budget, and above neither the index_max_zoom ceiling nor
        _FOREST_MAX_LEVEL; otherwise it becomes a LEAF (one
        wave_stage_df subtree task, its root classified by the normal
        stop rule in-kernel).  Zero-mass children of internal cells
        are recorded for the driver-side empty back-fill
        (index.js:151-154 pushes ``tl || []``).

        Guaranteed-split has TWO provers, both exact lower bounds on
        the cell tile's post-clip num_points (> index_max_points ⇒
        src/index.js:105-107 splits):
        - the gate's fully-inside bbox mass ``i`` (free, rides the
          gate job) — blind on dense clusters straddling a cell edge;
        - the vertex-survival count ``v`` (pipeline.
          forest_vertex_probe_df) — one cheap second job, run only
          when the walk meets over-budget cells ``i`` cannot prove
          (the measured forest skew: twin boundary cells with
          identical duplicated candidate mass, i == 0, 15 s of
          serial kernel each).  Internal cells are eligible up to
          l == _FOREST_MAX_LEVEL; their children beyond the gate's
          deepest level join the cut as BLIND leaves (no mass info —
          routed by bbox like any leaf, zero-row ones back-filled
          from missing acks).

        A cell over _FOREST_STRAGGLER task budgets that NEITHER
        prover can split (e.g. a giant ring enclosing the cell with
        every vertex outside) is returned as a STRAGGLER: its exact
        stop boundary is then measured by the full clip-descent probe
        (straggler_probe_stats) and its subtree rendered
        partition-spread by internal_tree_direct, never funneled into
        one wave task."""
        opts = self.options
        imz = opts.index_max_zoom
        imp = opts.index_max_points
        budget = self._KERNEL_PTS_PER_TASK
        max_lvl = self._FOREST_MAX_LEVEL
        self._forest_vprobe_sec = None
        cells = {(int(r["lvl"]), int(r["x"]), int(r["y"])):
                 (int(r["m"] or 0), int(r["i"] or 0))
                 for r in gate_rows}
        # per-leaf estimated work, consumed by the slot wave's LPT
        # bin-packing (blind leaves have no gate row and default to 1)
        leaf_work: dict = {}
        self._forest_leaf_work = leaf_work

        def walk(vcells):
            leaves: list = []
            internals: list = []
            empties: list = []
            stragglers: list = []
            opaque: list = []
            leaf_work.clear()
            stack = [(1, x, y) for y in (0, 1) for x in (0, 1)]
            while stack:
                l, x, y = stack.pop(0)
                m, i = cells.get((l, x, y), (0, 0))
                if m == 0:
                    empties.append((l, x, y))
                    continue
                work = m * max(imz - l, 1)
                eligible = l < imz and l <= max_lvl and work > budget
                proven = i > imp or (vcells is not None
                                     and vcells.get((l, x, y), 0) > imp)
                if eligible and proven:
                    internals.append((l, x, y))
                    for dy in (0, 1):
                        for dx in (0, 1):
                            c = (l + 1, 2 * x + dx, 2 * y + dy)
                            if l + 1 > max_lvl:
                                leaves.append(c)   # blind: no gate row
                            else:
                                stack.append(c)
                elif eligible and vcells is None:
                    opaque.append((l, x, y))
                elif work > self._FOREST_STRAGGLER * budget:
                    stragglers.append((l, x, y))
                else:
                    leaves.append((l, x, y))
                    leaf_work[(l, x, y)] = work
            return leaves, internals, empties, stragglers, opaque

        leaves, internals, empties, stragglers, opaque = walk(None)
        if opaque and fr0 is not None:
            from .pipeline import forest_vertex_probe_df
            lmin = min(l for l, _, _ in opaque)
            levels = list(range(lmin, min(max_lvl, imz - 1) + 1))
            _t = time.monotonic()
            v_rows = forest_vertex_probe_df(fr0, opts, opaque,
                                            levels).collect()
            self._forest_vprobe_sec = round(time.monotonic() - _t, 2)
            vcells = {(int(r["lvl"]), int(r["x"]), int(r["y"])):
                      int(r["v"] or 0) for r in v_rows}
            leaves, internals, empties, stragglers, _ = walk(vcells)
        elif opaque:
            # no frontier handle (unit-test path): unprovable cells
            # fall through exactly as pre-probe semantics
            leaves, internals, empties, stragglers, _ = walk({})
        return (leaves, internals, empties, stragglers)

    def _straggler_boundary(self, probe_acks, stragglers) -> tuple:
        """Place the exact stop boundary under each probed straggler
        cell from the summed (z, x, y, num_points) partials: a node
        SPLITS iff num_points > index_max_points and z < index_max_zoom
        (src/index.js:105-107 on exact post-clip counts).  Split nodes
        become internal-render cells, non-split nodes are STOP tiles
        (render + retained source), and a split node's zero-row
        children join the empty back-fill."""
        opts = self.options
        imp, imz = opts.index_max_points, opts.index_max_zoom
        tot: dict = {}
        for r in probe_acks:
            k = (int(r["z"]), int(r["x"]), int(r["y"]))
            tot[k] = tot.get(k, 0) + int(r["n_points"])
        internals: list = []
        stops: list = []
        empties: list = []
        stack = [tuple(int(v) for v in c) for c in stragglers]
        while stack:
            z, x, y = stack.pop(0)
            if tot.get((z, x, y), 0) > imp and z < imz:
                internals.append((z, x, y))
                for dy in (0, 1):
                    for dx in (0, 1):
                        c = (z + 1, 2 * x + dx, 2 * y + dy)
                        if tot.get(c, 0) > 0:
                            stack.append(c)
                        else:
                            empties.append(c)
            else:
                stops.append((z, x, y))
        return internals, stops, empties

    def _slot_values(self, g: int) -> list:
        """Ints v_0..v_{g-1} whose Spark murmur3 shuffle bucket
        (pmod(hash(int v), g)) is a bijection onto 0..g-1 — computed BY
        Spark in one tiny job, so the driver's bin assignment and the
        wave's HashPartitioning agree exactly (no reimplemented hash
        to drift)."""
        vals: list = [None] * g
        lo, missing = 0, g
        while missing:
            rows = (self.spark.range(lo, lo + 32 * g)
                    .select(F.col("id").cast("int").alias("v"),
                            F.pmod(F.hash(F.col("id").cast("int")),
                                   F.lit(g)).alias("b")).collect())
            for r in rows:
                if vals[r["b"]] is None:
                    vals[r["b"]] = int(r["v"])
                    missing -= 1
            lo += 32 * g
        return vals

    def _forest_leaf_wave(self, leaves, routed: DataFrame | None = None
                          ) -> list:
        """The forest wave's LEAF-subtree job: route the z0 frontier to
        the leaf cut cells and clip each whole descendant subtree
        in-task into subtree b=1.

        Default shape: DRIVER-PACKED slots — the cut's per-leaf work
        estimates are LPT-packed into ceil(total/budget) bins (never
        fewer than the fleet's slots), each bin becomes exactly one
        task via driver-chosen slot ints (see _slot_values), and the
        task slices its rows per cell through the shared per-cell
        kernel (pipeline.forest_slot_wave_df).  groupBy(z,x,y) places
        groups by hash instead, where two hot cells colliding into one
        task double the wave wall and no bin-packing is possible; with
        ~2 cells/partition such collisions are the common case, and
        wave wall = max task IS the term a cluster pays.
        GVT_NO_SLOTPACK=1 restores the group-keyed wave for A/B.

        Factored out of _build_forest so the resume path
        (_ensure_subtrees) can re-create a lost subtree store from the
        cut keys recorded in the forest lineage row — the z0 frontier
        it reads is the features-checkpoint view, still on disk for
        any resumable workdir (estimates are absent there: the pack
        falls back to uniform weights, same disk layout either way)."""
        import heapq
        import shutil
        opts = self.options
        if routed is None:
            routed = forest_route_df(self._read_frontier(0), opts,
                                     {tuple(c): 0 for c in leaves})
        slotpack = (os.environ.get("GVT_NO_SLOTPACK", "0") != "1"
                    and len(leaves) > 0)
        slot_map: dict = {}
        n_bins = 0
        if slotpack:
            est = getattr(self, "_forest_leaf_work", None) or {}
            werk = sorted(((est.get(tuple(c), 1), tuple(c))
                           for c in leaves), reverse=True)
            total = sum(w for w, _ in werk)
            par = self.spark.sparkContext.defaultParallelism
            n_bins = max(1, min(len(leaves),
                                max(par, -(-total
                                           // max(self._KERNEL_PTS_PER_TASK,
                                                  1)))))
            slot_vals = self._slot_values(n_bins)
            self._forest_slot_bins = n_bins
            heap = [(0, b) for b in range(n_bins)]
            heapq.heapify(heap)
            for w, c in werk:
                load, b = heapq.heappop(heap)
                slot_map[c] = slot_vals[b]
                heapq.heappush(heap, (load + w, b))
        restore: dict = {}
        conf = self.spark.conf
        for k, v in (
                ("spark.sql.adaptive.coalescePartitions.enabled",
                 "false"),
                ("spark.sql.shuffle.partitions",
                 str(n_bins if slotpack else max(64, 2 * len(leaves))))):
            restore[k] = conf.get(k)
            conf.set(k, v)
        try:
            self._set_pool("gvt-subtree")
            out = self._p("subtree", "b=1")
            if os.path.isdir(out):
                shutil.rmtree(out)
            cand = routed.where(F.col("role") == 0)
            if slotpack:
                from .pipeline import forest_slot_wave_df
                key = ((F.col("z").cast("long") * F.lit(1 << 50))
                       + (F.col("x").cast("long") * F.lit(1 << 25))
                       + F.col("y").cast("long"))
                pairs: list = []
                for (z, x, y), v in slot_map.items():
                    pairs.append(F.lit((z << 50) | (x << 25) | y))
                    pairs.append(F.lit(v))
                cand = cand.withColumn(
                    "slot", F.create_map(*pairs)[key].cast("int"))
                acks = forest_slot_wave_df(cand, opts, out_dir=out,
                                           from_zoom=0).collect()
            else:
                acks = one_wave_stage_df(cand, opts, out_dir=out,
                                         from_zoom=0).collect()
            os.makedirs(out, exist_ok=True)
            open(os.path.join(out, "_SUCCESS"), "w").close()
            return acks
        finally:
            for k, v in restore.items():
                self.spark.conf.set(k, v)

    def _build_forest(self, r0: dict, pool, futures, plan,
                      render=None) -> None:
        """Forest wave: the whole pyramid in ONE shuffle + two narrow
        maps, replacing the per-zoom distributed loop for corpora too
        big for the one-wave but coverable by a bounded quadtree cut.

        - LEAF cut cells → wave_stage_df subtree tasks (clip z0→cell
          in-task, whole descendant pyramid; the one-wave machinery at
          arbitrary depth).
        - INTERNAL cut cells → internal_tree_direct: ONE narrow
          mapInArrow job whose tasks walk their partition of the z0
          frontier down the internal tree in-task — clip one level
          per node on the shrinking parent state, render through the
          shared kernel; an internal tile's features stay spread
          across scan partitions exactly like the z0 render (no
          per-tile funnel), tilefeat parts written task-side, stats
          rows back as slim acks.
        - z0 renders concurrently as in the one-wave.

        The per-zoom spine (split → frontier write → classify → split,
        ~8 s/round of pure cadence measured on the 2M-page grid) is
        gone: wall = route + max(leaf task) + narrow renders.  Output
        layout is the loop's for internal zooms (tilefeat/z=N +
        tiles/z=N) and the wave's for leaves (subtree b=1), both
        native to every reader; lineage lands only after all stores
        are durable, so a kill anywhere restarts the build cleanly."""
        import pandas as pd
        import shutil
        from pyspark.sql import Observation
        opts = self.options
        t0 = time.monotonic()
        leaves, internals, empties, stragglers = plan
        fr0 = self._read_frontier(0)
        # only LEAF cells go through the grouped wave; internal cells
        # are rendered by the level-incremental chain below, straggler
        # cells (over-budget, unprovable split) by the probe + the same
        # partition-spread render
        routed = (forest_route_df(fr0, opts, {c: 0 for c in leaves})
                  if leaves else None)

        _steps: dict = {}

        if render is not None:
            # caller pre-started the z0 render before the gate/probe
            # jobs (build() forest branch) — adopt its future
            fut_render, obs_r, _rsteps = render
        else:
            obs_r = Observation()
            _rsteps = _steps

            def render_job():
                self._set_pool("gvt-render")
                _t = time.monotonic()
                (rendered_features_df(fr0, opts).drop("z")
                 .observe(obs_r, F.sum("n_simplified").alias("ns"))
                 .write.mode("overwrite")
                 .parquet(self._p("tilefeat", "z=0")))
                _rsteps["render0"] = round(time.monotonic() - _t, 2)

            fut_render = pool.submit(render_job)

        int_box: dict = {"acks": [], "stops": [], "extra_empties": [],
                         "internals": list(internals)}
        for z in sorted({l for l, _, _ in internals}):
            # stale parts from a killed attempt with a different task
            # count must not survive (deterministic per-task names
            # only guard same-plan retries)
            p = self._p("tilefeat", f"z={z}")
            if os.path.isdir(p):
                shutil.rmtree(p)

        def internal_job():
            self._set_pool("gvt-internal")
            all_int = list(internals)
            s_stop: list = []
            if stragglers:
                # exact stop boundary first: one slim distributed
                # probe, then the straggler subtrees render through
                # the SAME partition-spread walk as internal cells
                _t = time.monotonic()
                acks = straggler_probe_stats(
                    fr0, stragglers, opts).collect()
                s_int, s_stop, s_emp = self._straggler_boundary(
                    acks, stragglers)
                _steps["probe"] = round(time.monotonic() - _t, 2)
                _steps["n_stragglers"] = len(stragglers)
                _steps["n_stops"] = len(s_stop)
                all_int += s_int
                int_box["stops"] = s_stop
                int_box["extra_empties"] = s_emp
                int_box["internals"] = all_int
                known = {l for l, _, _ in internals}
                for z in sorted({c[0] for c in s_int + s_stop}
                                - known):
                    p = self._p("tilefeat", f"z={z}")
                    if os.path.isdir(p):
                        shutil.rmtree(p)
                for z in sorted({c[0] for c in s_stop}):
                    p = self._p("sources", f"z={z}")
                    if os.path.isdir(p):
                        shutil.rmtree(p)
            if not (all_int or s_stop):
                return
            _t = time.monotonic()
            int_box["acks"] = internal_tree_direct(
                fr0, all_int, opts, self._p("tilefeat"),
                stops=s_stop, sources_root=self._p("sources"))
            _steps["internal"] = round(time.monotonic() - _t, 2)

        fut_int = (pool.submit(internal_job)
                   if (internals or stragglers) else None)

        _t1 = time.monotonic()
        leaf_acks = (self._forest_leaf_wave(leaves, routed=routed)
                     if leaves else [])
        wave_sec = time.monotonic() - _t1
        if fut_int is not None:
            fut_int.result()
        _t2 = time.monotonic()
        fut_render.result()
        render_wait = time.monotonic() - _t2
        if _rsteps is not _steps:
            _steps.update(_rsteps)
        ns0 = int(obs_r.get["ns"] or 0)

        # driver-side rows: z0, internal-cell stats, empty children
        self._write_local_parquet(pd.DataFrame({
            "x": pd.Series([0], dtype="int32"),
            "y": pd.Series([0], dtype="int32"),
            "num_features": pd.Series([r0["num_features"]],
                                      dtype="int64"),
            "num_points": pd.Series([r0["num_points"]], dtype="int64"),
            "num_simplified": pd.Series([ns0], dtype="int64"),
            "minx": pd.Series([r0["minx"]], dtype="float64"),
            "miny": pd.Series([r0["miny"]], dtype="float64"),
            "maxx": pd.Series([r0["maxx"]], dtype="float64"),
            "maxy": pd.Series([r0["maxy"]], dtype="float64"),
            "is_split": pd.Series([True], dtype="bool"),
            "has_source": pd.Series([False], dtype="bool"),
            "tile_id": pd.Series([to_id(0, 0, 0)], dtype="int64"),
        }), self._p("tiles", "z=0"))
        merged: dict = {}
        for r in int_box.get("acks", []):
            key = (int(r["z"]), int(r["x"]), int(r["y"]))
            cur = merged.get(key)
            if cur is None:
                merged[key] = [int(r["n_feats"]), int(r["n_points"]),
                               int(r["n_sim"]), float(r["minx"]),
                               float(r["miny"]), float(r["maxx"]),
                               float(r["maxy"])]
            else:
                cur[0] += int(r["n_feats"])
                cur[1] += int(r["n_points"])
                cur[2] += int(r["n_sim"])
                cur[3] = min(cur[3], float(r["minx"]))
                cur[4] = min(cur[4], float(r["miny"]))
                cur[5] = max(cur[5], float(r["maxx"]))
                cur[6] = max(cur[6], float(r["maxy"]))
        # one tiles/z=N write per level: internal-cell stats rows plus
        # empty-children sentinels (a second _write_local_parquet to
        # the same level would overwrite the first).  Straggler STOP
        # cells are leaf tiles: is_split=False, has_source=True; a
        # stop cell with no ack clipped empty everywhere and joins the
        # sentinel back-fill.
        stop_set = {tuple(c) for c in int_box.get("stops", [])}
        # BLIND leaves (children of a _FOREST_MAX_LEVEL internal, no
        # gate mass info) that received no candidate rows produce no
        # wave group and no subtree part: back-fill their sentinel
        # rows from the missing acks, same as gate-proven empties
        acked = {(int(r["z"]), int(r["x"]), int(r["y"]))
                 for r in leaf_acks}
        all_empties = (list(empties) + list(int_box.get("extra_empties",
                                                        []))
                       + [c for c in stop_set if c not in merged]
                       + [tuple(c) for c in leaves
                          if tuple(c) not in acked])
        by_level: dict = {}
        for (z, x, y), st in merged.items():
            is_stop = (z, x, y) in stop_set
            by_level.setdefault(z, []).append(
                (x, y, st + [not is_stop, is_stop]))
        for z, x, y in all_empties:
            by_level.setdefault(z, []).append(
                (x, y, [0, 0, 0, 2.0, 1.0, -1.0, 0.0, False, True]))
        for z, rows in sorted(by_level.items()):
            rows.sort(key=lambda t: (t[0], t[1]))
            self._write_local_parquet(pd.DataFrame({
                "x": pd.Series([t[0] for t in rows], dtype="int32"),
                "y": pd.Series([t[1] for t in rows], dtype="int32"),
                "num_features": pd.Series([t[2][0] for t in rows],
                                          dtype="int64"),
                "num_points": pd.Series([t[2][1] for t in rows],
                                        dtype="int64"),
                "num_simplified": pd.Series([t[2][2] for t in rows],
                                            dtype="int64"),
                "minx": pd.Series([t[2][3] for t in rows],
                                  dtype="float64"),
                "miny": pd.Series([t[2][4] for t in rows],
                                  dtype="float64"),
                "maxx": pd.Series([t[2][5] for t in rows],
                                  dtype="float64"),
                "maxy": pd.Series([t[2][6] for t in rows],
                                  dtype="float64"),
                "is_split": pd.Series([t[2][7] for t in rows],
                                      dtype="bool"),
                "has_source": pd.Series([t[2][8] for t in rows],
                                        dtype="bool"),
                "tile_id": pd.Series([to_id(z, t[0], t[1])
                                      for t in rows], dtype="int64"),
            }), self._p("tiles", f"z={z}"))
        for z in sorted({l for l, _, _ in int_box["internals"]}
                        | {c[0] for c in stop_set if c in merged}):
            os.makedirs(self._p("tilefeat", f"z={z}"), exist_ok=True)
            open(os.path.join(self._p("tilefeat", f"z={z}"),
                              "_SUCCESS"), "w").close()
        for z in sorted({c[0] for c in stop_set if c in merged}):
            os.makedirs(self._p("sources", f"z={z}"), exist_ok=True)
            open(os.path.join(self._p("sources", f"z={z}"),
                              "_SUCCESS"), "w").close()

        # lineage lands LAST (resume contract: no lineage → clean
        # rebuild from the features checkpoint)
        max_z = max([l for l, _, _ in leaves]
                    + [c[0] for c in stop_set] or [1])
        self._append_lineage({
            "zoom": 0, "n_tiles": 1, "n_split": 1,
            "n_points": int(r0["num_points"]), "heavy": [],
            "handoff": [], "forest": True,
            "wall_sec": time.monotonic() - t0,
            "steps": {"render_wait": round(render_wait, 2)},
            "complete": True, "final": False})
        self._append_lineage({
            "subtree_batch": 1, "n_keys": len(leaves), "forest": True,
            "wall_sec": round(wave_sec, 2),
            "steps": {
                "n_leaves": len(leaves), "n_internal": len(internals),
                "n_empty": len(empties),
                "n_slots": getattr(self, "_forest_slot_bins", None),
                "gate": getattr(self, "_forest_gate_sec", None),
                "vprobe": getattr(self, "_forest_vprobe_sec", None),
                **_steps,
                "task_secs_sum": round(sum(
                    r["secs"] for r in leaf_acks), 2),
                "task_secs_max": round(max(
                    (r["secs"] for r in leaf_acks), default=0.0), 2)}})
        # the final row records the leaf cut keys so _ensure_subtrees
        # can re-create a lost subtree store for a completed forest
        # build (one-wave rows already do the analogous re-run)
        self._append_lineage({
            "zoom": max_z, "n_tiles": len(leaves) + len(internals),
            "heavy": [], "handoff": [list(c) for c in leaves],
            "forest": True,
            "wall_sec": time.monotonic() - t0,
            "complete": True, "final": True})

    def build(self, features_df: DataFrame | None, resume: bool = False,
              z0_stats: list[dict] | None = None,
              cached_features: DataFrame | None = None) -> None:
        """First-pass pyramid (cz == null path of splitTile).

        features_df: FEATURE_SCHEMA rows, already converted + wrapped —
        or None, meaning the z0 frontier is the features checkpoint
        served as a view (no-wrap fast path of build_from_converted).
        With resume=True, restarts after the last zoom whose lineage row
        is complete, reusing the checkpointed frontier.
        """
        opts = self.options
        spark = self.spark
        par = spark.sparkContext.defaultParallelism
        pool = ThreadPoolExecutor(max_workers=12)
        futures: list = []

        start_z = 0
        heavy_prev: list | None = None
        if resume:
            done = [r for r in self._read_lineage() if r.get("complete")]
            if done:
                self._ensure_subtrees(done, pool, futures)
                last = max(r["zoom"] for r in done)
                last_row = [r for r in done if r["zoom"] == last][-1]
                if last_row.get("final"):
                    for f in futures:
                        f.result()
                    pool.shutdown()
                    return  # build already finished
                start_z = last + 1
                heavy_prev = [tuple(k) for k in last_row.get("heavy", [])]
            else:
                # Nothing durable is recorded yet (a kill landed before
                # the first complete lineage row), so the restart is a
                # fresh build in every way that matters — but a killed
                # forest/one-wave attempt may have left task-side store
                # parts (subtree b=1, tilefeat z=N are written by TASKS,
                # not a committed job) that the root-level readers would
                # union as phantom tiles if the rebuild's handoff/render
                # levels don't coincide.  Run the fresh-build cleanup,
                # including any non-complete lineage rows (subtree_batch
                # acks) and the snapshot manifests that rode them.
                import shutil
                for store in ("tiles", "tilefeat", "frontier", "sources",
                              "subtree"):
                    p = self._p(store)
                    if os.path.isdir(p):
                        shutil.rmtree(p)
                if os.path.exists(self._lineage_path()):
                    os.remove(self._lineage_path())
                if os.path.isdir(self._snap_dir()):
                    shutil.rmtree(self._snap_dir())
                if os.path.exists(self._version_path()):
                    os.remove(self._version_path())
        if not resume and os.path.exists(self._lineage_path()):
            os.remove(self._lineage_path())
        if not resume:
            # a fresh build starts a fresh snapshot history
            import shutil
            if os.path.isdir(self._snap_dir()):
                shutil.rmtree(self._snap_dir())
            if os.path.exists(self._version_path()):
                os.remove(self._version_path())
            # stale stores from a previous build in the same workdir
            # must not survive: each write is overwrite-mode, but a
            # build of different depth or handoff shape leaves
            # differently-NAMED zoom/batch dirs behind, and the
            # root-level readers (tiles(), _subtree_df) union whatever
            # is on disk
            for store in ("tiles", "tilefeat", "frontier", "sources",
                          "subtree"):
                p = self._p(store)
                if os.path.isdir(p):
                    shutil.rmtree(p)

        if (start_z == 0 and features_df is None and z0_stats
                and self._one_wave_eligible(z0_stats[0]["num_points"])):
            try:
                self._build_one_wave(z0_stats[0], pool, futures,
                                     cached=cached_features)
            finally:
                for f in futures:
                    f.result()
                pool.shutdown()
                self._stats_cache = None
                self._sub_meta_cache.clear()
                self._source_rows_cache.clear()
                self._df_cache.clear()
            return

        if (start_z == 0 and features_df is None
                and cached_features is None and z0_stats
                and self._forest_eligible(z0_stats[0]["num_points"])):
            # gate job decides for real: bounded-cut or fall through
            # to the per-zoom loop
            _tg = time.monotonic()
            _fr0 = self._read_frontier(0)
            # the z0 render depends only on the frontier, not the cut:
            # start it BEFORE the gate + vertex-probe jobs so their
            # serial prefix (the only driver-side decision point the
            # forest has) overlaps the heaviest single render — FAIR
            # pools share the fleet between them
            from pyspark.sql import Observation
            _obs_r = Observation()
            _rsteps: dict = {}

            def _z0_render_job():
                self._set_pool("gvt-render")
                _t = time.monotonic()
                (rendered_features_df(_fr0, opts).drop("z")
                 .observe(_obs_r, F.sum("n_simplified").alias("ns"))
                 .write.mode("overwrite")
                 .parquet(self._p("tilefeat", "z=0")))
                _rsteps["render0"] = round(time.monotonic() - _t, 2)

            _fut_render = pool.submit(_z0_render_job)
            plan = self._forest_cut(forest_gate_df(
                _fr0, opts, self._FOREST_MAX_LEVEL).collect(),
                fr0=_fr0)
            self._forest_gate_sec = round(time.monotonic() - _tg, 2)
            if plan is None:
                # defensive: the cut always returns a plan today, but a
                # fall-through to the loop must not race the already-
                # started z0 render
                _fut_render.result()
            if plan is not None:
                try:
                    self._build_forest(z0_stats[0], pool, futures,
                                       plan, render=(_fut_render,
                                                     _obs_r, _rsteps))
                finally:
                    for f in futures:
                        f.result()
                    pool.shutdown()
                    self._stats_cache = None
                    self._sub_meta_cache.clear()
                    self._source_rows_cache.clear()
                    self._df_cache.clear()
                return

        n_verts = (F.size("coords") / 3).cast("long").alias("n_verts")
        if start_z == 0:
            if features_df is not None:
                frontier = (features_df
                            .withColumn("z", F.lit(0))
                            .withColumn("x", F.lit(0))
                            .withColumn("y", F.lit(0))
                            .select(*TILED_COLUMNS, n_verts))
                frontier.write.mode("overwrite").parquet(
                    self._p("frontier", "z=0"))
            else:
                # view mode: clear any stale materialized z0 frontier so
                # _read_frontier(0) serves the features-checkpoint view
                import shutil
                p0 = self._p("frontier", "z=0")
                if os.path.isdir(p0):
                    shutil.rmtree(p0)

        def _child_obs_metrics(children):
            """Per-child conditional aggregates: the next zoom's
            classification stats, observed during the split job itself
            (used only while the child set is small — the blocking
            stats agg disappears for the low zooms where it is pure
            round latency)."""
            metrics = []
            for (cx, cy) in children:
                cond = (F.col("x") == cx) & (F.col("y") == cy)
                p = f"c{cx}_{cy}"
                metrics += [
                    F.sum(F.when(cond, 1).otherwise(0)).alias(f"{p}_nf"),
                    F.sum(F.when(cond, F.col("n_verts"))).alias(f"{p}_np"),
                    F.min(F.when(cond, F.col("minx"))).alias(f"{p}_minx"),
                    F.min(F.when(cond, F.col("miny"))).alias(f"{p}_miny"),
                    F.max(F.when(cond, F.col("maxx"))).alias(f"{p}_maxx"),
                    F.max(F.when(cond, F.col("maxy"))).alias(f"{p}_maxy"),
                ]
            return metrics

        _OBS_MAX_CHILDREN = 16

        z = start_z
        prev_points = 0
        prev_finalize = None
        split_obs = None  # (Observation, child_keys) from the last split
        split_direct = None  # ack-aggregated stats from a direct split
        while True:
            t0 = time.monotonic()
            frontier = self._read_frontier(z)
            if heavy_prev is not None:
                # the previous split ran optimistically over every tile;
                # only children of HEAVY splits belong to this zoom's
                # distributed frontier (light subtrees + leaf sources
                # were handled from the z-1 frontier)
                parents = [_pack_xy(x, y) for x, y in heavy_prev]
                pcol = (F.shiftleft(F.shiftright(F.col("x"), 1)
                                    .cast("long"), 25)
                        + F.shiftright(F.col("y"), 1).cast("long"))
                frontier = frontier.where(pcol.isin(parents))

            # CLASSIFY-THEN-SPLIT: from round 4 on, every z≥1 round
            # defers the split until the stop rules ran — stats come
            # from the previous split's observed metrics or a
            # driver-side pyarrow scan of the frontier parquet (both
            # sub-second off-fleet reads), so classification no longer
            # costs a fleet round trip and splitting the whole frontier
            # optimistically is pure dead work: light/leaf tiles'
            # children were written to frontier z+1 but never read
            # (their subtrees rebuild the same clip inside the handoff
            # wave).  Deferring also shrinks the frontier store to
            # HEAVY children only — smaller writes, smaller scans.
            # The z0 round keeps the concurrent split: its stats are
            # precomputed and the root is heavy by construction.
            fut_split = None
            split_group = None
            defer_split = heavy_prev is not None
            next_obs = None
            next_direct = None
            if z < opts.index_max_zoom and not defer_split:
                n_parts = max(par, min(
                    4096,
                    prev_points // self.target_points_per_partition + 1))
                split_group = f"gvt-split-z{z + 1}"
                split_flag = {"cancelled": False}
                cur_keys = ([(0, 0)] if heavy_prev is None else
                            [(2 * px + dx, 2 * py + dy)
                             for px, py in heavy_prev
                             for dx in (0, 1) for dy in (0, 1)])
                obs = children = None
                if 4 * len(cur_keys) <= _OBS_MAX_CHILDREN:
                    from pyspark.sql import Observation
                    children = [(2 * cx + dx, 2 * cy + dy)
                                for cx, cy in cur_keys
                                for dx in (0, 1) for dy in (0, 1)]
                    obs = Observation()
                    next_obs = (obs, children)

                def split_job(fr=frontier, z=z, n=n_parts, grp=split_group,
                              flag=split_flag, obs=obs, children=children):
                    if flag["cancelled"]:
                        return
                    self._set_pool("gvt-split")
                    spark.sparkContext.setLocalProperty(
                        "spark.jobGroup.id", grp)
                    try:
                        out = split_children_df(fr, z, opts).select(
                            "*", n_verts)
                        if obs is not None:
                            out = out.observe(
                                obs, *_child_obs_metrics(children))
                        (out.repartition(n).write.mode("overwrite")
                         .parquet(self._p("frontier", f"z={z+1}")))
                    finally:
                        spark.sparkContext.setLocalProperty(
                            "spark.jobGroup.id", None)

                fut_split = pool.submit(split_job)

            # render per-feature tile output rows (tolerance filter,
            # rewind, integer transform, JSON) as a NARROW map — no
            # shuffle, no per-tile string concat: a z0 tile holding the
            # whole corpus stays distributed across its input partitions
            # (the per-tile features_json is materialized lazily on read;
            # a single 100MB tile string would serialize one reduce task)
            tilefeat_path = self._p("tilefeat", f"z={z}")

            # direct per-file render when the frontier is a local
            # parquet dir (pipeline.render_files_direct): pyarrow
            # read/render/write task-side, nsim sums back as acks —
            # removes the JVM decode, both Arrow pipe crossings, the
            # JVM writer, AND the finalizer's re-scan groupBy job
            render_in = seed0 = None
            if os.environ.get("GVT_DIRECT_RENDER", "1") != "0":
                fz = self._p("frontier", f"z={z}")
                feat = self._p("features")
                if _has_parquet(fz):
                    render_in, seed0 = fz, False
                elif z == 0 and _has_parquet(feat):
                    render_in, seed0 = feat, True
            ns_box: dict = {}

            def render_job(fr=frontier, p=tilefeat_path, z=z,
                           render_in=render_in, seed0=seed0,
                           parents=heavy_prev, ns_box=ns_box):
                self._set_pool("gvt-render")
                if render_in is not None:
                    ns_box["nsim"] = render_files_direct(
                        self.spark, z, parents, opts, render_in, p,
                        z0_seed=seed0)
                else:
                    (rendered_features_df(fr, opts).drop("z")
                     .write.mode("overwrite").parquet(p))

            fut_tilefeat = pool.submit(render_job)

            # classification stats come straight from the frontier with
            # a pure-SQL agg (num_points counts every vertex incl. rings
            # dropped later, tile.js:89 — exactly sum(size(coords)/3)),
            # so the stop rules never wait for the render job
            # n_verts was precomputed at frontier-write time, so this
            # agg scans only slim integer/double columns.  z0 stats may
            # arrive precomputed (observed during the features write)
            if z == 0 and z0_stats is not None:
                stats = z0_stats
            elif split_direct is not None:
                # this zoom's stats came back as direct-split acks —
                # heavy-only by construction, no re-scan, no filter
                stats = split_direct
            elif split_obs is not None:
                # this zoom's stats were observed during the split job
                # that produced its frontier; restrict to children of
                # heavy parents (the same filter the frontier read uses)
                got = split_obs[0].get
                hp = set(heavy_prev or [])
                stats = []
                for (cx, cy) in split_obs[1]:
                    if (cx >> 1, cy >> 1) not in hp:
                        continue
                    nf = got.get(f"c{cx}_{cy}_nf")
                    if not nf:
                        continue
                    p = f"c{cx}_{cy}"
                    stats.append({
                        "x": cx, "y": cy, "num_features": int(nf),
                        "num_points": int(got[f"{p}_np"] or 0),
                        "minx": float(got[f"{p}_minx"]),
                        "miny": float(got[f"{p}_miny"]),
                        "maxx": float(got[f"{p}_maxx"]),
                        "maxy": float(got[f"{p}_maxy"])})
            else:
                # classification stats come off-fleet: a driver-side
                # pyarrow scan of the just-written frontier parquet's
                # SLIM columns (x, y, n_verts, bbox — the geometry
                # arrays are never touched).  The round-4 profile
                # measured the equivalent Spark agg at 5-7 s per zoom,
                # all of it slot-wait behind multi-second subtree
                # tasks under FAIR — pure critical-path latency the
                # executors cannot give back.  Falls back to the Spark
                # agg if the frontier is not a local parquet dir.
                stats = self._stats_via_pyarrow(z, heavy_prev)
                if stats is None:
                    stats = (frontier
                             .groupBy("x", "y")
                             .agg(F.count(F.lit(1)).alias("num_features"),
                                  F.sum("n_verts").alias("num_points"),
                                  F.min("minx").alias("minx"),
                                  F.min("miny").alias("miny"),
                                  F.max("maxx").alias("maxx"),
                                  F.max("maxy").alias("maxy"))
                             .collect())
            _tm = {"stats": time.monotonic() - t0}
            present = {(r["x"], r["y"]) for r in stats}
            n_points = sum(r["num_points"] for r in stats)
            splits = [(r["x"], r["y"], r["num_points"])
                      for r in stats
                      if not (z == opts.index_max_zoom or
                              r["num_points"] <= opts.index_max_points)]
            threshold = self._subtree_threshold(z, n_points)
            if splits:
                # only chase outliers whose subtree task would exceed
                # ~1.5s of kernel time — splitting smaller ones costs
                # more in extra sync rounds than the straggler saves
                mean_sp = sum(p for *_, p in splits) / len(splits)
                lv = max(1, opts.index_max_zoom - z)
                threshold = min(threshold,
                                max(500_000 // lv,
                                    self._SKEW_FACTOR * mean_sp))
            light = [(x, y) for x, y, np_ in splits if np_ <= threshold]
            heavy = [(x, y) for x, y, np_ in splits if np_ > threshold]
            heavy_points = sum(np_ for _, _, np_ in splits if np_ > threshold)
            if z == opts.index_max_zoom - 1 and heavy and light:
                # final-level rule: when any tile stays heavy, the
                # z+1 round happens regardless — and that round's
                # render/stats/sources are all NARROW distributed maps
                # that absorb max-zoom leaves at fleet parallelism.
                # Handing off the light splits would only convert
                # their children into single-task wave stragglers (the
                # densest metro leaf gated the 2M/4M grid builds for
                # 20-60 s of near-idle fleet), so route everything
                # through the final distributed round instead.
                heavy = [(x, y) for x, y, _ in splits]
                light = []
                heavy_points = sum(np_ for _, _, np_ in splits)

            # all 4 children of every split tile at z-1 exist as tiles,
            # even empty ones (index.js:151-154 pushes `tl || []`);
            # children of light splits come from their subtree batch.
            # The tiles table itself is tiny (stats only) and is written
            # straight from the driver rows — no extra Spark jobs
            missing = []
            if z > 0 and heavy_prev:
                missing = [(cx, cy)
                           for px, py in heavy_prev
                           for cx in (2 * px, 2 * px + 1)
                           for cy in (2 * py, 2 * py + 1)
                           if (cx, cy) not in present]
            n_empty = len(missing)

            # leaf tiles retain their source features for drill-down;
            # positive key filter — the frontier file also holds children
            # of light/leaf tiles from the optimistic split, which belong
            # to no tile at this zoom
            split_set = {(x, y) for x, y, _ in splits}
            leaf_packed = [_pack_xy(x, y) for (x, y) in present
                           if (x, y) not in split_set]
            leaf_keys = [(x, y) for (x, y) in present
                         if (x, y) not in split_set]
            fut_sources = None
            if leaf_keys:
                def sources_job(z=z, lp=list(leaf_packed), lk=leaf_keys):
                    self._set_pool("gvt-sources")
                    (self._read_frontier(z).where(
                        F.col("x").isin([int(x) for x, _ in lk]) &
                        F.col("y").isin([int(y) for _, y in lk]) &
                        _pack_col().isin(lp))
                     .drop("z").write.mode("overwrite")
                     .parquet(self._p("sources", f"z={z}")))
                fut_sources = pool.submit(sources_job)

            self._submit_subtree(pool, futures, z, light)
            final = not heavy

            # everything below only FINALIZES this zoom (nsim sums,
            # stats parquet, lineage row); the loop's forward progress
            # needs none of it, so it runs async — the lineage row lands
            # only after the zoom's stores are durable, which is exactly
            # the resume contract (a kill before that re-runs the zoom)
            def finalize(z=z, stats=stats, missing=missing, splits=splits,
                         heavy=heavy, light=light, n_points=n_points,
                         n_empty=n_empty, fut_tilefeat=fut_tilefeat,
                         fut_sources=fut_sources, final=final,
                         tilefeat_path=tilefeat_path, _tm=_tm, t0=t0,
                         ns_box=ns_box, prev_fin=prev_finalize):
                import pandas as pd
                self._set_pool("gvt-finalize")
                _t = time.monotonic()
                fut_tilefeat.result()
                _tm["assemble_wait"] = time.monotonic() - _t
                if "nsim" in ns_box:  # direct render returned the sums
                    nsim = ns_box["nsim"]
                else:
                    nsim = {(r["x"], r["y"]): r["ns"] for r in
                            (spark.read.parquet(tilefeat_path)
                             .groupBy("x", "y")
                             .agg(F.sum("n_simplified").alias("ns"))
                             .collect())}
                _t = time.monotonic()
                split_lookup = {(x, y) for x, y, _ in splits}
                tiles_pdf = pd.DataFrame({
                    "x": pd.Series([r["x"] for r in stats]
                                   + [c[0] for c in missing], dtype="int32"),
                    "y": pd.Series([r["y"] for r in stats]
                                   + [c[1] for c in missing], dtype="int32"),
                    "num_features": pd.Series(
                        [r["num_features"] for r in stats] + [0] * n_empty,
                        dtype="int64"),
                    "num_points": pd.Series(
                        [r["num_points"] for r in stats] + [0] * n_empty,
                        dtype="int64"),
                    "num_simplified": pd.Series(
                        [nsim.get((r["x"], r["y"]), 0) for r in stats]
                        + [0] * n_empty, dtype="int64"),
                    "minx": pd.Series([r["minx"] for r in stats]
                                      + [2.0] * n_empty, dtype="float64"),
                    "miny": pd.Series([r["miny"] for r in stats]
                                      + [1.0] * n_empty, dtype="float64"),
                    "maxx": pd.Series([r["maxx"] for r in stats]
                                      + [-1.0] * n_empty, dtype="float64"),
                    "maxy": pd.Series([r["maxy"] for r in stats]
                                      + [0.0] * n_empty, dtype="float64"),
                    "is_split": pd.Series(
                        [(r["x"], r["y"]) in split_lookup for r in stats]
                        + [False] * n_empty, dtype="bool"),
                    "has_source": pd.Series(
                        [(r["x"], r["y"]) not in split_lookup for r in stats]
                        + [True] * n_empty, dtype="bool"),
                    "tile_id": pd.Series(
                        [to_id(z, r["x"], r["y"]) for r in stats]
                        + [to_id(z, cx, cy) for cx, cy in missing],
                        dtype="int64"),
                })
                # tiny, driver-local — pyarrow write, no Spark job (a
                # tiny job queues behind the big concurrent stages and
                # was measured costing seconds of pure scheduler wait)
                self._write_local_parquet(tiles_pdf,
                                          self._p("tiles", f"z={z}"))
                _tm["tiles_write"] = time.monotonic() - _t
                if fut_sources is not None:
                    fut_sources.result()
                # lineage rows must land in zoom order: "complete up to
                # z" has to imply every store below z is durable.  The
                # pool is FIFO, so the previous finalize has started
                # (or finished) by the time this one runs — no deadlock.
                if prev_fin is not None:
                    prev_fin.result()
                self._append_lineage({
                    "zoom": z, "n_tiles": len(stats) + n_empty,
                    "n_split": len(splits), "n_points": n_points,
                    "heavy": [list(k) for k in heavy],
                    "handoff": [list(k) for k in light],
                    "wall_sec": time.monotonic() - t0,
                    "steps": {k: round(v, 2) for k, v in _tm.items()},
                    "complete": True, "final": final,
                })

            prev_finalize = pool.submit(finalize)
            futures.append(prev_finalize)

            _t = time.monotonic()
            if fut_split is not None:
                if final:
                    # the optimistic z+1 split is dead work on the last
                    # round — cancel it so the subtree batches and the
                    # finalizers get the executors
                    split_flag["cancelled"] = True
                    spark.sparkContext.cancelJobGroup(split_group)
                    try:
                        fut_split.result()
                    except Exception:
                        pass
                else:
                    fut_split.result()
                    _tm["split_wait"] = time.monotonic() - _t
            elif not final and z < opts.index_max_zoom:
                # deferred split: the heavy set is known, so clip only
                # the heavy parents' rows — light/leaf children come
                # from the subtree batches and are never read
                self._set_pool("gvt-split")
                in_dir = self._p("frontier", f"z={z}")
                if (os.environ.get("GVT_DIRECT_SPLIT", "1") != "0"
                        and os.path.isdir(in_dir)):
                    # direct path: one task per frontier file, pyarrow
                    # read/clip/write task-side, slim acks back — the
                    # geometry never crosses the JVM and the acks ARE
                    # the next round's classification stats (see
                    # pipeline.split_files_direct; grid-measured in
                    # BENCH/SCALING.md round 4)
                    # size output shards so file count (= next
                    # round's task parallelism) tracks data volume:
                    # ~2 files per core, never ballooning as rows
                    # shrink (clip adds ~10% boundary duplicates)
                    hset = set(map(tuple, heavy))
                    heavy_nf = sum(r["num_features"] for r in stats
                                   if (r["x"], r["y"]) in hset)
                    sr = max(4096, int(heavy_nf * 1.1) // (2 * par) + 1)
                    direct_stats, acks = split_files_direct(
                        spark, z, heavy, opts, in_dir,
                        self._p("frontier", f"z={z+1}"), shard_rows=sr)
                    next_direct = direct_stats
                    _tm["split_sync"] = time.monotonic() - _t
                    tasks = sorted(
                        ((round(float(a["secs"]), 2), int(a["rows_in"]),
                          int(a["rows_out"])) for a in acks),
                        reverse=True)
                    self._append_lineage({
                        "split_for": z + 1, "n_heavy": len(heavy),
                        "heavy_points": heavy_points, "mode": "direct",
                        "n_files": len(acks),
                        "top_tasks": [list(t) for t in tasks[:5]],
                        "wall_sec": round(_tm["split_sync"], 2)})
                else:
                    hp = [_pack_xy(x, y) for x, y in heavy]
                    fr_heavy = frontier.where(
                        F.col("x").isin([int(x) for x, _ in heavy]) &
                        F.col("y").isin([int(y) for _, y in heavy]) &
                        _pack_col().isin(hp))
                    n_parts = max(par, min(
                        4096,
                        heavy_points // self.target_points_per_partition
                        + 1))
                    out = split_children_df(fr_heavy, z, opts).select(
                        "*", n_verts)
                    if 4 * len(heavy) <= _OBS_MAX_CHILDREN:
                        from pyspark.sql import Observation
                        children = [(2 * hx + dx, 2 * hy + dy)
                                    for hx, hy in heavy
                                    for dx in (0, 1) for dy in (0, 1)]
                        dobs = Observation()
                        out = out.observe(dobs,
                                          *_child_obs_metrics(children))
                        next_obs = (dobs, children)
                    if os.environ.get("GVT_NO_REPART", "0") != "1":
                        out = out.repartition(n_parts)
                    (out.write.mode("overwrite")
                     .parquet(self._p("frontier", f"z={z+1}")))
                    _tm["split_sync"] = time.monotonic() - _t
                    # the zoom row itself is finalized asynchronously
                    # and usually lands before this point — record the
                    # round cadence gate as its own (resume-inert)
                    # lineage row
                    self._append_lineage({
                        "split_for": z + 1, "n_heavy": len(heavy),
                        "heavy_points": heavy_points,
                        "wall_sec": round(_tm["split_sync"], 2)})
            split_obs = next_obs if not final else None
            split_direct = next_direct if not final else None
            prev_points = heavy_points
            if final:
                break
            heavy_prev = heavy
            z += 1

        for f in futures:
            f.result()
        pool.shutdown()
        self._stats_cache = None
        self._sub_meta_cache.clear()
        self._source_rows_cache.clear()
        self._df_cache.clear()

    # ------------------------------------------------------------ read side

    def _stats(self) -> dict:
        """(z,x,y) → {has_source, bbox} for DISTRIBUTED-zoom tiles only.

        The per-zoom stats parquet holds O(driver-loop frontier) rows —
        it does not grow with the 4^z subtree output, so caching it is
        driver-safe at any pyramid depth.  Subtree tiles are served by
        ``_subtree_meta`` keyed lookups instead of being collected."""
        if self._stats_cache is None:
            cache = {}
            if self._read_lineage() and os.path.isdir(self._p("tiles")):
                for r in (self.spark.read.parquet(self._p("tiles"))
                          .select("z", "x", "y", "has_source",
                                  "minx", "miny", "maxx", "maxy").collect()):
                    cache[(r["z"], r["x"], r["y"])] = {
                        "has_source": r["has_source"],
                        "bbox": (r["minx"], r["miny"],
                                 r["maxx"], r["maxy"])}
            self._stats_cache = cache
        return self._stats_cache

    def _subtree_meta(self, z, x, y) -> dict | None:
        """has_source/bbox of one subtree-built tile via a keyed
        (predicate-pushdown) parquet lookup, memoized per request —
        driver memory stays O(tiles actually asked about)."""
        key = (z, x, y)
        if key in self._sub_meta_cache:
            return self._sub_meta_cache[key]
        meta = None
        sub = self._subtree_df()
        if sub is not None:
            rows = (sub.where((F.col("kind") == "tile") &
                              (F.col("z") == z) & (F.col("x") == x) &
                              (F.col("y") == y))
                    .select("has_source", "minx", "miny", "maxx", "maxy")
                    .collect())
            if rows:
                r = rows[0]
                meta = {"has_source": r["has_source"],
                        "bbox": (r["minx"], r["miny"],
                                 r["maxx"], r["maxy"])}
        self._sub_meta_cache[key] = meta
        return meta

    def _tile_meta(self, z, x, y) -> dict | None:
        st = self._stats().get((z, x, y))
        return st if st is not None else self._subtree_meta(z, x, y)

    def warm(self) -> None:
        """Open the tile stores for serving: load the (bounded) stats
        cache and run parquet listing/schema discovery once, so each
        subsequent get_tile is a single pruned read and an all-hit
        get_tiles batch is at most two jobs."""
        self._stats()
        self._tilefeat_df()
        self._subtree_df()

    def _subtree_df(self) -> DataFrame | None:
        if "subtree" not in self._df_cache:
            path = self._p("subtree")
            self._df_cache["subtree"] = (
                self.spark.read.parquet(path) if os.path.isdir(path)
                else None)
        return self._df_cache["subtree"]

    def _tilefeat_df(self) -> DataFrame | None:
        """Root read of the per-feature tile store — the z partition
        column comes from directory discovery, so zoom filters prune."""
        if "tilefeat" not in self._df_cache:
            path = self._p("tilefeat")
            self._df_cache["tilefeat"] = (
                self.spark.read.parquet(path) if os.path.isdir(path)
                else None)
        return self._df_cache["tilefeat"]

    def tiles(self) -> DataFrame:
        base = (self.spark.read.parquet(self._p("tiles"))
                .select(*TILE_COLUMNS))
        sub = self._subtree_df()
        if sub is not None:
            base = base.unionByName(
                sub.where(F.col("kind") == "tile").select(*TILE_COLUMNS))
        return base

    def tile_count(self) -> int:
        """Exact generated-tile count without a Spark job: parquet
        footers for the stats stores plus one slim driver-side 'kind'
        column read over the subtree parts.  The reference's
        equivalent is ``tileCoords.length`` — an in-memory array
        length — so serving the count from store metadata is the
        parity-faithful shape; pinned equal to ``tiles().count()`` by
        tests on every build path."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        total = 0
        troot = self._p("tiles")
        if os.path.isdir(troot):
            for zdir in os.listdir(troot):
                zp = os.path.join(troot, zdir)
                if not (zdir.startswith("z=") and os.path.isdir(zp)):
                    continue
                for f in os.listdir(zp):
                    if f.endswith(".parquet"):
                        total += pq.ParquetFile(
                            os.path.join(zp, f)).metadata.num_rows
        sroot = self._p("subtree")
        if os.path.isdir(sroot):
            for bdir in os.listdir(sroot):
                bp = os.path.join(sroot, bdir)
                if not (bdir.startswith("b=") and os.path.isdir(bp)):
                    continue
                for f in os.listdir(bp):
                    if f.endswith(".parquet"):
                        kinds = pq.read_table(
                            os.path.join(bp, f),
                            columns=["kind"]).column("kind")
                        total += int(pc.sum(pc.equal(
                            kinds, "tile").cast("int64")).as_py() or 0)
        return total

    _TILEFEAT_COLS = ["ord_path", "gtype", "coords", "rlens",
                      "tags_json", "fid_json"]
    _PACK_COLS = ["ftypes", "fnrings", "frlens", "fcoords",
                  "ftags", "ffids"]

    def _assemble_features(self, rows) -> list:
        """Materialize per-feature rows (packed integer geometry) into
        the tile's features list, ordered by ord_path.  JSON/object
        rendering happens here at read time — the build stores arrays."""
        from .kernel.vec import feature_obj
        rows = sorted(rows, key=lambda r: tuple(r["ord_path"]))
        return [feature_obj(int(r["gtype"]), r["coords"], r["rlens"],
                            r["tags_json"], r["fid_json"])
                for r in rows if r["gtype"]]

    @staticmethod
    def _unpack_tile_features(r) -> list:
        """Subtree tile row → features list (same packed encoding,
        whole tile in one row)."""
        from .kernel.vec import feature_obj
        out = []
        ri = ci = 0
        frlens = r["frlens"]
        fcoords = r["fcoords"]
        for i, t in enumerate(r["ftypes"]):
            nr = int(r["fnrings"][i])
            rl = frlens[ri:ri + nr]
            ri += nr
            c2 = 2 * int(sum(rl))
            fc = fcoords[ci:ci + c2]
            ci += c2
            out.append(feature_obj(int(t), fc, rl,
                                   r["ftags"][i], r["ffids"][i]))
        return out

    def enumerate_tiles(self) -> dict[str, list]:
        """genTiles equivalent (/root/reference/test/test-full.js:49-64):
        every generated tile's transformed features keyed z{z}-{x}-{y}.

        Small-scale/test path: collects every tile.  Distributed tiles
        materialize their features from the rendered per-feature store."""
        out = {}
        if not self._read_lineage():
            return out
        for row in self.tiles().select("z", "x", "y").collect():
            out[f"z{row['z']}-{row['x']}-{row['y']}"] = []
        grouped: dict[str, list] = {}
        tf = self._tilefeat_df()
        if tf is not None:
            for r in (tf
                      .select("z", "x", "y", *self._TILEFEAT_COLS)
                      .collect()):
                grouped.setdefault(
                    f"z{r['z']}-{r['x']}-{r['y']}", []).append(r)
        for key, rows in grouped.items():
            out[key] = self._assemble_features(rows)
        sub = self._subtree_df()
        if sub is not None:
            for r in (sub.where(F.col("kind") == "tile")
                      .select("z", "x", "y", *self._PACK_COLS).collect()):
                out[f"z{r['z']}-{r['x']}-{r['y']}"] = \
                    self._unpack_tile_features(r)
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
        if (z, x, y) in self._stats():
            # distributed-zoom tile: zero-job existence, one pruned read
            # (the subtree root is never re-emitted there, so dist-first
            # order can't shadow anything)
            tf = self._tilefeat_df()
            rows = []
            if tf is not None:
                rows = (tf.where((F.col("z") == z) & (F.col("x") == x) &
                                 (F.col("y") == y))
                        .select(*self._TILEFEAT_COLS).collect())
            return {"features": self._assemble_features(rows),
                    "z": z, "x": x, "y": y}
        sub = self._subtree_df()
        if sub is not None:
            # known-absent shortcut: a batched meta probe may have
            # already proven this tile does not exist in the subtree
            # store — skip the per-tile read entirely
            if (z, x, y) in self._sub_meta_cache and \
                    self._sub_meta_cache[(z, x, y)] is None:
                return None
            rows = (sub.where((F.col("kind") == "tile") & (F.col("z") == z) &
                              (F.col("x") == x) & (F.col("y") == y))
                    .select(*self._PACK_COLS).collect())
            if rows:
                return {"features": self._unpack_tile_features(rows[0]),
                        "z": z, "x": x, "y": y}
        return None

    def _source_rows(self, z, x, y) -> list:
        """Collect retained-source feature records (plain dicts) for
        (z,x,y) from the per-zoom sources store (row per feature) and
        the subtree batches (one packed row per leaf tile)."""
        from .pipeline import SOURCE_PACK_COLUMNS, unpack_source_pack
        if (z, x, y) in self._source_rows_cache:
            return self._source_rows_cache[(z, x, y)]
        rows: list[dict] = []
        p1 = self._p("sources", f"z={z}")
        if os.path.isdir(p1):
            rows.extend(
                r.asDict() for r in self.spark.read.parquet(p1)
                .where((F.col("x") == x) & (F.col("y") == y))
                .select(*FEATURE_COLUMNS).collect())
        sub = self._subtree_df()
        if sub is not None:
            for r in (sub.where((F.col("kind") == "source") &
                                (F.col("z") == z) &
                                (F.col("x") == x) & (F.col("y") == y))
                      .select(*SOURCE_PACK_COLUMNS).collect()):
                rows.extend(unpack_source_pack(r))
        return rows

    def _lookup_source(self, z, x, y):
        """Return kernel features of the retained source for (z,x,y), or None."""
        tid = to_id(z, x, y)
        if tid in self._consumed_sources:
            return None
        if tid in self._drill_sources:
            feats = self._drill_sources[tid]
            return feats if feats else None
        st = self._tile_meta(z, x, y)
        if st is None or not st["has_source"]:
            return None
        from .model import record_to_feature
        feats = sorted((record_to_feature(r)
                        for r in self._source_rows(z, x, y)),
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
            # only the drill root pre-exists in the stores (its source
            # came from a LEAF, which by definition was never split), so
            # descendants need no per-tile store lookups — just the
            # in-memory overlay from earlier drills
            known = (tid in self._drill_tiles
                     or (z, x, y) == (z0, x0, y0))
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
        return self._tile_meta(z, x, y) is not None

    def _tile_bbox(self, tid, z, x, y):
        if tid in self._drill_tiles:
            t = self._drill_tiles[tid]
            return (t["minx"], t["miny"], t["maxx"], t["maxy"])
        st = self._tile_meta(z, x, y)
        if st is not None:
            return st["bbox"]
        return (2.0, 1.0, -1.0, 0.0)

    def _prefetch_drill(self, misses) -> None:
        """Batch every store lookup a miss-driven drill will need, so
        the per-tile get_tile fallbacks run purely on warm caches and
        the in-process kernel (VERDICT r2 #8 — deep drills were one
        keyed read per ancestor per miss).

        Two jobs bound the whole batch regardless of miss count: one
        keyed subtree probe covering every requested tile + ancestor
        chain (also caching proven ABSENCE, so the misses' own lookups
        go jobless), and one source fetch per touched store for every
        has_source ancestor."""
        if not self._read_lineage():
            return
        from .pipeline import SOURCE_PACK_COLUMNS, unpack_source_pack
        chains: dict = {}
        universe: set = set()
        for k in misses:
            z, x, y = k
            chain = []
            while z > 0:
                z -= 1
                x >>= 1
                y >>= 1
                chain.append((z, x, y))
            chains[k] = chain
            universe.add(k)
            universe.update(chain)
        stats = self._stats()
        sub = self._subtree_df()
        need_meta = [a for a in universe
                     if a not in stats and a not in self._sub_meta_cache]
        if sub is not None and need_meta:
            ids = [to_id(*a) for a in need_meta]
            found = {}
            for r in (sub.where((F.col("kind") == "tile") &
                                F.col("tile_id").isin(ids))
                      .select("z", "x", "y", "has_source",
                              "minx", "miny", "maxx", "maxy").collect()):
                found[(r["z"], r["x"], r["y"])] = {
                    "has_source": r["has_source"],
                    "bbox": (r["minx"], r["miny"],
                             r["maxx"], r["maxy"])}
            for a in need_meta:
                self._sub_meta_cache[a] = found.get(a)

        # every has_source ancestor can end up the drill root (a nearer
        # one may hold an empty source, sending the walk further up)
        want_src: set = set()
        for chain in chains.values():
            for a in chain:
                meta = stats.get(a) or self._sub_meta_cache.get(a)
                if meta is not None and meta["has_source"]:
                    want_src.add(a)
        fetch = [a for a in want_src
                 if a not in self._source_rows_cache
                 and to_id(*a) not in self._drill_sources
                 and to_id(*a) not in self._consumed_sources]
        if not fetch:
            return
        for a in fetch:
            self._source_rows_cache[a] = []
        by_z: dict = {}
        for (z, x, y) in fetch:
            by_z.setdefault(z, []).append((x, y))
        for z, keys in sorted(by_z.items()):
            p1 = self._p("sources", f"z={z}")
            if not os.path.isdir(p1):
                continue
            sel = (self.spark.read.parquet(p1)
                   .where(F.col("x").isin([x for x, _ in keys]) &
                          F.col("y").isin([y for _, y in keys]) &
                          _pack_col().isin([_pack_xy(x, y)
                                            for x, y in keys]))
                   .select("x", "y", *FEATURE_COLUMNS))
            for r in sel.collect():
                d = r.asDict()
                key = (z, d.pop("x"), d.pop("y"))
                if key in self._source_rows_cache:
                    self._source_rows_cache[key].append(d)
        if sub is not None:
            ids = [to_id(*a) for a in fetch]
            zs = sorted({z for z, _, _ in fetch})
            pred = None
            for zv in zs:
                packed = [_pack_xy(x, y) for (z, x, y) in fetch if z == zv]
                p = (F.col("z") == zv) & _pack_col().isin(packed)
                pred = p if pred is None else (pred | p)
            for r in (sub.where((F.col("kind") == "source") &
                                F.col("z").isin(zs) & pred)
                      .select("z", "x", "y", *SOURCE_PACK_COLUMNS)
                      .collect()):
                key = (r["z"], r["x"], r["y"])
                if key in self._source_rows_cache:
                    self._source_rows_cache[key].extend(
                        unpack_source_pack(r))

    def get_tiles(self, coords) -> dict:
        """Batch getTile: resolve many (z, x, y) requests in one sweep.

        Same semantics as per-request get_tile (drill-downs included),
        but hits are served in TWO Spark jobs for the whole batch: one
        pruned read of the tilefeat store covering every requested
        distributed tile (all zooms OR-ed into a single predicate) and
        one keyed read of the subtree store for the rest.  Only genuine
        misses fall back to the drill path, and each retained source is
        drilled at most once for the whole batch."""
        norm: dict = {}
        for c in coords:
            c = tuple(c)
            z, x, y = (int(float(v)) for v in c)
            if z < 0 or z > 24:
                norm[c] = None
                continue
            z2 = 1 << z
            norm[c] = (z, (x + z2) & (z2 - 1), y)

        want = {k for k in norm.values() if k is not None}
        feats: dict = {}
        for key in list(want):
            t = self._drill_tiles.get(to_id(*key))
            if t is not None:
                feats[key] = t["features"]
                want.discard(key)

        if want and self._read_lineage():
            dist = [k for k in want if k in self._stats()]
            tf = self._tilefeat_df() if dist else None
            if tf is not None:
                zs = sorted({z for z, _, _ in dist})
                pred = None
                for zv in zs:
                    packed = [_pack_xy(x, y) for (z, x, y) in dist if z == zv]
                    p = (F.col("z") == zv) & _pack_col().isin(packed)
                    pred = p if pred is None else (pred | p)
                grouped: dict = {k: [] for k in dist}
                for r in (tf.where(F.col("z").isin(zs) & pred)
                          .select("z", "x", "y", *self._TILEFEAT_COLS)
                          .collect()):
                    grouped[(r["z"], r["x"], r["y"])].append(r)
                for k in dist:
                    feats[k] = self._assemble_features(grouped[k])
                    want.discard(k)
            sub = self._subtree_df() if want else None
            if sub is not None:
                ids = [to_id(*k) for k in want]
                for r in (sub.where((F.col("kind") == "tile") &
                                    F.col("tile_id").isin(ids))
                          .select("z", "x", "y", *self._PACK_COLS)
                          .collect()):
                    k = (r["z"], r["x"], r["y"])
                    feats[k] = self._unpack_tile_features(r)
                    want.discard(k)
            if sub is not None:
                for k in want:
                    # the keyed fetch just proved these absent — cache
                    # that so their per-tile lookups go jobless
                    self._sub_meta_cache.setdefault(k, None)
            if want:
                # genuine misses: batch the meta/source lookups their
                # drills will need (2 jobs for the whole batch), then
                # the get_tile fallbacks below run on warm caches + the
                # in-process kernel
                self._prefetch_drill(sorted(want))

        out = {}
        for c, key in norm.items():
            if key is None:
                out[c] = None
            elif key in feats:
                out[c] = {"features": feats[key],
                          "z": key[0], "x": key[1], "y": key[2]}
            else:
                out[c] = self.get_tile(*key)
        return out

    def tile_coords(self) -> list[tuple[int, int, int]]:
        """Insertion-ordered tile enumeration matching the reference's
        ``tileCoords`` (/root/reference/src/index.js:37,87).

        The reference appends tiles in splitTile's stack order — DFS
        pre-order visiting children br, tr, bl, tl first — which is
        fully determined by the built tile SET (a split tile always has
        all four children), so it is reconstructed here from the stores;
        drill-down tiles follow in creation order, exactly as getTile
        appends them.  Enumeration surface (tests/manifests): O(n_tiles)
        driver memory by nature, not a serving path."""
        out: list[tuple[int, int, int]] = []
        if self._read_lineage():
            present = {(r["z"], r["x"], r["y"])
                       for r in self.tiles().select("z", "x", "y").collect()}
            stack = [(0, 0, 0)] if (0, 0, 0) in present else []
            while stack:
                z, x, y = stack.pop()
                out.append((z, x, y))
                # push tl, bl, tr, br so br pops first (index.js:151-154)
                stack.extend(k for k in (
                    (z + 1, 2 * x, 2 * y), (z + 1, 2 * x, 2 * y + 1),
                    (z + 1, 2 * x + 1, 2 * y),
                    (z + 1, 2 * x + 1, 2 * y + 1)) if k in present)
        seen = set(out)
        out.extend(k for t in self._drill_tiles.values()
                   if (k := (t["z"], t["x"], t["y"])) not in seen)
        return out
