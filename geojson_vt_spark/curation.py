"""Resumable corpus-curation pipeline runner.

Composes the webtext operators into the crawl→tokenizer chain a
pre-training data build runs (URL dedup → quality rules → exact dedup →
decontamination → classifier → packing) and gives the chain the same
durability contract the tile engine has: every stage lands in its own
parquet store with a parent-linked snapshot manifest and an atomically
advanced VERSION pointer, so a killed run resumes at the first
incomplete stage without recomputing finished ones, and a reader that
follows VERSION → snapshot → manifest only ever sees complete commits.

Design notes (100-TB posture):

- Stage boundaries are the checkpoint grain — exactly the places a real
  run wants durability, because each stage is one or two shuffles and
  recomputing a finished shuffle on failure is the dominant restart
  cost at scale.  Intra-stage recovery is Spark's own task/stage retry;
  this layer makes the *pipeline* restartable across driver deaths.
- Per-partition lineage: each commit manifests every parquet part file
  with its byte size AND row count (from the parquet footer — no Spark
  job), which is the per-partition watermark the north rule asks for;
  `verify()` audits them against the filesystem before any resume.
- The store is plain parquet + JSON metadata (the container has no
  Iceberg runtime); the commit protocol — write-temp, fsync-free
  atomic rename, single VERSION pointer — reproduces the snapshot
  semantics that matter for resume.  Swapping the store for real
  Iceberg tables keeps the stage graph unchanged.
- Stages receive and return DataFrames; nothing is collected to the
  driver.  The runner adds no shuffle of its own — reading a finished
  stage back is a parquet scan that preserves the stage's partitioning.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class StageResult:
    name: str
    rows: int
    n_files: int
    seconds: float
    skipped: bool


class CurationPipeline:
    """Run a named chain of DataFrame→DataFrame stages with per-stage
    durable parquet stores + snapshot lineage.  ``stages`` is a list of
    ``(name, fn)`` where ``fn(df) -> df``."""

    def __init__(self, spark: SparkSession, workdir: str,
                 stages: list[tuple[str, Callable[[DataFrame], DataFrame]]],
                 target_file_rows: int = 100_000):
        self.spark = spark
        self.workdir = workdir
        self.stages = stages
        # Iceberg-style write.target-file-size stand-in: writers roll
        # to a new file every N rows WITHOUT an extra shuffle, so an
        # AQE-coalesced final stage can't collapse a store into a few
        # giant files that cap the NEXT stage's scan parallelism (the
        # sandbox measured a 1.2M-doc chain flat-lining at 3 scan
        # tasks before this).  Pair with a scan-side
        # spark.sql.files.maxPartitionBytes small enough that the
        # bin-packer doesn't glue the files back together.
        self.target_file_rows = target_file_rows
        os.makedirs(workdir, exist_ok=True)

    # ------------------------------------------------------------ paths

    def _stage_dir(self, i: int, name: str) -> str:
        return os.path.join(self.workdir, f"stage={i:02d}_{name}")

    def _snap_dir(self) -> str:
        return os.path.join(self.workdir, "snapshots")

    def _version_path(self) -> str:
        return os.path.join(self.workdir, "VERSION.json")

    # -------------------------------------------------------- snapshots

    def current_snapshot_id(self) -> int:
        try:
            with open(self._version_path()) as fh:
                return int(json.load(fh)["snapshot_id"])
        except (FileNotFoundError, ValueError, KeyError):
            return 0

    def snapshots(self) -> list[dict]:
        out = []
        for sid in range(1, self.current_snapshot_id() + 1):
            try:
                with open(os.path.join(self._snap_dir(),
                                       f"v{sid:06d}.json")) as fh:
                    out.append(json.load(fh))
            except FileNotFoundError:
                continue
        return out

    def _manifest(self, stage_dir: str) -> list[dict]:
        """Part-file manifest with byte sizes and parquet-footer row
        counts — per-partition lineage without a Spark job."""
        import pyarrow.parquet as pq
        files = []
        for fn in sorted(os.listdir(stage_dir)):
            p = os.path.join(stage_dir, fn)
            entry = {"name": fn, "bytes": os.path.getsize(p)}
            if fn.endswith(".parquet"):
                entry["rows"] = pq.ParquetFile(p).metadata.num_rows
            files.append(entry)
        return files

    def _commit(self, stage_idx: int, name: str, stage_dir: str,
                seconds: float) -> dict:
        files = self._manifest(stage_dir)
        rows = sum(f.get("rows", 0) for f in files)
        prev = self.current_snapshot_id()
        sid = prev + 1
        os.makedirs(self._snap_dir(), exist_ok=True)
        snap = {
            "snapshot_id": sid,
            "parent_id": prev or None,
            "operation": "curation-stage",
            "committed_at": time.time(),
            "commit": {"stage": stage_idx, "name": name, "rows": rows,
                       "seconds": round(seconds, 3)},
            "manifests": {os.path.basename(stage_dir): files},
        }
        with open(os.path.join(self._snap_dir(), f"v{sid:06d}.json"),
                  "w") as fh:
            json.dump(snap, fh)
        tmp = self._version_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"snapshot_id": sid}, fh)
        os.replace(tmp, self._version_path())
        return snap

    def _committed_stage(self, stage_idx: int, name: str) -> dict | None:
        """The snapshot that committed this stage, if any — the LAST
        one, so a recommit after corruption supersedes the original."""
        found = None
        for snap in self.snapshots():
            c = snap.get("commit", {})
            if (c.get("stage") == stage_idx and c.get("name") == name
                    and "ingest" not in c):
                found = snap
        return found

    def expire_snapshots(self, keep_last: int = 3) -> dict:
        """Iceberg-style table maintenance: drop superseded snapshot
        metadata older than the ``keep_last`` most recent commits and
        remove orphaned data files no retained manifest references.

        Retention rule: a snapshot is expirable only if it is BOTH
        older than the retention window AND not the latest committer
        of any store — the latest committer carries the manifest that
        ``verify()`` / resume audit against, so per-store lineage
        survives arbitrary expiry (recompute-on-resume never cascades
        from maintenance).  Orphans are files inside a committed store
        that its live manifest doesn't list (crash leftovers) plus
        abandoned ``._tmp`` staging dirs; the base corpus and every
        committed ingest store are untouched.  Returns
        ``{"expired_snapshots": [...], "orphans_removed": [...]}``.

        .. warning:: Maintenance must NOT run concurrently with an
           active ``run()`` / ``ingest()`` on the same workdir: a
           live ``._tmp`` staging dir being written by that run is
           indistinguishable from an abandoned one and would be
           swept.  (Iceberg's own remove-orphan-files carries the
           same single-writer caveat.)"""
        import shutil

        snaps = self.snapshots()
        latest_committer: dict[str, int] = {}
        for s in snaps:
            for store in s["manifests"]:
                latest_committer[store] = s["snapshot_id"]
        keep_floor = self.current_snapshot_id() - keep_last + 1
        keep_ids = set(latest_committer.values())
        expired = []
        for s in snaps:
            sid = s["snapshot_id"]
            if sid >= keep_floor or sid in keep_ids:
                continue
            os.remove(os.path.join(self._snap_dir(), f"v{sid:06d}.json"))
            expired.append(sid)

        live: dict[str, set] = {}
        for s in self.snapshots():           # re-read surviving set
            for store, files in s["manifests"].items():
                live[store] = {f["name"] for f in files}
        orphans = []
        for store, names in live.items():
            base = os.path.join(self.workdir, store)
            if not os.path.isdir(base):
                continue
            for fn in os.listdir(base):
                if fn not in names:
                    p = os.path.join(base, fn)
                    (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
                    orphans.append(os.path.join(store, fn))
        # abandoned staging dirs at the workdir root AND inside
        # ingest=NNNN subdirs (per-ingest stage/seen staging leftovers)
        sweep_roots = [self.workdir] + [
            os.path.join(self.workdir, d)
            for d in os.listdir(self.workdir)
            if d.startswith("ingest=") and
            os.path.isdir(os.path.join(self.workdir, d))]
        for root in sweep_roots:
            rel = os.path.relpath(root, self.workdir)
            for fn in os.listdir(root):
                if fn.endswith("._tmp"):
                    shutil.rmtree(os.path.join(root, fn))
                    orphans.append(fn if rel == "." else
                                   os.path.join(rel, fn))
        return {"expired_snapshots": expired, "orphans_removed": orphans}

    def verify(self, snapshot_id: int | None = None) -> list[str]:
        """Audit committed manifests against the filesystem; empty list
        = intact.  Run before trusting a workdir for resume.

        Each store is audited against the LATEST snapshot that commits
        it — a recommit (after corruption recovery) rewrites the store,
        so earlier manifests for the same store are superseded, exactly
        like replaced data files in an Iceberg rewrite."""
        sid = snapshot_id or self.current_snapshot_id()
        latest: dict[str, list] = {}
        for snap in self.snapshots():
            if snap["snapshot_id"] > sid:
                break
            latest.update(snap["manifests"])
        problems = []
        for store, files in latest.items():
            base = os.path.join(self.workdir, store)
            for f in files:
                p = os.path.join(base, f["name"])
                if not os.path.exists(p):
                    problems.append(f"{store}/{f['name']}: missing")
                elif os.path.getsize(p) != f["bytes"]:
                    problems.append(
                        f"{store}/{f['name']}: size "
                        f"{os.path.getsize(p)} != {f['bytes']}")
        return problems

    # -------------------------------------------------------------- run

    def run(self, source: DataFrame) -> tuple[DataFrame, list[StageResult]]:
        """Execute the chain over ``source``; returns the final stage's
        DataFrame (read back from its durable store) and per-stage
        results.  Stages whose snapshot is committed AND whose files
        audit clean are skipped — their store is read back instead."""
        df = source
        results = []
        dirty = False   # once a stage recomputes, downstream commits
        #                 are stale — they were built on the old output
        for i, (name, fn) in enumerate(self.stages):
            sdir = self._stage_dir(i, name)
            snap = self._committed_stage(i, name)
            if not dirty and snap is not None and not self._audit_one(snap):
                df = self.spark.read.parquet(sdir)
                results.append(StageResult(
                    name, snap["commit"]["rows"],
                    len(snap["manifests"][os.path.basename(sdir)]),
                    0.0, skipped=True))
                continue
            dirty = True
            t0 = time.monotonic()
            out = fn(df)
            tmp = sdir + "._tmp"
            (out.write.option("maxRecordsPerFile", self.target_file_rows)
             .mode("overwrite").parquet(tmp))
            if os.path.isdir(sdir):          # stale partial store
                import shutil
                shutil.rmtree(sdir)
            os.rename(tmp, sdir)
            dt = time.monotonic() - t0
            snap = self._commit(i, name, sdir, dt)
            df = self.spark.read.parquet(sdir)
            results.append(StageResult(
                name, snap["commit"]["rows"],
                len(snap["manifests"][os.path.basename(sdir)]),
                dt, skipped=False))
        return df, results

    # ------------------------------------------------------------ ingest

    def _ingest_ids(self) -> list[int]:
        return sorted({s["commit"]["ingest"] for s in self.snapshots()
                       if "ingest" in s.get("commit", {})})

    def _ingest_stage_dir(self, ingest_id: int, i: int, name: str) -> str:
        return os.path.join(self.workdir, f"ingest={ingest_id:04d}",
                            f"stage={i:02d}_{name}")

    def corpus(self, corpus_stage: int = -2) -> DataFrame:
        """The current curated corpus: the base run's ``corpus_stage``
        store unioned with every committed ingest's — one multi-path
        parquet scan, no shuffle."""
        i = range(len(self.stages))[corpus_stage]
        paths = [self._stage_dir(i, self.stages[i][0])]
        for ing in self._ingest_ids():
            p = self._ingest_stage_dir(ing, i, self.stages[i][0])
            if os.path.isdir(p):
                paths.append(p)
        return self.spark.read.parquet(*paths)

    def ingest(self, batch: DataFrame,
               fingerprints: list | None = None,
               corpus_stage: int = -2
               ) -> tuple[DataFrame, list[StageResult]]:
        """Incremental snapshot ingest — the daily-crawl append.  The
        batch is first deduplicated against EVERYTHING already curated
        (the base run plus all prior ingests — so re-ingesting the same
        batch is a no-op), then the survivors run through the full
        stage chain into their own ``ingest=NNNN/stage=...`` stores
        with the same commit protocol (parent-linked snapshots, atomic
        VERSION advance, per-file manifests, resume-at-stage-grain).
        The base corpus is never rewritten — exactly the append-only
        shape Iceberg snapshot semantics exist for.

        ``fingerprints``: list of unbound Columns computed on both
        sides (default: the prefix-8-token content fingerprint).  The
        anti-join build side is distinct fingerprints only — curated
        document bodies never leave their scan.

        Every ingest ALSO commits a ``seen`` store holding the raw
        batch's distinct fingerprints (crawl-frontier semantics): later
        ingests anti-join against curated-corpus fingerprints ∪ all
        prior seen stores, so a document REJECTED by the chain is
        remembered too — re-ingesting any previously-presented batch is
        a no-op, and chain filters whose outcome depends on the cohort
        (keep-lowest URL dedup) can't resurrect last time's losers."""
        if fingerprints is None:
            from .operators.webtext import prefix_fingerprint_col
            fingerprints = [prefix_fingerprint_col(F.col("text"))]

        ids = self._ingest_ids()
        # resume an ingest left incomplete (its last stage uncommitted),
        # else open the next ingest id
        ing = ids[-1] if ids and self._committed_ingest_stage(
            ids[-1], len(self.stages) - 1,
            self.stages[-1][0]) is None else (ids[-1] + 1 if ids else 1)

        def fps_of(df):
            out = None
            for fp in fingerprints:
                part = df.select(fp.alias("_fp"))
                out = part if out is None else out.unionByName(part)
            return out.distinct()

        base_fps = fps_of(self.corpus(corpus_stage))
        for prior in ids:
            if prior == ing:
                continue     # resuming: never anti-join our own batch
            sdir = os.path.join(self.workdir, f"ingest={prior:04d}", "seen")
            if os.path.isdir(sdir):
                base_fps = base_fps.unionByName(
                    self.spark.read.parquet(sdir))
        base_fps = base_fps.distinct()
        new = (batch.withColumn("_fp", fingerprints[0])
               .join(base_fps, "_fp", "left_anti").drop("_fp"))
        for fp in fingerprints[1:]:
            new = (new.withColumn("_fp", fp)
                   .join(base_fps, "_fp", "left_anti").drop("_fp"))

        # commit the raw batch's fingerprints as this ingest's seen
        # store (before the chain — rejected docs must be remembered)
        seen_dir = os.path.join(self.workdir, f"ingest={ing:04d}", "seen")
        if self._committed_ingest_stage(ing, -1, "seen") is None:
            tmp = seen_dir + "._tmp"
            (fps_of(batch).write
             .option("maxRecordsPerFile", self.target_file_rows)
             .mode("overwrite").parquet(tmp))
            if os.path.isdir(seen_dir):
                import shutil
                shutil.rmtree(seen_dir)
            os.rename(tmp, seen_dir)
            self._commit_ingest(ing, -1, "seen", seen_dir, 0.0)

        df = new
        results = []
        dirty = False
        for i, (name, fn) in enumerate(self.stages):
            sdir = self._ingest_stage_dir(ing, i, name)
            snap = self._committed_ingest_stage(ing, i, name)
            if not dirty and snap is not None and not self._audit_one(snap):
                df = self.spark.read.parquet(sdir)
                results.append(StageResult(
                    name, snap["commit"]["rows"],
                    len(next(iter(snap["manifests"].values()))),
                    0.0, skipped=True))
                continue
            dirty = True
            t0 = time.monotonic()
            out = fn(df)
            tmp = sdir + "._tmp"
            (out.write.option("maxRecordsPerFile", self.target_file_rows)
             .mode("overwrite").parquet(tmp))
            if os.path.isdir(sdir):
                import shutil
                shutil.rmtree(sdir)
            os.rename(tmp, sdir)
            dt = time.monotonic() - t0
            snap = self._commit_ingest(ing, i, name, sdir, dt)
            df = self.spark.read.parquet(sdir)
            results.append(StageResult(
                name, snap["commit"]["rows"],
                len(next(iter(snap["manifests"].values()))),
                dt, skipped=False))
        return df, results

    def _commit_ingest(self, ingest_id: int, stage_idx: int, name: str,
                       stage_dir: str, seconds: float) -> dict:
        files = self._manifest(stage_dir)
        rows = sum(f.get("rows", 0) for f in files)
        prev = self.current_snapshot_id()
        sid = prev + 1
        os.makedirs(self._snap_dir(), exist_ok=True)
        rel = os.path.relpath(stage_dir, self.workdir)
        snap = {
            "snapshot_id": sid,
            "parent_id": prev or None,
            "operation": "ingest-stage",
            "committed_at": time.time(),
            "commit": {"ingest": ingest_id, "stage": stage_idx,
                       "name": name, "rows": rows,
                       "seconds": round(seconds, 3)},
            "manifests": {rel: files},
        }
        with open(os.path.join(self._snap_dir(), f"v{sid:06d}.json"),
                  "w") as fh:
            json.dump(snap, fh)
        tmp = self._version_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"snapshot_id": sid}, fh)
        os.replace(tmp, self._version_path())
        return snap

    def _committed_ingest_stage(self, ingest_id: int, stage_idx: int,
                                name: str) -> dict | None:
        found = None
        for snap in self.snapshots():
            c = snap.get("commit", {})
            if (c.get("ingest") == ingest_id and c.get("stage") == stage_idx
                    and c.get("name") == name):
                found = snap
        return found

    def _audit_one(self, snap: dict) -> list[str]:
        problems = []
        for store, files in snap["manifests"].items():
            base = os.path.join(self.workdir, store)
            for f in files:
                p = os.path.join(base, f["name"])
                if (not os.path.exists(p)
                        or os.path.getsize(p) != f["bytes"]):
                    problems.append(f"{store}/{f['name']}")
        return problems


# ------------------------------------------------------- standard chain

def standard_stages(benchmark: DataFrame | None = None,
                    mixture: dict[str, int] | None = None,
                    seq_len: int = 2048, n_shards: int = 64,
                    ) -> list[tuple[str, Callable]]:
    """The reference crawl→tokenizer chain over a ``(doc_id, url, text,
    lang)`` corpus: URL dedup → Gopher rules → exact dedup →
    decontamination → quality classifier → mixture sampling → sequence
    packing.  Every stage keeps the corpus schema (filter semantics)
    except the final packing stage, which emits the window layout.

    Each filter is the operator's own plan (slim shuffles, broadcast
    where the small side fits) followed by a key-only semi-join back to
    the corpus — document text never rides a shuffle it doesn't need."""
    from .operators.dedup import exact_dedup
    from .operators.webtext import (decontaminate_df, mixture_sample_df,
                                    pack_sequences_df,
                                    quality_classifier_df,
                                    repetition_stats_df, url_dedup)

    def s_url_dedup(df):
        keep = url_dedup(df).select(F.col("keep_id").alias("doc_id"))
        return df.join(keep, "doc_id", "left_semi")

    def s_gopher(df):
        keep = (repetition_stats_df(df).where(F.col("keep") == 1)
                .select("doc_id"))
        return df.join(keep, "doc_id", "left_semi")

    def s_exact_dedup(df):
        keep = exact_dedup(df, content_col="text", id_col="doc_id") \
            .select("doc_id")
        return df.join(keep, "doc_id", "left_semi")

    def s_decontaminate(df):
        if benchmark is None:
            return df
        keep = decontaminate_df(df, benchmark).select("doc_id")
        return df.join(keep, "doc_id", "left_semi")

    def s_quality(df):
        keep = (quality_classifier_df(df).where(F.col("keep") == 1)
                .select("doc_id"))
        return df.join(keep, "doc_id", "left_semi")

    def s_mixture(df):
        if not mixture:
            return df
        keep = mixture_sample_df(df, mixture).select("doc_id")
        return df.join(keep, "doc_id", "left_semi")

    def s_pack(df):
        return pack_sequences_df(df, seq_len=seq_len, n_shards=n_shards)

    return [("url_dedup", s_url_dedup), ("gopher", s_gopher),
            ("exact_dedup", s_exact_dedup),
            ("decontaminate", s_decontaminate), ("quality", s_quality),
            ("mixture", s_mixture), ("pack", s_pack)]
