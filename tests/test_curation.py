"""CurationPipeline: stage chaining, snapshot lineage, kill-and-resume,
corruption detection, and staleness invalidation."""

import os

import pyspark.sql.functions as F
import pytest

from geojson_vt_spark.curation import CurationPipeline, standard_stages

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def corpus(spark):
    import __spark_entry__ as em
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select("doc_id", em._synth_url_col().alias("url"),
                       "text", "lang")


def _mk(spark, corpus, tmp_path, stages=None):
    bench = corpus.where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    st = stages if stages is not None else standard_stages(
        benchmark=bench,
        mixture={"en": 50, "de": 20, "es": 15, "fr": 10, "zh": 5},
        seq_len=256, n_shards=4)
    return CurationPipeline(spark, str(tmp_path / "cur"), st)


def test_full_chain_runs_and_verifies(spark, corpus, tmp_path):
    pipe = _mk(spark, corpus, tmp_path)
    out, results = pipe.run(corpus)
    names = [r.name for r in results]
    assert names == ["url_dedup", "gopher", "exact_dedup",
                     "decontaminate", "quality", "mixture", "pack"]
    # filters only shrink the corpus; every stage is non-empty
    rows = [r.rows for r in results]
    assert all(a >= b for a, b in zip(rows[:-2], rows[1:-1]))
    assert rows[-1] == rows[-2]           # pack is 1:1 with survivors
    assert out.count() == rows[-1]
    assert set(out.columns) == {"doc_id", "shard", "n_tokens",
                                "first_seq", "last_seq", "offset_in_seq"}
    assert pipe.verify() == []
    # snapshots are parent-linked, one per stage
    snaps = pipe.snapshots()
    assert len(snaps) == 7
    assert [s["parent_id"] for s in snaps] == [None, 1, 2, 3, 4, 5, 6]


def test_resume_skips_all_completed_stages(spark, corpus, tmp_path):
    pipe = _mk(spark, corpus, tmp_path)
    _, first = pipe.run(corpus)
    out2, second = pipe.run(corpus)
    assert all(r.skipped for r in second)
    assert [r.rows for r in second] == [r.rows for r in first]
    assert len(pipe.snapshots()) == 7     # no new commits on resume


def test_killed_run_resumes_midway(spark, corpus, tmp_path):
    full = standard_stages(seq_len=256, n_shards=4)
    # simulate a driver death after stage 3 by running a truncated chain
    part = _mk(spark, corpus, tmp_path, stages=full[:3])
    part.run(corpus)
    pipe = _mk(spark, corpus, tmp_path, stages=full)
    _, results = pipe.run(corpus)
    assert [r.skipped for r in results] == [True] * 3 + [False] * 4


def test_corruption_flags_and_recomputes_downstream(spark, corpus, tmp_path):
    pipe = _mk(spark, corpus, tmp_path)
    _, first = pipe.run(corpus)
    # truncate one part file of the exact_dedup store
    sdir = pipe._stage_dir(2, "exact_dedup")
    victim = next(os.path.join(sdir, f) for f in sorted(os.listdir(sdir))
                  if f.endswith(".parquet"))
    with open(victim, "r+b") as fh:
        fh.truncate(4)
    assert pipe.verify() != []
    _, second = pipe.run(corpus)
    # stages 0-1 skip; 2 recomputes; 3+ recompute (stale inputs)
    assert [r.skipped for r in second] == [True, True] + [False] * 5
    assert [r.rows for r in second] == [r.rows for r in first]
    assert pipe.verify() == []            # recommit superseded the bad one


def test_chain_matches_manual_composition(spark, corpus, tmp_path):
    """The durable chain computes exactly what composing the operators
    in memory computes."""
    from geojson_vt_spark.operators.dedup import exact_dedup
    from geojson_vt_spark.operators.webtext import (repetition_stats_df,
                                                    url_dedup)
    stages = standard_stages(seq_len=256, n_shards=4)[:3]
    pipe = _mk(spark, corpus, tmp_path, stages=stages)
    out, _ = pipe.run(corpus)

    m = corpus.join(url_dedup(corpus).select(
        F.col("keep_id").alias("doc_id")), "doc_id", "left_semi")
    m = m.join(repetition_stats_df(m).where(F.col("keep") == 1)
               .select("doc_id"), "doc_id", "left_semi")
    m = m.join(exact_dedup(m, content_col="text", id_col="doc_id")
               .select("doc_id"), "doc_id", "left_semi")
    assert (sorted(r.doc_id for r in out.select("doc_id").collect())
            == sorted(r.doc_id for r in m.select("doc_id").collect()))


def test_ingest_appends_only_new_documents(spark, corpus, tmp_path):
    """Incremental ingest: overlap with the curated base is dropped by
    the fingerprint anti-join, survivors run the full chain into their
    own ingest stores, corpus() unions base + ingest, and lineage
    verifies clean."""
    base_src = corpus.where(F.col("doc_id") % 4 != 0)
    batch = corpus.where(F.col("doc_id") % 4 == 0)
    pipe = _mk(spark, corpus, tmp_path)
    out, _ = pipe.run(base_src)
    base_n = pipe.corpus().count()

    # plus re-crawled CURATED content (same text, new ids) — its
    # fingerprints are in corpus(), so the anti-join must drop it
    recrawl = pipe.corpus().limit(20).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "url", "text",
        "lang")
    df, results = pipe.ingest(batch.unionByName(recrawl))
    assert [r.name for r in results] == [n for n, _ in pipe.stages]
    assert not pipe.verify()
    got = pipe.corpus().count()
    assert got > base_n                       # genuinely new docs landed
    ids = {r.doc_id for r in pipe.corpus().select("doc_id").collect()}
    assert not any(i >= 10_000_000 for i in ids)   # re-crawls dropped


def test_ingest_is_idempotent(spark, corpus, tmp_path):
    """Re-ingesting an already-ingested batch is a no-op: every
    fingerprint is now in corpus(), so zero rows survive the anti-join
    and the corpus row count is unchanged."""
    pipe = _mk(spark, corpus, tmp_path)
    pipe.run(corpus.where(F.col("doc_id") % 4 != 0))
    batch = corpus.where(F.col("doc_id") % 4 == 0)
    pipe.ingest(batch)
    n1 = pipe.corpus().count()
    _, results = pipe.ingest(batch)
    assert pipe.corpus().count() == n1
    assert results[-2].rows == 0              # corpus stage empty
    assert not pipe.verify()


def test_ingest_snapshot_lineage_chains(spark, corpus, tmp_path):
    """Ingest commits extend the same parent-linked snapshot chain and
    flag corruption in an ingest store like any other store."""
    import os
    pipe = _mk(spark, corpus, tmp_path)
    pipe.run(corpus.where(F.col("doc_id") % 4 != 0))
    sid0 = pipe.current_snapshot_id()
    pipe.ingest(corpus.where(F.col("doc_id") % 4 == 0))
    snaps = pipe.snapshots()
    # one seen-store commit + one commit per stage
    assert snaps[-1]["snapshot_id"] == sid0 + len(pipe.stages) + 1
    assert all(s["parent_id"] == s["snapshot_id"] - 1 for s in snaps[1:])
    assert all(s["operation"] == "ingest-stage" for s in snaps[sid0:])
    # truncate one ingest part file -> verify flags it
    rel, files = next(iter(snaps[-1]["manifests"].items()))
    victim = os.path.join(pipe.workdir, rel,
                          next(f["name"] for f in files
                               if f["name"].endswith(".parquet")))
    with open(victim, "r+b") as fh:
        fh.truncate(max(os.path.getsize(victim) - 7, 1))
    assert pipe.verify()


def test_expire_snapshots_keeps_lineage_and_removes_orphans(
        spark, corpus, tmp_path):
    """Maintenance must not break resume or audit: after a corruption-
    recovery rerun doubles the snapshot history, expire_snapshots drops
    only superseded metadata (never a store's latest committer), the
    workdir still verifies clean, a further run still skips every
    stage, and crash leftovers (orphan files, abandoned ._tmp staging
    dirs) are swept."""
    pipe = _mk(spark, corpus, tmp_path)
    pipe.run(corpus)
    # corrupt stage 0 → rerun recommits every stage (history: 14 snaps)
    sdir = pipe._stage_dir(0, pipe.stages[0][0])
    part = [f for f in os.listdir(sdir) if f.endswith(".parquet")][0]
    with open(os.path.join(sdir, part), "ab") as fh:
        fh.write(b"junk")
    pipe.run(corpus)
    assert len(pipe.snapshots()) == 14

    # plant crash leftovers — at the workdir root AND inside an
    # ingest=NNNN subdir (the staging layout ingest() actually uses;
    # ADVICE r3: these were previously never swept)
    orphan = os.path.join(sdir, "part-junk-leftover.parquet.crc")
    open(orphan, "wb").write(b"x")
    os.makedirs(os.path.join(str(tmp_path / "cur"), "stage=99_x._tmp"),
                exist_ok=True)
    ing_tmp = os.path.join(str(tmp_path / "cur"), "ingest=0042",
                           "seen._tmp")
    os.makedirs(ing_tmp, exist_ok=True)

    res = pipe.expire_snapshots(keep_last=3)
    # snapshots 1-7 are all superseded by the rerun's 8-14 → expirable
    # except none of them is a latest committer; 8-11 are latest
    # committers of their stores so they survive the window too
    assert res["expired_snapshots"] == [1, 2, 3, 4, 5, 6, 7]
    assert any("part-junk-leftover" in o for o in res["orphans_removed"])
    assert any(o.endswith("._tmp") for o in res["orphans_removed"])
    assert os.path.join("ingest=0042", "seen._tmp") \
        in res["orphans_removed"]
    assert not os.path.exists(ing_tmp)
    assert not os.path.exists(orphan)

    assert pipe.verify() == []
    _, again = pipe.run(corpus)
    assert all(r.skipped for r in again)
    # idempotent: a second expiry finds nothing
    res2 = pipe.expire_snapshots(keep_last=3)
    assert res2 == {"expired_snapshots": [], "orphans_removed": []}
