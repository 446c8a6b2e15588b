"""Iceberg-style snapshot metadata: per-commit file manifests + an
atomically advanced VERSION pointer over the plain-parquet stores."""

import json
import os

from geojson_vt_spark import TileOptions
from geojson_vt_spark.engine import SparkTileEngine

from .util_fixtures import load_fixture


def _build(spark, tmp_path):
    # subtree_max_points forces a few distributed zoom rounds so the
    # history holds several zoom commits plus handoff batches
    eng = SparkTileEngine(spark, TileOptions(index_max_zoom=3,
                                             index_max_points=200),
                          workdir=str(tmp_path), subtree_max_points=500)
    eng.build_from_geojson(load_fixture("us-states.json"))
    return eng


def test_snapshot_chain_and_version(spark, tmp_path):
    eng = _build(spark, tmp_path)
    snaps = eng.snapshots()
    assert len(snaps) >= 3
    # contiguous chain, parent links, VERSION points at the head
    ids = [s["snapshot_id"] for s in snaps]
    assert ids == list(range(1, len(snaps) + 1))
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur["parent_id"] == prev["snapshot_id"]
    assert eng.current_snapshot_id() == ids[-1]
    # zoom commits land in zoom order (the resume contract), and the
    # final zoom commit is marked final
    zoom_snaps = [s for s in snaps if s["operation"] == "append-zoom"]
    zooms = [s["commit"]["zoom"] for s in zoom_snaps]
    assert zooms == sorted(zooms)
    assert zoom_snaps[-1]["commit"]["final"] is True
    # every manifest entry exists with the recorded byte size
    assert eng.verify_snapshot() == []


def test_snapshot_verify_catches_corruption(spark, tmp_path):
    eng = _build(spark, tmp_path)
    assert eng.verify_snapshot() == []
    # delete one data file from a committed store
    victim_store = None
    for snap in eng.snapshots():
        for store, files in snap["manifests"].items():
            data = [f for f in files if f["name"].endswith(".parquet")]
            if data:
                victim_store, victim = store, data[0]
                break
        if victim_store:
            break
    assert victim_store is not None
    os.remove(os.path.join(str(tmp_path), *victim_store.split("/"),
                           victim["name"]))
    problems = eng.verify_snapshot()
    assert any("missing" in p for p in problems), problems


def test_snapshot_history_resets_on_fresh_build(spark, tmp_path):
    eng = _build(spark, tmp_path)
    first = eng.current_snapshot_id()
    assert first >= 3
    # rebuilding the same workdir from scratch restarts the history
    eng2 = SparkTileEngine(spark, TileOptions(index_max_zoom=2,
                                              index_max_points=200),
                           workdir=str(tmp_path))
    eng2.build_from_geojson(load_fixture("us-states.json"))
    snaps = eng2.snapshots()
    assert snaps[0]["snapshot_id"] == 1
    assert eng2.verify_snapshot() == []


def test_snapshot_version_pointer_is_atomic_json(spark, tmp_path):
    eng = _build(spark, tmp_path)
    with open(os.path.join(str(tmp_path), "VERSION.json")) as fh:
        v = json.load(fh)
    assert v["snapshot_id"] == eng.current_snapshot_id()
    assert not os.path.exists(os.path.join(str(tmp_path),
                                           "VERSION.json.tmp"))
