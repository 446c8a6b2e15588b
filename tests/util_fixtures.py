"""Shared fixture helpers: reference test harness ported to the kernel.

``gen_tiles`` mirrors /root/reference/test/test-full.js:49-64 — build the
index, then enumerate every generated tile through get_tile and key the
transformed feature lists by 'z{z}-{x}-{y}'.
"""

from __future__ import annotations

import json
import os

from geojson_vt_spark import TileOptions
from geojson_vt_spark.kernel import LocalTileIndex

FIXTURE_DIR = "/root/reference/test/fixtures"


def load_fixture(name: str):
    with open(os.path.join(FIXTURE_DIR, name)) as f:
        return json.load(f)


def gen_tiles(data, **opts):
    merged = {"index_max_zoom": 0, "index_max_points": 10000}
    merged.update(opts)
    index = LocalTileIndex(data, TileOptions(**merged))
    out = {}
    for tile in index.tiles.values():
        key = f"z{tile.z}-{tile.x}-{tile.y}"
        out[key] = index.get_tile(tile.z, tile.x, tile.y)["features"]
    return out
