"""Projected-space → integer tile-space transform.

Reproduces /root/reference/src/transform.js.  JS ``Math.round`` rounds
half *away from zero upward* (half-up); numpy rounds half-even, so the
transform uses ``floor(v + 0.5)`` which matches JS exactly for all
doubles.
"""

from __future__ import annotations

import numpy as np

from .tile import Tile


def transform_point_arrays(xy: np.ndarray, extent: int, z2: int, tx: int, ty: int):
    """Vectorized transformPoint (/root/reference/src/transform.js:37-41)."""
    out = np.empty_like(xy)
    out[:, 0] = extent * (xy[:, 0] * z2 - tx)
    out[:, 1] = extent * (xy[:, 1] * z2 - ty)
    return np.floor(out + 0.5).astype(np.int64)


def transform_tile(tile: Tile, extent: int) -> dict:
    """Return a JSON-ready transformed tile: {'features': [...]}."""
    z2 = 1 << tile.z
    tx = tile.x
    ty = tile.y
    features = []
    for tf in tile.features:
        if tf.type == 1:
            geom = transform_point_arrays(tf.geometry, extent, z2, tx, ty).tolist()
        else:
            geom = [transform_point_arrays(ring, extent, z2, tx, ty).tolist()
                    for ring in tf.geometry]
        d = {"geometry": geom, "type": tf.type, "tags": tf.tags}
        if tf.has_id:
            d["id"] = tf.id
        features.append(d)
    return {"features": features, "z": tile.z, "x": tile.x, "y": tile.y}
