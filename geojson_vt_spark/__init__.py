"""geojson_vt_spark — a PySpark-native vector-tile slicer and spatial
analytics engine with the query semantics of mapbox/geojson-vt.

Layers:
- ``kernel``     numpy geometry kernels (exact reference parity)
- ``engine``     distributed tile pyramid (DataFrame stages, checkpointed)
- ``operators``  spatial joins, dedup, similarity, text analytics
- ``sources``    GeoJSON + synthetic web-corpus sources
- ``functions``  pure-Column helpers (projection, tile ids, bboxes)
"""

from .options import TileOptions

__all__ = ["TileOptions"]
__version__ = "0.1.0"
