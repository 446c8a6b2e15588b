from .clip import clip_feature, clip_features, clip_ring
from .convert import convert, project_x, project_y
from .feature import Ring, VTFeature, create_feature
from .index import LocalTileIndex, to_id
from .simplify import simplify
from .tile import create_tile
from .transform import transform_tile
from .wrap import shift_features, wrap

__all__ = [
    "LocalTileIndex", "Ring", "VTFeature", "clip_feature", "clip_features",
    "clip_ring", "convert", "create_feature", "create_tile", "project_x",
    "project_y", "shift_features", "simplify", "to_id", "transform_tile",
    "wrap",
]
