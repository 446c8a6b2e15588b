from .corpus import extract_geo_features_df, synth_pages_df
from .geojson import read_geojson

__all__ = ["extract_geo_features_df", "read_geojson", "synth_pages_df"]
