from .pipeline import (streaming_asof_enrich, streaming_dedup_by_url,
                       streaming_heavy_tiles,
                       streaming_heavy_tiles_continuous,
                       streaming_incremental_dedup,
                       streaming_latest_capture, streaming_link_graph,
                       streaming_sessionize,
                       streaming_synth_pages, streaming_tile_counts)

__all__ = ["streaming_asof_enrich", "streaming_dedup_by_url",
           "streaming_heavy_tiles", "streaming_heavy_tiles_continuous",
           "streaming_incremental_dedup", "streaming_latest_capture",
           "streaming_link_graph",
           "streaming_sessionize", "streaming_synth_pages",
           "streaming_tile_counts"]
