"""Engine configuration.

Mirrors the reference option surface and validation
(/root/reference/src/index.js:8-19,29-30) with snake_case names.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TileOptions:
    max_zoom: int = 14          # max zoom to preserve detail on
    index_max_zoom: int = 5     # max zoom in the tile index (first pass)
    index_max_points: int = 100000  # max points per tile before splitting stops
    tolerance: float = 3.0      # simplification tolerance (higher → simpler)
    extent: int = 4096          # tile extent (integer coordinate range)
    buffer: int = 64            # tile buffer on each side
    line_metrics: bool = False  # track mapbox_clip_start / mapbox_clip_end
    promote_id: str | None = None  # property name promoted to feature id
    generate_id: bool = False   # synthesize ids from the input ordinal
    debug: int = 0

    def __post_init__(self) -> None:
        if self.max_zoom < 0 or self.max_zoom > 24:
            raise ValueError("maxZoom should be in the 0-24 range")
        if self.promote_id and self.generate_id:
            raise ValueError("promoteId and generateId cannot be used together.")
