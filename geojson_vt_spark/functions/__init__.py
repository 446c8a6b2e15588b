from .geo import (bbox_cells_col, cell_col, cell_xy_cols, project_x_col,
                  project_y_col, tile_coord_col, tile_id_col, wrap_x_col)
from .hilbert import (bbox_hilbert_ranges, cluster_by_hilbert,
                      filter_bbox_by_hilbert, hilbert_xy2d, with_hilbert,
                      with_hilbert_cell)

__all__ = [
    "bbox_cells_col", "cell_col", "cell_xy_cols", "project_x_col",
    "project_y_col", "tile_coord_col", "tile_id_col", "wrap_x_col",
    "bbox_hilbert_ranges", "cluster_by_hilbert", "filter_bbox_by_hilbert",
    "hilbert_xy2d", "with_hilbert", "with_hilbert_cell",
]
