from .geo import (bbox_cells_col, cell_col, cell_xy_cols, project_x_col,
                  project_y_col, tile_coord_col, tile_id_col, wrap_x_col)

__all__ = [
    "bbox_cells_col", "cell_col", "cell_xy_cols", "project_x_col",
    "project_y_col", "tile_coord_col", "tile_id_col", "wrap_x_col",
]
