from hrviton_tpu.utils.logging import Board
from hrviton_tpu.utils.vis import (SEG_PALETTE, make_image_grid, save_images,
                                   to_uint8, visualize_segmap)

__all__ = ["Board", "SEG_PALETTE", "make_image_grid", "save_images",
           "to_uint8", "visualize_segmap"]
