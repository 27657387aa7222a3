from hrviton_tpu.utils.legacy import (changearm, gen_noise, get_clothes_mask,
                                      ndim_tensor2im, pred_to_onehot)
from hrviton_tpu.utils.logging import Board
from hrviton_tpu.utils.vis import (SEG_PALETTE, make_image_grid, save_images,
                                   to_uint8, visualize_segmap)

__all__ = ["Board", "SEG_PALETTE", "make_image_grid", "save_images",
           "to_uint8", "visualize_segmap",
           "changearm", "gen_noise", "get_clothes_mask", "ndim_tensor2im",
           "pred_to_onehot"]
