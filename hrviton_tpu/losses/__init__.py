from hrviton_tpu.losses.gan import gan_loss, lsgan_loss
from hrviton_tpu.losses.lpips import (LPIPSAlex, LPIPSFn, LPIPSModel,
                                      dssim_distance, l2_distance, make_lpips,
                                      score_2afc, score_jnd)
from hrviton_tpu.losses.matching import feature_matching_loss
from hrviton_tpu.losses.perceptual import VGGLossFn, make_vgg_loss
from hrviton_tpu.losses.seg import cal_miou, cross_entropy2d, iou_metric
from hrviton_tpu.losses.tv import edge_aware_tv_loss, flow_tv_suite, tv_loss

__all__ = [
    "gan_loss", "lsgan_loss",
    "LPIPSAlex", "LPIPSFn", "LPIPSModel", "make_lpips",
    "dssim_distance", "l2_distance", "score_2afc", "score_jnd",
    "feature_matching_loss",
    "VGGLossFn", "make_vgg_loss",
    "cal_miou", "cross_entropy2d", "iou_metric",
    "edge_aware_tv_loss", "flow_tv_suite", "tv_loss",
]
