from hrviton_tpu.infer.metrics import inception_score, mse, ssim_gray
from hrviton_tpu.infer.rejection import (d_logit, norm_const_from_logits, odds,
                                         rejection_scores)

__all__ = ["inception_score", "mse", "ssim_gray",
           "d_logit", "norm_const_from_logits", "odds", "rejection_scores"]
