"""Offline evaluation CLI — equivalent of /root/reference/evaluate.py.

Computes SSIM (grayscale, gaussian-weighted), MSE, LPIPS(alex @128) and — when
an inception softmax provider is available — Inception Score; writes eval.txt
and per-image lpips.txt sorted by distance (evaluate.py:91-111).

Inception Score needs pretrained inception_v3 weights; with zero-egress and no
torchvision in the image, IS is reported as NaN unless --inception_weights
points at a converted checkpoint (documented limitation).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from hrviton_tpu.infer import inception_score, mse, ssim_gray
from hrviton_tpu.losses.lpips import make_lpips


def get_opt(argv=None):
    p = argparse.ArgumentParser()
    from hrviton_tpu.cli.common import add_ignored_reference_flags
    add_ignored_reference_flags(p, "--evaluation")
    p.add_argument("--predict_dir", default="./result/output/")
    p.add_argument("--ground_truth_dir",
                   default="./data/zalando-hd-resize/test/image")
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--lpips_weights", default="",
                   help="converted LPIPS alex weights (msgpack)")
    p.add_argument("--inception_weights", default="")
    return p.parse_args(argv)


def _resize_for(opt, img):
    if opt.resolution == 1024:
        return img
    if opt.resolution == 512:
        return img.resize((384, 512), Image.BILINEAR)
    if opt.resolution == 256:
        return img.resize((192, 256), Image.BILINEAR)
    raise NotImplementedError(opt.resolution)


def main(argv=None):
    opt = get_opt(argv)
    pred_list = sorted(os.listdir(opt.predict_dir))
    pred_list = [p for p in pred_list if p.endswith((".png", ".jpg"))]

    from hrviton_tpu.cli.common import check_pretrained_backbone
    check_pretrained_backbone(opt.lpips_weights, what="LPIPS (eval metric)",
                              flag="--lpips_weights", allowed=False,
                              allow_flag="--lpips_weights", refuse=False)
    lpips_vars = None
    if opt.lpips_weights:
        from hrviton_tpu.train.checkpoint import load_pytree
        lpips_vars = load_pytree(opt.lpips_weights)
    lpips = make_lpips(lpips_vars, image_hw=(128, 128))
    lpips_jit = jax.jit(lpips.__call__)

    def to_lpips_input(img):
        arr = np.asarray(img.convert("RGB").resize((128, 128), Image.BILINEAR),
                         dtype=np.float32) / 255.0
        return jnp.asarray(arr[None] * 2.0 - 1.0)

    avg_ssim = avg_mse = avg_lpips = 0.0
    lpips_list = []
    for i, name in enumerate(pred_list):
        gt_name = name.split("_")[0] + "_00.jpg"
        gt_img = _resize_for(opt, Image.open(
            os.path.join(opt.ground_truth_dir, gt_name)))
        pred_img = Image.open(os.path.join(opt.predict_dir, name))
        assert gt_img.size == pred_img.size, f"{gt_img.size} vs {pred_img.size}"

        gt_gray = np.asarray(gt_img.convert("L"))
        pred_gray = np.asarray(pred_img.convert("L"))
        avg_ssim += ssim_gray(gt_gray, pred_gray)
        avg_mse += mse(np.asarray(gt_img.convert("RGB")),
                       np.asarray(pred_img.convert("RGB")))
        d = float(lpips_jit(to_lpips_input(gt_img), to_lpips_input(pred_img))[0])
        lpips_list.append((name, d))
        avg_lpips += d
        print(f"step: {i + 1} evaluation... lpips:{d}", flush=True)

    n = max(len(pred_list), 1)
    avg_ssim /= n
    avg_mse /= n
    avg_lpips /= n

    is_mean, is_std = float("nan"), float("nan")
    if opt.inception_weights:
        from hrviton_tpu.models.inception import InceptionV3, convert_inception_v3
        if opt.inception_weights.endswith((".pth", ".pt")):
            from hrviton_tpu.train.checkpoint import load_torch_state_dict
            inc_vars = convert_inception_v3(
                load_torch_state_dict(opt.inception_weights))
        else:
            from hrviton_tpu.train.checkpoint import load_pytree
            inc_vars = load_pytree(opt.inception_weights)
        inception = InceptionV3()
        inc_fwd = jax.jit(lambda v, x: jax.nn.softmax(
            inception.apply(v, x), axis=-1))

        def to_inc_input(img):
            arr = np.asarray(img.convert("RGB").resize((299, 299),
                                                       Image.BILINEAR),
                             dtype=np.float32) / 255.0
            return jnp.asarray(arr[None] * 2.0 - 1.0)

        preds = np.zeros((len(pred_list), 1000))
        for i, name in enumerate(pred_list):
            pred_img = Image.open(os.path.join(opt.predict_dir, name))
            preds[i] = np.asarray(inc_fwd(inc_vars, to_inc_input(pred_img))[0])
        is_mean, is_std = inception_score(preds, splits=1)

    lpips_list.sort(key=lambda x: x[1], reverse=True)
    with open(os.path.join(opt.predict_dir, "lpips.txt"), "a") as f:
        for name, score in lpips_list:
            f.write(f"{name} {score}\n")
    with open(os.path.join(opt.predict_dir, "eval.txt"), "a") as f:
        f.write(f"SSIM : {avg_ssim} / MSE : {avg_mse} / LPIPS : {avg_lpips}\n")
        f.write(f"IS_mean : {is_mean} / IS_std : {is_std}\n")

    print("SSIM : %f / MSE : %f / LPIPS : %f" % (avg_ssim, avg_mse, avg_lpips))
    print("IS_mean : %f / IS_std : %f" % (is_mean, is_std))
    return avg_ssim, avg_mse, avg_lpips, is_mean, is_std


if __name__ == "__main__":
    main()
