"""Condition-stage test CLI — equivalent of /root/reference/test_condition.py.

Runs tocg over the test split, saves 12-panel grids, and (with a discriminator
checkpoint + --norm_const) writes the sorted discriminator-rejection scores to
rejection_prob.txt (test_condition.py:118-153).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from hrviton_tpu.cli.common import (add_ignored_reference_flags,
                                    add_data_flags, add_tocg_flags,
                                    data_cfg_from_args, load_tocg_variables)
from hrviton_tpu.config import (CondDiscriminatorConfig, PipelineConfig,
                                TOCGConfig)
from hrviton_tpu.data import Loader, VitonHDDataset
from hrviton_tpu.infer import d_logit, rejection_scores
from hrviton_tpu.models import CondMultiscaleDiscriminator, ConditionGenerator
from hrviton_tpu.pipelines.tryon import compose_clothmask
from hrviton_tpu.train.checkpoint import (convert_cond_discriminator,
                                          load_torch_state_dict, restore_into)
from hrviton_tpu.utils import make_image_grid, visualize_segmap


def get_opt(argv=None):
    p = argparse.ArgumentParser()
    add_data_flags(p, dataroot="./data/zalando-hd-resize", datamode="test",
                   data_list="test_pairs.txt", batch_size=8)
    add_tocg_flags(p)
    add_ignored_reference_flags(p, "--fp16", "--gpu_ids", "--checkpoint_dir", "--tensorboard_dir", "--tensorboard_count")
    p.add_argument("--datasetting", default="paired")
    p.add_argument("--tocg_checkpoint", default="")
    p.add_argument("--D_checkpoint", default="")
    p.add_argument("--Ddownx2", action="store_true")
    p.add_argument("--Ddropout", action="store_true")
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--spectral", action="store_true")
    p.add_argument("--norm_const", type=float, default=None)
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    opt = get_opt(argv)
    print(opt)

    tocg = ConditionGenerator(TOCGConfig(ngf=96, warp_feature=opt.warp_feature,
                                         out_layer=opt.out_layer,
                                         upsample=opt.upsample))
    k = jax.random.PRNGKey(opt.seed)
    tv = jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, opt.fine_height, opt.fine_width, 4)),
        jnp.zeros((1, opt.fine_height, opt.fine_width, 16)), train=False))(k)
    if opt.tocg_checkpoint and os.path.exists(opt.tocg_checkpoint):
        tv = load_tocg_variables(opt.tocg_checkpoint, tv, opt.out_layer)

    d_model = None
    dv = None
    if opt.D_checkpoint and os.path.exists(opt.D_checkpoint):
        if opt.norm_const is None:
            raise SystemExit("--norm_const is required with --D_checkpoint "
                             "(run get_norm_const first)")
        d_cfg = CondDiscriminatorConfig(
            input_nc=4 + opt.semantic_nc + 3 + opt.output_nc,
            num_d=opt.num_D, ddownx2=opt.Ddownx2, ddropout=opt.Ddropout,
            spectral=opt.spectral)
        d_model = CondMultiscaleDiscriminator(d_cfg)
        dv = jax.jit(lambda key: d_model.init(
            key,
            jnp.zeros((1, opt.fine_height, opt.fine_width, d_cfg.input_nc)),
            train=False))(k)
        if opt.D_checkpoint.endswith((".pth", ".pt")):
            dv = convert_cond_discriminator(
                load_torch_state_dict(opt.D_checkpoint), opt.num_D)
        else:
            dv = restore_into(dv, opt.D_checkpoint)

    @jax.jit
    def run_impl(tv, dv, input1, input2):
        flow_list, seg, wc, wcm = tocg.apply(tv, input1, input2, train=False)
        seg = compose_clothmask(seg, wcm, opt.clothmask_composition)
        logits = None
        if d_model is not None:
            seg_softmax = jax.nn.softmax(seg, axis=-1)
            pred = d_model.apply(dv, jnp.concatenate(
                [input1, input2, seg_softmax], axis=-1), train=False)
            logits = d_logit(pred)
        return seg, wc, wcm, logits

    def run(input1, input2):
        return run_impl(tv, dv, input1, input2)

    ds = VitonHDDataset(data_cfg_from_args(opt), mode="test")
    loader = Loader(ds, opt.batch_size, shuffle=False, drop_last=False,
                    num_workers=opt.workers,
                    worker_processes=opt.worker_processes)
    ckname = opt.tocg_checkpoint.split("/")[-2:] if opt.tocg_checkpoint else ["x", "y"]
    out_dir = os.path.join(opt.output_dir, *ckname, opt.datamode,
                           opt.datasetting, "multi-task")
    os.makedirs(out_dir, exist_ok=True)

    scores = []
    num = 0
    t0 = time.time()
    steps = (len(ds) + opt.batch_size - 1) // opt.batch_size
    for _ in range(steps):
        raw = loader.next_batch()
        cm = (jnp.asarray(raw["cloth_mask"][opt.datasetting]) > 0.5
              ).astype(jnp.float32)
        input1 = jnp.concatenate([jnp.asarray(raw["cloth"][opt.datasetting]),
                                  cm], axis=-1)
        input2 = jnp.concatenate([jnp.asarray(raw["parse_agnostic"]),
                                  jnp.asarray(raw["densepose"])], axis=-1)
        seg, wc, wcm, logits = run(input1, input2)
        if logits is not None:
            s = rejection_scores(logits, opt.norm_const)
            for i in range(len(s)):
                name = raw["c_name"]["paired"][i].replace(".jpg", ".png")
                scores.append((name, float(s[i])))

        wcm_hard = np.asarray(wcm) > 0.5
        fake_cm = np.asarray(jnp.argmax(seg, -1) == 3)[..., None]
        for i in range(input1.shape[0]):
            panels = [
                np.asarray(raw["cloth"][opt.datasetting][i]) / 2 + 0.5,
                np.repeat(np.asarray(cm[i]), 3, -1),
                visualize_segmap(raw["parse_agnostic"], i),
                (np.asarray(raw["densepose"][i]) + 1) / 2,
                np.asarray(raw["parse_cloth"][i]) / 2 + 0.5,
                np.repeat(np.asarray(raw["pcm"][i]), 3, -1),
                np.asarray(wc[i], dtype=np.float32) / 2 + 0.5,
                np.repeat(wcm_hard[i].astype(np.float32), 3, -1),
                visualize_segmap(raw["parse"], i),
                visualize_segmap(np.asarray(seg, dtype=np.float32), i),
                np.asarray(raw["image"][i]) / 2 + 0.5,
                np.repeat(np.clip(fake_cm[i].astype(np.float32) -
                                  wcm_hard[i], 0, 1), 3, -1),
            ]
            grid = make_image_grid(panels, nrow=4)
            name = (raw["c_name"]["paired"][i].split(".")[0] + "_" +
                    raw["c_name"]["unpaired"][i].split(".")[0] + ".png")
            Image.fromarray((grid * 255).astype(np.uint8)).save(
                os.path.join(out_dir, name))
        num += input1.shape[0]
        print(num, flush=True)

    if scores:
        scores.sort(key=lambda x: x[1], reverse=True)
        with open(os.path.join(out_dir, "rejection_prob.txt"), "w") as f:
            for name, s in scores:
                f.write(f"{name} {s}\n")
    loader.close()
    print(f"Test time {time.time() - t0}")


if __name__ == "__main__":
    main()
