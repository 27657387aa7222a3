"""Norm-constant CLI — equivalent of /root/reference/get_norm_const.py.

Computes M = max over the train set of the discriminator odds l/(1-l) on both
real and predicted segmaps; feed M to test_condition --norm_const.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.cli.common import (add_data_flags, add_tocg_flags,
                                    add_ignored_reference_flags,
                                    data_cfg_from_args, load_tocg_variables)
from hrviton_tpu.config import CondDiscriminatorConfig, TOCGConfig
from hrviton_tpu.data import Loader, VitonHDDataset
from hrviton_tpu.infer import d_logit, norm_const_from_logits
from hrviton_tpu.models import CondMultiscaleDiscriminator, ConditionGenerator
from hrviton_tpu.pipelines.tryon import compose_clothmask
from hrviton_tpu.train.checkpoint import (convert_cond_discriminator,
                                          load_torch_state_dict, restore_into)


def get_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="test")
    add_data_flags(p, dataroot="./data", datamode="train",
                   data_list="train_pairs.txt", batch_size=8)
    add_tocg_flags(p)
    add_ignored_reference_flags(
        p, "--checkpoint_dir", "--display_count", "--fp16", "--gpu_ids",
        "--keep_step", "--load_step", "--save_count", "--tensorboard_count",
        "--tensorboard_dir", "--test_data_list", "--test_dataroot",
        "--test_datasetting")
    p.add_argument("--tocg_checkpoint", default="")
    p.add_argument("--D_checkpoint", default="")
    p.add_argument("--Ddownx2", action="store_true")
    p.add_argument("--Ddropout", action="store_true")
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--spectral", action="store_true")
    p.add_argument("--max_samples", type=int, default=0,
                   help="limit train samples scanned (0 = all)")
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

    d_cfg = CondDiscriminatorConfig(
        input_nc=4 + opt.semantic_nc + 3 + opt.output_nc, num_d=opt.num_D,
        ddownx2=opt.Ddownx2, ddropout=opt.Ddropout, spectral=opt.spectral)
    d_model = CondMultiscaleDiscriminator(d_cfg)
    dv = jax.jit(lambda key: d_model.init(
        key, jnp.zeros((1, opt.fine_height, opt.fine_width, d_cfg.input_nc)),
        train=False))(k)
    if opt.D_checkpoint and os.path.exists(opt.D_checkpoint):
        if opt.D_checkpoint.endswith((".pth", ".pt")):
            dv = convert_cond_discriminator(
                load_torch_state_dict(opt.D_checkpoint), opt.num_D)
        else:
            dv = restore_into(dv, opt.D_checkpoint)

    @jax.jit
    def run_impl(tv, dv, input1, input2, label):
        flow_list, seg, wc, wcm = tocg.apply(tv, input1, input2, train=False)
        seg = compose_clothmask(seg, wcm, opt.clothmask_composition)
        seg_softmax = jax.nn.softmax(seg, axis=-1)
        real = d_model.apply(dv, jnp.concatenate([input1, input2, label], -1),
                             train=False)
        fake = d_model.apply(dv, jnp.concatenate([input1, input2, seg_softmax],
                                                 -1), train=False)
        return d_logit(real), d_logit(fake)

    def run(input1, input2, label):
        return run_impl(tv, dv, input1, input2, label)

    ds = VitonHDDataset(data_cfg_from_args(opt), mode="train")
    loader = Loader(ds, opt.batch_size, shuffle=False, drop_last=False,
                    num_workers=opt.workers,
                    worker_processes=opt.worker_processes)
    length = len(ds) if opt.max_samples == 0 else min(opt.max_samples, len(ds))

    real_logits, fake_logits = [], []
    for step in range(max(1, length // opt.batch_size)):
        raw = loader.next_batch()
        cm = (jnp.asarray(raw["cloth_mask"]["paired"]) > 0.5).astype(jnp.float32)
        input1 = jnp.concatenate([jnp.asarray(raw["cloth"]["paired"]), cm], -1)
        input2 = jnp.concatenate([jnp.asarray(raw["parse_agnostic"]),
                                  jnp.asarray(raw["densepose"])], -1)
        lr, lf = run(input1, input2, jnp.asarray(raw["parse"]))
        real_logits.append(np.asarray(lr))
        fake_logits.append(np.asarray(lf))
        print("real:", np.asarray(lr), "fake:", np.asarray(lf), flush=True)

    loader.close()
    m = norm_const_from_logits(real_logits, fake_logits)
    print("M:", m)
    return m


if __name__ == "__main__":
    main()
