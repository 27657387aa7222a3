"""Inference CLI — drop-in equivalent of /root/reference/test_generator.py.

Full unpaired try-on at 1024x768: jitted tocg + SPADE pipeline, saves output
JPEGs and 12-panel debug grids. Accepts either framework (.ckpt msgpack) or
original torch (.pth) checkpoints (converted on the fly).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from hrviton_tpu.cli.common import (add_ignored_reference_flags,
                                    add_data_flags, add_spade_flags,
                                    add_tocg_flags, data_cfg_from_args,
                                    load_gen_variables, load_tocg_variables)
from hrviton_tpu.config import PipelineConfig, SPADEGenConfig, TOCGConfig
from hrviton_tpu.core.precision import bf16_params
from hrviton_tpu.data import Loader, VitonHDDataset, expand_compact
from hrviton_tpu.models import ConditionGenerator, SPADEGenerator
from hrviton_tpu.pipelines import tryon_forward
from hrviton_tpu.utils import (make_image_grid, save_images, to_uint8,
                               visualize_segmap)
from PIL import Image


def get_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--test_name", default="test")
    add_data_flags(p, dataroot="./data/zalando-hd-resize", datamode="test",
                   data_list="test_pairs.txt", fine_width=768,
                   fine_height=1024, batch_size=1)
    add_tocg_flags(p)
    add_ignored_reference_flags(p, "--cuda", "--fp16", "--gpu_ids", "--checkpoint_dir", "--tensorboard_dir", "--tensorboard_count")
    add_spade_flags(p)
    p.add_argument("--output_dir", default="./Output")
    p.add_argument("--datasetting", default="unpaired")
    p.add_argument("--tocg_checkpoint",
                   default="./eval_models/weights/v0.1/mtviton.pth")
    p.add_argument("--gen_checkpoint",
                   default="./eval_models/weights/v0.1/gen.pth")
    p.add_argument("--cond_height", type=int, default=256)
    p.add_argument("--cond_width", type=int, default=192)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (default f32 for strict parity)")
    p.add_argument("--no_grids", action="store_true",
                   help="skip 12-panel debug grids (faster)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    opt = get_opt(argv)
    print(opt)

    pcfg = PipelineConfig(fine_height=opt.fine_height, fine_width=opt.fine_width,
                          cond_height=opt.cond_height, cond_width=opt.cond_width,
                          clothmask_composition=opt.clothmask_composition,
                          occlusion=opt.occlusion, upsample=opt.upsample)
    tocg = ConditionGenerator(TOCGConfig(ngf=96, warp_feature=opt.warp_feature,
                                         out_layer=opt.out_layer,
                                         upsample=opt.upsample))
    gen = SPADEGenerator(SPADEGenConfig(
        ngf=opt.ngf, gen_semantic_nc=opt.gen_semantic_nc,
        num_upsampling_layers=opt.num_upsampling_layers, norm_g=opt.norm_G,
        fine_height=opt.fine_height, fine_width=opt.fine_width))

    # jit the inits: eager init dispatches thousands of tiny ops (very slow
    # over the TPU tunnel); one compiled program instead
    k = jax.random.PRNGKey(opt.seed)
    tv = jax.jit(lambda key: tocg.init(
        key, jnp.zeros((1, opt.cond_height, opt.cond_width, 4)),
        jnp.zeros((1, opt.cond_height, opt.cond_width, 16)), train=False))(k)
    gv = jax.jit(lambda key: gen.init(
        {"params": key, "noise": key},
        jnp.zeros((1, opt.fine_height, opt.fine_width, 9)),
        jnp.zeros((1, opt.fine_height, opt.fine_width, 7)), train=False))(k)
    if opt.tocg_checkpoint and os.path.exists(opt.tocg_checkpoint):
        tv = load_tocg_variables(opt.tocg_checkpoint, tv, opt.out_layer)
    else:
        print(f"WARNING: tocg checkpoint missing ({opt.tocg_checkpoint}); "
              "random weights")
    if opt.gen_checkpoint and os.path.exists(opt.gen_checkpoint):
        gv = load_gen_variables(opt.gen_checkpoint, gv,
                                opt.num_upsampling_layers)
    else:
        print(f"WARNING: gen checkpoint missing ({opt.gen_checkpoint}); "
              "random weights")
    if opt.bf16:
        tv, gv = bf16_params(tv), bf16_params(gv)

    noise_key = jax.random.PRNGKey(opt.seed + 1)

    # weights as jit arguments (not HLO constants)
    @jax.jit
    def run_impl(tocg_vars, gen_vars, batch):
        def tocg_apply(i1, i2):
            return tocg.apply(tocg_vars, i1, i2, train=False)

        def gen_apply(x, seg):
            return gen.apply(gen_vars, x, seg, train=False,
                             rngs={"noise": noise_key})

        return tryon_forward(tocg_apply, gen_apply, batch, pcfg,
                             cloth_key="cloth", clothmask_key="cloth_mask")

    def run(batch):
        return run_impl(tv, gv, batch)

    # compact wire format: uint8 host->device (10x fewer bytes over the
    # interconnect), normalize/one-hot expanded on device (data/device.py)
    compact = not opt.no_device_preprocess
    ds = VitonHDDataset(data_cfg_from_args(opt), mode="test_gen",
                        compact=compact)
    loader = Loader(ds, opt.batch_size, shuffle=False, drop_last=False,
                    num_workers=opt.workers,
                    worker_processes=opt.worker_processes)
    import functools
    expand = jax.jit(functools.partial(expand_compact,
                                       semantic_nc=opt.semantic_nc))

    output_dir = opt.output_dir or os.path.join(
        "./output", opt.test_name, opt.datamode, opt.datasetting,
        "generator", "output")
    grid_dir = os.path.join("./output", opt.test_name, opt.datamode,
                            opt.datasetting, "generator", "grid")
    os.makedirs(output_dir, exist_ok=True)
    os.makedirs(grid_dir, exist_ok=True)

    dtype = jnp.bfloat16 if opt.bf16 else jnp.float32
    num = 0
    t0 = time.time()
    steps = (len(ds) + opt.batch_size - 1) // opt.batch_size
    for _ in range(steps):
        raw = loader.next_batch()
        names = raw.pop("c_name")
        raw.pop("im_name")
        if compact:
            # expanded dict has the full-contract keys, so the grid code
            # below is oblivious to the wire format
            raw = expand(jax.tree_util.tree_map(jnp.asarray, raw))
        batch = {
            "cloth": raw["cloth"][opt.datasetting],
            "cloth_mask": raw["cloth_mask"][opt.datasetting],
            "parse_agnostic": raw["parse_agnostic"],
            "densepose": raw["densepose"],
            "agnostic": raw["agnostic"],
        }
        batch = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype=dtype), batch)
        output, cond = run(batch)
        output = np.asarray(output.astype(jnp.float32))

        out_names = []
        for i in range(output.shape[0]):
            out_name = (names["paired"][i].split(".")[0] + "_" +
                        names[opt.datasetting][i].split(".")[0] + ".png")
            out_names.append(out_name)
            if not opt.no_grids:
                f32 = lambda x: np.asarray(x[i], dtype=np.float32)
                panels = [
                    f32(batch["cloth"]) / 2 + 0.5,
                    np.repeat(f32(batch["cloth_mask"]), 3, -1),
                    visualize_segmap(np.asarray(raw["parse_agnostic"]), i),
                    (f32(batch["densepose"]) + 1) / 2,
                    f32(cond.warped_cloth) / 2 + 0.5,
                    np.repeat(np.clip(f32(cond.warped_clothmask), 0, 1), 3, -1),
                    visualize_segmap(
                        np.asarray(cond.fake_parse_gauss, dtype=np.float32), i),
                    f32(raw["pose"]) / 2 + 0.5,
                    f32(cond.warped_cloth) / 2 + 0.5,
                    f32(batch["agnostic"]) / 2 + 0.5,
                    f32(raw["image"]) / 2 + 0.5,
                    output[i] / 2 + 0.5,
                ]
                grid = make_image_grid(panels, nrow=4)
                Image.fromarray((grid * 255).astype(np.uint8)).save(
                    os.path.join(grid_dir, out_name))
        save_images(output, out_names, output_dir)
        num += output.shape[0]
        print(num, flush=True)

    loader.close()
    print(f"Test time {time.time() - t0}")
    print("Finished testing!")


if __name__ == "__main__":
    main()
