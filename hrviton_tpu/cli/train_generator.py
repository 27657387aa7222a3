"""Stage-2 training CLI — drop-in equivalent of
/root/reference/train_generator.py (flags preserved; see --help).

Frozen tocg conditioning + SPADE generator/discriminator training with TTUR
and linear decay, in-train LPIPS validation over 500 test images every
--lpips_count steps, data-parallel over the device mesh, bf16-safe.
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
                                    add_tocg_flags, check_pretrained_backbone,
                                    data_cfg_from_args,
                                    load_gen_variables, load_tocg_variables)
from hrviton_tpu.config import (GeneratorTrainConfig, PipelineConfig,
                                SPADEDiscriminatorConfig, SPADEGenConfig,
                                TOCGConfig)
from hrviton_tpu.core.mesh import (batch_sharding, make_mesh, replicated,
                                   shard_batch, shard_eval_batch)
from hrviton_tpu.data import Loader, VitonHDDataset, expand_compact
from hrviton_tpu.losses.lpips import make_lpips
from hrviton_tpu.losses.perceptual import make_vgg_loss
from hrviton_tpu.models import ConditionGenerator
from hrviton_tpu.ops.resize import interpolate
from hrviton_tpu.train import GeneratorTrainer, save_pytree
from hrviton_tpu.utils import Board, make_image_grid, visualize_segmap


def get_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", required=True)
    add_data_flags(p, dataroot="./data/", datamode="train",
                   data_list="train_pairs.txt", fine_width=768,
                   fine_height=1024, batch_size=8)
    add_tocg_flags(p)
    add_ignored_reference_flags(p, "--cuda", "--gpu_ids", "--GMM_const", "--grid_size",
                                "--lambda_l1", "--netD_subarch", "--radius")
    add_spade_flags(p)
    p.add_argument("--tensorboard_dir", default="tensorboard")
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--tocg_checkpoint", default="")
    p.add_argument("--gen_checkpoint", default="")
    p.add_argument("--dis_checkpoint", default="")
    p.add_argument("--vgg_weights", default="")
    p.add_argument("--lpips_weights", default="")
    p.add_argument("--taps_wgrad", action="store_true", default=True,
                   help="im2col-free 3x3 conv weight gradients (lower peak "
                        "HBM; enables larger per-chip batches). Default on; "
                        "--no_taps_wgrad restores XLA's im2col wgrad")
    p.add_argument("--no_taps_wgrad", dest="taps_wgrad", action="store_false")
    p.add_argument("--fused_block", action="store_true",
                   help="fused SPADE-unit Pallas kernels in the TRAINING "
                        "generator. Default OFF for training: the unit's "
                        "custom VJP re-runs an isolated XLA forward per "
                        "unit in backward — measured +50 ms/step at b2 "
                        "1024x768 (ROADMAP §4, r5). Inference CLIs keep "
                        "the kernels on (they win there)")
    p.add_argument("--no_remat", dest="remat", action="store_false",
                   default=True,
                   help="store SPADE-block activations instead of "
                        "rematerializing them in backward: -72 ms/step at "
                        "b2 bf16 taps (r5) but needs the extra HBM — "
                        "default on (safe); b2 with --taps_wgrad fits")
    p.add_argument("--no_d_remat", dest="d_remat", action="store_false",
                   default=True,
                   help="store D activations instead of recomputing them "
                        "in backward: -22 ms/step at b2 (r5); default on "
                        "(safe)")
    p.add_argument("--allow_random_vgg", action="store_true",
                   help="run with a randomly initialized VGG19 perceptual "
                        "backbone (changes the training objective; smoke "
                        "tests only)")
    p.add_argument("--tensorboard_count", type=int, default=100)
    p.add_argument("--display_count", type=int, default=100)
    p.add_argument("--save_count", type=int, default=10000)
    p.add_argument("--load_step", type=int, default=0)
    p.add_argument("--keep_step", type=int, default=100000)
    p.add_argument("--decay_step", type=int, default=100000)
    p.add_argument("--lpips_count", type=int, default=1000)
    p.add_argument("--lpips_samples", type=int, default=500)
    p.add_argument("--lpips_batch", type=int, default=10,
                   help="batch size for the in-train LPIPS validation pass. "
                        "The metric is a mean of per-image distances, so "
                        "batching is exact; the reference's batch-1 loop "
                        "(train_generator.py:480-584) costs ~500 sequential "
                        "dispatches per tick")
    p.add_argument("--test_datasetting", default="paired")
    p.add_argument("--test_dataroot", default="./data/")
    p.add_argument("--test_data_list", default="test_pairs.txt")
    p.add_argument("--num_test_visualize", type=int, default=3,
                   help="unpaired test_images/i grid count per tensorboard "
                        "tick (train_generator.py:110,471)")
    p.add_argument("--G_lr", type=float, default=1e-4)
    p.add_argument("--D_lr", type=float, default=4e-4)
    p.add_argument("--no_ganFeat_loss", action="store_true")
    p.add_argument("--no_vgg_loss", action="store_true")
    p.add_argument("--lambda_feat", type=float, default=10.0)
    p.add_argument("--lambda_vgg", type=float, default=10.0)
    p.add_argument("--n_layers_D", type=int, default=3)
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--norm_D", default="spectralinstance")
    p.add_argument("--GT", action="store_true")
    p.add_argument("--cond_height", type=int, default=256)
    p.add_argument("--cond_width", type=int, default=192)
    p.add_argument("--fp16", "--bf16", dest="bf16", action="store_true",
                   help="bf16 compute / f32 params (the reference's --fp16)")
    p.add_argument("--seed", type=int, default=0)
    # multi-host (jax.distributed): run one process per host with these set
    p.add_argument("--coordinator", default="",
                   help="coordinator address host:port for multi-host runs")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    opt = get_opt(argv)
    print(opt)

    # fail fast, before dataset construction
    if not opt.no_vgg_loss:
        check_pretrained_backbone(opt.vgg_weights,
                                  what="VGG19 (perceptual loss)",
                                  flag="--vgg_weights",
                                  allowed=opt.allow_random_vgg,
                                  allow_flag="--allow_random_vgg")

    if opt.coordinator:
        from hrviton_tpu.core.mesh import init_distributed
        init_distributed(opt.coordinator, opt.num_processes, opt.process_id)

    tcfg = GeneratorTrainConfig(
        batch_size=opt.batch_size, keep_step=opt.keep_step,
        decay_step=opt.decay_step, g_lr=opt.G_lr, d_lr=opt.D_lr,
        lambda_feat=opt.lambda_feat, lambda_vgg=opt.lambda_vgg,
        no_gan_feat_loss=opt.no_ganFeat_loss, no_vgg_loss=opt.no_vgg_loss,
        gt_mode=opt.GT, occlusion=opt.occlusion,
        clothmask_composition=opt.clothmask_composition,
        lpips_count=opt.lpips_count, display_count=opt.display_count,
        save_count=opt.save_count, tensorboard_count=opt.tensorboard_count,
        load_step=opt.load_step, bf16=opt.bf16, taps_wgrad=opt.taps_wgrad,
        d_remat=opt.d_remat)
    pcfg = PipelineConfig(fine_height=opt.fine_height, fine_width=opt.fine_width,
                          cond_height=opt.cond_height, cond_width=opt.cond_width,
                          clothmask_composition=opt.clothmask_composition,
                          occlusion=opt.occlusion)

    # frozen tocg (weights ride as a jit argument via the `frozen` dict)
    tocg_cfg = None
    tocg_vars = {}
    if not opt.GT:
        tocg_cfg = TOCGConfig(ngf=96, warp_feature=opt.warp_feature,
                              out_layer=opt.out_layer)
        tocg = ConditionGenerator(tocg_cfg)
        template = jax.jit(lambda key: tocg.init(
            key, jnp.zeros((1, opt.cond_height, opt.cond_width, 4)),
            jnp.zeros((1, opt.cond_height, opt.cond_width, 16)),
            train=False))(jax.random.PRNGKey(0))
        tocg_vars = load_tocg_variables(opt.tocg_checkpoint, template,
                                        opt.out_layer) \
            if opt.tocg_checkpoint else template

    gen_cfg = SPADEGenConfig(ngf=opt.ngf, gen_semantic_nc=opt.gen_semantic_nc,
                             num_upsampling_layers=opt.num_upsampling_layers,
                             norm_g=opt.norm_G, fine_height=opt.fine_height,
                             fine_width=opt.fine_width,
                             fused_block=opt.fused_block, remat=opt.remat)
    d_cfg = SPADEDiscriminatorConfig(gen_semantic_nc=opt.gen_semantic_nc,
                                     ndf=opt.ndf, n_layers_d=opt.n_layers_D,
                                     num_d=opt.num_D,
                                     no_gan_feat_loss=opt.no_ganFeat_loss)

    vgg_vars = None
    if opt.vgg_weights:
        from hrviton_tpu.train.checkpoint import load_pytree
        vgg_vars = load_pytree(opt.vgg_weights)
    vgg = make_vgg_loss(vgg_vars, image_hw=(opt.fine_height, opt.fine_width))
    # random LPIPS only corrupts the in-train metric, not the objective: warn
    check_pretrained_backbone(opt.lpips_weights, what="LPIPS (in-train metric)",
                              flag="--lpips_weights", allowed=False,
                              allow_flag="--lpips_weights", refuse=False)
    lpips_vars = None
    if opt.lpips_weights:
        from hrviton_tpu.train.checkpoint import load_pytree
        lpips_vars = load_pytree(opt.lpips_weights)
    lpips = make_lpips(lpips_vars)

    trainer = GeneratorTrainer(gen_cfg, d_cfg, tcfg, pcfg, tocg_cfg)
    frozen = {"vgg": vgg.variables, "tocg": tocg_vars}
    state = trainer.init(jax.random.PRNGKey(opt.seed))
    if opt.gen_checkpoint and os.path.exists(opt.gen_checkpoint):
        gvars = load_gen_variables(opt.gen_checkpoint, state.g.variables(),
                                   opt.num_upsampling_layers)
        from hrviton_tpu.train.state import NetState
        extras = {k: gvars.get(k, state.g.extras[k]) for k in state.g.extras}
        state = state.replace(g=NetState(gvars["params"], extras,
                                         state.g.opt_state))

    # data
    compact = not opt.no_device_preprocess
    train_ds = VitonHDDataset(data_cfg_from_args(opt), mode="train",
                              compact=compact)
    train_loader = Loader(train_ds, opt.batch_size, shuffle=True,
                          num_workers=opt.workers, seed=opt.seed,
                          process_id=jax.process_index(),
                          num_processes=jax.process_count(),
                          worker_processes=opt.worker_processes)
    import dataclasses
    test_cfg = dataclasses.replace(
        data_cfg_from_args(opt, mode="test", data_list=opt.test_data_list),
        dataroot=opt.test_dataroot)
    test_ds = VitonHDDataset(test_cfg, mode="test_gen")
    # batched LPIPS validation: mean of per-image distances is exact under
    # batching (equal-size batches), so one tick is lpips_samples/lpips_batch
    # jit dispatches instead of the reference's 500 (train_generator.py:480)
    n_eval = min(opt.lpips_samples, len(test_ds))
    lpips_batch = max(1, min(opt.lpips_batch, n_eval))
    lpips_iters = max(1, n_eval // lpips_batch)
    if lpips_iters * lpips_batch != n_eval:
        print(f"note: lpips_batch={lpips_batch} does not divide "
              f"{n_eval} eval samples; scoring {lpips_iters * lpips_batch}")
    test_loader = Loader(test_ds, lpips_batch, shuffle=False,
                         num_workers=opt.workers,
                         indices=range(lpips_iters * lpips_batch))
    # unpaired visualization loader (train_generator.py:618-624: batch_size is
    # forced to num_test_visualize, shuffled test split)
    vis_loader = Loader(test_ds, min(opt.num_test_visualize, len(test_ds)),
                        shuffle=True, num_workers=0, seed=opt.seed + 7)

    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))
    frozen = jax.device_put(frozen, replicated(mesh))
    shard = batch_sharding(mesh)
    board = Board(os.path.join(opt.tensorboard_dir, opt.name))
    ckpt_dir = os.path.join(opt.checkpoint_dir, opt.name)
    rng = jax.random.PRNGKey(opt.seed + 1)

    lpips_resize = jax.jit(
        lambda a, b: lpips(interpolate(a, (128, 128), "bilinear"),
                           interpolate(b, (128, 128), "bilinear")))

    def put(batch, eval_path=False):
        for k in ("im_name", "c_name"):
            batch.pop(k, None)
        # flatten paired cloth keys (train_generator.py:195-196)
        batch["cloth"] = batch["cloth"]["paired"]
        batch["cloth_mask"] = batch["cloth_mask"]["paired"]
        # multi-host-correct: each process contributes only its local shard;
        # eval batches (lpips_batch) needn't divide the data axis — replicate
        if eval_path:
            return shard_eval_batch(mesh, batch)
        return shard_batch(mesh, batch)

    import functools
    expand = jax.jit(functools.partial(expand_compact,
                                       semantic_nc=opt.semantic_nc))

    t0 = time.time()
    with mesh:
        for step in range(opt.load_step, opt.keep_step + opt.decay_step):
            batch = put(train_loader.next_batch())
            if compact:
                batch = expand(batch)
            rng, sub = jax.random.split(rng)
            state, metrics = trainer.train_step(state, batch, sub, frozen)

            if (step + 1) % tcfg.display_count == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"step {step + 1} t={time.time() - t0:.1f}s " +
                      " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())),
                      flush=True)
            if (step + 1) % tcfg.tensorboard_count == 0:
                board.scalars({k: float(v) for k, v in metrics.items()}, step + 1)

                # 10-panel grids, reference layout (train_generator.py:366-476)
                def grid_panels(tb, out, warped, fpg, i):
                    dp = np.asarray(tb["densepose"][i], np.float32)
                    return [
                        np.asarray(tb["cloth"][i], np.float32) / 2 + 0.5,
                        np.repeat(np.asarray(tb["cloth_mask"][i], np.float32),
                                  3, -1),
                        (dp + 1) / 2,
                        visualize_segmap(
                            np.asarray(tb["parse_agnostic"], np.float32), i),
                        np.asarray(warped[i], np.float32) / 2 + 0.5,
                        np.asarray(tb["agnostic"][i], np.float32) / 2 + 0.5,
                        dp / 2 + 0.5,
                        visualize_segmap(np.asarray(fpg, np.float32), i),
                        np.asarray(out[i], np.float32) / 2 + 0.5,
                        np.asarray(tb["image"][i], np.float32) / 2 + 0.5,
                    ]

                rng, sub = jax.random.split(rng)
                out, warped, fpg = trainer.generate_debug(
                    state, batch, sub, frozen.get("tocg"))
                board.image_grid(
                    "train_images",
                    make_image_grid(grid_panels(batch, out, warped, fpg, 0),
                                    nrow=4), step + 1)

                vb = vis_loader.next_batch()
                vb.pop("im_name", None)
                vb.pop("c_name", None)
                # unpaired cloth for the test grids (train_generator.py:391-392)
                vb["cloth"] = vb["cloth"]["unpaired"]
                vb["cloth_mask"] = vb["cloth_mask"]["unpaired"]
                # no explicit batch sharding: num_test_visualize needn't
                # divide the mesh; jit replicates/places as needed
                rng, sub = jax.random.split(rng)
                out, warped, fpg = trainer.generate_debug(
                    state, vb, sub, frozen.get("tocg"))
                for i in range(out.shape[0]):
                    board.image_grid(
                        f"test_images/{i}",
                        make_image_grid(grid_panels(vb, out, warped, fpg, i),
                                        nrow=4), step + 1)
            if (step + 1) % tcfg.lpips_count == 0:
                dists = []
                for _ in range(lpips_iters):
                    tb = put(test_loader.next_batch(), eval_path=True)
                    rng, sub = jax.random.split(rng)
                    out = trainer.generate(state, tb, sub,
                                           frozen.get("tocg"))
                    dists.append(float(jnp.mean(lpips_resize(tb["image"], out))))
                board.scalar("test/LPIPS", float(np.mean(dists)), step + 1)
                print(f"LPIPS {np.mean(dists):.4f}", flush=True)
            if (step + 1) % tcfg.save_count == 0:
                save_pytree(state.g.variables(),
                            os.path.join(ckpt_dir, f"gen_step_{step + 1:06d}.ckpt"))
                save_pytree(state.d.variables(),
                            os.path.join(ckpt_dir, f"dis_step_{step + 1:06d}.ckpt"))

    save_pytree(state.g.variables(), os.path.join(ckpt_dir, "gen_model_final.ckpt"))
    save_pytree(state.d.variables(), os.path.join(ckpt_dir, "dis_model_final.ckpt"))
    board.close()
    print(f"Finished training {opt.name}!")


if __name__ == "__main__":
    main()
