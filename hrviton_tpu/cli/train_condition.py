"""Stage-1 training CLI — drop-in equivalent of
/root/reference/train_condition.py (flags preserved; see --help).

Runs the jitted ConditionTrainer step data-parallel over the device mesh, with
in-train IoU validation every --val_count steps over 2000 test samples,
TensorBoard panels every --tensorboard_count, checkpoints every --save_count.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from hrviton_tpu.cli.common import (add_ignored_reference_flags,
                                    add_data_flags, add_tocg_flags,
                                    check_pretrained_backbone,
                                    data_cfg_from_args, load_tocg_variables)
from hrviton_tpu.config import (CondDiscriminatorConfig, ConditionTrainConfig,
                                TOCGConfig)
from hrviton_tpu.core.mesh import (batch_sharding, make_mesh, replicated,
                                   shard_batch, shard_eval_batch)
from hrviton_tpu.data import Loader, VitonHDDataset, expand_compact
from hrviton_tpu.losses.perceptual import make_vgg_loss
from hrviton_tpu.train import ConditionTrainer, save_pytree
from hrviton_tpu.train.state import NetState
from hrviton_tpu.utils import Board, make_image_grid, visualize_segmap


def get_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="test")
    add_data_flags(p, dataroot="./data/", datamode="train",
                   data_list="train_pairs.txt")
    add_tocg_flags(p)
    add_ignored_reference_flags(p, "--cuda", "--gpu_ids")
    p.add_argument("--tensorboard_dir", default="tensorboard")
    p.add_argument("--checkpoint_dir", default="checkpoints")
    p.add_argument("--tocg_checkpoint", default="")
    p.add_argument("--vgg_weights", default="",
                   help="converted VGG19 weights (msgpack); required unless "
                        "--allow_random_vgg")
    p.add_argument("--allow_random_vgg", action="store_true",
                   help="run with a randomly initialized VGG19 perceptual "
                        "backbone (changes the training objective; smoke "
                        "tests only)")
    p.add_argument("--tensorboard_count", type=int, default=100)
    p.add_argument("--display_count", type=int, default=100)
    p.add_argument("--save_count", type=int, default=10000)
    p.add_argument("--load_step", type=int, default=0)
    p.add_argument("--keep_step", type=int, default=300000)
    p.add_argument("--Ddownx2", action="store_true")
    p.add_argument("--Ddropout", action="store_true")
    p.add_argument("--num_D", type=int, default=2)
    p.add_argument("--spectral", action="store_true")
    p.add_argument("--G_D_seperate", action="store_true")
    p.add_argument("--no_GAN_loss", action="store_true")
    p.add_argument("--lasttvonly", action="store_true")
    p.add_argument("--interflowloss", action="store_true")
    p.add_argument("--edgeawaretv", choices=["no_edge", "last_only", "weighted"],
                   default="no_edge")
    p.add_argument("--add_lasttv", action="store_true")
    p.add_argument("--no_test_visualize", action="store_true")
    p.add_argument("--num_test_visualize", type=int, default=3)
    p.add_argument("--test_datasetting", default="unpaired")
    p.add_argument("--test_dataroot", default="./data/")
    p.add_argument("--test_data_list", default="test_pairs.txt")
    p.add_argument("--G_lr", type=float, default=2e-4)
    p.add_argument("--D_lr", type=float, default=2e-4)
    p.add_argument("--CElamda", type=float, default=10)
    p.add_argument("--GANlambda", type=float, default=1)
    p.add_argument("--tvlambda", type=float, default=2)
    p.add_argument("--val_count", type=int, default=1000)
    p.add_argument("--val_samples", type=int, default=2000)
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
    check_pretrained_backbone(opt.vgg_weights, what="VGG19 (perceptual loss)",
                              flag="--vgg_weights",
                              allowed=opt.allow_random_vgg,
                              allow_flag="--allow_random_vgg")

    if opt.coordinator:
        from hrviton_tpu.core.mesh import init_distributed
        init_distributed(opt.coordinator, opt.num_processes, opt.process_id)

    tcfg = ConditionTrainConfig(
        batch_size=opt.batch_size, keep_step=opt.keep_step, g_lr=opt.G_lr,
        d_lr=opt.D_lr, ce_lambda=opt.CElamda, gan_lambda=opt.GANlambda,
        tv_lambda=opt.tvlambda, no_gan_loss=opt.no_GAN_loss,
        g_d_separate=opt.G_D_seperate, lasttvonly=opt.lasttvonly,
        interflowloss=opt.interflowloss, edgeawaretv=opt.edgeawaretv,
        add_lasttv=opt.add_lasttv, occlusion=opt.occlusion,
        clothmask_composition=opt.clothmask_composition,
        val_count=opt.val_count, display_count=opt.display_count,
        save_count=opt.save_count, tensorboard_count=opt.tensorboard_count,
        load_step=opt.load_step, bf16=opt.bf16)
    tocg_cfg = TOCGConfig(input2_nc=opt.semantic_nc + 3, output_nc=opt.output_nc,
                          ngf=96, warp_feature=opt.warp_feature,
                          out_layer=opt.out_layer, upsample=opt.upsample)
    d_cfg = CondDiscriminatorConfig(
        input_nc=4 + opt.semantic_nc + 3 + opt.output_nc, num_d=opt.num_D,
        ddownx2=opt.Ddownx2, ddropout=opt.Ddropout, spectral=opt.spectral)

    # data
    compact = not opt.no_device_preprocess
    train_ds = VitonHDDataset(data_cfg_from_args(opt), mode="train",
                              compact=compact)
    train_loader = Loader(train_ds, opt.batch_size, shuffle=True,
                          num_workers=opt.workers, seed=opt.seed,
                          process_id=jax.process_index(),
                          num_processes=jax.process_count(),
                          worker_processes=opt.worker_processes)
    val_loader = test_loader = None
    if not opt.no_test_visualize:
        import dataclasses
        test_cfg = dataclasses.replace(
            data_cfg_from_args(opt, mode="test", data_list=opt.test_data_list),
            dataroot=opt.test_dataroot)
        test_ds = VitonHDDataset(test_cfg, mode="test")
        val_loader = Loader(test_ds, opt.batch_size, shuffle=False,
                            num_workers=opt.workers,
                            indices=range(min(opt.val_samples, len(test_ds))))
        test_loader = Loader(test_ds, opt.num_test_visualize, shuffle=False,
                             num_workers=1)

    # model + trainer
    vgg_vars = None
    if opt.vgg_weights:
        from hrviton_tpu.train.checkpoint import load_pytree
        vgg_vars = load_pytree(opt.vgg_weights)
    vgg = make_vgg_loss(vgg_vars, image_hw=(opt.fine_height, opt.fine_width))
    trainer = ConditionTrainer(tocg_cfg, d_cfg, tcfg)
    frozen_vgg = vgg.variables
    state = trainer.init(jax.random.PRNGKey(opt.seed),
                         cond_hw=(opt.fine_height, opt.fine_width))
    if opt.tocg_checkpoint and os.path.exists(opt.tocg_checkpoint):
        gvars = load_tocg_variables(opt.tocg_checkpoint,
                                    template=state.g.variables(),
                                    out_layer=opt.out_layer)
        extras = {k: gvars[k] for k in state.g.extras if k in gvars}
        state = state.replace(g=NetState(gvars["params"],
                                         {**state.g.extras, **extras},
                                         state.g.opt_state))

    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))
    frozen_vgg = jax.device_put(frozen_vgg, replicated(mesh))
    shard = batch_sharding(mesh)

    board = Board(os.path.join(opt.tensorboard_dir, opt.name))
    ckpt_dir = os.path.join(opt.checkpoint_dir, opt.name)
    rng = jax.random.PRNGKey(opt.seed + 1)

    def put(batch, eval_path=False):
        names = {k: batch.pop(k) for k in ("im_name", "c_name") if k in batch}
        # multi-host-correct: each process contributes only its local shard;
        # eval/vis batches (num_test_visualize) needn't divide the data axis
        fn = shard_eval_batch if eval_path else shard_batch
        dev = fn(mesh, batch)
        return dev, names

    import functools
    expand = jax.jit(functools.partial(expand_compact,
                                       semantic_nc=opt.semantic_nc))

    t0 = time.time()
    with mesh:
        for step in range(opt.load_step, opt.keep_step):
            batch, _ = put(train_loader.next_batch())
            if compact:
                batch = expand(batch)
            rng, sub = jax.random.split(rng)
            state, metrics = trainer.train_step(state, batch, sub, frozen_vgg)

            if (step + 1) % tcfg.display_count == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"step {step + 1} t={time.time() - t0:.1f}s " +
                      " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())),
                      flush=True)
            if (step + 1) % tcfg.tensorboard_count == 0:
                board.scalars({k: float(v) for k, v in metrics.items()}, step + 1)
                if test_loader is not None:
                    # reference-style 12-panel grids (train_condition.py:377-435)
                    import numpy as _np
                    from hrviton_tpu.utils import visualize_segmap
                    vb_raw = test_loader.next_batch()
                    for k in ("im_name", "c_name"):
                        vb_raw.pop(k, None)
                    vb, _ = put(dict(vb_raw), eval_path=True)
                    vis = trainer.visualize(state, vb)
                    cm = (_np.asarray(vb_raw["cloth_mask"]["paired"]) > 0.5)
                    for i in range(min(opt.num_test_visualize,
                                       vb_raw["image"].shape[0])):
                        panels = [
                            _np.asarray(vb_raw["cloth"]["paired"][i]) / 2 + .5,
                            _np.repeat(cm[i].astype(_np.float32), 3, -1),
                            visualize_segmap(vb_raw["parse_agnostic"], i),
                            (_np.asarray(vb_raw["densepose"][i]) + 1) / 2,
                            _np.asarray(vb_raw["parse_cloth"][i]) / 2 + .5,
                            _np.repeat(_np.asarray(vb_raw["pcm"][i]), 3, -1),
                            _np.asarray(vis["warped_cloth"][i],
                                        dtype=_np.float32) / 2 + .5,
                            _np.repeat(_np.asarray(vis["warped_cm_onehot"][i]),
                                       3, -1),
                            visualize_segmap(vb_raw["parse"], i),
                            visualize_segmap(_np.asarray(
                                vis["seg_softmax"], dtype=_np.float32), i),
                            _np.asarray(vb_raw["image"][i]) / 2 + .5,
                            _np.repeat(_np.asarray(vis["misalign"][i]), 3, -1),
                        ]
                        board.image_grid(f"test_images/{i}",
                                         make_image_grid(panels, nrow=4),
                                         step + 1)
            if val_loader is not None and (step + 1) % tcfg.val_count == 0:
                ious = []
                for _ in range(max(1, opt.val_samples // opt.batch_size)):
                    vb, _ = put(val_loader.next_batch(), eval_path=True)
                    ious.append(float(trainer.eval_iou(state, vb)))
                board.scalar("val/iou", float(np.mean(ious)), step + 1)
                print(f"val/iou {np.mean(ious):.4f}", flush=True)
            if (step + 1) % tcfg.save_count == 0:
                save_pytree(state.g.variables(),
                            os.path.join(ckpt_dir, f"tocg_step_{step + 1:06d}.ckpt"))
                save_pytree(state.d.variables(),
                            os.path.join(ckpt_dir, f"D_step_{step + 1:06d}.ckpt"))

    save_pytree(state.g.variables(), os.path.join(ckpt_dir, "tocg_final.ckpt"))
    save_pytree(state.d.variables(), os.path.join(ckpt_dir, "D_final.ckpt"))
    board.close()
    print(f"Finished training {opt.name}!")


if __name__ == "__main__":
    main()
