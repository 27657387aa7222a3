"""Measure where the multichip dryrun's one-core cold time goes.

Strategy under test (the round-3 dryrun design):
  * eval_shape the model inits (pure tracing, no XLA compile);
  * materialize params + optimizer state + synthetic data in ONE jitted
    builder whose out_shardings put state/frozen replicated and the batch
    sharded — zero host->device per-leaf transfers (measured 160 s on this
    one-core host for ~700 leaves x 8 devices);
  * rbg PRNG (hardware-style, tiny lowering) instead of threefry;
  * taps_wgrad off, d_remat off, gen remat off, no_vgg_loss — compile-time
    reductions that do not change what the artifact certifies.
Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -u tools/exp_dryrun_compile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

from hrviton_tpu.config import (GeneratorTrainConfig, PipelineConfig,
                                SPADEDiscriminatorConfig, SPADEGenConfig,
                                TOCGConfig)
from hrviton_tpu.core.mesh import batch_sharding, make_mesh, replicated
from hrviton_tpu.models import ConditionGenerator
from hrviton_tpu.train.generator_trainer import GeneratorTrainer
from hrviton_tpu.train.state import GANState, NetState

T0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter() - T0:6.1f}s] {msg}", flush=True)


n_devices = 8
devices = jax.devices("cpu")
mesh = make_mesh(devices[:n_devices])
mark("mesh")

fine_h = fine_w = 64
cond_h = cond_w = 32
batch = n_devices
pcfg = PipelineConfig(fine_height=fine_h, fine_width=fine_w,
                      cond_height=cond_h, cond_width=cond_w)
tocg_cfg = TOCGConfig(ngf=4)
tocg = ConditionGenerator(tocg_cfg)
gen_cfg = SPADEGenConfig(ngf=4, fine_height=fine_h, fine_width=fine_w,
                         num_upsampling_layers="more", remat=False)
d_cfg = SPADEDiscriminatorConfig(ndf=4)
tcfg = GeneratorTrainConfig(batch_size=batch, no_vgg_loss=True,
                            taps_wgrad=False, d_remat=False)
trainer = GeneratorTrainer(gen_cfg, d_cfg, tcfg, pcfg, tocg_cfg)
key = jax.random.PRNGKey(0)

# ---- shapes only: eval_shape never compiles ----------------------------------
tocg_shapes = jax.eval_shape(
    lambda k: tocg.init(k, jnp.zeros((1, cond_h, cond_w, 4)),
                        jnp.zeros((1, cond_h, cond_w, 16)), train=False), key)
gen_shapes = jax.eval_shape(
    lambda a, b: trainer.gen.init(
        {"params": a, "noise": b},
        jnp.zeros((1, fine_h, fine_w, gen_cfg.input_nc)),
        jnp.zeros((1, fine_h, fine_w, gen_cfg.gen_semantic_nc)),
        train=False), key, key)
d_shapes = jax.eval_shape(
    lambda k: trainer.d.init(
        k, jnp.zeros((1, fine_h, fine_w, d_cfg.input_nc)), train=False), key)
mark("shapes traced")

CHANNELS = {"cloth": 3, "cloth_mask": 1, "parse_agnostic": 13, "densepose": 3,
            "agnostic": 3, "image": 3, "parse": 13, "parse_cloth": 3}


def _fill_tree(shapes, flat):
    """Carve per-leaf fills out of one positive random vector (values are
    irrelevant to the certification; positivity keeps variance-like leaves and
    spectral-norm u vectors numerically safe)."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    out, off = [], 0
    for s in leaves:
        n = int(np.prod(s.shape)) if s.shape else 1
        if jnp.issubdtype(s.dtype, jnp.floating):
            out.append(jax.lax.dynamic_slice_in_dim(flat, off, n)
                       .reshape(s.shape).astype(s.dtype))
            off += n
        else:
            out.append(jnp.zeros(s.shape, s.dtype))
    return jax.tree_util.tree_unflatten(treedef, out), off


def _size(shapes):
    return sum(int(np.prod(s.shape)) if s.shape else 1
               for s in jax.tree_util.tree_leaves(shapes)
               if jnp.issubdtype(s.dtype, jnp.floating))


TOTAL = _size(tocg_shapes) + _size(gen_shapes) + _size(d_shapes)


def build_all(k):
    kp, kd = jax.random.split(k)
    flat = jnp.abs(jax.random.normal(kp, (TOTAL,), jnp.float32)) * 0.2 + 0.05
    tocg_vars, off = _fill_tree(tocg_shapes, flat)
    gv, off2 = _fill_tree(gen_shapes, flat[off:])
    dv, _ = _fill_tree(d_shapes, flat[off + off2:])
    gp = dict(gv).pop("params"); ge = {a: b for a, b in gv.items() if a != "params"}
    dp = dict(dv).pop("params"); de = {a: b for a, b in dv.items() if a != "params"}
    state = GANState(step=jnp.zeros((), jnp.int32),
                     g=NetState(gp, ge, trainer.g_tx.init(gp)),
                     d=NetState(dp, de, trainer.d_tx.init(dp)))
    ks = jax.random.split(kd, len(CHANNELS))
    data = {name: jax.random.normal(kk, (batch, fine_h, fine_w, c), jnp.float32)
            for kk, (name, c) in zip(ks, CHANNELS.items())}
    data["cloth_mask"] = jnp.abs(data["cloth_mask"])
    return state, {"tocg": tocg_vars}, data


shard = batch_sharding(mesh)
rep = replicated(mesh)
built = jax.jit(build_all, out_shardings=(rep, rep, shard))
state, frozen, data = built(key)
jax.block_until_ready((state, frozen, data))
mark("state+frozen+data built on-mesh (one jit)")

step = jax.jit(lambda s, b, r, f: trainer.train_step(s, b, r, f))

with mesh:
    low = step.lower(state, data, jax.random.PRNGKey(2), frozen)
    mark("step lowered (trace)")
    comp = low.compile()
    mark("step compiled")
    new_state, metrics = comp(state, data, jax.random.PRNGKey(2), frozen)
    jax.block_until_ready(new_state)
    mark("step ran")
print({k_: float(v) for k_, v in metrics.items()}, flush=True)
