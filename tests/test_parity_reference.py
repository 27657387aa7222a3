"""Model-level golden parity: our Flax models vs the actual reference PyTorch
networks, weights ported with the checkpoint converters.

The reference modules are imported from /root/reference (read-only) at test
time — definitions only, never copied. This validates end-to-end numerics of
ConditionGenerator and SPADEGenerator including the converters themselves.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier

import jax
import jax.numpy as jnp
import torch

sys.path.insert(0, "/root/reference")

# the image has torch-cpu but no torchvision; the reference imports it at module
# scope for the (unused-here) Vgg19 class — stub it out
if "torchvision" not in sys.modules:
    tv = types.ModuleType("torchvision")
    tv.models = types.ModuleType("torchvision.models")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models

from hrviton_tpu.config import SPADEGenConfig, TOCGConfig
from hrviton_tpu.models import ConditionGenerator, SPADEGenerator
from hrviton_tpu.train.checkpoint import convert_spade_gen, convert_tocg

H, W = 64, 64  # divisible by 32; small for single-core-CPU speed


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw_t(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


@pytest.mark.parametrize("warp_feature", ["T1", "encoder"])
def test_tocg_matches_reference_model(warp_feature):
    import networks as ref_networks

    opt = types.SimpleNamespace(warp_feature=warp_feature, out_layer="relu",
                                cuda=False)
    torch.manual_seed(0)
    ref = ref_networks.ConditionGenerator(opt, input1_nc=4, input2_nc=16,
                                          output_nc=13, ngf=8)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_tocg(sd)

    model = ConditionGenerator(TOCGConfig(ngf=8, warp_feature=warp_feature))
    rng = np.random.default_rng(0)
    in1 = rng.standard_normal((2, H, W, 4), dtype=np.float32)
    in2 = rng.standard_normal((2, H, W, 16), dtype=np.float32)

    flows, seg, wc, wcm = model.apply(variables, jnp.asarray(in1),
                                      jnp.asarray(in2), train=False)
    with torch.no_grad():
        rflows, rseg, rwc, rwcm = ref(opt, _nchw_t(in1), _nchw_t(in2))

    for i in range(5):
        # atol covers f32 accumulation-order drift across the 5-level pyramid
        # (conftest pins matmul precision to 'highest' for torch-grade f32)
        np.testing.assert_allclose(np.asarray(flows[i]),
                                   rflows[i].detach().numpy(),
                                   rtol=1e-3, atol=5e-4,
                                   err_msg=f"flow level {i}")
    np.testing.assert_allclose(np.asarray(seg), _nhwc(rseg),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(wc), _nhwc(rwc), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(wcm), _nhwc(rwcm), rtol=1e-3, atol=5e-4)


def test_spade_generator_matches_reference_model():
    import network_generator as ref_gen

    # 'more' at 128x128 -> 2x2 latent; torch InstanceNorm rejects 1x1 spatial,
    # so 'most' (latent 1x1 at this size) can't run a torch forward here — its
    # converter coverage is in test_spade_most_converter_structure below
    GH = GW = 128
    opt = types.SimpleNamespace(
        norm_G="spectralaliasinstance", gen_semantic_nc=7,
        num_upsampling_layers="more", fine_height=GH, fine_width=GW,
        ngf=8, cuda=False)
    torch.manual_seed(0)
    ref = ref_gen.SPADEGenerator(opt, 9)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_spade_gen(sd, "more")

    cfg = SPADEGenConfig(ngf=8, fine_height=GH, fine_width=GW,
                         num_upsampling_layers="more")
    model = SPADEGenerator(cfg)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, GH, GW, 9), dtype=np.float32)
    seg = rng.standard_normal((1, GH, GW, 7), dtype=np.float32)

    # fresh model: noise_scale == 0, so the stochastic injection cancels and
    # outputs are comparable despite different RNGs
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(seg), train=False,
                      rngs={"noise": jax.random.PRNGKey(0)})
    with torch.no_grad():
        rout = ref(_nchw_t(x), _nchw_t(seg))

    np.testing.assert_allclose(np.asarray(out), _nhwc(rout),
                               rtol=1e-3, atol=2e-3)


def test_cond_discriminator_matches_reference_model():
    import networks as ref_networks

    torch.manual_seed(0)
    ref = ref_networks.define_D(input_nc=33, ndf=8, n_layers_D=3,
                                norm="instance", num_D=2)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from hrviton_tpu.config import CondDiscriminatorConfig
    from hrviton_tpu.models import CondMultiscaleDiscriminator
    from hrviton_tpu.train.checkpoint import convert_cond_discriminator

    variables = convert_cond_discriminator(sd)
    model = CondMultiscaleDiscriminator(CondDiscriminatorConfig(input_nc=33,
                                                                ndf=8))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, H, W, 33), dtype=np.float32)
    ours = model.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        theirs = ref(_nchw_t(x))
    assert len(ours) == len(theirs) == 2
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o[-1]), _nhwc(t[-1]),
                                   rtol=1e-3, atol=1e-4)


def test_tryon_pipeline_matches_reference_chain():
    """Composed end-to-end parity for the full test_generator.py:144-216 chain
    (downsample -> tocg -> composition -> tgm blur -> argmax -> 13->7 regroup
    -> flow upsample/norm -> grid_sample -> occlusion -> SPADE) at 512x384
    'most' (latent 4x3), condition stage at the reference-hardcoded 256x192."""
    import torch.nn.functional as F

    import networks as ref_networks
    import network_generator as ref_gen

    from hrviton_tpu.config import PipelineConfig
    from hrviton_tpu.ops.blur import gaussian_kernel1d
    from hrviton_tpu.pipelines.tryon import tryon_forward

    FH, FW = 512, 384
    opt = types.SimpleNamespace(
        warp_feature="T1", out_layer="relu", cuda=False,
        norm_G="spectralaliasinstance", gen_semantic_nc=7,
        num_upsampling_layers="most", fine_height=FH, fine_width=FW,
        ngf=8, clothmask_composition="warp_grad", occlusion=True)

    torch.manual_seed(0)
    ref_tocg = ref_networks.ConditionGenerator(opt, input1_nc=4, input2_nc=16,
                                               output_nc=13, ngf=8)
    ref_g = ref_gen.SPADEGenerator(opt, 9)
    ref_tocg.eval(), ref_g.eval()

    tocg_vars = convert_tocg(
        {k: v.detach().numpy() for k, v in ref_tocg.state_dict().items()})
    gen_vars = convert_spade_gen(
        {k: v.detach().numpy() for k, v in ref_g.state_dict().items()}, "most")

    rng = np.random.default_rng(11)
    cloth = rng.standard_normal((1, FH, FW, 3), dtype=np.float32)
    cm = rng.uniform(0, 1, (1, FH, FW, 1)).astype(np.float32)
    labels13 = rng.integers(0, 13, (1, FH, FW))
    parse_agn = (labels13[..., None] == np.arange(13)).astype(np.float32)
    densepose = rng.standard_normal((1, FH, FW, 3), dtype=np.float32)
    agnostic = rng.standard_normal((1, FH, FW, 3), dtype=np.float32)

    # ---------------- reference chain in torch (test_generator.py:144-216)
    t_cloth, t_cm = _nchw_t(cloth), _nchw_t(cm)
    t_agn13, t_dp, t_ag = _nchw_t(parse_agn), _nchw_t(densepose), _nchw_t(agnostic)
    with torch.no_grad():
        t_cm = (t_cm > 0.5).float()
        cloth_d = F.interpolate(t_cloth, size=(256, 192), mode="bilinear")
        cm_d = F.interpolate(t_cm, size=(256, 192), mode="nearest")
        agn_d = F.interpolate(t_agn13, size=(256, 192), mode="nearest")
        dp_d = F.interpolate(t_dp, size=(256, 192), mode="bilinear")
        flow_list, fake_segmap, _, warped_cm_lr = ref_tocg(
            opt, torch.cat([cloth_d, cm_d], 1), torch.cat([agn_d, dp_d], 1))
        # warp_grad composition (:171-176)
        mask = torch.ones_like(fake_segmap)
        mask[:, 3:4] = warped_cm_lr
        fake_segmap = fake_segmap * mask
        # tgm.image.GaussianBlur((15,15),(3,3)): depthwise zero-padded conv
        g1 = gaussian_kernel1d(15, 3.0)
        k2 = torch.from_numpy(np.outer(g1, g1).astype(np.float32))
        w = k2.expand(13, 1, 15, 15).contiguous()
        seg_full = F.interpolate(fake_segmap, size=(FH, FW), mode="bilinear")
        fake_parse_gauss = F.conv2d(seg_full, w, padding=7, groups=13)
        fake_parse = fake_parse_gauss.argmax(dim=1)[:, None]
        old_parse = torch.zeros(1, 13, FH, FW).scatter_(1, fake_parse, 1.0)
        groups = [[0], [2, 4, 7, 8, 9, 10, 11], [3], [1], [5], [6], [12]]
        parse7 = torch.zeros(1, 7, FH, FW)
        for i, g in enumerate(groups):
            for l in g:
                parse7[:, i] += old_parse[:, l]
        flow = F.interpolate(flow_list[-1].permute(0, 3, 1, 2), size=(FH, FW),
                             mode="bilinear").permute(0, 2, 3, 1)
        flow_norm = torch.cat([flow[..., 0:1] / ((96 - 1.0) / 2.0),
                               flow[..., 1:2] / ((128 - 1.0) / 2.0)], 3)
        grid = ref_networks.make_grid(1, FH, FW, opt)
        warped_cloth = F.grid_sample(t_cloth, grid + flow_norm,
                                     padding_mode="border")
        warped_cm_full = F.grid_sample(t_cm, grid + flow_norm,
                                       padding_mode="border")
        # occlusion (test_generator.py:19-24, :214-216)
        body = torch.cat([fake_parse_gauss.softmax(dim=1)[:, 1:3],
                          fake_parse_gauss.softmax(dim=1)[:, 5:]], 1
                         ).sum(dim=1, keepdim=True)
        warped_cm_full = warped_cm_full - body * warped_cm_full
        warped_cloth = warped_cloth * warped_cm_full + (1 - warped_cm_full)
        ref_out = ref_g(torch.cat([t_ag, t_dp, warped_cloth], 1), parse7)

    # ---------------- our single-jit pipeline
    cfg = PipelineConfig(fine_height=FH, fine_width=FW, cond_height=256,
                         cond_width=192, occlusion=True,
                         clothmask_composition="warp_grad")
    model_tocg = ConditionGenerator(TOCGConfig(ngf=8))
    model_gen = SPADEGenerator(SPADEGenConfig(
        ngf=8, fine_height=FH, fine_width=FW, num_upsampling_layers="most"))

    batch = {"cloth": jnp.asarray(cloth), "cloth_mask": jnp.asarray(cm),
             "parse_agnostic": jnp.asarray(parse_agn),
             "densepose": jnp.asarray(densepose),
             "agnostic": jnp.asarray(agnostic)}
    out, cond = tryon_forward(
        lambda i1, i2: model_tocg.apply(tocg_vars, i1, i2, train=False),
        lambda x, s: model_gen.apply(gen_vars, x, s, train=False,
                                     rngs={"noise": jax.random.PRNGKey(0)}),
        batch, cfg)

    # Intermediate gates first. The blurred segmap has genuine f32 argmax
    # ties (top-2 margin ~4e-8 at ~1e-5 of pixels); accumulation order may
    # legitimately flip those labels, so the criterion is: any parse mismatch
    # must sit on a reference-side near-tie, and the fallout must stay
    # local/tiny in the final render.
    p_jax = np.asarray(cond.fake_parse)
    p_ref = fake_parse[:, 0].numpy()
    mis = p_jax != p_ref
    assert mis.mean() <= 3e-5, f"{mis.sum()} parse mismatches"
    fg = fake_parse_gauss.numpy()
    for b, y, xc in np.argwhere(mis):
        top2 = np.sort(fg[b, :, y, xc])[-2:]
        assert top2[1] - top2[0] < 1e-6, (y, xc, top2)
    assert (np.asarray(cond.parse7) != _nhwc(parse7)).sum() <= mis.sum() * 2

    np.testing.assert_allclose(np.asarray(cond.warped_cloth),
                               _nhwc(warped_cloth), rtol=1e-3, atol=1e-3)
    d = np.abs(np.asarray(out, np.float32) - _nhwc(ref_out))
    assert np.quantile(d, 0.999) <= 2e-3, np.quantile(d, 0.999)
    assert (d > 2e-2).mean() <= 1e-3, (d > 2e-2).mean()  # tie fallout is local
    if not mis.any():
        np.testing.assert_allclose(np.asarray(out), _nhwc(ref_out),
                                   rtol=1e-3, atol=2e-3)


def test_spade_most_converter_structure():
    """'most' adds up_4; verify the converter produces exactly the tree our
    'most' model initializes (shape-level check, no torch forward needed)."""
    import network_generator as ref_gen

    opt = types.SimpleNamespace(
        norm_G="spectralaliasinstance", gen_semantic_nc=7,
        num_upsampling_layers="most", fine_height=256, fine_width=256,
        ngf=8, cuda=False)
    torch.manual_seed(0)
    ref = ref_gen.SPADEGenerator(opt, 9)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_spade_gen(sd, "most")

    cfg = SPADEGenConfig(ngf=8, fine_height=256, fine_width=256,
                         num_upsampling_layers="most")
    model = SPADEGenerator(cfg)
    template = jax.eval_shape(
        lambda k: model.init({"params": k, "noise": k},
                             jnp.zeros((1, 256, 256, 9)),
                             jnp.zeros((1, 256, 256, 7)), train=False),
        jax.random.PRNGKey(0))

    flat_t = {"/".join(map(str, k)): v.shape for k, v in
              jax.tree_util.tree_flatten_with_path(template)[0]}
    flat_c = {"/".join(map(str, k)): np.asarray(v).shape for k, v in
              jax.tree_util.tree_flatten_with_path(variables)[0]}
    missing = set(flat_t) - set(flat_c)
    extra = set(flat_c) - set(flat_t)
    assert not missing, f"converter missing params: {sorted(missing)[:8]}"
    assert not extra, f"converter extra params: {sorted(extra)[:8]}"
    for k in flat_t:
        assert flat_t[k] == flat_c[k], (k, flat_t[k], flat_c[k])
