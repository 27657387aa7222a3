"""Space-to-depth domain ops (ops/s2d.py) vs the plain full-res formulation.

The s2d domain re-expresses the SPADE generator's full-res conv stacks with
128-lane-aligned channel counts (see ops/s2d.py docstring); these tests pin
its exactness: every op must reproduce the standard NHWC formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from hrviton_tpu.ops.s2d import (conv1x1_s2d, conv3x3_s2d, from_s2d,
                                 instance_norm_s2d, to_s2d, upsample2x_s2d)

_rng = np.random.default_rng(7)


def arr(*shape):
    return jnp.asarray(_rng.standard_normal(shape), dtype=jnp.float32)


def ref_conv(x, k, b=None, pad=1):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x, k, (1, 1), ((pad, pad), (pad, pad)),
                                 dimension_numbers=dn)
    return y if b is None else y + b


def test_roundtrip():
    x = arr(2, 8, 6, 5)
    assert jnp.array_equal(from_s2d(to_s2d(x), 5), x)


def test_upsample2x():
    x = arr(2, 4, 3, 5)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    assert jnp.array_equal(from_s2d(upsample2x_s2d(x), 5), up)


@pytest.mark.parametrize("cin,cout", [(7, 16), (5, 3)])
def test_conv3x3(cin, cout):
    x = arr(2, 16, 12, cin)
    k = arr(3, 3, cin, cout) * 0.1
    b = arr(cout) * 0.1
    ref = ref_conv(x, k, b)
    got = from_s2d(conv3x3_s2d(to_s2d(x), k, b), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_conv3x3_boundary_rows_match_zero_padding():
    # all-ones input exposes any padding-alignment error at the 4 edges
    x = jnp.ones((1, 8, 8, 3), jnp.float32)
    k = arr(3, 3, 3, 2)
    ref = ref_conv(x, k)
    got = from_s2d(conv3x3_s2d(to_s2d(x), k), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_conv1x1():
    x = arr(2, 8, 6, 10)
    k = arr(1, 1, 10, 4) * 0.1
    b = arr(4) * 0.1
    ref = ref_conv(x, k, b, pad=0)
    got = from_s2d(conv1x1_s2d(to_s2d(x), k, b), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_instance_norm():
    x = arr(2, 12, 10, 6) * 3.0 + 1.5
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2), keepdims=True)
    ref = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    got = from_s2d(instance_norm_s2d(to_s2d(x), 6), 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_generator_s2d_tail_equivalence():
    """SPADEGenerator(s2d_tail=True) == plain path: same params, same noise
    rng, identical output up to conv reassociation (f32)."""
    import dataclasses

    from hrviton_tpu.config import SPADEGenConfig
    from hrviton_tpu.models import SPADEGenerator

    cfg = SPADEGenConfig(ngf=8, fine_height=256, fine_width=128,
                         num_upsampling_layers="most", remat=False)
    gen_plain = SPADEGenerator(cfg)
    gen_s2d = SPADEGenerator(dataclasses.replace(cfg, s2d_tail=True))

    k = jax.random.PRNGKey(0)
    x = arr(2, 256, 128, 9)
    seg = arr(2, 256, 128, 7)
    variables = gen_plain.init({"params": k, "noise": k}, x, seg, train=False)

    nk = jax.random.PRNGKey(3)
    ref = gen_plain.apply(variables, x, seg, train=False,
                          rngs={"noise": nk})
    got = gen_s2d.apply(variables, x, seg, train=False, rngs={"noise": nk})
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    # param tree is domain-oblivious: init under s2d matches the plain tree
    v2 = gen_s2d.init({"params": k, "noise": k}, x, seg, train=False)
    t1 = jax.tree_util.tree_structure(variables)
    t2 = jax.tree_util.tree_structure(v2)
    assert t1 == t2


def test_full_block_equivalence():
    # the composed up_4 SPADE block (tools/exp_up4.py --check wires this at
    # larger shapes); here a quick small-shape gate for CI
    import subprocess
    import sys
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable,
                        os.path.join(root, "tools", "exp_up4.py"), "--check"],
                       capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "check ok" in r.stdout
