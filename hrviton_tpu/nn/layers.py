"""Flax layer library with torch-parity semantics.

These are the L1 building blocks shared by all models. Key parity points:
  * Conv2d uses *explicit* (lo, hi) padding — torch's pad-then-convolve differs
    from XLA 'SAME' for strided convs (window start offsets), so 'SAME' would
    silently change every stride-2 encoder (/root/reference/networks.py:185).
  * BatchNorm follows torch: eps 1e-5, momentum 0.1, running-var update uses the
    *unbiased* batch variance while normalization uses the biased one
    (sync_batchnorm/batchnorm.py:115-127 math). Under pjit with the batch axis
    sharded over the mesh's 'data' axis, the batch moments below are computed on
    the *global* batch — GSPMD inserts the cross-replica reduction, which is the
    TPU-native SyncBN replacing the reference's threaded
    DataParallelWithCallback machinery (SURVEY.md §2.2).
  * SpectralNorm does one power iteration per training forward on a stored u
    (torch.nn.utils.spectral_norm parity), kept in the 'aux' variable collection.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from hrviton_tpu.ops.conv3x3 import conv3x3
from hrviton_tpu.ops.s2d import conv1x1_s2d, conv3x3_s2d

Array = jax.Array
Dtype = Any

__all__ = [
    "Conv2d", "BatchNorm2d", "InstanceNorm2d", "SpectralNorm2d",
    "leaky_relu", "normal_init", "xavier_normal_init", "kaiming_normal_init",
]


def leaky_relu(x, negative_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope)


def normal_init(std: float = 0.02, mean: float = 0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)
    return init


def xavier_normal_init(gain: float = 0.02):
    """torch.nn.init.xavier_normal_ parity for HWIO conv kernels."""
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:  # HWIO
            rf = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * rf, shape[3] * rf
        else:
            fan_in, fan_out = shape[0], shape[-1]
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return std * jax.random.normal(key, shape, dtype)
    return init


def kaiming_normal_init():
    """torch kaiming_normal_(a=0, mode='fan_in') parity for HWIO kernels."""
    def init(key, shape, dtype=jnp.float32):
        rf = shape[0] * shape[1] if len(shape) == 4 else 1
        fan_in = shape[-2] * rf
        std = (2.0 / fan_in) ** 0.5
        return std * jax.random.normal(key, shape, dtype)
    return init


class _ConvCore(nn.Module):
    """Param-compatible replacement for nn.Conv ('kernel'/'bias' in HWIO)
    that can route 3x3/s1/p1 convs through the Pallas kernel (ops/conv3x3.py)
    with an optionally fused producer activation."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]
    padding: Tuple[int, int]
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, pre_act: Optional[str] = None, s2d: bool = False,
                 raw: bool = False):
        kh, kw = self.kernel_size
        # s2d: x is a space-to-depth tensor (4*Cin lanes) but the declared
        # kernel keeps the plain Cin — the param tree is domain-oblivious.
        in_ch = x.shape[-1] // 4 if s2d else x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_ch, self.features), jnp.float32)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if raw:
            # weight-extraction mode for externally-fused consumers
            # (ops/spade_block.py): x supplies only in_ch/dtype; the param
            # tree is identical to the applying path.
            return kernel, bias
        dtype = x.dtype if self.dtype is None else self.dtype
        x = x.astype(dtype)
        if s2d:
            if pre_act is not None:
                x = (leaky_relu(x, 0.2) if pre_act == "leaky0.2"
                     else jax.nn.relu(x))
            if (kh, kw) == (3, 3) and self.stride == (1, 1) \
                    and self.padding == (1, 1):
                return conv3x3_s2d(x, kernel, bias, dtype)
            if (kh, kw) == (1, 1) and self.stride == (1, 1) \
                    and self.padding == (0, 0):
                return conv1x1_s2d(x, kernel, bias, dtype)
            raise NotImplementedError(
                f"s2d conv only for 3x3/s1/p1 and 1x1: {self.kernel_size}")
        if ((kh, kw) == (3, 3) and self.stride == (1, 1)
                and self.padding == (1, 1)):
            return conv3x3(x, kernel, bias, pre_act=pre_act)
        if pre_act is not None:
            x = leaky_relu(x, 0.2) if pre_act == "leaky0.2" else jax.nn.relu(x)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), window_strides=self.stride,
            padding=((self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])),
            dimension_numbers=dn)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class Conv2d(nn.Module):
    """NHWC conv with torch Conv2d padding/stride semantics (HWIO kernel)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    kernel_init: Callable = normal_init(0.02)
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, pre_act: Optional[str] = None, s2d: bool = False,
                 raw: bool = False):
        k = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 2
        s = self.stride if isinstance(self.stride, tuple) else (self.stride,) * 2
        p = self.padding if isinstance(self.padding, tuple) else (self.padding,) * 2
        return _ConvCore(
            features=self.features,
            kernel_size=k,
            stride=s,
            padding=p,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            name="conv",
        )(x, pre_act=pre_act, s2d=s2d, raw=raw)


class BatchNorm2d(nn.Module):
    """torch BatchNorm2d over NHWC: per-channel stats across (N, H, W).

    Mutable collection 'batch_stats' holds running mean/var. In training
    (use_running_average=False) batch moments normalize the activations and the
    running stats are updated with torch's unbiased-variance rule. Global-batch
    statistics under pjit == cross-replica SyncBN.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            # two-pass variance (torch parity; E[x^2]-E[x]^2 rounds differently)
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", self.scale_init, (self.features,), jnp.float32)
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y * scale + bias
        return y.astype(x.dtype)


class InstanceNorm2d(nn.Module):
    """torch InstanceNorm2d(affine=False) parity: per-sample, per-channel."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class SpectralNorm2d(nn.Module):
    """Spectrally-normalized Conv2d (torch spectral_norm parity).

    The weight is reshaped to (O, I*Kh*Kw); u is a persistent vector updated by
    one power iteration per training step (mutable collection 'aux'); the conv
    uses W / sigma. Eval mode reuses the stored u without updating.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    kernel_init: Callable = normal_init(0.02)
    bias_init: Callable = nn.initializers.zeros
    eps: float = 1e-12
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False,
                 pre_act: Optional[str] = None, s2d: bool = False,
                 raw: bool = False):
        k = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 2
        s = self.stride if isinstance(self.stride, tuple) else (self.stride,) * 2
        p = self.padding if isinstance(self.padding, tuple) else (self.padding,) * 2

        in_ch = x.shape[-1] // 4 if s2d else x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k[0], k[1], in_ch, self.features), jnp.float32)
        # torch reshapes OIHW weight to (O, I*H*W); our HWIO equivalent.
        # Power iteration stays f32 even under a bf16 compute policy.
        w_mat = kernel.astype(jnp.float32).transpose(3, 2, 0, 1).reshape(
            self.features, -1)

        def l2norm(v):
            return v / (jnp.linalg.norm(v) + self.eps)

        # torch keeps both u and v buffers: eval reuses them verbatim; each
        # training forward does one power iteration (v <- W^T u, u <- W v).
        u_var = self.variable(
            "aux", "u",
            lambda: l2norm(jax.random.normal(
                self.make_rng("params") if self.has_rng("params")
                else jax.random.PRNGKey(0), (self.features,), jnp.float32)))
        v_var = self.variable(
            "aux", "v",
            lambda: l2norm(jnp.matmul(u_var.value, w_mat)))

        if update_stats:
            v = l2norm(jnp.matmul(u_var.value, w_mat))
            u = l2norm(jnp.matmul(w_mat, v))
            if not self.is_initializing():
                u_var.value = u
                v_var.value = v
        else:
            u, v = u_var.value, v_var.value
        sigma = jnp.dot(u, jnp.matmul(w_mat, v))
        w_sn = (kernel / sigma.astype(kernel.dtype)).astype(
            x.dtype if self.dtype is None else self.dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if raw:
            # weight-extraction mode (see _ConvCore): returns the
            # spectrally-normalized kernel; power-iteration bookkeeping
            # (update_stats) behaves exactly as in the applying path.
            return w_sn, bias

        if s2d:
            if pre_act is not None:
                x = (leaky_relu(x, 0.2) if pre_act == "leaky0.2"
                     else jax.nn.relu(x))
            if k == (3, 3) and s == (1, 1) and p == (1, 1):
                return conv3x3_s2d(x, w_sn, bias, x.dtype)
            if k == (1, 1) and s == (1, 1) and p == (0, 0):
                return conv1x1_s2d(x, w_sn, bias, x.dtype)
            raise NotImplementedError(
                f"s2d conv only for 3x3/s1/p1 and 1x1: {k}")
        if k == (3, 3) and s == (1, 1) and p == (1, 1):
            return conv3x3(x, w_sn, bias, pre_act=pre_act)
        if pre_act is not None:
            x = leaky_relu(x, 0.2) if pre_act == "leaky0.2" else jax.nn.relu(x)
        dn = jax.lax.conv_dimension_numbers(x.shape, w_sn.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w_sn, window_strides=s,
            padding=((p[0], p[0]), (p[1], p[1])), dimension_numbers=dn)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
