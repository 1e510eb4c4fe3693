"""Shared Flax layers for the restoration zoo (NHWC, torch-compatible math).

Weight-conversion convention: torch Conv2d kernels (O, I, kh, kw) transpose to
flax (kh, kw, I, O); Linear weights (O, I) transpose to (I, O). Depthwise
convs use feature_group_count == channels with torch's (C, 1, kh, kw) kernel
reshaped to (kh, kw, 1, C).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layernorm import layer_norm_2d, layer_norm_bias_free, layer_norm_with_bias


class Conv(nn.Module):
    """Conv2d with explicit symmetric zero padding (torch semantics)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            use_bias=self.use_bias,
            feature_group_count=self.groups,
        )(x)


class DWConv(nn.Module):
    """Depthwise conv (groups == channels)."""

    kernel: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        p = (self.kernel - 1) // 2
        return nn.Conv(
            c,
            (self.kernel, self.kernel),
            padding=[(p, p), (p, p)],
            use_bias=self.use_bias,
            feature_group_count=c,
        )(x)


class LayerNorm2d(nn.Module):
    """NAFNet-style LayerNorm over channels at each pixel (eps=1e-6)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm_2d(x, w, b, self.eps)


class RestormerLayerNorm(nn.Module):
    """Restormer LayerNorm (eps=1e-5), bias-free or with-bias."""

    bias_free: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (c,))
        if self.bias_free:
            return layer_norm_bias_free(x, w)
        b = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm_with_bias(x, w, b)
