"""IFAN in Flax/NHWC (rebuild of IFAN/models/archs/IFAN.py + models/IAC.py).

Iterative Filter Adaptive Network for defocus deblurring: a feature
extractor and a filter encoder run in parallel; a disparity-map estimator
conditions a filter predictor that emits N=17 per-pixel separable filter
pairs + biases; IAC applies them iteratively to the 1/8-res features
(separable 3-tap vertical then horizontal per-pixel filtering with
LeakyReLU(0.1) between iterations); a conv reconstructor decodes back to
full resolution with skip connections and a global residual.

Faithfulness notes vs the reference:
- SAC applies ``kernel1`` in BOTH passes (IAC.py:36-37 — an acknowledged
  upstream bug the released checkpoints were trained with). Reproduced so
  converted weights behave identically.
- IFAN's ResnetBlock (nn_common.py:29-54) applies LeakyReLU(0.1) AFTER
  each inner residual add and wraps an outer skip when ``res_num > 1`` —
  unlike DRBNet's block (no post-add activation), so it gets its own
  module here.
- ``out_res`` is conv+LeakyReLU (nn_common.py:4 default act) before the
  global residual add and clip (IFAN.py:162).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv
from .drbnet import UpConv, _lrelu
from .registry import ModelSpec, register_model


def sac(feat: jnp.ndarray, kernel1: jnp.ndarray, kernel2: jnp.ndarray,
        ksize: int = 3) -> jnp.ndarray:
    """Separable per-pixel filtering. kernel{1,2}: (B, H, W, C*ksize),
    channel-major (c, tap). Reference bug preserved: kernel1 weights both
    passes (kernel2 participates only through shape)."""
    b, h, w, c = feat.shape
    pad = (ksize - 1) // 2
    k1 = kernel1.reshape(b, h, w, c, ksize)

    # vertical pass (replicate pad rows)
    fp = jnp.pad(feat, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="edge")
    out = jnp.zeros_like(feat)
    for i in range(ksize):
        out = out + fp[:, i:i + h] * k1[..., i]
    # horizontal pass (replicate pad cols) — kernel1 again, as upstream
    fp = jnp.pad(out, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="edge")
    out = jnp.zeros_like(feat)
    for i in range(ksize):
        out = out + fp[:, :, i:i + w] * k1[..., i]
    return out


def iac(feat: jnp.ndarray, filters: jnp.ndarray, n: int, c: int, k: int
        ) -> jnp.ndarray:
    """N iterations of SAC + bias + LeakyReLU (IAC.py:4-17,
    is_act_last=True)."""
    pair = c * k * 2
    fs = filters[..., : n * pair]
    biases = filters[..., n * pair:]
    out = feat
    for i in range(n):
        fi = fs[..., i * pair:(i + 1) * pair]
        k1, k2 = fi[..., : c * k], fi[..., c * k:]
        out = sac(out, k1, k2, k)
        out = out + biases[..., i * c:(i + 1) * c]
        out = _lrelu(out)
    return out


class ResnetBlockIFAN(nn.Module):
    """IFAN's ResnetBlock (nn_common.py:29-54): per iteration
    ``x = lrelu(x + conv(lrelu(conv(x))))``; outer skip when res_num>1."""
    res_num: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        temp = x
        for i in range(self.res_num):
            y = Conv(c, kernel=3, name=f"stem{i}_a")(x)
            y = _lrelu(y)
            y = Conv(c, kernel=3, name=f"stem{i}_b")(y)
            x = _lrelu(x + y)
        if self.res_num > 1:
            x = x + temp
        return x


class IFAN(nn.Module):
    ch: int = 32
    res_num: int = 2
    filter_size: int = 3   # Fs
    n_iters: int = 17      # N

    @nn.compact
    def __call__(self, x):
        ch1 = self.ch
        ch2, ch3, ch4 = ch1 * 2, ch1 * 4, ch1 * 4
        k = self.filter_size

        def enc(x, f, name, stride_first):
            x = Conv(f, kernel=3, stride=2 if stride_first else 1,
                     name=f"{name}_1")(x)
            x = _lrelu(x)
            x = Conv(f, kernel=3, name=f"{name}_2")(x)
            x = _lrelu(x)
            x = Conv(f, kernel=3, name=f"{name}_3")(x)
            return _lrelu(x)

        # feature extractor (IFAN.py:128-131)
        f1 = enc(x, ch1, "conv1", False)
        f2 = enc(f1, ch2, "conv2", True)
        f3 = enc(f2, ch3, "conv3", True)
        f_c = enc(f3, ch4, "conv4", True)

        # filter encoder (IFAN.py:134-137)
        g = enc(x, ch1, "kconv1", False)
        g = enc(g, ch2, "kconv2", True)
        g = enc(g, ch3, "kconv3", True)
        g = enc(g, ch4, "kconv4", True)

        # disparity map estimator: conv -> 2x ResnetBlock(res_num) ->
        # conv(1, no act)  (IFAN.py:101-105)
        d = _lrelu(Conv(ch4, kernel=3, name="dme_in")(g))
        d = ResnetBlockIFAN(self.res_num, name="dme_res1")(d)
        d = ResnetBlockIFAN(self.res_num, name="dme_res2")(d)
        dm = Conv(1, kernel=3, name="dme_out")(d)

        # filter predictor (IFAN.py:108-115)
        f_dm = _lrelu(Conv(ch4, kernel=3, name="conv_dme")(dm))
        g = _lrelu(Conv(ch4, kernel=3, name="conv4_4_in")(
            jnp.concatenate([g, f_dm], axis=-1)))
        g = ResnetBlockIFAN(self.res_num, name="conv4_4_res1")(g)
        g = ResnetBlockIFAN(self.res_num, name="conv4_4_res2")(g)
        g = _lrelu(Conv(ch4, kernel=3, name="conv4_4_out")(g))
        kernel_dim = self.n_iters * (ch4 * k * 2) + self.n_iters * ch4
        p = _lrelu(Conv(ch4, kernel=3, name="F_in")(g))
        p = ResnetBlockIFAN(self.res_num, name="F_res1")(p)
        p = ResnetBlockIFAN(self.res_num, name="F_res2")(p)
        filters = Conv(kernel_dim, kernel=1, name="F_out")(p)

        # IAC on the deepest features (IFAN.py:148)
        y = iac(f_c, filters, self.n_iters, ch4, k)

        # reconstructor: conv -> ResnetBlock(3) -> conv (IFAN.py:59-62)
        y = _lrelu(Conv(ch4, kernel=3, name="conv_res_in")(y))
        y = ResnetBlockIFAN(3, name="conv_res_mid")(y)
        y = _lrelu(Conv(ch4, kernel=3, name="conv_res_out")(y))

        y = UpConv(ch3, name="upconv3_u")(y) + f3
        y = ResnetBlockIFAN(1, name="upconv3_1")(y)
        y = ResnetBlockIFAN(1, name="upconv3_2")(y)
        y = UpConv(ch2, name="upconv2_u")(y) + f2
        y = ResnetBlockIFAN(1, name="upconv2_1")(y)
        y = ResnetBlockIFAN(1, name="upconv2_2")(y)
        y = UpConv(ch1, name="upconv1_u")(y) + f1
        y = ResnetBlockIFAN(1, name="upconv1_1")(y)
        y = ResnetBlockIFAN(1, name="upconv1_2")(y)

        out = _lrelu(Conv(3, kernel=3, name="out_res")(y)) + x
        return jnp.clip(out, 0.0, 1.0)


register_model(ModelSpec(
    name="ifan",
    build=lambda **kw: IFAN(**kw),
    subtasks=("defocus deblurring",),
    pad_multiple=8, pad_kind="reflect",
    tile=None,
    config=dict(),
))

register_model(ModelSpec(
    name="ifan_tiny",
    build=lambda **kw: IFAN(**kw),
    subtasks=("defocus deblurring",),
    pad_multiple=8, pad_kind="reflect",
    tile=None,
    config=dict(ch=8, res_num=1, n_iters=2),
))
