"""IFAN in Flax/NHWC (rebuild of IFAN/models/archs/IFAN.py + IAC.py).

Iterative Filter Adaptive Network for defocus deblurring: a feature
extractor and a filter encoder run in parallel; a disparity-map estimator
conditions a filter predictor that emits N=17 per-pixel separable filter
pairs + biases; IAC applies them iteratively to the 1/8-res features
(separable 3-tap vertical then horizontal per-pixel filtering with
LeakyReLU(0.1) between iterations); a conv reconstructor decodes back to
full resolution with skip connections and a global residual.

Faithfulness note: the reference SAC applies ``kernel1`` in BOTH passes
(IAC.py:36-37 — an acknowledged upstream bug the released checkpoints were
trained with). Reproduced here so converted weights behave identically.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv
from .drbnet import ResBlockDRB, UpConv, _lrelu
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
    """N iterations of SAC + bias + LeakyReLU (IAC.py:4-17)."""
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

        def res_stack(y, count, name):
            for i in range(count):
                y = ResBlockDRB(name=f"{name}_{i}")(y)
            return y

        # feature extractor
        f1 = enc(x, ch1, "conv1", False)
        f2 = enc(f1, ch2, "conv2", True)
        f3 = enc(f2, ch3, "conv3", True)
        f_c = enc(f3, ch4, "conv4", True)

        # filter encoder
        g = enc(x, ch1, "kconv1", False)
        g = enc(g, ch2, "kconv2", True)
        g = enc(g, ch3, "kconv3", True)
        g = enc(g, ch4, "kconv4", True)

        # disparity map estimator
        d = Conv(ch4, kernel=3, name="dme_in")(g)
        d = _lrelu(d)
        d = res_stack(d, self.res_num, "dme_res")
        dm = Conv(1, kernel=3, name="dme_out")(d)

        # filter predictor
        f_dm = Conv(ch4, kernel=3, name="conv_dme")(dm)
        f_dm = _lrelu(f_dm)
        g = Conv(ch4, kernel=3, name="conv4_4_in")(
            jnp.concatenate([g, f_dm], axis=-1))
        g = _lrelu(g)
        g = res_stack(g, 2, "conv4_4_res")
        g = Conv(ch4, kernel=3, name="conv4_4_out")(g)
        g = _lrelu(g)
        kernel_dim = self.n_iters * (ch4 * k * 2) + self.n_iters * ch4
        p = Conv(ch4, kernel=3, name="F_in")(g)
        p = _lrelu(p)
        p = res_stack(p, self.res_num, "F_res")
        filters = Conv(kernel_dim, kernel=1, name="F_out")(p)

        # IAC on the deepest features
        y = iac(f_c, filters, self.n_iters, ch4, k)

        # reconstructor
        y0 = Conv(ch4, kernel=3, name="conv_res_in")(y)
        y0 = _lrelu(y0)
        y0 = res_stack(y0, 3, "conv_res")
        y = Conv(ch4, kernel=3, name="conv_res_out")(y0)
        y = _lrelu(y)

        y = UpConv(ch3, name="upconv3_u")(y) + f3
        y = ResBlockDRB(name="upconv3_1")(y)
        y = ResBlockDRB(name="upconv3_2")(y)
        y = UpConv(ch2, name="upconv2_u")(y) + f2
        y = ResBlockDRB(name="upconv2_1")(y)
        y = ResBlockDRB(name="upconv2_2")(y)
        y = UpConv(ch1, name="upconv1_u")(y) + f1
        y = ResBlockDRB(name="upconv1_1")(y)
        y = ResBlockDRB(name="upconv1_2")(y)

        out = Conv(3, kernel=3, name="out_res")(y) + x
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
