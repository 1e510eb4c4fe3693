"""DRBNet (single-view) in Flax/NHWC
(rebuild of DRBNet/models/DRBNet.py DRBNet_single:97-290).

Defocus deblurring with per-pixel dynamic filters: a 4-level conv encoder;
at each decoder scale the (features || image-features) predict a per-pixel
7x7 kernel and a residual, progressively refining an image estimate from
1/8 resolution upward: ``est = up(est_prev) + FAC(up(est_prev), kernel) +
res``. Operates in [-1, 1]; output clipped.

FAC (filter-adaptive convolution): out[p] = sum_{dy,dx} pad(img)[p+(dy,dx)]
* K[p, dy*7+dx], the same 49-tap kernel for all 3 channels. The reference
transposes both the unfolded patches and the kernel identically
(DRBNet.py:70-93), which cancels — implemented here as a static 49-tap
shift-multiply-accumulate (VPU-friendly; no gathers).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv
from .registry import ModelSpec, register_model


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def fac(img: jnp.ndarray, kernel: jnp.ndarray, ksize: int = 7) -> jnp.ndarray:
    """Per-pixel dynamic filtering, kernel (B, H, W, ksize*ksize)."""
    pad = (ksize - 1) // 2
    xp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    h, w = img.shape[1], img.shape[2]
    out = jnp.zeros_like(img)
    for dy in range(ksize):
        for dx in range(ksize):
            tap = xp[:, dy:dy + h, dx:dx + w, :]
            out = out + tap * kernel[..., dy * ksize + dx][..., None]
    return out


class ConvStack(nn.Module):
    """n convs with LeakyReLU(0.1) between; optional linear last conv."""

    features: tuple
    kernels: tuple
    act_last: bool = True

    @nn.compact
    def __call__(self, x):
        for i, (f, k) in enumerate(zip(self.features, self.kernels)):
            x = Conv(f, kernel=k, name=f"c{i}")(x)
            if self.act_last or i < len(self.features) - 1:
                x = _lrelu(x)
        return x


class ResBlockDRB(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = Conv(x.shape[-1], kernel=3, name="c1")(x)
        y = _lrelu(y)
        y = Conv(x.shape[-1], kernel=3, name="c2")(y)
        return x + y


class UpConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        # k4 s2 "SAME" == torch ConvTranspose2d(k=4, s=2, p=1): exact 2x
        y = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", name="t")(x)
        return _lrelu(y)


def _area_down(x, factor):
    # torch F.interpolate(mode='area') downscale is an exact block mean
    b, h, w, c = x.shape
    return x.reshape(b, h // factor, factor, w // factor, factor, c) \
        .mean(axis=(2, 4))


def _area_up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class DRBNet(nn.Module):
    ch1: int = 32
    kernel_width: int = 7

    @nn.compact
    def __call__(self, x01):
        """x01 in [0,1]; internal range [-1,1] like the reference serving."""
        c = x01 * 2.0 - 1.0
        ch1 = self.ch1
        ch2, ch3, ch4 = ch1 * 2, ch1 * 4, ch1 * 8
        kd = self.kernel_width ** 2

        def enc(x, f, name, stride_first):
            x = Conv(f, kernel=3, stride=2 if stride_first else 1,
                     name=f"{name}_1")(x)
            x = _lrelu(x)
            x = Conv(f, kernel=3, name=f"{name}_2")(x)
            x = _lrelu(x)
            x = Conv(f, kernel=3, name=f"{name}_3")(x)
            return _lrelu(x)

        f1 = enc(c, ch1, "conv1", False)
        f2 = enc(f1, ch2, "conv2", True)
        f3 = enc(f2, ch3, "conv3", True)
        f_c = enc(f3, ch4, "conv4", True)
        # conv -> ResnetBlock x2 -> conv (DRBNet.py:329-334)
        f = ConvStack((ch4,), (3,), name="conv4_4_pre")(f_c)
        f = ResBlockDRB(name="conv4_4_r1")(f)
        f = ResBlockDRB(name="conv4_4_r2")(f)
        f = ConvStack((ch4,), (3,), name="conv4_4_post")(f)

        def refine_est(est, f, img_dims, kernel_dims, res_dims, tag):
            imf = ConvStack(img_dims, (3, 3, 3),
                            name=f"img_{tag}_feature")(est)
            feat = jnp.concatenate([f, imf], axis=-1)
            kern = ConvStack((*kernel_dims, kd), (3, 3, 1), act_last=False,
                             name=f"up{tag[1]}_kernel")(feat)
            res = ConvStack((*res_dims, 3), (3, 3, 1),
                            name=f"up{tag[1]}_res")(feat)
            return est + fac(est, kern, self.kernel_width) + res

        # 1/8 estimate from the bottleneck features (reference :235-246)
        est = refine_est(_area_down(c, 8), f,
                         (ch2, ch3, ch4), (ch4, ch3), (ch4, ch2), "d8")

        # per scale: refine features upward, then refine the upsampled
        # estimate with the SAME-scale features (reference :248-283)
        for tag, skip, up_ch, img_dims, kdims, rdims in (
            ("d4", f3, ch3, (ch2, ch3, ch3), (ch3, ch3), (ch3, ch2)),
            ("d2", f2, ch2, (ch2, ch2, ch2), (ch2, ch2), (ch2, ch2)),
            ("d1", f1, ch1, (ch2, ch2, ch1), (ch2, ch2), (ch2, ch2)),
        ):
            lvl = {"d4": "3", "d2": "2", "d1": "1"}[tag]
            f = UpConv(up_ch, name=f"upconv{lvl}_u")(f) + skip
            f = ResBlockDRB(name=f"upconv{lvl}_r1")(f)
            f = ResBlockDRB(name=f"upconv{lvl}_r2")(f)
            est = refine_est(_area_up2(est), f, img_dims, kdims, rdims, tag)

        est = jnp.clip(est, -1.0, 1.0)
        return (est + 1.0) / 2.0


register_model(ModelSpec(
    name="drbnet",
    build=lambda **kw: DRBNet(**kw),
    subtasks=("defocus deblurring",),
    pad_multiple=8, pad_kind="reflect",
    tile=None,
    config=dict(),
))

register_model(ModelSpec(
    name="drbnet_tiny",
    build=lambda **kw: DRBNet(**kw),
    subtasks=("defocus deblurring",),
    pad_multiple=8, pad_kind="reflect",
    tile=None,
    config=dict(ch1=8),
))
