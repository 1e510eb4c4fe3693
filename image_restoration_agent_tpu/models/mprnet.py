"""MPRNet in Flax/NHWC (rebuild of MPRNet/Denoising/MPRNet.py).

Three progressive stages over a multi-patch hierarchy: stage 1 processes
four quadrants through a CAB U-Net, stage 2 two halves with cross-stage
feature fusion (CSFF), stage 3 the full image through an original-resolution
ORSNet; supervised attention modules (SAM) bridge stages. Activation is
PReLU; channel attention is GAP -> 1x1 -> ReLU -> 1x1 -> sigmoid.

TPU notes: the four stage-1 quadrants batch into one (4B, H/2, W/2, C)
forward (the reference runs them as four sequential calls) — same math,
4x larger matmuls for the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv
from .registry import ModelSpec, register_model


class PReLU(nn.Module):
    """torch nn.PReLU: single shared learnable negative slope (init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, a * x)


class CALayer(nn.Module):
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        # bias=False throughout (MPRNet.py:239 constructor default)
        y = Conv(self.channel // self.reduction, kernel=1, use_bias=False,
                 name="du1")(y)
        y = nn.relu(y)
        y = Conv(self.channel, kernel=1, use_bias=False, name="du2")(y)
        return x * nn.sigmoid(y)


class CAB(nn.Module):
    n_feat: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        res = Conv(self.n_feat, kernel=3, use_bias=False, name="c1")(x)
        res = PReLU(name="act")(res)
        res = Conv(self.n_feat, kernel=3, use_bias=False, name="c2")(res)
        res = CALayer(self.n_feat, self.reduction, name="ca")(res)
        return res + x


class SAM(nn.Module):
    n_feat: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x, x_img):
        x1 = Conv(self.n_feat, kernel=self.kernel, use_bias=False,
                  name="conv1")(x)
        img = Conv(3, kernel=self.kernel, use_bias=False,
                   name="conv2")(x) + x_img
        x2 = nn.sigmoid(Conv(self.n_feat, kernel=self.kernel, use_bias=False,
                             name="conv3")(img))
        return x1 * x2 + x, img


def _bilinear_resize(x, scale: float):
    # torch nn.Upsample(bilinear, align_corners=False) does NOT antialias
    # on downscale; at scale 0.5 it reduces to plain half-pixel sampling.
    b, h, w, c = x.shape
    nh, nw = int(h * scale), int(w * scale)
    return jax.image.resize(x, (b, nh, nw, c), method="bilinear",
                            antialias=False)


class DownSample(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = _bilinear_resize(x, 0.5)
        return Conv(self.out_ch, kernel=1, use_bias=False, name="conv")(x)


class UpSample(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = _bilinear_resize(x, 2.0)
        return Conv(self.out_ch, kernel=1, use_bias=False, name="conv")(x)


class Encoder(nn.Module):
    n_feat: int
    scale_unetfeats: int
    csff: bool
    reduction: int = 4

    @nn.compact
    def __call__(self, x, encoder_outs=None, decoder_outs=None):
        f, s = self.n_feat, self.scale_unetfeats
        dims = (f, f + s, f + 2 * s)
        outs = []
        for lvl, dim in enumerate(dims):
            for i in range(2):
                x = CAB(dim, self.reduction, name=f"enc{lvl}_cab{i}")(x)
            if self.csff and encoder_outs is not None:
                x = x + Conv(dim, kernel=1, use_bias=False,
                             name=f"csff_enc{lvl}")(encoder_outs[lvl]) \
                      + Conv(dim, kernel=1, use_bias=False,
                             name=f"csff_dec{lvl}")(decoder_outs[lvl])
            outs.append(x)
            if lvl < 2:
                x = DownSample(dims[lvl + 1], name=f"down{lvl}")(x)
        return outs


class Decoder(nn.Module):
    n_feat: int
    scale_unetfeats: int
    reduction: int = 4

    @nn.compact
    def __call__(self, outs):
        f, s = self.n_feat, self.scale_unetfeats
        enc1, enc2, enc3 = outs
        dec3 = enc3
        for i in range(2):
            dec3 = CAB(f + 2 * s, self.reduction, name=f"dec2_cab{i}")(dec3)
        x = UpSample(f + s, name="up32")(dec3) + \
            CAB(f + s, self.reduction, name="skip_attn2")(enc2)
        dec2 = x
        for i in range(2):
            dec2 = CAB(f + s, self.reduction, name=f"dec1_cab{i}")(dec2)
        x = UpSample(f, name="up21")(dec2) + \
            CAB(f, self.reduction, name="skip_attn1")(enc1)
        dec1 = x
        for i in range(2):
            dec1 = CAB(f, self.reduction, name=f"dec0_cab{i}")(dec1)
        return [dec1, dec2, dec3]


class ORSNet(nn.Module):
    n_feat: int
    scale_orsnetfeats: int
    scale_unetfeats: int
    num_cab: int = 8
    reduction: int = 4

    @nn.compact
    def __call__(self, x, encoder_outs, decoder_outs):
        f, so, su = self.n_feat, self.scale_orsnetfeats, self.scale_unetfeats

        def orb(x, name):
            res = x
            for i in range(self.num_cab):
                res = CAB(f + so, self.reduction, name=f"{name}_cab{i}")(res)
            res = Conv(f + so, kernel=3, use_bias=False,
                       name=f"{name}_conv")(res)
            return res + x

        up_e2 = UpSample(f + su, name="up_enc2a")(encoder_outs[2])
        up_e2 = UpSample(f, name="up_enc2b")(up_e2)
        up_d2 = UpSample(f + su, name="up_dec2a")(decoder_outs[2])
        up_d2 = UpSample(f, name="up_dec2b")(up_d2)

        x = orb(x, "orb1")
        x = x + Conv(f + so, kernel=1, use_bias=False,
                     name="conv_enc1")(encoder_outs[0]) \
              + Conv(f + so, kernel=1, use_bias=False,
                     name="conv_dec1")(decoder_outs[0])
        x = orb(x, "orb2")
        x = x + Conv(f + so, kernel=1, use_bias=False, name="conv_enc2")(
                UpSample(f, name="up_enc1")(encoder_outs[1])) \
              + Conv(f + so, kernel=1, use_bias=False, name="conv_dec2")(
                UpSample(f, name="up_dec1")(decoder_outs[1]))
        x = orb(x, "orb3")
        x = x + Conv(f + so, kernel=1, use_bias=False, name="conv_enc3")(up_e2) \
              + Conv(f + so, kernel=1, use_bias=False, name="conv_dec3")(up_d2)
        return x


class MPRNet(nn.Module):
    n_feat: int = 80
    scale_unetfeats: int = 48
    scale_orsnetfeats: int = 32
    num_cab: int = 8
    reduction: int = 4

    @nn.compact
    def __call__(self, x3_img):
        b, h, w, _ = x3_img.shape
        f = self.n_feat

        def shallow(x, name):
            y = Conv(f, kernel=3, use_bias=False, name=f"{name}_conv")(x)
            return CAB(f, self.reduction, name=f"{name}_cab")(y)

        # ---- stage 1: four quadrants, batched together ----
        top, bot = x3_img[:, : h // 2], x3_img[:, h // 2:]
        quads = jnp.concatenate([
            top[:, :, : w // 2], top[:, :, w // 2:],
            bot[:, :, : w // 2], bot[:, :, w // 2:]], axis=0)  # (4B,...)
        x1 = shallow(quads, "shallow_feat1")
        enc1_q = Encoder(f, self.scale_unetfeats, csff=False,
                         reduction=self.reduction, name="stage1_encoder")(x1)
        # stitch quadrant features back into top/bot halves (cat on W)
        feat1_top = [jnp.concatenate([e[:b], e[b:2 * b]], axis=2)
                     for e in enc1_q]
        feat1_bot = [jnp.concatenate([e[2 * b:3 * b], e[3 * b:]], axis=2)
                     for e in enc1_q]
        dec = Decoder(f, self.scale_unetfeats, self.reduction,
                      name="stage1_decoder")
        res1_top = dec([jnp.asarray(t) for t in feat1_top])
        res1_bot = dec([jnp.asarray(t) for t in feat1_bot])

        sam12 = SAM(f, kernel=1, name="sam12")
        x2top_sam, img_top = sam12(res1_top[0], top)
        x2bot_sam, img_bot = sam12(res1_bot[0], bot)

        # ---- stage 2: two halves, batched through the shared weights ----
        halves = jnp.concatenate([top, bot], axis=0)           # (2B, ...)
        x2 = shallow(halves, "shallow_feat2")
        sam_feats = jnp.concatenate([x2top_sam, x2bot_sam], axis=0)
        x2_cat = Conv(f, kernel=3, use_bias=False, name="concat12")(
            jnp.concatenate([x2, sam_feats], axis=-1))
        x2top_cat, x2bot_cat = x2_cat[:b], x2_cat[b:]

        enc2 = Encoder(f, self.scale_unetfeats, csff=True,
                       reduction=self.reduction, name="stage2_encoder")
        feat2_top = enc2(x2top_cat, feat1_top, res1_top)
        feat2_bot = enc2(x2bot_cat, feat1_bot, res1_bot)
        feat2 = [jnp.concatenate([t, bm], axis=1)
                 for t, bm in zip(feat2_top, feat2_bot)]
        res2 = Decoder(f, self.scale_unetfeats, self.reduction,
                       name="stage2_decoder")(feat2)
        x3_sam, stage2_img = SAM(f, kernel=1, name="sam23")(res2[0], x3_img)

        # ---- stage 3: full resolution ----
        x3 = shallow(x3_img, "shallow_feat3")
        x3_cat = Conv(f + self.scale_orsnetfeats, kernel=3, use_bias=False,
                      name="concat23")(
            jnp.concatenate([x3, x3_sam], axis=-1))
        x3_out = ORSNet(f, self.scale_orsnetfeats, self.scale_unetfeats,
                        self.num_cab, self.reduction,
                        name="stage3_orsnet")(x3_cat, feat2, res2)
        stage3_img = Conv(3, kernel=3, use_bias=False, name="tail")(x3_out)
        return stage3_img + x3_img


register_model(ModelSpec(
    name="mprnet",
    build=lambda **kw: MPRNet(**kw),
    subtasks=("denoising", "motion deblurring", "deraining"),
    pad_multiple=8, pad_kind="reflect",
    tile=None,
    config=dict(),
))

register_model(ModelSpec(
    name="mprnet_tiny",
    build=lambda **kw: MPRNet(**kw),
    subtasks=("denoising",),
    pad_multiple=8, pad_kind="reflect",
    tile=None,
    config=dict(n_feat=8, scale_unetfeats=4, scale_orsnetfeats=4, num_cab=1),
))
