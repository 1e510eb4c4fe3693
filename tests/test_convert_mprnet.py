"""MPRNet weight-conversion parity: torch model assembled in-test from
torch.nn primitives (published MPRNet architecture, arXiv:2102.02808) with
the reference's state-dict names (MPRNet.py), converted via mprnet_rules
and compared numerically to models/mprnet.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_with_drops, mprnet_rules,
)
from image_restoration_agent_tpu.models import build_model  # noqa: E402

pytestmark = pytest.mark.slow


def conv3(ci, co, k=3):
    return tnn.Conv2d(ci, co, k, padding=k // 2, bias=False)


class TCALayer(tnn.Module):
    def __init__(self, c, reduction):
        super().__init__()
        self.conv_du = tnn.Sequential(
            tnn.Conv2d(c, c // reduction, 1, bias=False), tnn.ReLU(),
            tnn.Conv2d(c // reduction, c, 1, bias=False), tnn.Sigmoid())

    def forward(self, x):
        return x * self.conv_du(tF.adaptive_avg_pool2d(x, 1))


class TCAB(tnn.Module):
    def __init__(self, c, reduction, act):
        super().__init__()
        self.body = tnn.Sequential(conv3(c, c), act, conv3(c, c))
        self.CA = TCALayer(c, reduction)

    def forward(self, x):
        return x + self.CA(self.body(x))


class TSAM(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c, 1, bias=False)
        self.conv2 = tnn.Conv2d(c, 3, 1, bias=False)
        self.conv3 = tnn.Conv2d(3, c, 1, bias=False)

    def forward(self, x, x_img):
        img = self.conv2(x) + x_img
        return self.conv1(x) * torch.sigmoid(self.conv3(img)) + x, img


def _updown(ci, co, scale):
    return tnn.Sequential(
        tnn.Upsample(scale_factor=scale, mode="bilinear",
                     align_corners=False),
        tnn.Conv2d(ci, co, 1, bias=False))


class TDown(tnn.Module):
    def __init__(self, ci, s):
        super().__init__()
        self.down = _updown(ci, ci + s, 0.5)

    def forward(self, x):
        return self.down(x)


class TUp(tnn.Module):
    def __init__(self, ci, s):
        super().__init__()
        self.up = _updown(ci + s, ci, 2)

    def forward(self, x):
        return self.up(x)


class TEncoder(tnn.Module):
    def __init__(self, f, red, act, s, csff):
        super().__init__()
        self.encoder_level1 = tnn.Sequential(TCAB(f, red, act),
                                             TCAB(f, red, act))
        self.encoder_level2 = tnn.Sequential(TCAB(f + s, red, act),
                                             TCAB(f + s, red, act))
        self.encoder_level3 = tnn.Sequential(TCAB(f + 2 * s, red, act),
                                             TCAB(f + 2 * s, red, act))
        self.down12 = TDown(f, s)
        self.down23 = TDown(f + s, s)
        if csff:
            for i, c in ((1, f), (2, f + s), (3, f + 2 * s)):
                setattr(self, f"csff_enc{i}", tnn.Conv2d(c, c, 1, bias=False))
                setattr(self, f"csff_dec{i}", tnn.Conv2d(c, c, 1, bias=False))
        self.csff = csff

    def forward(self, x, enc_outs=None, dec_outs=None):
        enc1 = self.encoder_level1(x)
        if self.csff and enc_outs is not None:
            enc1 = enc1 + self.csff_enc1(enc_outs[0]) + \
                self.csff_dec1(dec_outs[0])
        x = self.down12(enc1)
        enc2 = self.encoder_level2(x)
        if self.csff and enc_outs is not None:
            enc2 = enc2 + self.csff_enc2(enc_outs[1]) + \
                self.csff_dec2(dec_outs[1])
        x = self.down23(enc2)
        enc3 = self.encoder_level3(x)
        if self.csff and enc_outs is not None:
            enc3 = enc3 + self.csff_enc3(enc_outs[2]) + \
                self.csff_dec3(dec_outs[2])
        return [enc1, enc2, enc3]


class TDecoder(tnn.Module):
    def __init__(self, f, red, act, s):
        super().__init__()
        self.decoder_level1 = tnn.Sequential(TCAB(f, red, act),
                                             TCAB(f, red, act))
        self.decoder_level2 = tnn.Sequential(TCAB(f + s, red, act),
                                             TCAB(f + s, red, act))
        self.decoder_level3 = tnn.Sequential(TCAB(f + 2 * s, red, act),
                                             TCAB(f + 2 * s, red, act))
        self.skip_attn1 = TCAB(f, red, act)
        self.skip_attn2 = TCAB(f + s, red, act)
        self.up21 = TUp(f, s)
        self.up32 = TUp(f + s, s)

    def forward(self, outs):
        enc1, enc2, enc3 = outs
        dec3 = self.decoder_level3(enc3)
        x = self.up32(dec3) + self.skip_attn2(enc2)
        dec2 = self.decoder_level2(x)
        x = self.up21(dec2) + self.skip_attn1(enc1)
        dec1 = self.decoder_level1(x)
        return [dec1, dec2, dec3]


class TORSNet(tnn.Module):
    def __init__(self, f, so, su, num_cab, red, act):
        super().__init__()
        for i in (1, 2, 3):
            body = [TCAB(f + so, red, act) for _ in range(num_cab)]
            body.append(conv3(f + so, f + so))
            setattr(self, f"orb{i}", tnn.Sequential())
            getattr(self, f"orb{i}").body = tnn.Sequential(*body)
        self.up_enc1 = TUp(f, su)
        self.up_dec1 = TUp(f, su)
        self.up_enc2 = tnn.Sequential(TUp(f + su, su), TUp(f, su))
        self.up_dec2 = tnn.Sequential(TUp(f + su, su), TUp(f, su))
        for nm in ("conv_enc1", "conv_enc2", "conv_enc3",
                   "conv_dec1", "conv_dec2", "conv_dec3"):
            setattr(self, nm, tnn.Conv2d(f, f + so, 1, bias=False))

    @staticmethod
    def _orb(orb, x):
        return x + orb.body(x)

    def forward(self, x, enc_outs, dec_outs):
        x = self._orb(self.orb1, x)
        x = x + self.conv_enc1(enc_outs[0]) + self.conv_dec1(dec_outs[0])
        x = self._orb(self.orb2, x)
        x = x + self.conv_enc2(self.up_enc1(enc_outs[1])) + \
            self.conv_dec2(self.up_dec1(dec_outs[1]))
        x = self._orb(self.orb3, x)
        x = x + self.conv_enc3(self.up_enc2(enc_outs[2])) + \
            self.conv_dec3(self.up_dec2(dec_outs[2]))
        return x


class TMPRNet(tnn.Module):
    """Published 3-stage MPRNet with the reference's state-dict names;
    one shared nn.PReLU across all CABs (MPRNet.py:239)."""

    def __init__(self, f=8, su=4, so=4, num_cab=1, red=4):
        super().__init__()
        act = tnn.PReLU()
        for i in (1, 2, 3):
            setattr(self, f"shallow_feat{i}",
                    tnn.Sequential(conv3(3, f), TCAB(f, red, act)))
        self.stage1_encoder = TEncoder(f, red, act, su, csff=False)
        self.stage1_decoder = TDecoder(f, red, act, su)
        self.stage2_encoder = TEncoder(f, red, act, su, csff=True)
        self.stage2_decoder = TDecoder(f, red, act, su)
        self.stage3_orsnet = TORSNet(f, so, su, num_cab, red, act)
        self.sam12 = TSAM(f)
        self.sam23 = TSAM(f)
        self.concat12 = conv3(2 * f, f)
        self.concat23 = conv3(2 * f, f + so)
        self.tail = conv3(f + so, 3)

    def forward(self, x3):
        h, w = x3.shape[2], x3.shape[3]
        x2t, x2b = x3[:, :, :h // 2], x3[:, :, h // 2:]
        x1 = [x2t[:, :, :, :w // 2], x2t[:, :, :, w // 2:],
              x2b[:, :, :, :w // 2], x2b[:, :, :, w // 2:]]
        feats1 = [self.shallow_feat1(q) for q in x1]
        enc1 = [self.stage1_encoder(fq) for fq in feats1]
        feat1_t = [torch.cat((a, b), 3) for a, b in zip(enc1[0], enc1[1])]
        feat1_b = [torch.cat((a, b), 3) for a, b in zip(enc1[2], enc1[3])]
        res1_t = self.stage1_decoder(feat1_t)
        res1_b = self.stage1_decoder(feat1_b)
        x2t_sam, img_t = self.sam12(res1_t[0], x2t)
        x2b_sam, img_b = self.sam12(res1_b[0], x2b)

        x2t_f = self.shallow_feat2(x2t)
        x2b_f = self.shallow_feat2(x2b)
        x2t_cat = self.concat12(torch.cat([x2t_f, x2t_sam], 1))
        x2b_cat = self.concat12(torch.cat([x2b_f, x2b_sam], 1))
        feat2_t = self.stage2_encoder(x2t_cat, feat1_t, res1_t)
        feat2_b = self.stage2_encoder(x2b_cat, feat1_b, res1_b)
        feat2 = [torch.cat((a, b), 2) for a, b in zip(feat2_t, feat2_b)]
        res2 = self.stage2_decoder(feat2)
        x3_sam, img2 = self.sam23(res2[0], x3)

        x3_f = self.shallow_feat3(x3)
        x3_cat = self.concat23(torch.cat([x3_f, x3_sam], 1))
        x3_out = self.stage3_orsnet(x3_cat, feat2, res2)
        return self.tail(x3_out) + x3


class TestMPRNetFullParity:
    @pytest.fixture(scope="class")
    def rng(self):
        return np.random.default_rng(7)

    def test_converted_forward_matches(self, rng):
        torch.manual_seed(3)
        tm = TMPRNet().eval()
        state = tm.state_dict()
        # the shared PReLU appears once per CAB in the state dict
        alphas = [k for k in state if k.endswith("body.1.weight")]
        assert len(alphas) >= 30

        fm = build_model("mprnet_tiny")
        x = rng.random((1, 16, 16, 3), dtype=np.float32)
        template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = convert_with_drops(state, mprnet_rules(), template)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   atol=5e-6)
