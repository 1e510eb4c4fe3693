"""Full numerical conversion parity for Restormer against an in-test torch
implementation of the published architecture (MDTA + GDFN, WithBias LN)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_state_dict, restormer_rules)
from image_restoration_agent_tpu.models import build_model  # noqa: E402

pytestmark = pytest.mark.slow

DIM = 8
HEADS = (1, 1, 2, 2)
BLOCKS = (1, 1, 1, 1)
EXP = 2.0


class TLN(tnn.Module):
    """WithBias LayerNorm over channel at each pixel, wrapped in .body."""

    class Body(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = tnn.Parameter(torch.ones(c))
            self.bias = tnn.Parameter(torch.zeros(c))

        def forward(self, x):  # (b, hw, c)
            mu = x.mean(-1, keepdim=True)
            sigma = x.var(-1, keepdim=True, unbiased=False)
            return (x - mu) / torch.sqrt(sigma + 1e-5) * self.weight \
                + self.bias

    def __init__(self, c):
        super().__init__()
        self.body = TLN.Body(c)

    def forward(self, x):  # (b, c, h, w)
        b, c, h, w = x.shape
        y = x.flatten(2).transpose(1, 2)
        y = self.body(y)
        return y.transpose(1, 2).view(b, c, h, w)


class TAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.temperature = tnn.Parameter(torch.ones(heads, 1, 1))
        self.qkv = tnn.Conv2d(dim, dim * 3, 1, bias=False)
        self.qkv_dwconv = tnn.Conv2d(dim * 3, dim * 3, 3, padding=1,
                                     groups=dim * 3, bias=False)
        self.project_out = tnn.Conv2d(dim, dim, 1, bias=False)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.qkv_dwconv(self.qkv(x))
        q, k, v = qkv.chunk(3, dim=1)

        def heads_of(t):
            return t.reshape(b, self.heads, c // self.heads, h * w)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        q = tF.normalize(q, dim=-1)
        k = tF.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        out = (attn @ v).reshape(b, c, h, w)
        return self.project_out(out)


class TFFN(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        hidden = int(dim * EXP)
        self.project_in = tnn.Conv2d(dim, hidden * 2, 1, bias=False)
        self.dwconv = tnn.Conv2d(hidden * 2, hidden * 2, 3, padding=1,
                                 groups=hidden * 2, bias=False)
        self.project_out = tnn.Conv2d(hidden, dim, 1, bias=False)

    def forward(self, x):
        x1, x2 = self.dwconv(self.project_in(x)).chunk(2, dim=1)
        return self.project_out(tF.gelu(x1) * x2)


class TBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = TLN(dim)
        self.attn = TAttn(dim, heads)
        self.norm2 = TLN(dim)
        self.ffn = TFFN(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.ffn(self.norm2(x))


class TDown(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.body = tnn.Sequential(
            tnn.Conv2d(c, c // 2, 3, padding=1, bias=False),
            tnn.PixelUnshuffle(2))

    def forward(self, x):
        return self.body(x)


class TUp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.body = tnn.Sequential(
            tnn.Conv2d(c, c * 2, 3, padding=1, bias=False),
            tnn.PixelShuffle(2))

    def forward(self, x):
        return self.body(x)


class TRestormer(tnn.Module):
    def __init__(self):
        super().__init__()
        d = DIM
        self.patch_embed_proj = tnn.Conv2d(3, d, 3, padding=1, bias=False)
        mk = lambda dim, h, n: tnn.ModuleList(
            [TBlock(dim, h) for _ in range(n)])
        self.encoder_level1 = mk(d, HEADS[0], BLOCKS[0])
        self.down1_2 = TDown(d)
        self.encoder_level2 = mk(d * 2, HEADS[1], BLOCKS[1])
        self.down2_3 = TDown(d * 2)
        self.encoder_level3 = mk(d * 4, HEADS[2], BLOCKS[2])
        self.down3_4 = TDown(d * 4)
        self.latent = mk(d * 8, HEADS[3], BLOCKS[3])
        self.up4_3 = TUp(d * 8)
        self.reduce_chan_level3 = tnn.Conv2d(d * 8, d * 4, 1, bias=False)
        self.decoder_level3 = mk(d * 4, HEADS[2], BLOCKS[2])
        self.up3_2 = TUp(d * 4)
        self.reduce_chan_level2 = tnn.Conv2d(d * 4, d * 2, 1, bias=False)
        self.decoder_level2 = mk(d * 2, HEADS[1], BLOCKS[1])
        self.up2_1 = TUp(d * 2)
        self.decoder_level1 = mk(d * 2, HEADS[0], BLOCKS[0])
        self.refinement = mk(d * 2, HEADS[0], 1)
        self.output = tnn.Conv2d(d * 2, 3, 3, padding=1, bias=False)

    def forward(self, x):
        def run(blocks, y):
            for b in blocks:
                y = b(y)
            return y

        e1 = run(self.encoder_level1, self.patch_embed_proj(x))
        e2 = run(self.encoder_level2, self.down1_2(e1))
        e3 = run(self.encoder_level3, self.down2_3(e2))
        lat = run(self.latent, self.down3_4(e3))
        y = self.reduce_chan_level3(torch.cat([self.up4_3(lat), e3], 1))
        y = run(self.decoder_level3, y)
        y = self.reduce_chan_level2(torch.cat([self.up3_2(y), e2], 1))
        y = run(self.decoder_level2, y)
        y = run(self.decoder_level1, torch.cat([self.up2_1(y), e1], 1))
        y = run(self.refinement, y)
        return self.output(y) + x


def _reference_names(tm) -> dict:
    out = {}
    for k, v in tm.state_dict().items():
        k = k.replace("patch_embed_proj.", "patch_embed.proj.")
        out[k] = v.detach().numpy()
    return out


class TestRestormerFullParity:
    def test_converted_model_matches_torch(self, rng):
        torch.manual_seed(0)
        tm = TRestormer().eval()
        # randomize temperatures away from init for a stronger check
        with torch.no_grad():
            for m in tm.modules():
                if isinstance(m, TAttn):
                    m.temperature.copy_(torch.rand_like(m.temperature) + 0.5)
        state = _reference_names(tm)

        fm = build_model("restormer_tiny")
        template = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        params = convert_state_dict(state, restormer_rules(), template)

        x = rng.random((1, 16, 16, 3), dtype=np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   atol=5e-5)
