"""MANIQA conversion parity against an in-test torch implementation
mirroring the official IIGROUP/MANIQA graph (ViT trunk block taps ->
TABlocks -> conv -> light Swin stages -> score*weight head) at mini scale.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.iqa_rules import (  # noqa: E402
    maniqa_rules)
from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_with_drops)
from image_restoration_agent_tpu.iqa.maniqa import MANIQA  # noqa: E402

pytestmark = pytest.mark.slow

EMBED = 8          # vit width
IMG = 16
PATCH = 4          # -> 4x4 = 16 tokens
RES = IMG // PATCH
N = RES * RES
VIT_DEPTH = 4
VIT_HEADS = 2
TAPS = (0, 1, 2, 3)
WS = 2
DEPTHS = (2, 2)
HEADS = (2, 2)
DIM_MLP = 8
SCALE = 0.8


class TViTBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, 3 * dim)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        qkv = self.attn.qkv(self.norm1(x)) \
            .reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * hd ** -0.5
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(o)
        y = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(y)))


class TViT(tnn.Module):
    def __init__(self):
        super().__init__()
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, EMBED))
        self.pos_embed = tnn.Parameter(torch.randn(1, N + 1, EMBED) * 0.02)
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, EMBED, PATCH, PATCH)
        self.blocks = tnn.ModuleList(
            [TViTBlock(EMBED, VIT_HEADS) for _ in range(VIT_DEPTH)])

    def forward(self, x):  # returns all block outputs
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        outs = []
        for blk in self.blocks:
            x = blk(x)
            outs.append(x)
        return outs


class TTAB(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.c_q = tnn.Linear(dim, dim)
        self.c_k = tnn.Linear(dim, dim)
        self.c_v = tnn.Linear(dim, dim)

    def forward(self, x):  # (B, C, N)
        q, k, v = self.c_q(x), self.c_k(x), self.c_v(x)
        a = (q @ k.transpose(-2, -1)) * x.shape[-1] ** -0.5
        return a.softmax(dim=-1) @ v + x


def _rel_index(ws):
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij"))
    cf = torch.flatten(coords, 1)
    rel = cf[:, :, None] - cf[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class TSwinBlock(tnn.Module):
    def __init__(self, dim, heads, ws, shift, dim_mlp):
        super().__init__()
        self.dim, self.heads, self.ws, self.shift = dim, heads, ws, shift
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = tnn.Module()
        self.attn.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        self.attn.qkv = tnn.Linear(dim, 3 * dim)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim_mlp)
        self.mlp.fc2 = tnn.Linear(dim_mlp, dim)
        self.attn.register_buffer("relative_position_index",
                                  _rel_index(ws))

    def forward(self, x, h, w):  # (B, N, C)
        b, n, c = x.shape
        ws = self.ws
        shortcut = x
        y = self.norm1(x).view(b, h, w, c)
        if self.shift:
            y = torch.roll(y, (-self.shift, -self.shift), dims=(1, 2))
        # window partition
        y = y.view(b, h // ws, ws, w // ws, ws, c) \
            .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        hd = c // self.heads
        qkv = self.attn.qkv(y).reshape(-1, ws * ws, 3, self.heads, hd) \
            .permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * hd ** -0.5
        rpb = self.attn.relative_position_bias_table[
            self.attn.relative_position_index.view(-1)] \
            .view(ws * ws, ws * ws, self.heads).permute(2, 0, 1)
        a = a + rpb.unsqueeze(0)
        if self.shift:
            from image_restoration_agent_tpu.ops.window_attention import (
                shift_attention_mask)
            m = shift_attention_mask(h, w, ws, self.shift)
            mask = torch.from_numpy(np.asarray(m))
            nw = mask.shape[0]
            a = a.view(-1, nw, self.heads, ws * ws, ws * ws) \
                + mask.unsqueeze(0).unsqueeze(2)
            a = a.view(-1, self.heads, ws * ws, ws * ws)
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(-1, ws * ws, c)
        o = self.attn.proj(o)
        o = o.view(b, h // ws, w // ws, ws, ws, c) \
            .permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if self.shift:
            o = torch.roll(o, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + o.reshape(b, n, c)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class TBasicLayer(tnn.Module):
    def __init__(self, dim, depth, heads, ws, dim_mlp):
        super().__init__()
        self.blocks = tnn.ModuleList([
            TSwinBlock(dim, heads, ws, 0 if i % 2 == 0 else ws // 2,
                       dim_mlp) for i in range(depth)])

    def forward(self, x, h, w):
        for blk in self.blocks:
            x = blk(x, h, w)
        return x


class TSwinT(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.layers = tnn.ModuleList([
            TBasicLayer(dim, d, hd, WS, DIM_MLP)
            for d, hd in zip(DEPTHS, HEADS)])

    def forward(self, x):  # (B, C, H, W)
        b, c, h, w = x.shape
        t = x.flatten(2).transpose(1, 2)
        for layer in self.layers:
            res = t
            t = layer(t, h, w)
            t = SCALE * t + res
        return t.transpose(1, 2).view(b, c, h, w)


class TMANIQA(tnn.Module):
    def __init__(self):
        super().__init__()
        self.vit = TViT()
        self.tablock1 = tnn.ModuleList([TTAB(N) for _ in range(2)])
        self.conv1 = tnn.Conv2d(EMBED * 4, EMBED, 1)
        self.swintransformer1 = TSwinT(EMBED)
        self.tablock2 = tnn.ModuleList([TTAB(N) for _ in range(2)])
        self.conv2 = tnn.Conv2d(EMBED, EMBED // 2, 1)
        self.swintransformer2 = TSwinT(EMBED // 2)
        self.fc_score = tnn.Sequential(
            tnn.Linear(EMBED // 2, EMBED // 2), tnn.ReLU(), tnn.Dropout(0),
            tnn.Linear(EMBED // 2, 1), tnn.ReLU())
        self.fc_weight = tnn.Sequential(
            tnn.Linear(EMBED // 2, EMBED // 2), tnn.ReLU(), tnn.Dropout(0),
            tnn.Linear(EMBED // 2, 1), tnn.Sigmoid())

    def forward(self, x):
        outs = self.vit(x)
        f = torch.cat([outs[i][:, 1:] for i in TAPS], dim=2)  # (B,N,4E)
        b = f.shape[0]
        x = f.transpose(1, 2)  # (B, C, N)
        for tab in self.tablock1:
            x = tab(x)
        x = x.view(b, -1, RES, RES)
        x = self.conv1(x)
        x = self.swintransformer1(x)
        x = x.flatten(2)
        for tab in self.tablock2:
            x = tab(x)
        x = x.view(b, -1, RES, RES)
        x = self.conv2(x)
        x = self.swintransformer2(x)
        x = x.flatten(2).transpose(1, 2)  # (B, N, C)
        s = self.fc_score(x)
        w = self.fc_weight(x)
        return (s * w).sum(dim=1)[:, 0] / w.sum(dim=1)[:, 0]


def _mini_flax():
    return MANIQA(embed_dim=EMBED, patch_size=PATCH, img_size=IMG,
                  depths=DEPTHS, num_heads=HEADS, window_size=WS,
                  dim_mlp=DIM_MLP, num_tab=2, scale=SCALE,
                  vit_depth=VIT_DEPTH, vit_heads=VIT_HEADS,
                  feature_blocks=TAPS)


def test_maniqa_conversion_forward_parity():
    torch.manual_seed(0)
    tm = TMANIQA().eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = _mini_flax()
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, IMG, IMG, 3))))["params"]
    params = convert_with_drops(state, maniqa_rules(), template=template)

    x = np.random.default_rng(0).standard_normal(
        (2, IMG, IMG, 3)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_maniqa_scorer_protocol():
    """ManiqaScorer: crop batching + deterministic output on random init."""
    from image_restoration_agent_tpu.iqa.maniqa import ManiqaScorer

    fm = _mini_flax()
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)))
    sc = ManiqaScorer(params, model=fm, n_crops=3)
    img = np.random.default_rng(1).random((40, 50, 3), dtype=np.float32)
    a, b = sc(img), sc(img)
    assert a == b and math.isfinite(a)
    # smaller-than-crop inputs get upscaled
    small = np.random.default_rng(2).random((10, 12, 3), dtype=np.float32)
    assert math.isfinite(sc(small))
