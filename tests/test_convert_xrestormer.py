"""Full numerical conversion parity for X-Restormer against an in-test torch
implementation of the published architecture (MDTA channel attention +
overlapping cross-attention OCAB with decomposed RelPosEmb, GDFN ffns).

Reference: xrestormer_arch.py:24-238 (rel_to_abs / relative_logits_1d /
RelPosEmb / ChannelAttention / OCAB / TransformerBlock) and :325-414
(4-level U-shape with refinement).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402
from torch import einsum  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_state_dict, xrestormer_rules)
from image_restoration_agent_tpu.models.xrestormer import XRestormer  # noqa: E402

pytestmark = pytest.mark.slow

DIM = 8
BLOCKS = (1, 1, 1, 1)
REFINE = 1
CH_HEADS = (1, 1, 2, 2)
SP_HEADS = (1, 1, 2, 2)
DIM_HEAD = 4
WS = 4
OVER = 0.5
EXP = 2.0


def rel_to_abs(x):
    # reference xrestormer_arch.py:24-35
    b, l, m = x.shape
    r = (m + 1) // 2
    col_pad = torch.zeros((b, l, 1), dtype=x.dtype)
    x = torch.cat((x, col_pad), dim=2)
    flat_x = x.reshape(b, l * (m + 1))
    flat_pad = torch.zeros((b, m - l), dtype=x.dtype)
    flat_x_padded = torch.cat((flat_x, flat_pad), dim=1)
    final_x = flat_x_padded.reshape(b, l + 1, m)
    return final_x[:, :l, -r:]


def relative_logits_1d(q, rel_k):
    # reference xrestormer_arch.py:37-47 (expand_dim at dim=2, k=r)
    b, h, w, _ = q.shape
    r = (rel_k.shape[0] + 1) // 2
    logits = einsum("b x y d, r d -> b x y r", q, rel_k)
    logits = logits.reshape(b * h, w, -1)
    logits = rel_to_abs(logits)
    logits = logits.reshape(b, h, w, r)
    return logits.unsqueeze(2).expand(b, h, r, w, r)


class TRelPosEmb(tnn.Module):
    def __init__(self, block_size, rel_size, dim_head):
        super().__init__()
        height = width = rel_size
        scale = dim_head ** -0.5
        self.block_size = block_size
        self.rel_height = tnn.Parameter(
            torch.randn(height * 2 - 1, dim_head) * scale)
        self.rel_width = tnn.Parameter(
            torch.randn(width * 2 - 1, dim_head) * scale)

    def forward(self, q):
        block = self.block_size
        q = q.reshape(-1, block, block, q.shape[-1])
        rel_logits_w = relative_logits_1d(q, self.rel_width)
        b, x, i, y, j = rel_logits_w.shape
        rel_logits_w = rel_logits_w.permute(0, 1, 3, 2, 4).reshape(
            b, x * y, i * j)

        q = q.permute(0, 2, 1, 3)
        rel_logits_h = relative_logits_1d(q, self.rel_height)
        b, x, i, y, j = rel_logits_h.shape
        # 'b x i y j -> b (y x) (j i)'
        rel_logits_h = rel_logits_h.permute(0, 3, 1, 4, 2).reshape(
            b, y * x, j * i)
        return rel_logits_w + rel_logits_h


class TLN(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.body = tnn.ParameterDict()
        self.body = tnn.Module()
        self.body.weight = tnn.Parameter(torch.ones(c))
        self.body.bias = tnn.Parameter(torch.zeros(c))

    def forward(self, x):
        b, c, h, w = x.shape
        y = x.flatten(2).transpose(1, 2)
        mu = y.mean(-1, keepdim=True)
        sigma = y.var(-1, keepdim=True, unbiased=False)
        y = (y - mu) / torch.sqrt(sigma + 1e-5) * self.body.weight \
            + self.body.bias
        return y.transpose(1, 2).view(b, c, h, w)


class TChannelAttention(tnn.Module):
    def __init__(self, dim, heads, bias=False):
        super().__init__()
        self.num_heads = heads
        self.temperature = tnn.Parameter(torch.ones(heads, 1, 1))
        self.qkv = tnn.Conv2d(dim, dim * 3, 1, bias=bias)
        self.qkv_dwconv = tnn.Conv2d(dim * 3, dim * 3, 3, padding=1,
                                     groups=dim * 3, bias=bias)
        self.project_out = tnn.Conv2d(dim, dim, 1, bias=bias)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.qkv_dwconv(self.qkv(x))
        q, k, v = qkv.chunk(3, dim=1)
        hds = self.num_heads

        def heads_of(t):
            return t.reshape(b, hds, c // hds, h * w)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        q = tF.normalize(q, dim=-1)
        k = tF.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        out = (attn @ v).reshape(b, c, h, w)
        return self.project_out(out)


class TOCAB(tnn.Module):
    # reference xrestormer_arch.py:190-238
    def __init__(self, dim, window_size, overlap_ratio, num_heads, dim_head,
                 bias=False):
        super().__init__()
        self.num_spatial_heads = num_heads
        self.dim = dim
        self.window_size = window_size
        self.overlap_win_size = int(window_size * overlap_ratio) + window_size
        self.dim_head = dim_head
        self.inner_dim = dim_head * num_heads
        self.scale = dim_head ** -0.5
        self.unfold = tnn.Unfold(
            kernel_size=(self.overlap_win_size, self.overlap_win_size),
            stride=window_size,
            padding=(self.overlap_win_size - window_size) // 2)
        self.qkv = tnn.Conv2d(dim, self.inner_dim * 3, 1, bias=bias)
        self.project_out = tnn.Conv2d(self.inner_dim, dim, 1, bias=bias)
        self.rel_pos_emb = TRelPosEmb(
            block_size=window_size,
            rel_size=window_size + (self.overlap_win_size - window_size),
            dim_head=dim_head)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.qkv(x)
        qs, ks, vs = qkv.chunk(3, dim=1)
        ws, ows = self.window_size, self.overlap_win_size
        inner = self.inner_dim

        # queries: non-overlapping windows 'b c (h p1) (w p2) -> (b h w) (p1 p2) c'
        qs = qs.reshape(b, inner, h // ws, ws, w // ws, ws)
        qs = qs.permute(0, 2, 4, 3, 5, 1).reshape(-1, ws * ws, inner)
        # keys/values: overlapping windows via Unfold
        ks, vs = map(
            lambda t: self.unfold(t).reshape(
                b, inner, ows * ows, -1).permute(0, 3, 2, 1).reshape(
                    -1, ows * ows, inner),
            (ks, vs))

        hds = self.num_spatial_heads

        def heads_of(t):
            n = t.shape[1]
            return t.reshape(-1, n, hds, self.dim_head).permute(0, 2, 1, 3) \
                .reshape(-1, n, self.dim_head)

        qs, ks, vs = heads_of(qs), heads_of(ks), heads_of(vs)
        qs = qs * self.scale
        spatial_attn = qs @ ks.transpose(-2, -1)
        spatial_attn = spatial_attn + self.rel_pos_emb(qs)
        spatial_attn = spatial_attn.softmax(dim=-1)
        out = spatial_attn @ vs  # (b*nW*heads, ws*ws, dim_head)
        # merge heads + windows back: inverse of the splits above
        nw = (h // ws) * (w // ws)
        out = out.reshape(b * nw, hds, ws * ws, self.dim_head)
        out = out.permute(0, 2, 1, 3).reshape(b, h // ws, w // ws, ws, ws,
                                              inner)
        out = out.permute(0, 5, 1, 3, 2, 4).reshape(b, inner, h, w)
        return self.project_out(out)


class TFFN(tnn.Module):
    def __init__(self, dim, bias=False):
        super().__init__()
        hidden = int(dim * EXP)
        self.project_in = tnn.Conv2d(dim, hidden * 2, 1, bias=bias)
        self.dwconv = tnn.Conv2d(hidden * 2, hidden * 2, 3, padding=1,
                                 groups=hidden * 2, bias=bias)
        self.project_out = tnn.Conv2d(hidden, dim, 1, bias=bias)

    def forward(self, x):
        x = self.project_in(x)
        x1, x2 = self.dwconv(x).chunk(2, dim=1)
        return self.project_out(tF.gelu(x1) * x2)


class TBlock(tnn.Module):
    def __init__(self, dim, ch_heads, sp_heads):
        super().__init__()
        self.norm1 = TLN(dim)
        self.channel_attn = TChannelAttention(dim, ch_heads)
        self.norm2 = TLN(dim)
        self.channel_ffn = TFFN(dim)
        self.norm3 = TLN(dim)
        self.spatial_attn = TOCAB(dim, WS, OVER, sp_heads, DIM_HEAD)
        self.norm4 = TLN(dim)
        self.spatial_ffn = TFFN(dim)

    def forward(self, x):
        x = x + self.channel_attn(self.norm1(x))
        x = x + self.channel_ffn(self.norm2(x))
        x = x + self.spatial_attn(self.norm3(x))
        x = x + self.spatial_ffn(self.norm4(x))
        return x


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


class TXRestormer(tnn.Module):
    def __init__(self):
        super().__init__()
        d = DIM

        class PE(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Conv2d(3, d, 3, padding=1, bias=False)

            def forward(self, x):
                return self.proj(x)

        def blocks(dim, lvl, n):
            return tnn.Sequential(*[TBlock(dim, CH_HEADS[lvl], SP_HEADS[lvl])
                                    for _ in range(n)])

        self.patch_embed = PE()
        self.encoder_level1 = blocks(d, 0, BLOCKS[0])
        self.down1_2 = TDown(d)
        self.encoder_level2 = blocks(d * 2, 1, BLOCKS[1])
        self.down2_3 = TDown(d * 2)
        self.encoder_level3 = blocks(d * 4, 2, BLOCKS[2])
        self.down3_4 = TDown(d * 4)
        self.latent = blocks(d * 8, 3, BLOCKS[3])
        self.up4_3 = TUp(d * 8)
        self.reduce_chan_level3 = tnn.Conv2d(d * 8, d * 4, 1, bias=False)
        self.decoder_level3 = blocks(d * 4, 2, BLOCKS[2])
        self.up3_2 = TUp(d * 4)
        self.reduce_chan_level2 = tnn.Conv2d(d * 4, d * 2, 1, bias=False)
        self.decoder_level2 = blocks(d * 2, 1, BLOCKS[1])
        self.up2_1 = TUp(d * 2)
        self.decoder_level1 = blocks(d * 2, 0, BLOCKS[0])
        self.refinement = blocks(d * 2, 0, REFINE)
        self.output = tnn.Conv2d(d * 2, 3, 3, padding=1, bias=False)

    def forward(self, x):
        e1 = self.encoder_level1(self.patch_embed(x))
        e2 = self.encoder_level2(self.down1_2(e1))
        e3 = self.encoder_level3(self.down2_3(e2))
        lat = self.latent(self.down3_4(e3))
        y = self.reduce_chan_level3(torch.cat([self.up4_3(lat), e3], 1))
        y = self.decoder_level3(y)
        y = self.reduce_chan_level2(torch.cat([self.up3_2(y), e2], 1))
        y = self.decoder_level2(y)
        y = torch.cat([self.up2_1(y), e1], 1)
        y = self.refinement(self.decoder_level1(y))
        return self.output(y) + x


class TestXRestormerFullParity:
    def test_converted_model_matches_torch(self, rng):
        torch.manual_seed(0)
        tm = TXRestormer().eval()
        # randomize so parity is meaningful (convs init nonzero already;
        # perturb norms)
        with torch.no_grad():
            for p in tm.parameters():
                if p.ndim == 1:
                    p.add_(torch.randn_like(p) * 0.05)

        state = {k: v.numpy() for k, v in tm.state_dict().items()}
        fm = XRestormer(dim=DIM, num_blocks=BLOCKS,
                        num_refinement_blocks=REFINE,
                        channel_heads=CH_HEADS, spatial_heads=SP_HEADS,
                        overlap_ratio=(OVER,) * 4, window_size=WS,
                        spatial_dim_head=DIM_HEAD,
                        ffn_expansion_factor=EXP)
        template = jax.eval_shape(
            lambda: fm.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3))))
        params = convert_state_dict(state, xrestormer_rules(), template)

        x = rng.random((1, 32, 32, 3), dtype=np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   atol=5e-5)
