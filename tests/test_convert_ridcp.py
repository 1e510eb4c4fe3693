"""Full numerical conversion parity for RIDCP against an in-test torch
implementation of the published architecture (dehaze_vq_weight_arch.py):
multi-scale GN-ResBlock encoder + SwinIR RSTB bottleneck + VQ codebook with
HQ-prior reweighting + code decoder + residual decoder with DCNv2 warp and
mean-ratio fusion.

The torch DCNv2 is re-modeled independently with F.grid_sample (the CUDA
kernel's bilinear-with-zero-padding semantics and its (group, tap, [dy, dx])
offset layout fed by DCNv2Pack's cat((o1, o2)))."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_with_drops, ridcp_rules)
from image_restoration_agent_tpu.models.ridcp import RIDCP  # noqa: E402

from test_convert_swinir import _mask, _rpi, _win_part, _win_rev  # noqa: E402,F401

pytestmark = pytest.mark.slow

# tiny single-scale-codebook config
CQ = {256: 8, 128: 12, 64: 16}
N_E, E_DIM = 32, 16
MAX_DEPTH = 2
SWIN_BLOCKS, SWIN_DEPTH, SWIN_HEADS = 1, 2, 2
WS = 8
ALPHA = -21.25


def t_mdcn(x, offset, mask, weight, bias, groups):
    """Torch DCNv2 forward via grid_sample (stride 1, pad 1, k 3)."""
    b, cin, h, w = x.shape
    k = 3
    pad = 1
    cg = cin // groups
    ys, xs = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    out = torch.zeros(b, weight.shape[0], h, w)
    for g in range(groups):
        xg = x[:, g * cg:(g + 1) * cg]
        for i in range(k):
            for j in range(k):
                tap = i * k + j
                dy = offset[:, g * 2 * k * k + 2 * tap]
                dx = offset[:, g * 2 * k * k + 2 * tap + 1]
                m = mask[:, g * k * k + tap]
                py = ys[None] + (i - pad) + dy
                px = xs[None] + (j - pad) + dx
                grid = torch.stack(
                    [2 * px / (w - 1) - 1, 2 * py / (h - 1) - 1], dim=-1)
                sampled = tF.grid_sample(xg, grid, mode="bilinear",
                                         padding_mode="zeros",
                                         align_corners=True)
                wtap = weight[:, g * cg:(g + 1) * cg, i, j]  # (Cout, cg)
                out = out + torch.einsum(
                    "bchw,oc->bohw", sampled * m[:, None], wtap)
    return out + bias.view(1, -1, 1, 1)


class TResBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        gn = lambda ch: tnn.GroupNorm(min(32, ch), ch, eps=1e-6)  # noqa: E731

        class Norm(tnn.Module):
            def __init__(self, ch):
                super().__init__()
                self.norm = gn(ch)

            def forward(self, x):
                return self.norm(x)

        self.conv = tnn.Sequential(
            Norm(c), tnn.SiLU(), tnn.Conv2d(c, c, 3, padding=1),
            Norm(c), tnn.SiLU(), tnn.Conv2d(c, c, 3, padding=1))

    def forward(self, x):
        return x + self.conv(x)


class TSwinBlock(tnn.Module):
    """network_swinir SwinTransformerBlock on (B, HW, C) tokens."""

    def __init__(self, dim, heads, shift):
        super().__init__()
        self.shift = shift
        self.norm1 = tnn.LayerNorm(dim)

        class Attn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = tnn.Linear(dim, 3 * dim)
                self.proj = tnn.Linear(dim, dim)
                self.relative_position_bias_table = tnn.Parameter(
                    torch.randn((2 * WS - 1) ** 2, heads) * 0.02)
                self.register_buffer("relative_position_index", _rpi(WS))

        self.attn = Attn()
        self.heads = heads
        self.dim = dim
        self.norm2 = tnn.LayerNorm(dim)

        class Mlp(tnn.Module):  # network_swinir Mlp naming (fc1/fc2)
            def __init__(self):
                super().__init__()
                self.fc1 = tnn.Linear(dim, 4 * dim)
                self.fc2 = tnn.Linear(4 * dim, dim)

            def forward(self, x):
                return self.fc2(tF.gelu(self.fc1(x)))

        self.mlp = Mlp()

    def _attn(self, x, mask):
        b_, n, c = x.shape
        hd = c // self.heads
        qkv = self.attn.qkv(x).reshape(b_, n, 3, self.heads, hd) \
            .permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.attn.relative_position_bias_table[
            self.attn.relative_position_index.view(-1)].view(
            n, n, self.heads)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.heads, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.attn.proj(out)

    def forward(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        shift = 0 if min(h, w) <= WS else self.shift
        y = self.norm1(x)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        m = _mask(h, w, WS, shift) if shift else None
        yw = self._attn(_win_part(y, WS), m)
        y = _win_rev(yw, WS, h, w)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = x + y
        return x + self.mlp(self.norm2(x))


class TRSTB(tnn.Module):
    def __init__(self, dim, depth, heads):
        super().__init__()

        class Group(tnn.Module):
            def __init__(self):
                super().__init__()
                self.blocks = tnn.ModuleList(
                    [TSwinBlock(dim, heads, 0 if i % 2 == 0 else WS // 2)
                     for i in range(depth)])

        self.residual_group = Group()
        self.conv = tnn.Conv2d(dim, dim, 3, padding=1)

    def forward(self, x):  # (B, H, W, C)
        res = x
        for blk in self.residual_group.blocks:
            x = blk(x)
        x = self.conv(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        return x + res


class TWarp(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.offset = tnn.Conv2d(c * 2, c, 3, padding=1)

        class DCN(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_offset = tnn.Conv2d(c, 3 * 4 * 9, 3, padding=1)
                self.weight = tnn.Parameter(torch.randn(c, c, 3, 3) * 0.05)
                self.bias = tnn.Parameter(torch.zeros(c))

        self.dcn = DCN()

    def forward(self, x_vq, x_residual):
        feat = self.offset(torch.cat([x_vq, x_residual], dim=1))
        out = self.dcn.conv_offset(feat)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(mask)
        return t_mdcn(x_vq, offset, mask, self.dcn.weight, self.dcn.bias, 4)


class TRIDCP(tnn.Module):
    def __init__(self):
        super().__init__()

        class Enc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.in_conv = tnn.Conv2d(3, CQ[256], 4, padding=1)
                self.blocks = tnn.ModuleList()
                res = 256
                for _ in range(MAX_DEPTH):
                    out_ch = CQ[res // 2]
                    self.blocks.append(tnn.Sequential(
                        tnn.Conv2d(CQ[res], out_ch, 3, stride=2, padding=1),
                        TResBlock(out_ch), TResBlock(out_ch)))
                    res //= 2

                class Swin(tnn.Module):
                    def __init__(self):
                        super().__init__()
                        self.swin_blks = tnn.ModuleList(
                            [TRSTB(CQ[64], SWIN_DEPTH, SWIN_HEADS)
                             for _ in range(SWIN_BLOCKS)])

                    def forward(self, x):  # (B, C, H, W)
                        y = x.permute(0, 2, 3, 1)
                        for m in self.swin_blks:
                            y = m(y)
                        return y.permute(0, 3, 1, 2)

                self.blocks.append(Swin())

            def forward(self, x):
                x = self.in_conv(x)
                for m in self.blocks:
                    x = m(x)
                return x

        self.multiscale_encoder = Enc()
        self.before_quant_group = tnn.ModuleList(
            [tnn.Conv2d(CQ[64], E_DIM, 1)])

        class Quant(tnn.Module):
            def __init__(self):
                super().__init__()
                self.embedding = tnn.Embedding(N_E, E_DIM)
                self.weight = tnn.Parameter(torch.randn(N_E) * 0.02)

            def forward(self, z):
                z = z.permute(0, 2, 3, 1).contiguous()
                flat = z.view(-1, E_DIM)
                cb = self.embedding.weight
                d = (flat ** 2).sum(1, keepdim=True) + (cb ** 2).sum(1) \
                    - 2 * flat @ cb.t()
                d = d * torch.exp(ALPHA * self.weight)
                idx = torch.argmin(d, dim=1)
                zq = cb[idx].view(z.shape)
                return zq.permute(0, 3, 1, 2)

        self.quantize_group = tnn.ModuleList([Quant()])

        class Comb(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Conv2d(E_DIM, CQ[64], 3, padding=1)

            def forward(self, x):
                return self.conv(x)

        self.after_quant_group = tnn.ModuleList([Comb()])

        class DecBlock(tnn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.block = tnn.Sequential(
                    tnn.Upsample(scale_factor=2),
                    tnn.Conv2d(cin, cout, 3, padding=1),
                    TResBlock(cout), TResBlock(cout))

            def forward(self, x):
                return self.block(x)

        self.decoder_group = tnn.ModuleList(
            [DecBlock(CQ[64], CQ[128]), DecBlock(CQ[128], CQ[256])])
        self.out_conv = tnn.Conv2d(CQ[256], 3, 3, padding=1)
        self.residual_conv = tnn.Conv2d(CQ[256], 3, 3, padding=1)

        class ResidDec(tnn.Module):
            def __init__(self):
                super().__init__()
                self.upsampler = tnn.ModuleList([
                    tnn.Sequential(tnn.Upsample(scale_factor=2),
                                   tnn.Conv2d(CQ[64], CQ[128], 3, padding=1),
                                   TResBlock(CQ[128]), TResBlock(CQ[128])),
                    tnn.Sequential(tnn.Upsample(scale_factor=2),
                                   tnn.Conv2d(CQ[128], CQ[256], 3, padding=1),
                                   TResBlock(CQ[256]), TResBlock(CQ[256]))])
                self.warp = tnn.ModuleList(
                    [TWarp(CQ[128]), TWarp(CQ[256])])

            def forward(self, x, code_out):
                for idx, m in enumerate(self.upsampler):
                    x = m(x)
                    x_vq = self.warp[idx](code_out[idx], x)
                    x = x + x_vq * (x.mean() / x_vq.mean())
                return x

        self.multiscale_decoder = ResidDec()

    def forward(self, x):
        enc = self.multiscale_encoder(x)
        feat_to_quant = self.before_quant_group[0](enc)
        zq = self.quantize_group[0](feat_to_quant)
        y = self.after_quant_group[0](zq)
        code_out = []
        for m in self.decoder_group:
            y = m(y)
            code_out.append(y)
        resid = self.multiscale_decoder(enc, code_out)
        return self.residual_conv(resid)


class TestRIDCPFullParity:
    def test_converted_model_matches_torch(self, rng):
        torch.manual_seed(0)
        tm = TRIDCP().eval()
        state = {k: v.numpy() for k, v in tm.state_dict().items()}

        fm = RIDCP(n_embed=N_E, embed_dim=E_DIM, max_depth=MAX_DEPTH,
                   swin_blocks=SWIN_BLOCKS, swin_depth=SWIN_DEPTH,
                   swin_heads=SWIN_HEADS, weight_alpha=ALPHA,
                   channels=CQ)
        x = rng.random((1, 64, 64, 3), dtype=np.float32)
        template = jax.eval_shape(
            lambda: fm.init(jax.random.PRNGKey(0), jnp.asarray(x)))
        params = convert_with_drops(
            state, ridcp_rules(MAX_DEPTH, SWIN_BLOCKS), template)

        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   atol=1e-4)
