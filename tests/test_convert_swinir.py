"""Full numerical conversion parity for SwinIR against an in-test torch
implementation of the published architecture (window attention + RPB +
shifted windows + RSTB + pixelshuffle SR head)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_with_drops, swinir_rules)
from image_restoration_agent_tpu.models import build_model  # noqa: E402

pytestmark = pytest.mark.slow

WS = 8
DIM = 16
HEADS = 2
DEPTHS = (2, 2)


def _rpi(ws):
    coords = torch.stack(torch.meshgrid(
        [torch.arange(ws), torch.arange(ws)], indexing="ij")).flatten(1)
    rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
    rel = rel + ws - 1
    return (rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1])


class TWinAttn(tnn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = tnn.Linear(DIM, 3 * DIM)
        self.proj = tnn.Linear(DIM, DIM)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * WS - 1) ** 2, HEADS) * 0.02)
        self.register_buffer("relative_position_index", _rpi(WS))

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        hd = c // HEADS
        qkv = self.qkv(x).reshape(b_, n, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, HEADS)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, HEADS, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, HEADS, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(out)


def _win_part(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _win_rev(xw, ws, h, w):
    b = xw.shape[0] // (h * w // ws // ws)
    x = xw.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _mask(h, w, ws, shift):
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = _win_part(img, ws).squeeze(-1)
    diff = mw.unsqueeze(1) - mw.unsqueeze(2)
    return diff.masked_fill(diff != 0, -100.0).masked_fill(diff == 0, 0.0)


class TBlock(tnn.Module):
    def __init__(self, shift):
        super().__init__()
        self.shift = shift
        self.norm1 = tnn.LayerNorm(DIM)
        self.attn = TWinAttn()
        self.norm2 = tnn.LayerNorm(DIM)
        self.mlp = tnn.Sequential(
            tnn.Linear(DIM, 2 * DIM), tnn.GELU(), tnn.Linear(2 * DIM, DIM))
        # name mlp layers like the reference for conversion
        self.mlp_fc1 = self.mlp[0]
        self.mlp_fc2 = self.mlp[2]

    def forward(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        shift = 0 if min(h, w) <= WS else self.shift
        y = self.norm1(x)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        m = _mask(h, w, WS, shift) if shift else None
        yw = self.attn(_win_part(y, WS), m)
        y = _win_rev(yw, WS, h, w)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = x + y
        return x + self.mlp(self.norm2(x))


class TSwinIR(tnn.Module):
    """Tiny classical-SR SwinIR matching swinir_tiny's config."""

    def __init__(self):
        super().__init__()
        self.mean = torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1)
        self.conv_first = tnn.Conv2d(3, DIM, 3, padding=1)
        self.patch_norm = tnn.LayerNorm(DIM)
        self.layers = tnn.ModuleList()
        self.convs = tnn.ModuleList()
        for d in DEPTHS:
            self.layers.append(tnn.ModuleList(
                [TBlock(0 if i % 2 == 0 else WS // 2) for i in range(d)]))
            self.convs.append(tnn.Conv2d(DIM, DIM, 3, padding=1))
        self.norm = tnn.LayerNorm(DIM)
        self.conv_after_body = tnn.Conv2d(DIM, DIM, 3, padding=1)
        self.conv_before_upsample = tnn.Conv2d(DIM, 16, 3, padding=1)
        self.up0 = tnn.Conv2d(16, 64, 3, padding=1)
        self.up1 = tnn.Conv2d(16, 64, 3, padding=1)
        self.conv_last = tnn.Conv2d(16, 3, 3, padding=1)

    def forward(self, x):  # NCHW
        x = x - self.mean
        feat = self.conv_first(x)
        y = feat.permute(0, 2, 3, 1)
        y = self.patch_norm(y)
        for blocks, conv in zip(self.layers, self.convs):
            res = y
            for blk in blocks:
                y = blk(y)
            y = conv(y.permute(0, 3, 1, 2)).permute(0, 2, 3, 1) + res
        y = self.norm(y)
        y = self.conv_after_body(y.permute(0, 3, 1, 2)) + feat
        y = tF.leaky_relu(self.conv_before_upsample(y), 0.01)
        y = tF.pixel_shuffle(self.up0(y), 2)
        y = tF.pixel_shuffle(self.up1(y), 2)
        y = self.conv_last(y)
        return y + self.mean


def _state_with_reference_names(tm: TSwinIR) -> dict:
    out = {}
    sd = tm.state_dict()
    for k, v in sd.items():
        if k.startswith("mean"):
            continue
        k2 = k
        k2 = k2.replace("patch_norm.", "patch_embed.norm.")
        # layers.N.M.* -> layers.N.residual_group.blocks.M.*
        import re
        m = re.match(r"layers\.(\d)\.(\d)\.(.*)", k2)
        if m:
            rest = m.group(3)
            rest = rest.replace("mlp.0.", "mlp.fc1.").replace(
                "mlp.2.", "mlp.fc2.")
            if rest.startswith("mlp_fc"):
                continue  # alias duplicates
            k2 = f"layers.{m.group(1)}.residual_group.blocks." \
                 f"{m.group(2)}.{rest}"
        k2 = re.sub(r"convs\.(\d)\.", r"layers.\1.conv.", k2)
        k2 = k2.replace("up0.", "upsample.0.").replace("up1.", "upsample.2.")
        k2 = k2.replace("conv_before_upsample.",
                        "conv_before_upsample.0.")
        out[k2] = v.detach().numpy()
    return out


class TestSwinIRFullParity:
    def test_converted_model_matches_torch(self, rng):
        torch.manual_seed(0)
        tm = TSwinIR().eval()
        state = _state_with_reference_names(tm)

        fm = build_model("swinir_tiny", attention_impl="xla")
        template = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        params = convert_with_drops(state, swinir_rules(), template)

        x = rng.random((1, 16, 16, 3), dtype=np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   atol=5e-5)

    def test_pallas_interpret_matches_too(self, rng):
        """The converted weights must also agree through the Pallas kernel
        (interpret mode on CPU)."""
        import functools
        from image_restoration_agent_tpu.ops import pallas_attention as pa
        from image_restoration_agent_tpu.models import swinir as sw

        torch.manual_seed(1)
        tm = TSwinIR().eval()
        state = _state_with_reference_names(tm)
        fm_x = build_model("swinir_tiny", attention_impl="xla")
        template = fm_x.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 16, 3)))
        params = convert_with_drops(state, swinir_rules(), template)
        x = rng.random((1, 16, 16, 3), dtype=np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

        orig = pa.wmsa_pallas
        try:
            sw.wmsa_pallas = functools.partial(orig, interpret=True)
            fm_p = build_model("swinir_tiny", attention_impl="pallas")
            got = np.asarray(fm_p.apply(params, jnp.asarray(x)))
        finally:
            sw.wmsa_pallas = orig
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   atol=5e-5)


class TestRealSRHeads:
    def test_nearest_conv_head_rules_cover_template(self):
        """swinir_rules maps the Real-SR (nearest+conv) and lightweight
        (pixelshuffledirect) heads onto the model templates."""
        import re as _re

        import jax
        import jax.numpy as jnp

        from image_restoration_agent_tpu.convert.torch_import import (
            swinir_rules)
        from image_restoration_agent_tpu.models.swinir import SwinIR

        # nearest+conv x4 (Real-SR / GAN checkpoints)
        m = SwinIR(embed_dim=16, depths=(1,), num_heads=(2,), window_size=4,
                   upscale=4, upsampler="nearest+conv", num_feat=16)
        tpl = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))))
        flat = {"/".join(str(k.key) for k in p): None
                for p, _ in jax.tree_util.tree_flatten_with_path(tpl)[0]}
        rules = swinir_rules()
        dsts = set()
        for pat, tpl_path, _tr in rules:
            if tpl_path:
                dsts.add(tpl_path.split("/")[0].replace("\\1", "0"))
        for head in ("conv_up0", "conv_up1", "conv_hr",
                     "conv_before_upsample", "conv_last"):
            assert any(head in p for p in flat), (head, sorted(flat)[:5])
            assert any(head in d for d in dsts), head

        # lightweight: upsample.0 must route to upsample_direct
        rules_lw = swinir_rules(upsampler="pixelshuffledirect")
        first = next(tpl_path for pat, tpl_path, _ in rules_lw
                     if _re.fullmatch(pat, "upsample.0.weight"))
        assert "upsample_direct" in first
        first_cl = next(tpl_path for pat, tpl_path, _ in swinir_rules()
                        if _re.fullmatch(pat, "upsample.0.weight"))
        assert "upsample0" in first_cl
