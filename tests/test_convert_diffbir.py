"""DiffBIR conversion parity against in-test torch implementations of the
SD2.1 stack, using the real checkpoint key names (model.diffusion_model /
control_model / first_stage_model / cond_encoder / cond_stage_model) so
diffbir_rules() and extract_empty_context() are pinned:

- SD UNet (ControlledUnetModel): timestep MLP, input/middle/output blocks,
  SpatialTransformer with LINEAR proj (SD2.1), GEGLU, skip concat,
  control-tap addition (cldm.py:25-48);
- ControlNet: hint CONCATENATED with x at the input (cldm.py:272), zero
  convs per input block + middle (cldm.py:148-283);
- taming AutoencoderKL encoder/decoder (asymmetric pad downsample,
  reversed `up` indexing) + the separately-finetuned cond_encoder
  (cldm.py:313-323);
- FrozenOpenCLIPEmbedder(layer='penultimate') empty-prompt context.
"""

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_with_drops, diffbir_rules, extract_empty_context)

pytestmark = pytest.mark.slow

MC = 32                 # model_channels
CM = (1, 2)             # channel_mult
NRB = 1                 # num_res_blocks
ATTN_LV = (0, 1)        # attention levels (ds 1, 2)
HC = 16                 # num_head_channels
CTX = 64                # context dim
ZC = 4                  # latent channels
VCH = 32                # vae ch


def t_timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(-np.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TResBlockSD(tnn.Module):
    def __init__(self, cin, cout, emb):
        super().__init__()
        self.in_layers = tnn.Sequential(
            tnn.GroupNorm(32, cin), tnn.SiLU(),
            tnn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(emb, cout))
        self.out_layers = tnn.Sequential(
            tnn.GroupNorm(32, cout), tnn.SiLU(), tnn.Identity(),
            tnn.Conv2d(cout, cout, 3, padding=1))
        self.skip_connection = tnn.Conv2d(cin, cout, 1) if cin != cout \
            else tnn.Identity()

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        h = self.out_layers(h)
        return self.skip_connection(x) + h


class TCrossAttn(tnn.Module):
    def __init__(self, dim, ctx, heads, hd):
        super().__init__()
        inner = heads * hd
        self.heads, self.hd = heads, hd
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx, inner, bias=False)
        self.to_v = tnn.Linear(ctx, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, dim))

    def forward(self, x, context=None):
        ctx = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(ctx), self.to_v(ctx)
        b, n, _ = q.shape

        def h(t):
            return t.reshape(b, -1, self.heads, self.hd).permute(0, 2, 1, 3)

        a = (h(q) @ h(k).transpose(-1, -2)) * self.hd ** -0.5
        a = a.softmax(-1)
        o = (a @ h(v)).permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out(o)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * tF.gelu(gate)


class TTransformerBlockSD(tnn.Module):
    def __init__(self, dim, ctx, heads, hd):
        super().__init__()
        self.attn1 = TCrossAttn(dim, dim, heads, hd)
        self.attn2 = TCrossAttn(dim, ctx, heads, hd)
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = tnn.Sequential(OrderedDict([
            ("net", tnn.Sequential(
                TGEGLU(dim, dim * 4), tnn.Identity(),
                tnn.Linear(dim * 4, dim)))]))

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff.net(self.norm3(x))


class TSpatialTransformer(tnn.Module):
    def __init__(self, dim, ctx, hd):
        super().__init__()
        self.norm = tnn.GroupNorm(32, dim, eps=1e-6)
        self.proj_in = tnn.Linear(dim, dim)
        self.transformer_blocks = tnn.ModuleList(
            [TTransformerBlockSD(dim, ctx, dim // hd, hd)])
        self.proj_out = tnn.Linear(dim, dim)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = self.proj_out(y)
        return x + y.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def _build_encoder(in_ch, emb):
    """input_blocks list mirroring openaimodel ordering; returns
    (ModuleList, has_attn flags per entry, channel list)."""
    blocks = tnn.ModuleList(
        [tnn.ModuleList([tnn.Conv2d(in_ch, MC, 3, padding=1)])])
    kinds = ["conv"]
    ch = MC
    for li, mult in enumerate(CM):
        for _ in range(NRB):
            entry = tnn.ModuleList([TResBlockSD(ch, MC * mult, emb)])
            ch = MC * mult
            if li in ATTN_LV:
                entry.append(TSpatialTransformer(ch, CTX, HC))
            blocks.append(entry)
            kinds.append("res")
        if li < len(CM) - 1:
            ds = tnn.Module()
            ds.op = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)
            blocks.append(tnn.ModuleList([ds]))
            kinds.append("down")
    return blocks, kinds, ch


class TUNet(tnn.Module):
    def __init__(self, in_ch=ZC):
        super().__init__()
        emb = MC * 4
        self.time_embed = tnn.Sequential(
            tnn.Linear(MC, emb), tnn.SiLU(), tnn.Linear(emb, emb))
        self.input_blocks, self.kinds, ch = _build_encoder(in_ch, emb)
        self.middle_block = tnn.ModuleList([
            TResBlockSD(ch, ch, emb), TSpatialTransformer(ch, CTX, HC),
            TResBlockSD(ch, ch, emb)])
        # output blocks
        chans = [MC]
        c = MC
        for li, mult in enumerate(CM):
            for _ in range(NRB):
                c = MC * mult
                chans.append(c)
            if li < len(CM) - 1:
                chans.append(c)
        self.output_blocks = tnn.ModuleList()
        self.out_kinds = []
        for li in reversed(range(len(CM))):
            for bi in range(NRB + 1):
                skip = chans.pop()
                entry = tnn.ModuleList(
                    [TResBlockSD(c + skip, MC * CM[li], emb)])
                c = MC * CM[li]
                kind = ["res"]
                if li in ATTN_LV:
                    entry.append(TSpatialTransformer(c, CTX, HC))
                    kind.append("attn")
                if li > 0 and bi == NRB:
                    up = tnn.Module()
                    up.conv = tnn.Conv2d(c, c, 3, padding=1)
                    entry.append(up)
                    kind.append("up")
                self.output_blocks.append(entry)
                self.out_kinds.append(kind)
        self.out = tnn.Sequential(
            tnn.GroupNorm(32, c), tnn.SiLU(), tnn.Conv2d(c, ZC, 3, padding=1))

    def encode(self, x, emb, ctx):
        hs = []
        h = x
        for blk, kind in zip(self.input_blocks, self.kinds):
            if kind == "conv":
                h = blk[0](h)
            elif kind == "res":
                h = blk[0](h, emb)
                if len(blk) > 1:
                    h = blk[1](h, ctx)
            else:
                h = blk[0].op(h)
            hs.append(h)
        return h, hs

    def forward(self, x, t, ctx, control=None):
        emb = self.time_embed(t_timestep_embedding(t, MC))
        h, hs = self.encode(x, emb, ctx)
        for m in self.middle_block:
            h = m(h, emb) if isinstance(m, TResBlockSD) else m(h, ctx)
        if control is not None:
            h = h + control.pop()
        for entry, kind in zip(self.output_blocks, self.out_kinds):
            skip = hs.pop()
            if control is not None:
                skip = skip + control.pop()
            h = torch.cat([h, skip], dim=1)
            i = 0
            h = entry[i](h, emb)
            i += 1
            if "attn" in kind:
                h = entry[i](h, ctx)
                i += 1
            if "up" in kind:
                h = tF.interpolate(h, scale_factor=2, mode="nearest")
                h = entry[i].conv(h)
        return self.out(h)


class TControlNet(tnn.Module):
    def __init__(self, hint_ch=ZC):
        super().__init__()
        emb = MC * 4
        self.time_embed = tnn.Sequential(
            tnn.Linear(MC, emb), tnn.SiLU(), tnn.Linear(emb, emb))
        self.input_blocks, self.kinds, ch = _build_encoder(ZC + hint_ch, emb)
        self.middle_block = tnn.ModuleList([
            TResBlockSD(ch, ch, emb), TSpatialTransformer(ch, CTX, HC),
            TResBlockSD(ch, ch, emb)])
        self.zero_convs = tnn.ModuleList()
        c = MC
        chans = [MC]
        for li, mult in enumerate(CM):
            for _ in range(NRB):
                c = MC * mult
                chans.append(c)
            if li < len(CM) - 1:
                chans.append(c)
        for cc in chans:
            self.zero_convs.append(tnn.Sequential(tnn.Conv2d(cc, cc, 1)))
        self.middle_block_out = tnn.Sequential(tnn.Conv2d(ch, ch, 1))

    def forward(self, x, hint, t, ctx):
        emb = self.time_embed(t_timestep_embedding(t, MC))
        h = torch.cat([x, hint], dim=1)
        outs = []
        for blk, kind, zc in zip(self.input_blocks, self.kinds,
                                 self.zero_convs):
            if kind == "conv":
                h = blk[0](h)
            elif kind == "res":
                h = blk[0](h, emb)
                if len(blk) > 1:
                    h = blk[1](h, ctx)
            else:
                h = blk[0].op(h)
            outs.append(zc(h))
        for m in self.middle_block:
            h = m(h, emb) if isinstance(m, TResBlockSD) else m(h, ctx)
        outs.append(self.middle_block_out(h))
        return outs


# ---------------- taming VAE ----------------

class TVAERes(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.use_skip = cin != cout
        if self.use_skip:
            self.nin_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(tF.silu(self.norm1(x)))
        h = self.conv2(tF.silu(self.norm2(h)))
        if self.use_skip:
            x = self.nin_shortcut(x)
        return x + h


class TVAEAttn(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnn.GroupNorm(32, c, eps=1e-6)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, hh, ww = x.shape
        y = self.norm(x)
        q = self.q(y).reshape(b, c, hh * ww).permute(0, 2, 1)
        k = self.k(y).reshape(b, c, hh * ww)
        v = self.v(y).reshape(b, c, hh * ww).permute(0, 2, 1)
        a = torch.softmax(q @ k * c ** -0.5, dim=-1)
        o = (a @ v).permute(0, 2, 1).reshape(b, c, hh, ww)
        return x + self.proj_out(o)


VCM = (1, 2)


class TVAEEncoder(tnn.Module):
    def __init__(self, double_z=True):
        super().__init__()
        self.conv_in = tnn.Conv2d(3, VCH, 3, padding=1)
        self.down = tnn.ModuleList()
        c = VCH
        for i, mult in enumerate(VCM):
            lvl = tnn.Module()
            lvl.block = tnn.ModuleList()
            for _ in range(2):
                lvl.block.append(TVAERes(c, VCH * mult))
                c = VCH * mult
            if i < len(VCM) - 1:
                dsm = tnn.Module()
                dsm.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)
                lvl.downsample = dsm
            self.down.append(lvl)
        self.mid = tnn.Module()
        self.mid.block_1 = TVAERes(c, c)
        self.mid.attn_1 = TVAEAttn(c)
        self.mid.block_2 = TVAERes(c, c)
        self.norm_out = tnn.GroupNorm(32, c, eps=1e-6)
        self.conv_out = tnn.Conv2d(c, 2 * ZC if double_z else ZC, 3,
                                   padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            for blk in lvl.block:
                h = blk(h)
            if i < len(VCM) - 1:
                h = tF.pad(h, (0, 1, 0, 1))
                h = lvl.downsample.conv(h)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(tF.silu(self.norm_out(h)))


class TVAEDecoder(tnn.Module):
    def __init__(self):
        super().__init__()
        c = VCH * VCM[-1]
        self.conv_in = tnn.Conv2d(ZC, c, 3, padding=1)
        self.mid = tnn.Module()
        self.mid.block_1 = TVAERes(c, c)
        self.mid.attn_1 = TVAEAttn(c)
        self.mid.block_2 = TVAERes(c, c)
        # taming builds `up` in reverse and insert(0): up[i] = level i
        ups = []
        for i in reversed(range(len(VCM))):
            lvl = tnn.Module()
            lvl.block = tnn.ModuleList()
            for _ in range(3):
                lvl.block.append(TVAERes(c, VCH * VCM[i]))
                c = VCH * VCM[i]
            if i > 0:
                upm = tnn.Module()
                upm.conv = tnn.Conv2d(c, c, 3, padding=1)
                lvl.upsample = upm
            ups.insert(0, lvl)
        self.up = tnn.ModuleList(ups)
        self.norm_out = tnn.GroupNorm(32, c, eps=1e-6)
        self.conv_out = tnn.Conv2d(c, 3, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for i in reversed(range(len(VCM))):
            for blk in self.up[i].block:
                h = blk(h)
            if i > 0:
                h = tF.interpolate(h, scale_factor=2, mode="nearest")
                h = self.up[i].upsample.conv(h)
        return self.conv_out(tF.silu(self.norm_out(h)))


def _rules():
    return diffbir_rules(channel_mult=CM, num_res_blocks=NRB,
                         attention_levels=ATTN_LV)


def _convert(prefix_state, flax_module, init_args):
    template = jax.eval_shape(
        lambda: flax_module.init(jax.random.PRNGKey(0), *init_args))
    return convert_with_drops(prefix_state, _rules(), template=template)


def _nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_unet_controlnet_parity():
    """Full controlled forward: eps = UNet(x, t, ctx, ControlNet taps)."""
    from image_restoration_agent_tpu.models.diffbir.unet import (
        ControlNet, UNetModel)

    torch.manual_seed(0)
    tu = TUNet().eval()
    tc = TControlNet().eval()
    state = {}
    for k, v in tu.state_dict().items():
        state[f"model.diffusion_model.{k}"] = v.numpy()
    for k, v in tc.state_dict().items():
        state[f"control_model.{k}"] = v.numpy()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 8, ZC)).astype(np.float32)
    hint = rng.standard_normal((1, 8, 8, ZC)).astype(np.float32)
    ctx = rng.standard_normal((1, 5, CTX)).astype(np.float32)
    t = np.array([321], np.int32)

    with torch.no_grad():
        control = tc(_nchw(x), _nchw(hint), torch.from_numpy(t),
                     torch.from_numpy(ctx))
        want = _nhwc(tu(_nchw(x), torch.from_numpy(t),
                        torch.from_numpy(ctx), control=list(control)))

    cfg = dict(model_channels=MC, channel_mult=CM, num_res_blocks=NRB,
               attention_ds=(1, 2), num_head_channels=HC)
    fu = UNetModel(**cfg)
    fc = ControlNet(**cfg)

    import flax
    tmpl_u = jax.eval_shape(lambda: fu.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(ctx)))
    tmpl_c = jax.eval_shape(lambda: fc.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(hint),
        jnp.asarray(t), jnp.asarray(ctx)))
    merged_tmpl = {"params": {
        "diffusion_model": tmpl_u["params"],
        "control_model": tmpl_c["params"]}}
    params = convert_with_drops(state, _rules(), template=merged_tmpl)

    taps = fc.apply({"params": params["params"]["control_model"]},
                    jnp.asarray(x), jnp.asarray(hint), jnp.asarray(t),
                    jnp.asarray(ctx))
    got = fu.apply({"params": params["params"]["diffusion_model"]},
                   jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
                   control=list(taps))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_vae_and_cond_encoder_parity():
    from image_restoration_agent_tpu.models.diffbir.vae import (
        AutoencoderKL, CondEncoder)

    torch.manual_seed(1)
    enc = TVAEEncoder().eval()
    dec = TVAEDecoder().eval()
    quant = tnn.Conv2d(2 * ZC, 2 * ZC, 1)
    post = tnn.Conv2d(ZC, ZC, 1)
    cenc = TVAEEncoder().eval()
    cquant = tnn.Conv2d(2 * ZC, 2 * ZC, 1)

    state = {}
    for k, v in enc.state_dict().items():
        state[f"first_stage_model.encoder.{k}"] = v.numpy()
    for k, v in dec.state_dict().items():
        state[f"first_stage_model.decoder.{k}"] = v.numpy()
    state["first_stage_model.quant_conv.weight"] = quant.weight.detach().numpy()
    state["first_stage_model.quant_conv.bias"] = quant.bias.detach().numpy()
    state["first_stage_model.post_quant_conv.weight"] = \
        post.weight.detach().numpy()
    state["first_stage_model.post_quant_conv.bias"] = \
        post.bias.detach().numpy()
    for k, v in cenc.state_dict().items():
        state[f"cond_encoder.encoder.{k}"] = v.numpy()
    state["cond_encoder.quant_conv.weight"] = cquant.weight.detach().numpy()
    state["cond_encoder.quant_conv.bias"] = cquant.bias.detach().numpy()

    fv = AutoencoderKL(ch=VCH, ch_mult=VCM, num_res_blocks=2)
    fce = CondEncoder(ch=VCH, ch_mult=VCM, num_res_blocks=2)
    x0 = jnp.zeros((1, 16, 16, 3))
    tmpl_v = jax.eval_shape(lambda: fv.init(jax.random.PRNGKey(0), x0))
    tmpl_c = jax.eval_shape(lambda: fce.init(jax.random.PRNGKey(0), x0))
    merged = {"params": {"first_stage_model": tmpl_v["params"],
                         "cond_encoder": tmpl_c["params"]}}
    params = convert_with_drops(state, _rules(), template=merged)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        moments = quant(enc(_nchw(x)))
        mean = moments[:, :ZC]
        want_z = mean.numpy().transpose(0, 2, 3, 1) * 0.18215
        want_dec = _nhwc(dec(post(mean)))
        want_hint = (cquant(cenc(_nchw(x)))[:, :ZC]
                     .numpy().transpose(0, 2, 3, 1)) * 0.18215

    pv = {"params": params["params"]["first_stage_model"]}
    got_z = fv.apply(pv, jnp.asarray(x), method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(got_z), want_z, atol=2e-4)
    got_dec = fv.apply(pv, got_z, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(got_dec), want_dec, atol=2e-3)
    got_hint = fce.apply({"params": params["params"]["cond_encoder"]},
                         jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_hint), want_hint, atol=2e-4)


def test_extract_empty_context():
    """extract_empty_context == torch penultimate-layer forward of a mini
    OpenCLIP text stack, on the [SOT, EOT, 0...] empty prompt."""
    width, heads, layers, vocab, ctx_len = 32, 2, 3, 50, 10

    class TTB(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attn = tnn.MultiheadAttention(width, heads)
            self.ln_1 = tnn.LayerNorm(width)
            self.ln_2 = tnn.LayerNorm(width)
            self.mlp = tnn.Sequential(OrderedDict([
                ("c_fc", tnn.Linear(width, 4 * width)),
                ("gelu", tnn.GELU()),
                ("c_proj", tnn.Linear(4 * width, width))]))

        def forward(self, x, mask):
            y = self.ln_1(x)
            y, _ = self.attn(y, y, y, need_weights=False, attn_mask=mask)
            x = x + y
            return x + self.mlp(self.ln_2(x))

    torch.manual_seed(3)
    blocks = tnn.ModuleList([TTB() for _ in range(layers)]).eval()
    tok = tnn.Embedding(vocab, width)
    pos = tnn.Parameter(torch.randn(ctx_len, width) * 0.01)
    ln_final = tnn.LayerNorm(width)

    state = {"cond_stage_model.model.token_embedding.weight":
             tok.weight.detach().numpy(),
             "cond_stage_model.model.positional_embedding":
             pos.detach().numpy(),
             "cond_stage_model.model.ln_final.weight":
             ln_final.weight.detach().numpy(),
             "cond_stage_model.model.ln_final.bias":
             ln_final.bias.detach().numpy()}
    for i, blk in enumerate(blocks):
        for k, v in blk.state_dict().items():
            state[f"cond_stage_model.model.transformer.resblocks.{i}.{k}"] \
                = v.numpy()

    sot, eot = vocab - 2, vocab - 1
    ids = torch.zeros(ctx_len, dtype=torch.long)
    ids[0], ids[1] = sot, eot
    x = (tok(ids) + pos)[:, None, :]  # (T, 1, W) seq-first
    mask = torch.full((ctx_len, ctx_len), float("-inf")).triu(1)
    with torch.no_grad():
        for blk in blocks[:-1]:  # penultimate
            x = blk(x, mask)
        want = ln_final(x[:, 0]).numpy()

    got = extract_empty_context(state, context_length=ctx_len,
                                sot=sot, eot=eot, penultimate=True,
                                heads=heads)
    np.testing.assert_allclose(got, want, atol=2e-5)
