"""DehazeFormer in Flax/NHWC (rebuild of DehazeFormer/models/dehazeformer.py).

Distinctive pieces, all reproduced exactly:

- RLN "revised layer norm": statistics over the WHOLE sample (C,H,W), with
  1x1 meta convs mapping std/mean to per-channel rescale/rebias applied
  AFTER the attention/MLP branch (dehazeformer.py RLN:10, TransformerBlock).
- Attention with a parallel depthwise-conv path: out = proj(conv(V) +
  window_attn(QKV)) (Attention:141); shifted windows are handled by reflect-
  padding shift pixels at the top-left instead of masking (check_size).
- Continuous relative position bias: log-spaced relative coords through a
  2->256->heads MLP (WindowAttention.meta).
- SKFusion skip merging and a K/B output head: out = K*x - B + x.

5-stage U-shape; t/s/b variants differ in depths and attn_ratio.
"""

from __future__ import annotations

import functools
from typing import Sequence  # noqa: F401

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.window_attention import window_partition, window_reverse
from .common import Conv, DWConv
from .registry import ModelSpec, register_model


@functools.lru_cache(maxsize=16)
def _log_relative_positions(ws: int) -> np.ndarray:
    """(N, N, 2) sign(d) * log(1+|d|) relative coordinates."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    return (np.sign(rel) * np.log1p(np.abs(rel))).astype(np.float32)


class RLN(nn.Module):
    """Revised LayerNorm: whole-sample statistics + meta rescale/rebias."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        std = jnp.sqrt(jnp.mean(jnp.square(xf - mean), axis=(1, 2, 3),
                                keepdims=True) + self.eps)
        normed = (xf - mean) / std
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        out = (normed * weight + bias).astype(x.dtype)
        rescale = Conv(c, kernel=1, name="meta1")(std.astype(x.dtype))
        rebias = Conv(c, kernel=1, name="meta2")(mean.astype(x.dtype))
        return out, rescale, rebias


class DFWindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, qkv):  # (nWB, N, 3C)
        ws, nh = self.window_size, self.num_heads
        nwb, n, _ = qkv.shape
        hd = self.dim // nh

        # continuous relative position bias: log coords -> 2-layer MLP
        rel = jnp.asarray(_log_relative_positions(ws))
        bias = nn.Dense(256, name="meta_fc1")(rel)
        bias = nn.relu(bias)
        bias = nn.Dense(nh, name="meta_fc2")(bias)  # (N, N, nH)
        bias_hnn = bias.transpose(2, 0, 1)

        if jax.default_backend() == "tpu":
            from ..ops.pallas_attention import wmsa_pallas

            g = next(gg for gg in (8, 4, 2, 1) if nwb % gg == 0)
            return wmsa_pallas(qkv, bias_hnn.astype(jnp.float32), None,
                               num_heads=nh, g=g)

        q, k, v = jnp.split(
            qkv.reshape(nwb, n, 3, nh, hd).transpose(2, 0, 3, 1, 4), 3, 0)
        q, k, v = q[0], k[0], v[0]
        attn = jnp.einsum("whnd,whmd->whnm", q * hd ** -0.5, k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias_hnn[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("whnm,whmd->whnd", attn, v.astype(attn.dtype),
                         preferred_element_type=jnp.float32)
        return out.transpose(0, 2, 1, 3).reshape(nwb, n, self.dim).astype(
            qkv.dtype)


class DFAttention(nn.Module):
    """Window attention + parallel (DW)conv path."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    use_attn: bool
    conv_type: str = "DWConv"

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size

        v = None
        if self.conv_type == "DWConv" or self.use_attn:
            v = Conv(c, kernel=1, name="V")(x)

        if self.use_attn:
            qk = Conv(c * 2, kernel=1, name="QK")(x)
            qkv = jnp.concatenate([qk, v], axis=-1)
            # pad to window multiple; shifted blocks reflect-pad shift px at
            # the top-left (reference check_size — replaces mask logic)
            ph = (ws - h % ws) % ws
            pw = (ws - w % ws) % ws
            if ss > 0:
                pads = ((0, 0), (ss, (ws - ss + ph) % ws),
                        (ss, (ws - ss + pw) % ws), (0, 0))
            else:
                pads = ((0, 0), (0, ph), (0, pw), (0, 0))
            shifted = jnp.pad(qkv, pads, mode="reflect")
            ht, wt = shifted.shape[1], shifted.shape[2]
            windows = window_partition(shifted, ws).reshape(-1, ws * ws,
                                                            3 * c)
            attn_w = DFWindowAttention(c, ws, self.num_heads,
                                       name="attn")(windows)
            out = window_reverse(attn_w.reshape(-1, ws, ws, c), ws, ht, wt)
            out = out[:, ss: ss + h, ss: ss + w, :]

            if self.conv_type == "Conv":
                cv = ConvBranch(c, name="conv")(v)
                out = Conv(c, kernel=1, name="proj")(cv + out)
            elif self.conv_type == "DWConv":
                cv = RConv(c, kernel=5, groups=c, name="conv")(v)
                out = Conv(c, kernel=1, name="proj")(cv + out)
            else:
                out = Conv(c, kernel=1, name="proj")(out)
            return out

        if self.conv_type == "Conv":
            return ConvBranch(c, name="conv")(x)
        # DWConv without attention
        cv = RConv(c, kernel=5, groups=c, name="conv")(v)
        return Conv(c, kernel=1, name="proj")(cv)


class RConv(nn.Module):
    """Conv with reflect padding (the reference uses padding_mode='reflect'
    for every spatial conv — dehazeformer.py:157-163,322,340). Submodule
    layout matches common.Conv (<name>/Conv_0/...) so conversion rules are
    identical."""

    features: int
    kernel: int = 3
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding="VALID",
                       feature_group_count=self.groups)(x)


class ConvBranch(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        y = RConv(self.dim, kernel=3, name="c1")(x)
        y = nn.relu(y)
        return RConv(self.dim, kernel=3, name="c2")(y)


class DFBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    window_size: int
    shift_size: int
    use_attn: bool
    conv_type: str = "DWConv"

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.use_attn:
            y, rescale, rebias = RLN(name="norm1")(x)
        else:
            y = x
        y = DFAttention(self.dim, self.num_heads, self.window_size,
                        self.shift_size, self.use_attn,
                        self.conv_type, name="attn")(y)
        if self.use_attn:
            y = y * rescale + rebias
        x = identity + y

        identity = x
        y = Conv(int(self.dim * self.mlp_ratio), kernel=1, name="mlp_fc1")(x)
        y = nn.relu(y)
        y = Conv(self.dim, kernel=1, name="mlp_fc2")(y)
        return identity + y


class SKFusion(nn.Module):
    dim: int
    height: int = 2
    reduction: int = 8

    @nn.compact
    def __call__(self, feats: list):
        d = max(self.dim // self.reduction, 4)
        stacked = jnp.stack(feats, axis=1)  # (B, height, H, W, C)
        s = jnp.sum(stacked, axis=1)
        pooled = jnp.mean(s, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        a = Conv(d, kernel=1, use_bias=False, name="mlp1")(pooled)
        a = nn.relu(a)
        a = Conv(self.dim * self.height, kernel=1, use_bias=False,
                 name="mlp2")(a)
        a = a.reshape(a.shape[0], 1, 1, self.height, self.dim)
        # softmax over the height (branch) axis — dehazeformer.py:373
        a = jax.nn.softmax(a, axis=-2).transpose(0, 3, 1, 2, 4)
        return jnp.sum(stacked * a, axis=1)


class DehazeFormer(nn.Module):
    in_chans: int = 3
    out_chans: int = 4
    window_size: int = 8
    embed_dims: Sequence[int] = (24, 48, 96, 48, 24)
    mlp_ratios: Sequence[float] = (2.0, 4.0, 4.0, 2.0, 2.0)
    depths: Sequence[int] = (8, 8, 8, 4, 4)
    num_heads: Sequence[int] = (2, 4, 6, 1, 1)
    attn_ratio: Sequence[float] = (0.25, 0.5, 0.75, 0.0, 0.0)

    def _layer(self, x, li: int):
        depth = self.depths[li]
        attn_depth = self.attn_ratio[li] * depth
        for i in range(depth):
            use_attn = i >= depth - attn_depth  # attn_loc == "last"
            x = DFBlock(
                self.embed_dims[li], self.num_heads[li],
                self.mlp_ratios[li], self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                use_attn=use_attn, name=f"layer{li}_blk{i}")(x)
        return x

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        pad = 4  # patch_size
        ph, pw = (-h) % pad, (-w) % pad
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        inp = x

        d = self.embed_dims
        y = RConv(d[0], kernel=3, name="patch_embed")(x)
        y = self._layer(y, 0)
        skip1 = y
        y = Conv(d[1], kernel=2, stride=2, name="patch_merge1")(y)
        y = self._layer(y, 1)
        skip2 = y
        y = Conv(d[2], kernel=2, stride=2, name="patch_merge2")(y)
        y = self._layer(y, 2)

        y = Conv(d[3] * 4, kernel=1, name="patch_split1")(y)
        y = pixel_shuffle(y, 2)
        y = SKFusion(d[3], name="fusion1")(
            [y, Conv(d[1], kernel=1, name="skip2")(skip2)]) + y
        y = self._layer(y, 3)

        y = Conv(d[4] * 4, kernel=1, name="patch_split2")(y)
        y = pixel_shuffle(y, 2)
        y = SKFusion(d[4], name="fusion2")(
            [y, Conv(d[0], kernel=1, name="skip1")(skip1)]) + y
        y = self._layer(y, 4)
        feat = RConv(self.out_chans, kernel=3, name="patch_unembed")(y)

        k, bias = feat[..., :1], feat[..., 1:]
        out = k * inp - bias + inp
        return out[:, :h, :w, :]


_VARIANTS = {
    "t": dict(depths=(4, 4, 4, 2, 2), attn_ratio=(0, 0.5, 1.0, 0, 0)),
    "s": dict(depths=(8, 8, 8, 4, 4), attn_ratio=(0.25, 0.5, 0.75, 0, 0)),
    "b": dict(depths=(16, 16, 16, 8, 8), attn_ratio=(0.25, 0.5, 0.75, 0, 0)),
}

for _v, _cfg in _VARIANTS.items():
    register_model(ModelSpec(
        name=f"dehazeformer_{_v}",
        build=lambda **kw: DehazeFormer(**kw),
        subtasks=("dehazing",),
        pad_multiple=4, pad_kind="reflect",
        tile=None,
        config=dict(_cfg),
    ))

register_model(ModelSpec(
    name="dehazeformer_tiny",  # CPU-testable
    build=lambda **kw: DehazeFormer(**kw),
    subtasks=("dehazing",),
    pad_multiple=4, pad_kind="reflect",
    tile=None,
    config=dict(embed_dims=(8, 16, 32, 16, 8), depths=(1, 1, 2, 1, 1),
                attn_ratio=(0, 0.5, 1.0, 0, 0), num_heads=(1, 2, 2, 1, 1)),
))
