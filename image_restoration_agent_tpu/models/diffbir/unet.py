"""SD2.1-class UNet + ControlNet in Flax/NHWC (DiffBIR's denoiser pair).

Rebuild of DiffBIR/model/cldm.py (ControlledUnetModel / ControlNet over the
LDM openaimodel UNet): model_channels 320, channel_mult (1,2,4,4), 2 res
blocks per level, spatial transformers (depth 1, context 1024, head dim 64,
linear in/out projections) at downsample factors 1/2/4, timestep sinusoidal
embedding -> 2-layer MLP, and for ControlNet a hint pathway plus zero-conv
taps after every encoder stage whose outputs add into the locked UNet's
skip connections (cldm.yaml).

TPU notes: spatial attention flattens (H, W) and runs dense MHA — at latent
resolution 64 the sequences are <= 4096 tokens, MXU-friendly; bf16 with f32
softmax. Above DENSE_SCORE_LIMIT score entries (whole-image serving at
>=1024px canvases) self-attention switches to the chunked-q path so the
score matrix never materializes.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.chunked_attention import DENSE_SCORE_LIMIT, chunked_attention
from ..common import Conv


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """OpenAI-convention sinusoidal embedding: (B,) -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, emb):
        c = x.shape[-1]
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="in_norm")(x)
        y = nn.silu(y)
        y = Conv(self.out_ch, kernel=3, name="in_conv")(y)
        e = nn.Dense(self.out_ch, name="emb_proj")(nn.silu(emb))
        y = y + e[:, None, None, :]
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(y)
        y = nn.silu(y)
        y = Conv(self.out_ch, kernel=3, name="out_conv")(y)
        if c != self.out_ch:
            x = Conv(self.out_ch, kernel=1, name="skip")(x)
        return x + y


class CrossAttention(nn.Module):
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context=None):
        # x: (B, N, C); context: (B, M, Cc) or None for self-attention
        inner = self.heads * self.head_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.head_dim).transpose(
                0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        n, m = qh.shape[-2], kh.shape[-2]
        if self.heads * n * m > DENSE_SCORE_LIMIT:
            # whole-image self-attention at big canvases: the reference's
            # untiled --sr_scale 4 flow needs memory-efficient attention
            # (it uses xformers; here chunked-q, same FLOPs, O(chunk*M))
            out = chunked_attention(qh, kh, vh, self.head_dim ** -0.5)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm",
                              qh * self.head_dim ** -0.5, kh,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh.astype(attn.dtype),
                             preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1],
                                                inner).astype(x.dtype)
        return nn.Dense(x.shape[-1], name="to_out")(out)


class TransformerBlock(nn.Module):
    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.heads, self.head_dim, name="attn1")(
            nn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.heads, self.head_dim, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context)
        y = nn.LayerNorm(name="norm3")(x)
        gate = nn.Dense(x.shape[-1] * 8, name="ff_in")(y)
        a, b = jnp.split(gate, 2, axis=-1)
        y = a * nn.gelu(b)  # GEGLU
        return x + nn.Dense(x.shape[-1], name="ff_out")(y)


class SpatialTransformer(nn.Module):
    heads: int
    head_dim: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        y = nn.Dense(c, name="proj_in")(y.reshape(b, h * w, c))
        for i in range(self.depth):
            y = TransformerBlock(self.heads, self.head_dim,
                                 name=f"block{i}")(y, context)
        y = nn.Dense(c, name="proj_out")(y)
        return x + y.reshape(b, h, w, c)


class ZeroConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (1, 1),
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="conv")(x)


class _UNetCore(nn.Module):
    """Shared encoder/middle topology for UNet and ControlNet."""

    model_channels: int = 320
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_ds: Sequence[int] = (1, 2, 4)
    num_head_channels: int = 64
    in_channels: int = 4

    def encoder_stages(self, x, emb, context, tap=None):
        """Runs input blocks; returns (h, skips). ``tap(h)`` is called after
        every input block (ControlNet zero-convs / UNet skip caching)."""
        ch = self.model_channels
        skips = []
        h = Conv(ch, kernel=3, name="in_conv")(x)
        skips.append(h if tap is None else tap(h, 0))
        idx = 1
        ds = 1
        for li, mult in enumerate(self.channel_mult):
            for bi in range(self.num_res_blocks):
                h = ResBlock(self.model_channels * mult,
                             name=f"down{li}_res{bi}")(h, emb)
                if ds in self.attention_ds:
                    c = h.shape[-1]
                    h = SpatialTransformer(
                        c // self.num_head_channels, self.num_head_channels,
                        name=f"down{li}_attn{bi}")(h, context)
                skips.append(h if tap is None else tap(h, idx))
                idx += 1
            if li < len(self.channel_mult) - 1:
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)],
                            name=f"down{li}_downsample")(h)
                skips.append(h if tap is None else tap(h, idx))
                idx += 1
                ds *= 2
        return h, skips

    def middle(self, h, emb, context):
        c = h.shape[-1]
        h = ResBlock(c, name="mid_res1")(h, emb)
        h = SpatialTransformer(c // self.num_head_channels,
                               self.num_head_channels,
                               name="mid_attn")(h, context)
        return ResBlock(c, name="mid_res2")(h, emb)


class UNetModel(_UNetCore):
    out_channels: int = 4

    @nn.compact
    def __call__(self, x, t, context, control: Optional[list] = None,
                 only_mid_control: bool = False):
        temb = timestep_embedding(t, self.model_channels)
        emb = nn.Dense(self.model_channels * 4, name="time_fc1")(temb)
        emb = nn.Dense(self.model_channels * 4,
                       name="time_fc2")(nn.silu(emb))

        h, skips = self.encoder_stages(x, emb, context)
        h = self.middle(h, emb, context)
        if control is not None:
            h = h + control.pop()

        ds = 2 ** (len(self.channel_mult) - 1)
        for li, mult in reversed(list(enumerate(self.channel_mult))):
            for bi in range(self.num_res_blocks + 1):
                skip = skips.pop()
                if control is not None and not only_mid_control:
                    skip = skip + control.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(self.model_channels * mult,
                             name=f"up{li}_res{bi}")(h, emb)
                if ds in self.attention_ds:
                    c = h.shape[-1]
                    h = SpatialTransformer(
                        c // self.num_head_channels, self.num_head_channels,
                        name=f"up{li}_attn{bi}")(h, context)
            if li > 0:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c),
                                     method="nearest")
                h = Conv(c, kernel=3, name=f"up{li}_upsample")(h)
                ds //= 2

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.zeros,
                       name="out_conv")(h)


class ControlNet(_UNetCore):
    """DiffBIR v1's ControlNet concatenates the latent hint with x at the
    INPUT (cldm.py:272 ``x = torch.cat((x, hint), dim=1)``; the first conv
    takes in_channels + hint_channels) — there is no hint-conv stack.
    Zero-convs tap every input block plus the middle block."""
    hint_channels: int = 4

    @nn.compact
    def __call__(self, x, hint, t, context):
        temb = timestep_embedding(t, self.model_channels)
        emb = nn.Dense(self.model_channels * 4, name="time_fc1")(temb)
        emb = nn.Dense(self.model_channels * 4,
                       name="time_fc2")(nn.silu(emb))

        taps: list = []

        def tap(h, idx):
            taps.append(ZeroConv(h.shape[-1], name=f"zero{idx}")(h))
            return h

        h, _ = self.encoder_stages(
            jnp.concatenate([x, hint], axis=-1), emb, context, tap=tap)
        h = self.middle(h, emb, context)
        taps.append(ZeroConv(h.shape[-1], name="zero_mid")(h))
        return taps
