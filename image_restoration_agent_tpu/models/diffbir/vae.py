"""AutoencoderKL (Stable-Diffusion VAE) in Flax/NHWC.

Rebuild of the taming/LDM autoencoder used by DiffBIR
(DiffBIR/ldm/models/autoencoder.py; config: ch=128, ch_mult=(1,2,4,4),
2 res blocks, mid attention, z=4, scale_factor 0.18215). GroupNorm(32) +
SiLU throughout; single-head full attention at the 1/8-res bottleneck.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.chunked_attention import DENSE_SCORE_LIMIT, chunked_attention
from ..common import Conv


def _gn(x, name_holder, name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)(x)


class VAEResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        y = nn.silu(y)
        y = Conv(self.out_ch, kernel=3, name="conv1")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(y)
        y = nn.silu(y)
        y = Conv(self.out_ch, kernel=3, name="conv2")(y)
        if c != self.out_ch:
            x = Conv(self.out_ch, kernel=1, name="nin_shortcut")(x)
        return x + y


class MidAttention(nn.Module):
    """Single-head full self-attention over the bottleneck spatial grid."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = Conv(c, kernel=1, name="q")(y).reshape(b, h * w, c)
        k = Conv(c, kernel=1, name="k")(y).reshape(b, h * w, c)
        v = Conv(c, kernel=1, name="v")(y).reshape(b, h * w, c)
        n = h * w
        if n * n > DENSE_SCORE_LIMIT:
            # whole-image canvases: at a 1024px image the 128x128 latent
            # makes the dense (N, N) score matrix 1 GB (16 GB at 2048px);
            # chunked-q keeps peak memory at (chunk, N)
            out = chunked_attention(q, k, v, c ** -0.5)
        else:
            attn = jnp.einsum("bnc,bmc->bnm", q, k,
                              preferred_element_type=jnp.float32) * c ** -0.5
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bnm,bmc->bnc", attn, v.astype(attn.dtype),
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, c).astype(x.dtype)
        return x + Conv(c, kernel=1, name="proj_out")(out)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True

    @nn.compact
    def __call__(self, x):
        y = Conv(self.ch, kernel=3, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                y = VAEResBlock(self.ch * mult, name=f"down{i}_block{j}")(y)
            if i < len(self.ch_mult) - 1:
                # taming downsample: pad bottom/right then stride-2 valid conv
                y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
                y = nn.Conv(y.shape[-1], (3, 3), strides=(2, 2),
                            padding="VALID", name=f"down{i}_downsample")(y)
        y = VAEResBlock(y.shape[-1], name="mid_block1")(y)
        y = MidAttention(name="mid_attn")(y)
        y = VAEResBlock(y.shape[-1], name="mid_block2")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(y)
        y = nn.silu(y)
        out_ch = self.z_channels * (2 if self.double_z else 1)
        return Conv(out_ch, kernel=3, name="conv_out")(y)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3

    @nn.compact
    def __call__(self, z):
        mult = self.ch_mult[-1]
        y = Conv(self.ch * mult, kernel=3, name="conv_in")(z)
        y = VAEResBlock(y.shape[-1], name="mid_block1")(y)
        y = MidAttention(name="mid_attn")(y)
        y = VAEResBlock(y.shape[-1], name="mid_block2")(y)
        for i, mult in reversed(list(enumerate(self.ch_mult))):
            for j in range(self.num_res_blocks + 1):
                y = VAEResBlock(self.ch * mult, name=f"up{i}_block{j}")(y)
            if i > 0:
                b, h, w, c = y.shape
                y = jax.image.resize(y, (b, 2 * h, 2 * w, c),
                                     method="nearest")
                y = Conv(c, kernel=3, name=f"up{i}_upsample")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(y)
        y = nn.silu(y)
        return Conv(self.out_ch, kernel=3, name="conv_out")(y)


class CondEncoder(nn.Module):
    """DiffBIR's condition encoder: a separately-finetuned COPY of the VAE
    encoder + quant_conv (cldm.py:313-323, keys ``cond_encoder.*``); the
    hint latent is the distribution MODE times the SD scale factor."""
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    scale_factor: float = 0.18215

    @nn.compact
    def __call__(self, x):
        h = Encoder(self.ch, self.ch_mult, self.num_res_blocks,
                    self.embed_dim, name="encoder")(x)
        h = Conv(2 * self.embed_dim, kernel=1, name="quant_conv")(h)
        mean, _ = jnp.split(h, 2, axis=-1)
        return mean * self.scale_factor


class AutoencoderKL(nn.Module):
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    scale_factor: float = 0.18215

    def setup(self):
        self.encoder = Encoder(self.ch, self.ch_mult, self.num_res_blocks,
                               self.embed_dim)
        self.decoder = Decoder(self.ch, self.ch_mult, self.num_res_blocks)
        self.quant_conv = Conv(2 * self.embed_dim, kernel=1)
        self.post_quant_conv = Conv(self.embed_dim, kernel=1)

    def encode_moments(self, x):
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar

    def encode(self, x):
        """Deterministic (mode) encode, scaled — the inference path."""
        mean, _ = self.encode_moments(x)
        return mean * self.scale_factor

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z / self.scale_factor))

    def __call__(self, x):
        return self.decode(self.encode(x))
