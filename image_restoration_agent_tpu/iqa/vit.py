"""Vision Transformer backbone exposing per-block token features.

MANIQA's trunk is timm's ``vit_base_patch8_224`` with forward hooks saving
every block's output (reference consumes it via pyiqa's vendored MANIQA,
``AgenticIR/utils/scorer.py:10-16``); the quality head concatenates blocks
6..9. This Flax ViT mirrors the timm graph (pre-norm blocks, learned
position embedding incl. CLS, GELU MLP, LayerNorm eps 1e-6) and returns the
full list of block outputs so heads can pick any subset.

TPU notes: the token count (28x28+1 for B/8 at 224) is static; attention is
plain batched einsum — at 785 tokens x 12 heads XLA tiles it onto the MXU
fine, so no Pallas here (IQA scoring is not a serving hot path).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ViTMlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        b, n, c = x.shape
        hd = c // self.num_heads
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads, hd)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]  # (B, H, N, hd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * hd ** -0.5
        attn = nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(c, name="proj")(o)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        x = x + ViTMlp(int(c * self.mlp_ratio), c, name="mlp")(y)
        return x


class ViT(nn.Module):
    """timm-style ViT; ``__call__`` returns a list of every block's tokens
    (CLS first), post-block, pre-final-norm — the hook contract MANIQA's
    ``SaveOutput`` uses."""

    patch_size: int = 8
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    img_size: int = 224

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:  # x: (B, H, W, 3)
        b = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(x)
        x = x.reshape(b, -1, self.embed_dim)
        n = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)),
                             x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, n + 1, self.embed_dim))
        x = x + pos
        outs = []
        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         name=f"block{i}")(x)
            outs.append(x)
        return outs
