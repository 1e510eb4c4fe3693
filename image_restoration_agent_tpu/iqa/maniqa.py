"""MANIQA no-reference quality metric (Flax port).

The reference scores NR quality with pyiqa's ``maniqa``
(AgenticIR/utils/scorer.py:10-16), which vendors the official MANIQA
(IIGROUP/MANIQA, CVPRW'22): ViT-B/8 trunk whose blocks 6..9 token features
are concatenated, then

    (B, 4*768, 28, 28)
    -> 2x TABlock (transposed channel self-attention over N=784 tokens)
    -> 1x1 conv 3072->768 -> Swin stage (depth 2, heads 4, window 4)
    -> 2x TABlock -> 1x1 conv 768->384 -> Swin stage
    -> per-patch score (ReLU head) x weight (Sigmoid head),
    quality = sum(score*weight)/sum(weight).

Inference protocol follows pyiqa: input normalized with mean/std 0.5, scored
as the average over ``n_crops`` random 224x224 crops.

Port notes (to be arbitrated by the real-checkpoint validate-weights gate;
no network access in this environment):
- the Swin stage applies a scaled stage residual ``scale*stage(x) + x``
  (official swin.py, scale=0.8/0.13 per released config),
- Swin blocks here are standard shifted-window attention with relative
  position bias and GELU MLP (hidden ``dim_mlp``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.window_attention import (relative_position_index,
                                    shift_attention_mask, window_partition,
                                    window_reverse)
from .vit import ViT


class TABlock(nn.Module):
    """Transposed attention: tokens attend over the CHANNEL axis.

    Input (B, C, N); q/k/v are Dense over N; attn is (B, C, C);
    residual add (official MANIQA models/maniqa.py TABlock).
    """

    dim: int  # N (token count)

    @nn.compact
    def __call__(self, x):  # (B, C, N)
        q = nn.Dense(self.dim, name="c_q")(x)
        k = nn.Dense(self.dim, name="c_k")(x)
        v = nn.Dense(self.dim, name="c_v")(x)
        attn = jnp.einsum("bcn,bdn->bcd", q, k) * self.dim ** -0.5
        attn = nn.softmax(attn, axis=-1)
        return jnp.einsum("bcd,bdn->bcn", attn, v) + x


class ManiqaSwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    dim_mlp: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.window_size
        n = ws * ws
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        yw = window_partition(y, ws).reshape(-1, n, c)
        qkv = nn.Dense(3 * c, name="qkv")(yw)
        hd = c // self.num_heads
        q, k, v = jnp.split(
            qkv.reshape(-1, n, 3, self.num_heads, hd)
            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * hd ** -0.5
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        rpb = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + rpb[None]
        mask_np = shift_attention_mask(h, w, ws, self.shift)
        if mask_np is not None:
            nw = mask_np.shape[0]
            mask = jnp.asarray(mask_np)
            attn = attn.reshape(-1, nw, self.num_heads, n, n) \
                + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)
        attn = nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(-1, n, c)
        o = nn.Dense(c, name="proj")(o)
        y = window_reverse(o.reshape(-1, ws, ws, c), ws, h, w)
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(self.dim_mlp, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, name="fc2")(y)
        return x + y


class ManiqaSwinTransformer(nn.Module):
    """MANIQA's light Swin: ``len(depths)`` BasicLayers at constant dim
    (no patch merging), each a stack of shifted-window blocks, with a
    scaled residual ``scale * layer(x) + x`` around every layer
    (official MANIQA models/swin.py, scale=0.8)."""

    dim: int
    depths: tuple
    num_heads: tuple
    window_size: int
    dim_mlp: int
    scale: float = 0.8

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        for li, (depth, heads) in enumerate(zip(self.depths,
                                                self.num_heads)):
            res = x
            for i in range(depth):
                x = ManiqaSwinBlock(
                    self.dim, heads, self.window_size,
                    shift=0 if i % 2 == 0 else self.window_size // 2,
                    dim_mlp=self.dim_mlp,
                    name=f"layer{li}_block{i}")(x)
            x = self.scale * x + res
        return x


class MANIQA(nn.Module):
    embed_dim: int = 768
    patch_size: int = 8
    img_size: int = 224
    depths: tuple = (2, 2)
    num_heads: tuple = (4, 4)
    window_size: int = 4
    dim_mlp: int = 768
    num_tab: int = 2
    scale: float = 0.8
    vit_depth: int = 12
    vit_heads: int = 12
    feature_blocks: tuple = (6, 7, 8, 9)

    @nn.compact
    def __call__(self, x):  # (B, 224, 224, 3), normalized
        res = self.img_size // self.patch_size
        n = res * res
        outs = ViT(self.patch_size, self.embed_dim, self.vit_depth,
                   self.vit_heads, img_size=self.img_size, name="vit")(x)
        feats = jnp.concatenate([outs[i][:, 1:] for i in self.feature_blocks],
                                axis=2)  # (B, N, 4*embed)
        b = feats.shape[0]
        x = feats.transpose(0, 2, 1)  # (B, C, N)
        for i in range(self.num_tab):
            x = TABlock(n, name=f"tablock1_{i}")(x)
        x = x.transpose(0, 2, 1).reshape(b, res, res, -1)
        x = nn.Conv(self.embed_dim, (1, 1), name="conv1")(x)
        x = ManiqaSwinTransformer(self.embed_dim, self.depths,
                                  self.num_heads, self.window_size,
                                  self.dim_mlp, self.scale,
                                  name="swin1")(x)
        x = x.reshape(b, n, -1).transpose(0, 2, 1)
        for i in range(self.num_tab):
            x = TABlock(n, name=f"tablock2_{i}")(x)
        x = x.transpose(0, 2, 1).reshape(b, res, res, -1)
        x = nn.Conv(self.embed_dim // 2, (1, 1), name="conv2")(x)
        x = ManiqaSwinTransformer(self.embed_dim // 2, self.depths,
                                  self.num_heads, self.window_size,
                                  self.dim_mlp, self.scale,
                                  name="swin2")(x)
        x = x.reshape(b, n, -1)  # (B, N, C/2) token-major

        s = nn.Dense(self.embed_dim // 2, name="fc_score0")(x)
        s = nn.relu(s)
        s = nn.Dense(1, name="fc_score1")(s)
        s = nn.relu(s)
        w = nn.Dense(self.embed_dim // 2, name="fc_weight0")(x)
        w = nn.relu(w)
        w = nn.Dense(1, name="fc_weight1")(w)
        w = nn.sigmoid(w)
        return (jnp.sum(s * w, axis=1) / jnp.sum(w, axis=1))[:, 0]


class ManiqaScorer:
    """pyiqa-style inference: normalize (0.5, 0.5), average over
    ``n_crops`` random 224-crops (deterministic seed)."""

    def __init__(self, params, model: MANIQA | None = None,
                 n_crops: int = 20, seed: int = 0):
        self.model = model or MANIQA()
        self.params = params
        self.n_crops = n_crops
        self.seed = seed
        self._apply = jax.jit(self.model.apply)

    def __call__(self, img: np.ndarray) -> float:
        size = self.model.img_size
        x = np.asarray(img, np.float32)
        h, w = x.shape[:2]
        if h < size or w < size:
            sc = size / min(h, w)
            nh, nw = max(size, round(h * sc)), max(size, round(w * sc))
            x = np.asarray(jax.image.resize(
                jnp.asarray(x), (nh, nw, 3), method="bicubic"))
            h, w = nh, nw
        rng = np.random.default_rng(self.seed)
        crops = []
        for _ in range(self.n_crops):
            top = int(rng.integers(0, h - size + 1))
            left = int(rng.integers(0, w - size + 1))
            crops.append(x[top:top + size, left:left + size])
        batch = (np.stack(crops) - 0.5) / 0.5
        scores = self._apply(self.params, jnp.asarray(batch))
        return float(jnp.mean(scores))
