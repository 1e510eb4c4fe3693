"""CLIP RN50x4 (image + text towers) in Flax/NHWC.

TPU rebuild of the retrieval trunk the reference loads via ``clip.load``
(AgentApp/utils/util.py:119-180, CLIP4CIR ``clip_fine_tune.py:24``):
a ModifiedResNet visual tower (anti-aliased strided convs via avgpool,
attention pooling head) and a causal text transformer with QuickGELU,
both projecting into the shared 640-d space the Combiner fuses.

Inference-only: BatchNorms are frozen (mean/var are parameters converted
from the torch running stats). Weights convert from the published torch
checkpoint via ``convert/torch_import.clip_rules``.

RN50x4 shape card: vision layers (4, 6, 10, 6), vision width 80 (stage
widths 80/160/320/640, final 2560), input 288x288, attnpool heads 40;
text width 640, 12 layers, 10 heads, vocab 49408, context 77; shared
embed dim 640.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# CLIP preprocessing constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class FrozenBN(nn.Module):
    """Inference BatchNorm with running stats held as parameters (so the
    whole tower converts into a single params collection)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = scale / jnp.sqrt(var + 1e-5)
        return x * inv + (bias - mean * inv)


class Bottleneck(nn.Module):
    """ModifiedResNet block: all convs stride 1; spatial reduction is an
    avgpool before conv3 and in the downsample branch (anti-aliasing)."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        cout = self.planes * 4
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBN(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, name="conv2")(out)
        out = nn.relu(FrozenBN(name="bn2")(out))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride,) * 2, (self.stride,) * 2)
        out = nn.Conv(cout, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBN(name="bn3")(out)

        identity = x
        if self.stride > 1 or cin != cout:
            identity = nn.avg_pool(x, (self.stride,) * 2,
                                   (self.stride,) * 2) \
                if self.stride > 1 else x
            identity = nn.Conv(cout, (1, 1), use_bias=False,
                               name="down_conv")(identity)
            identity = FrozenBN(name="down_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Mean-token query attention pooling (CLIP model.py AttentionPool2d).

    ``use_pos_embed=False`` skips the positional embedding so the pool
    accepts any spatial grid — the CLIP-IQA preprocessing (pyiqa clipiqa
    runs CLIP at native image resolution with the embedding discarded)."""
    num_heads: int
    output_dim: int
    use_pos_embed: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        if self.use_pos_embed:
            pos = self.param("positional_embedding",
                             nn.initializers.normal(0.02), (h * w + 1, c))
            tokens = tokens + pos[None]

        q = nn.Dense(c, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, name="k_proj")(tokens)
        v = nn.Dense(c, name="v_proj")(tokens)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        attn = nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return nn.Dense(self.output_dim, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    layers: Sequence[int] = (4, 6, 10, 6)
    width: int = 80
    output_dim: int = 640
    heads: int = 40
    attnpool_pos: bool = True

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3), CLIP-normalized
        w = self.width
        # 3-conv stem, stride 2 on the first conv, then avgpool(2)
        x = nn.Conv(w // 2, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv1")(x)
        x = nn.relu(FrozenBN(name="bn1")(x))
        x = nn.Conv(w // 2, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(x)
        x = nn.relu(FrozenBN(name="bn2")(x))
        x = nn.Conv(w, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv3")(x)
        x = nn.relu(FrozenBN(name="bn3")(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for li, n_blocks in enumerate(self.layers):
            planes = w * (2 ** li)
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                x = Bottleneck(planes, stride,
                               name=f"layer{li + 1}_{bi}")(x)
        return AttentionPool2d(self.heads, self.output_dim,
                               use_pos_embed=self.attnpool_pos,
                               name="attnpool")(x)


class ResidualAttentionBlock(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, causal: bool = True):
        b, t, c = x.shape
        y = nn.LayerNorm(name="ln_1")(x)
        qkv = nn.Dense(3 * c, name="in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads

        def heads_of(z):
            return z.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads_of(q), heads_of(k), heads_of(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        if causal:
            mask = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
            logits = logits + mask[None, None]
        attn = nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, c)
        x = x + nn.Dense(c, name="out_proj")(o)

        y = nn.LayerNorm(name="ln_2")(x)
        y = nn.Dense(4 * c, name="c_fc")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(c, name="c_proj")(y)
        return x


class TextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 640
    layers: int = 12
    heads: int = 10
    embed_dim: int = 640

    @nn.compact
    def __call__(self, text_ids):  # (B, T) int32
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = tok[text_ids] + pos[None, : text_ids.shape[1]]
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.heads, name=f"block{i}")(x)
        x = nn.LayerNorm(name="ln_final")(x)
        # features at the EOT token (highest id in CLIP's vocab)
        eot = jnp.argmax(text_ids, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.embed_dim))
        return x @ proj


class CLIPModel(nn.Module):
    """Both towers; apply with ``method=CLIPModel.encode_image`` /
    ``encode_text`` (or call for both)."""
    embed_dim: int = 640
    vision_layers: Sequence[int] = (4, 6, 10, 6)
    vision_width: int = 80
    image_resolution: int = 288
    text_width: int = 640
    text_layers: int = 12
    text_heads: int = 10
    vocab_size: int = 49408
    context_length: int = 77
    attnpool_pos: bool = True

    def setup(self):
        self.visual = ModifiedResNet(
            tuple(self.vision_layers), self.vision_width, self.embed_dim,
            heads=self.vision_width * 32 // 64,
            attnpool_pos=self.attnpool_pos)
        self.text = TextTransformer(
            self.vocab_size, self.context_length, self.text_width,
            self.text_layers, self.text_heads, self.embed_dim)

    def encode_image(self, image):
        return self.visual(image)

    def encode_text(self, text_ids):
        return self.text(text_ids)

    def __call__(self, image, text_ids):
        return self.encode_image(image), self.encode_text(text_ids)


def preprocess(img: np.ndarray, n_px: int = 288,
               target_ratio: float | None = None) -> np.ndarray:
    """[0,1] HWC float -> CLIP-normalized (n_px, n_px, 3).

    ``target_ratio=None``: CLIP's default resize-shorter-side + center
    crop. With a ratio (reference 'targetpad', CLIP4CIR data_utils): pad
    symmetrically with zeros to cap the aspect ratio, then resize square.
    """
    h, w = img.shape[:2]
    x = jnp.asarray(img, jnp.float32)
    if target_ratio is not None:
        actual = max(w, h) / min(w, h)
        if actual >= target_ratio:
            scaled = max(w, h) / target_ratio
            hp = max(int((scaled - w) / 2), 0)
            vp = max(int((scaled - h) / 2), 0)
            x = jnp.pad(x, ((vp, vp), (hp, hp), (0, 0)))
        x = jax.image.resize(x, (n_px, n_px, 3), method="bicubic")
    else:
        scale = n_px / min(h, w)
        nh, nw = round(h * scale), round(w * scale)
        x = jax.image.resize(x, (nh, nw, 3), method="bicubic")
        top, left = (nh - n_px) // 2, (nw - n_px) // 2
        x = x[top:top + n_px, left:left + n_px]
    x = jnp.clip(x, 0.0, 1.0)
    return np.asarray((x - CLIP_MEAN) / CLIP_STD)
