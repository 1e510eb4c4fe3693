"""MUSIQ no-reference quality metric (Flax port).

The reference's sixth scorer metric is pyiqa's ``musiq`` (KonIQ checkpoint;
AgenticIR/utils/scorer.py:10-16), the Multi-Scale Image Quality Transformer
(google-research/musiq): the image is scored at native resolution plus
aspect-ratio-preserving resizes with longer side 384 and 224; each scale is
cut into 32x32 patches which are linearly encoded to a 384-d token; tokens
get a hash-based 2D spatial embedding (10x10 grid per scale) and a
per-scale embedding; a CLS token leads a 14-layer/6-head pre-norm
transformer (mlp 1152, LN eps 1e-6); quality = Linear(LN(CLS)).

TPU notes: all patch grids are computed at trace time from static shapes —
one compile per input shape, no dynamic sequence lengths (the TF original
pads + masks because it batches mixed shapes; we score one image at a
time, so exact static lengths are simpler and faster).

Port caveats (arbitrated by the validate-weights real-checkpoint gate):
- the released MUSIQ uses a small conv root for patch encoding; this port
  ships the linear ViT-style encoder first (``patch_encoder='linear'``)
  with the module boundary in place to add the conv root when real
  checkpoint shapes are inspectable,
- inputs are fed in [0, 1] RGB.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .vit import ViTBlock

PATCH = 32
HSE_GRID = 10


def _scale_sizes(h: int, w: int, longer_sides=(224, 384)) -> list:
    """(h, w) per scale: native first, then ARP resizes (TF musiq order:
    native, then each longer_side)."""
    sizes = [(h, w)]
    for ls in longer_sides:
        r = ls / max(h, w)
        sizes.append((max(1, round(h * r)), max(1, round(w * r))))
    return sizes


def _grid(hp: int, wp: int):
    """Patch-center hash indices for an (hp x wp) patch grid."""
    rows = np.floor(np.arange(hp) / hp * HSE_GRID).astype(np.int32)
    cols = np.floor(np.arange(wp) / wp * HSE_GRID).astype(np.int32)
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    return (rr * HSE_GRID + cc).reshape(-1)


class MUSIQ(nn.Module):
    hidden: int = 384
    num_layers: int = 14
    num_heads: int = 6
    mlp_dim: int = 1152
    num_scales: int = 3  # native + longer-side 384 + 224
    patch_encoder: str = "linear"

    @nn.compact
    def __call__(self, scales, hash_idx, scale_idx):
        """scales: list of (1, Np_s, patch*patch*3) flattened patch sets;
        hash_idx: concatenated (sum Np,) int32 spatial hash indices;
        scale_idx: (sum Np,) int32 scale of each patch."""
        d = self.hidden
        proj = nn.Dense(d, name="patch_proj")
        tokens = jnp.concatenate([proj(s) for s in scales], axis=1)

        hse = self.param("hse_embedding", nn.initializers.normal(0.02),
                         (HSE_GRID * HSE_GRID, d))
        sce = self.param("scale_embedding", nn.initializers.normal(0.02),
                         (self.num_scales, d))
        tokens = tokens + hse[hash_idx][None] + sce[scale_idx][None]

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        x = jnp.concatenate([cls, tokens], axis=1)
        for i in range(self.num_layers):
            x = ViTBlock(d, self.num_heads,
                         mlp_ratio=self.mlp_dim / d, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.Dense(1, name="head")(x[:, 0])[:, 0]


def extract_patches(img: jnp.ndarray, h: int, w: int):
    """Resize to (h, w), pad to PATCH multiples, return flattened 32x32
    patches (1, Np, 32*32*3) + their hash indices (static)."""
    x = jax.image.resize(img, (h, w, 3), method="bilinear") \
        if img.shape[:2] != (h, w) else img
    hp, wp = -(-h // PATCH), -(-w // PATCH)
    x = jnp.pad(x, ((0, hp * PATCH - h), (0, wp * PATCH - w), (0, 0)))
    x = x.reshape(hp, PATCH, wp, PATCH, 3).transpose(0, 2, 1, 3, 4)
    return x.reshape(1, hp * wp, PATCH * PATCH * 3), _grid(hp, wp)


class MusiqScorer:
    """Scores a [0,1] RGB image with the 3-scale MUSIQ protocol."""

    def __init__(self, params, model: MUSIQ | None = None,
                 longer_sides=(224, 384)):
        self.model = model or MUSIQ()
        self.params = params
        self.longer_sides = tuple(longer_sides)
        self._apply = jax.jit(self.model.apply)

    def __call__(self, img: np.ndarray) -> float:
        x = jnp.asarray(np.asarray(img, np.float32))
        h, w = x.shape[:2]
        sizes = _scale_sizes(h, w, self.longer_sides)
        scales, hashes, sids = [], [], []
        for si, (sh, sw) in enumerate(sizes):
            patches, hidx = extract_patches(x, sh, sw)
            scales.append(patches)
            hashes.append(hidx)
            sids.append(np.full(hidx.shape, si, np.int32))
        hash_idx = jnp.asarray(np.concatenate(hashes))
        scale_idx = jnp.asarray(np.concatenate(sids))
        return float(self._apply(self.params, scales, hash_idx,
                                 scale_idx)[0])
