"""Retrieval embedder: image + fixed caption -> fused 640-d embedding.

The reference fuses a CLIP RN50x4 image feature with the text feature of the
fixed caption "similar degradation" through the trained Combiner
(AgentApp/utils/util.py:119-180). Porting CLIP RN50x4 weights is a later
milestone; this module keeps the exact interface and fusion path with a
degradation-aware Flax image tower (shares the IQA classifier trunk — what
matters for retrieval is degradation similarity, which is precisely what the
classifier embeds) and a learned caption embedding standing in for the text
tower. Once trained (train/retrieval.py pipeline), embeddings are drop-in
for either vector store backend.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.io import load_image, to_float
from ..iqa.classifier import prepare_input
from .combiner import Combiner


class ImageTower(nn.Module):
    """Conv trunk -> 640-d image feature (CLIP RN50x4 stand-in)."""

    feature_dim: int = 640
    width: int = 32

    @nn.compact
    def __call__(self, x):  # (B, 224, 224, 3)
        w = self.width
        for i, f in enumerate((w, w * 2, w * 4, w * 8)):
            x = nn.Conv(f, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, name=f"gn{i}")(x)
            x = nn.gelu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.feature_dim, name="proj")(x)


class RetrievalModel(nn.Module):
    feature_dim: int = 640

    @nn.compact
    def __call__(self, img):
        img_feat = ImageTower(self.feature_dim, name="image_tower")(img)
        # learned embedding of the fixed caption "similar degradation"
        txt_feat = self.param("caption_embedding",
                              nn.initializers.normal(0.02),
                              (self.feature_dim,))
        txt = jnp.broadcast_to(txt_feat, img_feat.shape)
        return Combiner(self.feature_dim, name="combiner")(img_feat, txt)


class RetrievalEmbedder:
    def __init__(self, params=None, seed: int = 0, feature_dim: int = 640):
        self.model = RetrievalModel(feature_dim)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(seed),
                                     jnp.zeros((1, 224, 224, 3)))
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def embed_array(self, img: np.ndarray) -> np.ndarray:
        x = jnp.asarray(prepare_input(img))[None]
        return np.asarray(self._apply(self.params, x))[0]

    def embed_path(self, img_path: str | Path) -> np.ndarray:
        return self.embed_array(to_float(load_image(img_path)))
