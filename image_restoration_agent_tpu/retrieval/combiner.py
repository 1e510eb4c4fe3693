"""Combiner: image/text feature fusion for experience retrieval.

Rebuild of the reference CLIP4CIR combiner
(AgenticIR/pipeline/insert_emb_to_postgresql.py:103-162 /
retrival_database/CLIP4CIR/src/combiner.py): image and text features project
to a shared space, concatenate through a hidden MLP, and a learned dynamic
scalar mixes a convex combination of the raw features with the combined
output; the result is L2-normalized. Reference dims for CLIP RN50x4:
feature 640, projection 2560, hidden 5120.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Combiner(nn.Module):
    feature_dim: int = 640
    projection_dim: int = 2560
    hidden_dim: int = 5120

    @nn.compact
    def __call__(self, image_features: jnp.ndarray,
                 text_features: jnp.ndarray, deterministic: bool = True):
        # concat order is (text, image) — combiner.py:60
        txt_p = nn.relu(nn.Dense(self.projection_dim,
                                 name="text_projection")(text_features))
        img_p = nn.relu(nn.Dense(self.projection_dim,
                                 name="image_projection")(image_features))
        both = jnp.concatenate([txt_p, img_p], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_dim, name="combiner_layer")(both))
        combined = nn.Dense(self.feature_dim, name="output_layer")(h)

        # dynamic scalar is a hidden-layer MLP (combiner.py:28-29)
        ds = nn.relu(nn.Dense(self.hidden_dim, name="ds_hidden")(both))
        scalar = nn.sigmoid(nn.Dense(1, name="ds_out")(ds))
        out = (combined + scalar * text_features
               + (1 - scalar) * image_features)
        norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out / jnp.maximum(norm, 1e-12)
