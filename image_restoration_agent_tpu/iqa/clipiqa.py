"""CLIP-IQA: no-reference quality from a CLIP prompt pair.

Rebuild of the pyiqa ``clipiqa`` metric the reference scores with
(AgenticIR/utils/scorer.py:10-16): the image's CLIP embedding is compared
against the antonym prompt pair ("Good photo.", "Bad photo."); the score is
the softmax weight of the positive prompt at the CLIP logit scale (100).

Runs on the Flax CLIP port (retrieval/clip.py) with converted weights —
CLIP-IQA's published default is CLIP ResNet-50 (layers (3,4,6,3), width 64,
embed 1024, text width 512/8 heads), which ``CLIPModel`` expresses via its
config fields; the RN50x4 retrieval tower works too when only one converted
checkpoint is resident.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PROMPTS = ("Good photo.", "Bad photo.")

RN50_CONFIG = dict(embed_dim=1024, vision_layers=(3, 4, 6, 3),
                   vision_width=64, image_resolution=224,
                   text_width=512, text_layers=12, text_heads=8)


class ClipIQA:
    def __init__(self, clip_params, tokenizer=None, clip_model=None,
                 text_features: Optional[np.ndarray] = None,
                 n_px: int = 224, native_resolution: bool = True):
        """Either pass a tokenizer (prompt features are computed once) or
        precomputed ``text_features`` of shape (2, embed_dim).

        ``native_resolution=True`` matches pyiqa's clipiqa (the reference
        scorer metric): the image is CLIP-normalized but NOT resized, and
        the attnpool positional embedding is discarded so the pool accepts
        any grid. False restores resize/center-crop-to-``n_px`` scoring
        (one compile for all shapes, embedding kept)."""
        from ..retrieval.clip import CLIPModel

        self.native = native_resolution and clip_model is None
        if clip_model is not None:
            self.clip = clip_model
            self.native = native_resolution and \
                not getattr(clip_model, "attnpool_pos", True)
        else:
            self.clip = CLIPModel(**RN50_CONFIG,
                                  attnpool_pos=not self.native)
        self.params = clip_params
        self.n_px = n_px
        if text_features is None:
            ids = tokenizer.tokenize(list(PROMPTS),
                                     context_length=self.clip.context_length)
            text_features = self.clip.apply(
                clip_params, jnp.asarray(ids),
                method=CLIPModel.encode_text)
        tf = jnp.asarray(text_features)
        self._tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

        def score_fn(params, img):
            feat = self.clip.apply(params, img,
                                   method=CLIPModel.encode_image)
            feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
            logits = 100.0 * feat @ self._tf.T  # (B, 2)
            probs = jax.nn.softmax(logits, axis=-1)
            return probs[:, 0]

        self._score = jax.jit(score_fn)

    def __call__(self, img: np.ndarray) -> float:
        """img: (H, W, 3) float [0,1] -> quality in [0, 1]."""
        from ..retrieval.clip import CLIP_MEAN, CLIP_STD, preprocess

        if self.native:
            x = (np.clip(np.asarray(img, np.float32), 0.0, 1.0)
                 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
        else:
            x = preprocess(img, n_px=self.n_px)
        return float(self._score(self.params, jnp.asarray(x)[None])[0])
