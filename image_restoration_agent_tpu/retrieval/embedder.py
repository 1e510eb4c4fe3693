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
    identity = "trained_standin"  # recorded in vector-store metadata

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


class CLIPRetrievalEmbedder:
    """Reference-exact retrieval embedding: CLIP RN50x4 image feature +
    text feature of the fixed caption, fused by the trained Combiner and
    L2-normalized (AgentApp/utils/util.py:119-180).

    Requires converted checkpoints (clip_rules / combiner_rules) and the
    CLIP BPE merges file; ``from_dirs`` loads orbax directories.
    """

    CAPTION = "similar degradation"
    identity = "clip4cir_rn50x4"  # recorded in vector-store metadata

    def __init__(self, clip_params, combiner_params, tokenizer,
                 caption: Optional[str] = None, n_px: int = 288,
                 target_ratio: Optional[float] = 1.25,
                 feature_dim: int = 640, clip_model=None,
                 combiner_model=None):
        from .clip import CLIPModel, preprocess

        self.clip = clip_model or CLIPModel(embed_dim=feature_dim)
        self.combiner = combiner_model or Combiner(feature_dim)
        self.clip_params = clip_params
        self.combiner_params = combiner_params
        self.n_px = n_px
        self.target_ratio = target_ratio
        self._preprocess = preprocess

        ids = tokenizer.tokenize(caption or self.CAPTION,
                                 context_length=self.clip.context_length)
        self._text_feat = self.clip.apply(
            clip_params, jnp.asarray(ids), method=CLIPModel.encode_text)

        def fused(p_clip, p_comb, img, txt):
            img_feat = self.clip.apply(p_clip, img,
                                       method=CLIPModel.encode_image)
            out = self.combiner.apply(p_comb, img_feat, txt)
            norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
            return out / jnp.maximum(norm, 1e-12)

        self._fused = jax.jit(fused)

    @classmethod
    def from_dirs(cls, clip_dir: str | Path, combiner_dir: str | Path,
                  bpe_path: str | Path, **kw) -> "CLIPRetrievalEmbedder":
        import orbax.checkpoint as ocp

        from .tokenizer import SimpleTokenizer

        with ocp.StandardCheckpointer() as ckptr:
            clip_params = ckptr.restore(Path(clip_dir).resolve())
            combiner_params = ckptr.restore(Path(combiner_dir).resolve())
        return cls(clip_params, combiner_params,
                   SimpleTokenizer(bpe_path), **kw)

    def embed_array(self, img: np.ndarray) -> np.ndarray:
        x = self._preprocess(img, n_px=self.n_px,
                             target_ratio=self.target_ratio)
        out = self._fused(self.clip_params, self.combiner_params,
                          jnp.asarray(x)[None], self._text_feat)
        return np.asarray(out)[0]

    def embed_path(self, img_path: str | Path) -> np.ndarray:
        return self.embed_array(to_float(load_image(img_path)))


def default_embedder(weight_root: Optional[Path] = None):
    """Reference-exact CLIP embedder when its converted assets exist
    (weights/clip_rn50x4 + weights/combiner orbax dirs and the CLIP BPE
    merges file), else the trained stand-in. Keeps CLI/agent callers
    checkpoint-agnostic."""
    root = Path(weight_root) if weight_root else \
        Path(__file__).resolve().parents[1] / "weights"
    clip_dir = root / "clip_rn50x4"
    comb_dir = root / "combiner"
    bpe = root / "bpe_simple_vocab_16e6.txt.gz"
    if clip_dir.exists() and comb_dir.exists() and bpe.exists():
        try:
            return CLIPRetrievalEmbedder.from_dirs(clip_dir, comb_dir, bpe)
        except Exception:
            pass
    return RetrievalEmbedder()
