"""Scorer: full-reference metric harness (TPU rebuild of AgenticIR/utils/scorer.py).

Reference behavior: FR metrics PSNR/SSIM/LPIPS against an HQ image, with x4
MATLAB-bicubic upsampling of whichever side is smaller so SR outputs align
(scorer.py:56-62). NR metrics (MANIQA/CLIP-IQA/MUSIQ) are pyiqa networks; the
interface reserves their names and reports None until their Flax ports land.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..core.io import load_image, to_float
from ..core.resize import resize_matlab
from .metrics import psnr, ssim

FR_METRICS = ("psnr", "ssim")
NR_METRICS = ("maniqa", "clipiqa", "musiq")  # reserved, not yet ported


class Scorer:
    def __init__(self, metrics: tuple[str, ...] = FR_METRICS):
        self.metrics = metrics

    @staticmethod
    def _align(img: np.ndarray, ref: np.ndarray):
        """x4 upsample the smaller side if shapes differ by exactly 4x
        (reference scorer.py:56-62)."""
        if img.shape == ref.shape:
            return img, ref
        if img.shape[0] * 4 == ref.shape[0]:
            img = np.asarray(resize_matlab(jnp.asarray(img), scale=4))
        elif ref.shape[0] * 4 == img.shape[0]:
            ref = np.asarray(resize_matlab(jnp.asarray(ref), scale=4))
        if img.shape != ref.shape:
            raise ValueError(f"unalignable shapes {img.shape} vs {ref.shape}")
        return img, ref

    def __call__(self, img_path: str | Path, ref_path: str | Path) -> dict:
        img = to_float(load_image(img_path))
        ref = to_float(load_image(ref_path))
        return self.score_arrays(img, ref)

    def score_arrays(self, img: np.ndarray, ref: np.ndarray) -> dict:
        img, ref = self._align(img, ref)
        out: dict[str, float | None] = {}
        for m in self.metrics:
            if m == "psnr":
                out[m] = float(psnr(jnp.asarray(img), jnp.asarray(ref)))
            elif m == "ssim":
                out[m] = float(ssim(jnp.asarray(img), jnp.asarray(ref)))
            else:
                out[m] = None
        return out
