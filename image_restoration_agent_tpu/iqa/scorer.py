"""Scorer: six-metric harness (TPU rebuild of AgenticIR/utils/scorer.py).

Reference behavior: FR metrics PSNR/SSIM/LPIPS against an HQ image, with x4
MATLAB-bicubic upsampling of whichever side is smaller so SR outputs align
(scorer.py:56-62); NR metrics MANIQA/CLIP-IQA/MUSIQ on the image alone.
Each learned metric runs its Flax port (iqa/lpips.py, iqa/maniqa.py,
iqa/clipiqa.py, iqa/musiq.py) when its converted checkpoint is available
(weights/lpips_alex, weights/maniqa, weights/musiq) or when an instance is
passed in; otherwise that metric reports None.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.io import load_image, to_float
from ..core.resize import resize_matlab
from .metrics import psnr, ssim

FR_METRICS = ("psnr", "ssim")
NR_METRICS = ("maniqa", "clipiqa", "musiq")

_WEIGHTS = Path(__file__).resolve().parents[1] / "weights"
_DEFAULT_LPIPS_DIR = _WEIGHTS / "lpips_alex"


def _restore(path: Path):
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path.resolve())


class Scorer:
    def __init__(self, metrics: tuple[str, ...] = FR_METRICS,
                 lpips_params=None, lpips_dir: Optional[Path] = None,
                 clipiqa=None, maniqa=None, musiq=None):
        self.metrics = metrics
        self._lpips_params = lpips_params
        self._lpips_dir = Path(lpips_dir) if lpips_dir else _DEFAULT_LPIPS_DIR
        self._lpips_fn = None
        self._clipiqa = clipiqa  # iqa.clipiqa.ClipIQA, needs CLIP weights
        self._maniqa = maniqa    # iqa.maniqa.ManiqaScorer
        self._musiq = musiq      # iqa.musiq.MusiqScorer
        self._nr_loaded = False

    def _load_default_nr(self) -> None:
        """Lazily build MANIQA/MUSIQ scorers from converted checkpoints in
        the weights dir (convert-weights CLI output)."""
        if self._nr_loaded:
            return
        self._nr_loaded = True
        if self._maniqa is None and (_WEIGHTS / "maniqa").exists():
            try:
                from .maniqa import ManiqaScorer
                self._maniqa = ManiqaScorer(_restore(_WEIGHTS / "maniqa"))
            except Exception:
                pass
        if self._musiq is None and (_WEIGHTS / "musiq").exists():
            try:
                from .musiq import MusiqScorer
                self._musiq = MusiqScorer(_restore(_WEIGHTS / "musiq"))
            except Exception:
                pass

    def _lpips(self, img: np.ndarray, ref: np.ndarray) -> Optional[float]:
        if self._lpips_params is None:
            if not self._lpips_dir.exists():
                return None
            import orbax.checkpoint as ocp
            with ocp.StandardCheckpointer() as ckptr:
                self._lpips_params = ckptr.restore(self._lpips_dir.resolve())
        if self._lpips_fn is None:
            from .lpips import LPIPS
            model = LPIPS()
            self._lpips_fn = jax.jit(
                lambda p, a, b: model.apply(p, a, b))
        val = self._lpips_fn(self._lpips_params,
                             jnp.asarray(img)[None], jnp.asarray(ref)[None])
        return float(val[0])

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
            elif m == "lpips":
                out[m] = self._lpips(img, ref)
            elif m == "clipiqa" and self._clipiqa is not None:
                out[m] = float(self._clipiqa(img))
            elif m in ("maniqa", "musiq"):
                self._load_default_nr()
                fn = self._maniqa if m == "maniqa" else self._musiq
                out[m] = float(fn(img)) if fn is not None else None
            else:
                out[m] = None
        return out
