"""Model registry: name -> (constructor, default config, metadata).

Replaces the reference's port-number registry
(AgentApp/model_service/model_services.yaml) with in-process constructors.
Each entry records the serving contract the engine needs: output scale,
pad multiple / mode, and default tile parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    build: Callable[..., Any]           # returns a flax Module
    subtasks: tuple[str, ...]           # which agent subtasks this serves
    scale: int = 1                      # output spatial scale
    pad_multiple: int = 8               # pad H/W to this before forward
    pad_mode: str = "ceil"              # "ceil" | "extra" (SwinIR windows)
    pad_kind: str = "reflect"           # border fill
    tile: int | None = None             # default tile size (None = whole image)
    tile_overlap: int = 32
    # whole-image-vs-tile switch: images whose longest side exceeds
    # max_size fall back to fallback_tile (reference: RIDCP serves whole
    # below max_size=1500, else test_tile(tile_size=240, tile_pad=16) —
    # model_services.yaml:53, dehaze_vq_weight_arch.py test_tile)
    max_size: int | None = None
    fallback_tile: int = 240
    # whole-image forwards pad the canvas to this multiple instead of
    # pad_multiple (cropped back after). Restormer sets 64 so every U-Net
    # level (/1../8) keeps dims divisible by 8 and stays on the fused
    # MDTA/GDFN Pallas kernels: 720p tiled-256 1.86 -> whole-image 2.70
    # MP/s measured (the tile grid pays ~42% overlap redundancy).
    whole_pad_multiple: int = 1
    # geometric self-ensemble: average the model over the 8 dihedral
    # flips/rotations (reference MAXIM serving model_serving.py:123-163)
    self_ensemble: bool = False
    # whole-canvas serving as full-width row bands (the untiled TPU path):
    # bounds the x4 head's HBM while paying ~1.5% overlap redundancy vs
    # tiled-256's 42%; SR models also emit packed-RGB outputs (the
    # channels-last transpose is the head's main cost — see
    # models/common.fused_pixelshuffle_head). Measured 1.0 -> 2.1 MP/s on
    # the 2K x4 SwinIR headline vs tiled-256.
    band_mode: bool = False
    config: dict = dataclasses.field(default_factory=dict)


MODEL_REGISTRY: dict[str, ModelSpec] = {}


def register_model(spec: ModelSpec) -> ModelSpec:
    if spec.name in MODEL_REGISTRY:
        raise ValueError(f"duplicate model name: {spec.name}")
    MODEL_REGISTRY[spec.name] = spec
    return spec


def build_model(name: str, **overrides):
    spec = MODEL_REGISTRY[name]
    cfg = {**spec.config, **overrides}
    return spec.build(**cfg)


def list_models() -> list[str]:
    return sorted(MODEL_REGISTRY)


def get_spec(name: str) -> ModelSpec:
    return MODEL_REGISTRY[name]
