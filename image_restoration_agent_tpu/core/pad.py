"""Spatial padding to size multiples, replicating the reference serving semantics.

The reference pads inputs so H/W are multiples of a model-specific factor:

- SwinIR serving pads with a flip-concat (symmetric reflection) and *always*
  adds at least one extra window even when already aligned
  (AgentApp/model_service/denoising/SwinIR/model_serving.py:139-143) — mode
  ``"extra"`` here.
- Restormer/MPRNet serving pads to the next multiple of 8 with ordinary
  reflect padding (AgentApp/model_service/motion_deblurring/Restormer/
  model_serving.py:157-213) — mode ``"ceil"``.
- MAXIM pads symmetrically to multiples of 64.

All pad amounts are computed at trace time from static shapes, so the padded
program has static shapes and XLA can tile it onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _pad_amount(size: int, multiple: int, mode: str) -> int:
    if mode == "extra":
        # Reference SwinIR semantics: (size // m + 1) * m - size, i.e. pads a
        # full extra window when already aligned.
        return (size // multiple + 1) * multiple - size
    if mode == "ceil":
        return (-size) % multiple
    raise ValueError(f"unknown pad mode: {mode!r}")


def pad_to_multiple(
    x: jnp.ndarray,
    multiple: int,
    mode: str = "ceil",
    pad_mode: str = "symmetric",
) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Pad the H and W axes of an NHWC (or HWC) image to a size multiple.

    Args:
        x: ``(..., H, W, C)`` array.
        multiple: pad H and W up to a multiple of this.
        mode: ``"ceil"`` (pad 0 if aligned) or ``"extra"`` (reference SwinIR:
            always pad at least one full window).
        pad_mode: ``"symmetric"`` (flip-concat, edge pixel repeated — what the
            reference SwinIR flip-cat produces), ``"reflect"`` (edge pixel not
            repeated — reference Restormer), or ``"edge"`` / ``"constant"``.

    Returns:
        (padded array, (orig_H, orig_W)).
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = _pad_amount(h, multiple, mode)
    pw = _pad_amount(w, multiple, mode)
    if ph == 0 and pw == 0:
        return x, (h, w)
    if ph > h or pw > w:
        # symmetric/reflect padding cannot exceed the source extent; fall back
        # to edge replication for tiny inputs.
        pad_mode = "edge"
    widths = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, widths, mode=pad_mode), (h, w)


def unpad(x: jnp.ndarray, hw: tuple[int, int], scale: int = 1) -> jnp.ndarray:
    """Crop a padded (and possibly upscaled) result back to ``scale * hw``."""
    h, w = hw
    return x[..., : h * scale, : w * scale, :]
