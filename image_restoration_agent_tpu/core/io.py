"""Host-side image decode/encode.

Decode/encode stay on the host (PNG/JPEG entropy coding is not a TPU
workload); everything after ``decode_image`` — normalize, pad, tile, forward,
blend, crop — runs inside one XLA program. The reference instead does
cv2.imdecode + /255 + BGR->RGB + HWC->CHW per request on the host
(SwinIR model_serving.py:228-235); here the normalize lives in the jitted
pipeline so the uint8->float conversion happens on-chip after a small H2D
transfer of uint8 bytes (4x less PCIe/DMA traffic than transferring float32).
"""

from __future__ import annotations

import io as _io
from pathlib import Path

import numpy as np

try:  # PIL is present in the image; cv2 also works.
    from PIL import Image

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def decode_image(data: bytes) -> np.ndarray:
    """Decode encoded image bytes to an RGB uint8 (H, W, 3) array.

    PNGs go through the native zlib codec (native/png_codec.cpp) when it is
    built; everything else (and any native failure) falls back to PIL."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from . import io_native

        out = io_native.decode_png(data)
        if out is not None:
            if out.shape[-1] == 1:
                out = np.repeat(out, 3, axis=-1)
            elif out.shape[-1] == 4:
                out = out[..., :3]
            elif out.shape[-1] == 2:  # gray+alpha
                out = np.repeat(out[..., :1], 3, axis=-1)
            return out
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL unavailable")
    img = Image.open(_io.BytesIO(data))
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """Encode an RGB uint8 array as PNG bytes (native codec when built)."""
    from . import io_native

    out = io_native.encode_png(img)
    if out is not None:
        return out
    buf = _io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def load_image(path: str | Path) -> np.ndarray:
    """Load an image file as RGB uint8 (H, W, 3)."""
    with open(path, "rb") as f:
        return decode_image(f.read())


def save_image(img: np.ndarray | "jax.Array", path: str | Path) -> None:  # noqa: F821
    """Save an image (uint8, or float in [0,1]) as PNG."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(str(path))


def to_float(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [0,1]."""
    return img.astype(np.float32) / 255.0


def to_uint8(img: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8, with the reference's clamp + round
    (SwinIR model_serving.py:170-173)."""
    arr = np.asarray(img)
    return np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
