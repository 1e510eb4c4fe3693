"""Threaded image-decode pool over the native codec.

The reference's serving path decodes uploads inline on the request thread
(cv2.imdecode per request, SwinIR model_serving.py:228-233). Here decode
work fans out over a thread pool: the native PNG codec (native/
png_codec.cpp) is a ctypes call, so the GIL is released for the whole
inflate+unfilter — threads genuinely overlap; non-PNG formats fall back to
PIL (which also drops the GIL in its C decoders).

Used by the API server for multipart uploads and by the offline harnesses
when scoring result directories.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable, Optional

import numpy as np

from .io import load_image, to_float


class DecodePool:
    def __init__(self, workers: int = 4):
        self._pool = ThreadPoolExecutor(max_workers=workers,
                                        thread_name_prefix="decode")

    @staticmethod
    def _decode_bytes(blob: bytes) -> np.ndarray:
        from . import io_native
        out = io_native.decode_png(blob)
        if out is None:
            import io as _io

            from PIL import Image
            out = np.asarray(Image.open(_io.BytesIO(blob)).convert("RGB"))
        return out

    def decode(self, blob: bytes) -> np.ndarray:
        """Synchronous decode of one blob (uint8 HWC)."""
        return self._decode_bytes(blob)

    def decode_many(self, blobs: Iterable[bytes],
                    as_float: bool = False) -> list[np.ndarray]:
        outs = list(self._pool.map(self._decode_bytes, blobs))
        return [to_float(o) for o in outs] if as_float else outs

    def load_many(self, paths: Iterable[str | Path],
                  as_float: bool = False) -> list[np.ndarray]:
        outs = list(self._pool.map(load_image, paths))
        return [to_float(o) for o in outs] if as_float else outs

    def submit(self, blob: bytes):
        """Async decode; returns a Future."""
        return self._pool.submit(self._decode_bytes, blob)


_default: Optional[DecodePool] = None


def default_pool() -> DecodePool:
    global _default
    if _default is None:
        _default = DecodePool()
    return _default
