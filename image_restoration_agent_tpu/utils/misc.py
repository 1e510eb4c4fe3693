"""Small helpers (reference AgenticIR/utils/misc.py)."""

from __future__ import annotations

import base64
from pathlib import Path


def sorted_glob(directory: Path, pattern: str = "*") -> list[Path]:
    return sorted(Path(directory).glob(pattern))


def encode_image_base64(path: Path) -> str:
    return base64.b64encode(Path(path).read_bytes()).decode()
