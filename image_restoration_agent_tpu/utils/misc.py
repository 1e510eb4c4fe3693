"""Small helpers (reference AgenticIR/utils/misc.py)."""

from __future__ import annotations

import base64
from pathlib import Path


def sorted_glob(directory: Path, pattern: str = "*") -> list[Path]:
    return sorted(Path(directory).glob(pattern))


def encode_image_base64(path: Path) -> str:
    return base64.b64encode(Path(path).read_bytes()).decode()


def enable_persistent_compile_cache(cache_dir: str | Path) -> Path:
    """Point JAX's persistent compilation cache at ``cache_dir`` so compiled
    programs survive process restarts (pair with ``Engine.warmup`` /
    ``cli warmup`` to bound first-request latency; the headline Mosaic
    kernels cost minutes to compile but are compiled once per shape ever).
    """
    import jax

    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache
