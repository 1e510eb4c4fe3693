"""Device-mesh construction.

The TPU-native replacement for the reference's process/NCCL distribution
(SURVEY.md §2.6): one mesh, named axes, XLA collectives over ICI. Axes:

- ``data``: data parallel (batch / independent images),
- ``tile``: tile parallel — the "sequence parallel" of this domain: tiles of
  one large image spread across chips (SURVEY.md §5.7),
- ``model``: tensor/FSDP sharding of weights for training.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axis_shapes: dict[str, int], devices=None) -> Mesh:
    """Build a mesh with named axes from the available devices.

    Example: ``make_mesh({"data": 2, "tile": 4})`` on 8 chips.
    """
    devices = jax.devices() if devices is None else devices
    names = tuple(axis_shapes)
    shape = tuple(axis_shapes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, names)


def local_mesh(axis_name: str = "tile") -> Mesh:
    """1-D mesh over all local devices."""
    return make_mesh({axis_name: len(jax.devices())})
