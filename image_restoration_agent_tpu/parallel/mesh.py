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


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize``.

    The TPU-native replacement for the reference's only multi-node path —
    DeepSpeed's ``init_distributed(dist_backend="nccl")`` + WORLD_SIZE/RANK
    env wiring (DepictQA/src/train.py:30-37). On TPU pods the three
    arguments are discovered from the environment automatically; on
    CPU/GPU fleets pass them explicitly (or via JAX's standard
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env vars).

    Call once per process, before any backend touch. After it returns,
    ``jax.devices()`` spans every host and meshes built by
    ``make_global_mesh`` lay the DCN-crossing axis outermost.
    """
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_global_mesh(ici_axes: dict[str, int] | None = None,
                     dcn_axis: str = "data") -> Mesh:
    """DCN-aware global mesh: hosts form the OUTER ``dcn_axis`` (traffic
    between them crosses the data-center network), each host's local chips
    fill the inner ICI axes.

    Design per the scaling-book recipe: put pure data parallelism (one
    all-reduce per step, latency tolerant) over DCN; keep tile/tensor
    sharding (tight collectives) inside a host's ICI domain. With
    ``ici_axes=None`` the local chips form one ``tile`` axis.

    Works single-process too (process_count == 1): the DCN axis is size 1.
    """
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    ici_axes = dict(ici_axes or {"tile": n_local})
    n_ici = int(np.prod(list(ici_axes.values())))
    if n_ici > n_local:
        raise ValueError(
            f"ICI axes need {n_ici} chips but each host has {n_local}; "
            f"the {dcn_axis} axis must be the only one crossing hosts")
    # jax.devices() orders by process; reshape so axis 0 varies by host
    devs = np.asarray(jax.devices()).reshape(n_proc, n_local)
    devs = devs[:, :n_ici].reshape((n_proc,) + tuple(ici_axes.values()))
    return Mesh(devs, (dcn_axis,) + tuple(ici_axes))
