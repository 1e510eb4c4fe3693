"""Tile-parallel inference: shard the tile batch across chips over ICI.

This is the domain's sequence parallelism (SURVEY.md §2.6, §5.7): a large
image decomposes into an overlap-tile batch; tiles spread across the ``tile``
mesh axis; every chip runs the model forward on its shard inside
``shard_map``; the output tile batch is then re-assembled (XLA inserts the
all-gather over ICI) and blended by the SAME :func:`core.tiling.blend_tiles`
scan the single-chip path uses, in the same sequential tile order.

Parity contract (exercised by ``__graft_entry__.dryrun_multichip`` and
``tests/test_parallel.py``): the overlap BLEND is bit-identical to
single-chip by construction — the previous scheme psum-merged per-chip
partial canvases, and the psum tree groups overlap sums by device, diverging
in the last ulp where >2 tiles overlap; the elementwise-fn parity test pins
the blend exactly. The model FORWARD, however, is not bitwise
batch-grouping-invariant: the sharded batch shape differs from the
single-chip ``batch`` chunking, and XLA reassociates per-example
reductions/conv inner loops per shape — measured <=1e-6 relative for NAFNet
and ~3e-6 for Restormer's MDTA on the CPU mesh — so the model-family gates
assert a few-ulp bound; real sharding bugs sit orders of magnitude above
it. Communication volume is the output tile batch (~canvas x overlap
factor), on par with one canvas psum.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.pad import pad_to_multiple
from ..core.tiling import blend_tiles, extract_tiles, plan_tiles


def tiled_apply_sharded(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    img: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tile",
    tile: int = 256,
    overlap: int = 32,
    scale: int = 1,
    pad_multiple: int = 8,
    pad_mode: str = "ceil",
    pad_kind: str = "symmetric",
) -> jnp.ndarray:
    """Like :func:`core.tiling.tiled_apply` but with the tile batch sharded
    over ``mesh[axis]``. Must be called inside (or jitted with) the mesh.
    """
    padded, (h0, w0) = pad_to_multiple(img, max(pad_multiple, 1), pad_mode, pad_kind)
    h, w = padded.shape[-3], padded.shape[-2]
    plan = plan_tiles(h, w, tile, overlap)

    n = plan.num_tiles
    d = mesh.shape[axis]
    n_pad = (-n) % d

    tiles = extract_tiles(padded, plan)
    if n_pad:  # round the batch up to the device count (dropped after)
        tiles = jnp.concatenate([tiles, tiles[:n_pad]], axis=0)

    outs = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=P(axis),
    )(tiles)

    out = blend_tiles(outs[:n], plan, scale)
    return out[: h0 * scale, : w0 * scale, :]
