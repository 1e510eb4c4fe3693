"""Tile-parallel inference: shard the tile batch across chips over ICI.

This is the domain's sequence parallelism (SURVEY.md §2.6, §5.7): a large
image decomposes into an overlap-tile batch; tiles spread across the ``tile``
mesh axis; every chip runs the model forward on its shard inside
``shard_map``; the output tile batch is then re-assembled (XLA inserts the
all-gather over ICI) and blended by the SAME :func:`core.tiling.blend_tiles`
scan the single-chip path uses, in the same sequential tile order. Sharing
the blend (instead of psum-merging per-chip partial canvases, the previous
scheme) keeps the overlap-blend additions in single-chip association order,
so sharded and unsharded results are bit-identical even where >2 tiles
overlap — a psum tree groups those sums by device and diverges in the last
ulp, which matters for global-operator models (Restormer's MDTA) whose
parity gate is exact equality (exercised by
``__graft_entry__.dryrun_multichip``). Communication volume is the output
tile batch (~canvas x overlap factor), on par with one canvas psum.
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
