"""Tile-parallel inference: shard the tile batch across chips over ICI.

This is the domain's sequence parallelism (SURVEY.md §2.6, §5.7): a large
image decomposes into an overlap-tile batch; tiles spread across the ``tile``
mesh axis; every chip runs the model on its shard, scatters its outputs onto
a private canvas, and one ``psum`` over ICI merges the overlap-blend
accumulators. The divide-by-weight uses the same compile-time constant canvas
as the single-chip path, so sharded and unsharded results are bit-identical.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.pad import pad_to_multiple
from ..core.tiling import _weight_canvas, extract_tiles, plan_tiles


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
    offsets = plan.offsets * scale
    valid = np.ones((n,), np.float32)
    if n_pad:
        tiles = jnp.concatenate([tiles, tiles[:n_pad]], axis=0)
        offsets = np.concatenate([offsets, offsets[:n_pad]], axis=0)
        valid = np.concatenate([valid, np.zeros((n_pad,), np.float32)])

    ts = plan.tile * scale
    c_in = tiles.shape[-1]

    def shard_fn(tiles_shard, offsets_shard, valid_shard):
        outs = fn(tiles_shard)  # (n_local, ts, ts, C')
        outs = outs * valid_shard[:, None, None, None]
        c = outs.shape[-1]
        canvas = jnp.zeros((h * scale, w * scale, c), outs.dtype)
        # mark the carry as device-varying so the scan carry types match
        canvas = jax.lax.pcast(canvas, (axis,), to="varying")

        def body(e, inp):
            patch, off = inp
            cur = jax.lax.dynamic_slice(e, (off[0], off[1], 0), (ts, ts, c))
            e = jax.lax.dynamic_update_slice(e, cur + patch, (off[0], off[1], 0))
            return e, None

        canvas, _ = jax.lax.scan(body, canvas, (outs, offsets_shard))
        return jax.lax.psum(canvas, axis)  # merge partial blends over ICI

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(),
    )(tiles, jnp.asarray(offsets), jnp.asarray(valid))

    weight = jnp.asarray(_weight_canvas(plan, scale))
    out = out / weight
    return out[: h0 * scale, : w0 * scale, :]
