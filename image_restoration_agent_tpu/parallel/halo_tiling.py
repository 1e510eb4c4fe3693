"""Halo-exchange tile-parallel inference: each chip owns an output strip.

``tile_parallel.tiled_apply_sharded`` is simple and correct but every chip
scatters into a FULL output canvas and one psum merges them — O(D * canvas)
ICI traffic and memory. This module implements the TPU-native design
(SURVEY.md §5.7):

- the INPUT is row-sharded over the ``tile`` axis (spec P(axis)); each chip
  fetches the ``overlap`` input rows it needs from its lower neighbor with
  one backward ``ppermute`` (the last chip takes the replicated
  ``overlap``-row remainder instead);
- each chip computes only the tile-rows it owns and blends locally;
- one forward ``ppermute`` hands the (overlap * scale)-row output halo each
  chip's last tile row spills into its lower neighbor;
- the final ``overlap`` output rows are produced by the LAST chip inside
  the same program and returned through a second (small) sharded output —
  no replicated recompute outside the shard_map.

Total ICI traffic: O(D * overlap * W * C) in each direction, and both
input and output live sharded.

Constraints (asserted): after padding, (H - tile) % stride == 0 and the
number of tile rows is divisible by the device count. ``halo_pad_height``
computes the smallest compliant H.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def halo_pad_height(h: int, tile: int, stride: int, n_dev: int) -> int:
    """Smallest H' >= h with (H'-tile) % stride == 0 and row count % n_dev
    == 0."""
    rows = max(1, -(-(h - tile) // stride) + 1)
    while True:
        if rows % n_dev == 0:
            hp = (rows - 1) * stride + tile
            if hp >= h:
                return hp
        rows += 1


def tiled_apply_halo(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    img: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tile",
    tile: int = 256,
    overlap: int = 32,
    scale: int = 1,
) -> jnp.ndarray:
    """Tile-parallel forward over ``mesh[axis]`` with halo exchange.

    ``img`` must already be padded: (H - tile) % stride == 0 (use
    ``halo_pad_height``) and W likewise column-tileable with the same
    stride arithmetic as core.tiling (last column snapped is allowed since
    columns are local to every chip).

    Returns the full (H*scale, W*scale, C') canvas (unsharded view).
    """
    h, w, cin = img.shape
    stride = tile - overlap
    assert (h - tile) % stride == 0, (h, tile, stride)
    n_rows = (h - tile) // stride + 1
    d = mesh.shape[axis]
    assert n_rows % d == 0, (n_rows, d)
    rows_per = n_rows // d

    w_starts = tuple(range(0, w - tile, stride)) + (w - tile,)
    ts = tile * scale
    halo = overlap * scale
    strip_in_rows = (rows_per - 1) * stride + tile   # input rows needed
    own_rows = rows_per * stride                     # output rows owned
    # h == d * own_rows + overlap: the remainder rows ride in replicated

    # probe output channels once (trace-time)
    fn_out_c = jax.eval_shape(
        fn, jax.ShapeDtypeStruct((1, tile, tile, cin), img.dtype)).shape[-1]

    img_main = img[: d * own_rows]        # sharded P(axis)
    img_extra = img[d * own_rows:]        # (overlap, w, cin), replicated

    def shard_fn(block, extra):
        # block: (own_rows, w, cin) this chip's input rows
        me = jax.lax.axis_index(axis)
        extra = jax.lax.pcast(extra, (axis,), to="varying")

        # input halo: my strip needs the next chip's first `overlap` rows;
        # the last chip takes the replicated remainder instead
        head = block[:overlap]
        recv_head = jax.lax.ppermute(
            head, axis, [(i, i - 1) for i in range(1, d)])
        nxt = jnp.where(me == d - 1, extra, recv_head)
        strip = jnp.concatenate([block, nxt], axis=0)

        canvas = jnp.zeros((strip_in_rows * scale, w * scale, fn_out_c),
                           jnp.float32)
        weight = jnp.zeros((strip_in_rows * scale, w * scale, 1),
                           jnp.float32)
        canvas = jax.lax.pcast(canvas, (axis,), to="varying")
        weight = jax.lax.pcast(weight, (axis,), to="varying")

        # local tiles: rows_per x len(w_starts), batched through fn per row
        for r in range(rows_per):
            patches = jnp.stack([
                jax.lax.dynamic_slice(strip, (r * stride, ws_, 0),
                                      (tile, tile, cin))
                for ws_ in w_starts])
            outs = fn(patches).astype(jnp.float32)
            for j, ws_ in enumerate(w_starts):
                oy, ox = r * stride * scale, ws_ * scale
                cur = jax.lax.dynamic_slice(canvas, (oy, ox, 0),
                                            (ts, ts, fn_out_c))
                canvas = jax.lax.dynamic_update_slice(
                    canvas, cur + outs[j], (oy, ox, 0))
                curw = jax.lax.dynamic_slice(weight, (oy, ox, 0),
                                             (ts, ts, 1))
                weight = jax.lax.dynamic_update_slice(
                    weight, curw + 1.0, (oy, ox, 0))

        # output halo exchange: my canvas tail overlaps neighbor (me+1)'s
        # head. device 0 receives zeros (no source) — ppermute semantics.
        perm = [(i, i + 1) for i in range(d - 1)]
        tail_c = canvas[own_rows * scale:]
        tail_w = weight[own_rows * scale:]
        recv_c = jax.lax.ppermute(tail_c, axis, perm)
        recv_w = jax.lax.ppermute(tail_w, axis, perm)
        canvas = canvas.at[:halo].add(recv_c)
        weight = weight.at[:halo].add(recv_w)

        blended = canvas / jnp.maximum(weight, 1e-8)
        out_strip = blended[: own_rows * scale]
        # valid only on the LAST chip (its final tile row's bottom rows);
        # other chips' tails were already merged into their neighbor
        tail_strip = blended[own_rows * scale:]
        return out_strip, tail_strip

    out, tails = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None, None), P()),
        out_specs=(P(axis, None, None), P(axis, None, None)),
    )(img_main, img_extra)

    # the final `overlap` output rows live in the last chip's tail block
    return jnp.concatenate([out, tails[(d - 1) * halo:]], axis=0)
