"""Static-shape tiled sliding-window inference with overlap blending.

This is the TPU-native rebuild of the reference's per-tile host loop
(AgentApp/model_service/denoising/SwinIR/model_serving.py:148-166 and
motion_deblurring/Restormer/model_serving.py:177-196): the reference runs one
CUDA launch per tile from Python and accumulates E/W blend buffers on device
with host-side loop control. Here the whole pipeline — tile gather, batched
forward, overlap blend, crop — is one traced XLA program:

- the tile grid is planned at trace time from static shapes (same stride
  arithmetic as the reference: ``range(0, size - tile, stride) + [size-tile]``),
- tiles are gathered into one ``(N, tile, tile, C)`` batch so the model runs
  large batched matmuls on the MXU instead of N tiny launches,
- the weight (count) canvas W is a compile-time constant (all tiles contribute
  uniform weight 1, offsets are static), so only E is accumulated on device,
- blending is a `lax.scan` of dynamic-slice adds that XLA keeps in-place.

Tile batches can additionally be sharded across chips over ICI — see
``parallel/tile_parallel.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .pad import pad_to_multiple


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """A static tile decomposition of an ``(H, W)`` canvas.

    Tiles may be rectangular (``tile_h != tile_w``) — full-width row bands
    (tile_w == width) are the memory-bounded whole-image mode the untiled
    TPU path uses for x4 SR heads.
    """

    height: int
    width: int
    tile_h: int
    tile_w: int
    overlap: int
    h_starts: tuple[int, ...]
    w_starts: tuple[int, ...]

    @property
    def tile(self) -> "int | tuple[int, int]":
        return self.tile_h if self.tile_h == self.tile_w \
            else (self.tile_h, self.tile_w)

    @property
    def num_tiles(self) -> int:
        return len(self.h_starts) * len(self.w_starts)

    @property
    def offsets(self) -> np.ndarray:
        """(N, 2) array of (row, col) tile origins, row-major like the reference."""
        return np.array(
            [(h, w) for h in self.h_starts for w in self.w_starts], dtype=np.int32
        )


def plan_tiles(height: int, width: int, tile, overlap: int = 32) -> TilePlan:
    """Plan a tile grid exactly like the reference serving loop.

    ``tile`` (an int, or an ``(th, tw)`` pair for rectangular tiles) is
    clamped to the canvas, stride = tile - overlap, and the last tile is
    snapped to the bottom/right edge (reference SwinIR
    model_serving.py:150-153).
    """
    if isinstance(tile, (tuple, list)):
        th, tw = min(tile[0], height), min(tile[1], width)
    else:
        # reference scalar clamp: tile = min(tile, h, w) on BOTH axes
        th = tw = min(tile, height, width)
    if overlap >= th and th < height or overlap >= tw and tw < width:
        raise ValueError(f"overlap {overlap} must be < tile ({th}, {tw})")

    def starts(size, t):
        if t >= size:
            return (0,)
        return tuple(range(0, size - t, t - overlap)) + (size - t,)

    return TilePlan(height, width, th, tw, overlap,
                    starts(height, th), starts(width, tw))


def extract_tiles(img: jnp.ndarray, plan: TilePlan) -> jnp.ndarray:
    """Gather all tiles of an ``(H, W, C)`` image into ``(N, th, tw, C)``."""
    th, tw = plan.tile_h, plan.tile_w
    offsets = jnp.asarray(plan.offsets)

    def gather(off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0),
                                     (th, tw, img.shape[-1]))

    return jax.vmap(gather)(offsets)


def _weight_canvas(plan: TilePlan, scale: int, n_valid: int | None = None,
                   scale_w: int | None = None) -> np.ndarray:
    """Compile-time constant overlap-count canvas (the reference's W buffer).

    ``scale_w`` overrides the column-axis scale (packed-channel outputs
    fold C into the W axis, so columns scale by scale * C)."""
    th, tw, s = plan.tile_h, plan.tile_w, scale
    sw = scale if scale_w is None else scale_w
    w = np.zeros((plan.height * s, plan.width * sw, 1), dtype=np.float32)
    for i, (oh, ow) in enumerate(plan.offsets):
        if n_valid is not None and i >= n_valid:
            break
        w[oh * s : (oh + th) * s, ow * sw : (ow + tw) * sw] += 1.0
    return w


def _weight_axes(plan: TilePlan, scale: int,
                 scale_w: int | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """The overlap-count canvas factored into per-axis count vectors.

    The tile grid is the Cartesian product h_starts x w_starts, so the
    full-grid coverage count is separable: count[r, c] = rows(r) * cols(c).
    Embedding the two 1-D vectors instead of the dense (H*s, W*sw) canvas
    keeps the constant O(H + W) — the dense form was 133 MB (400 MB packed)
    at the 2K x4 headline and overflowed the remote-compile request."""
    th, tw, s = plan.tile_h, plan.tile_w, scale
    sw = scale if scale_w is None else scale_w
    rows = np.zeros((plan.height * s, 1), dtype=np.float32)
    for oh in plan.h_starts:
        rows[oh * s:(oh + th) * s] += 1.0
    cols = np.zeros((plan.width * sw, 1), dtype=np.float32)
    for ow in plan.w_starts:
        cols[ow * sw:(ow + tw) * sw] += 1.0
    return rows, cols


def blend_tiles(
    tiles: jnp.ndarray, plan: TilePlan, scale: int = 1,
    scale_w: int | None = None,
) -> jnp.ndarray:
    """Overlap-blend ``(N, th*s, tw*s, C)`` tile outputs onto the canvas.

    Implements the reference E/W accumulate-then-divide
    (model_serving.py:154-166) with W folded into a constant. With
    ``scale_w`` the tiles are packed ``(N, th*s, tw*scale_w)`` (channels
    folded into the column axis) and the blend runs in packed space.
    """
    packed = scale_w is not None
    if packed:
        tiles = tiles[..., None]
    n, ths, tws = tiles.shape[0], tiles.shape[1], tiles.shape[2]
    c = tiles.shape[-1]
    sw = scale if scale_w is None else scale_w
    offsets = jnp.asarray(plan.offsets[:n] * np.array([scale, sw],
                                                      dtype=np.int32))
    canvas = jnp.zeros((plan.height * scale, plan.width * sw, c),
                       tiles.dtype)

    def body(e, inp):
        patch, off = inp
        cur = jax.lax.dynamic_slice(e, (off[0], off[1], 0), (ths, tws, c))
        e = jax.lax.dynamic_update_slice(e, cur + patch, (off[0], off[1], 0))
        return e, None

    canvas, _ = jax.lax.scan(body, canvas, (tiles, offsets))
    if n == len(plan.offsets):
        # full grid: separable count, O(H + W) constants
        rows, cols = _weight_axes(plan, scale, scale_w=scale_w)
        canvas = canvas * jnp.asarray(1.0 / rows)[:, None]
        canvas = canvas * jnp.asarray(1.0 / cols)[None, :]
    else:  # truncated grids are not separable; dense fallback
        weight = jnp.asarray(_weight_canvas(plan, scale, n_valid=n,
                                            scale_w=scale_w))
        canvas = canvas / weight
    return canvas[..., 0] if packed else canvas


def _batched_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    tiles: jnp.ndarray,
    batch: int,
    scale: int,
) -> jnp.ndarray:
    """Run ``fn`` over tiles in fixed-size batches (static shapes, no recompiles).

    The tile count is padded up to a multiple of ``batch``; padded outputs are
    dropped before blending.
    """
    n, th, tw, c = tiles.shape
    if batch >= n:
        return fn(tiles)
    n_pad = (-n) % batch
    if n_pad:
        tiles = jnp.concatenate([tiles, tiles[:n_pad]], axis=0)
    chunks = tiles.reshape(-1, batch, th, tw, c)
    out_chunks = jax.lax.map(fn, chunks)
    if out_chunks.ndim == 4:  # packed model output (B, th*s, tw*s*C)
        out = out_chunks.reshape(-1, out_chunks.shape[2],
                                 out_chunks.shape[3])
    else:
        out = out_chunks.reshape(-1, th * scale, tw * scale,
                                 out_chunks.shape[-1])
    return out[:n]


def tiled_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    img: jnp.ndarray,
    tile: int | None,
    overlap: int = 32,
    scale: int = 1,
    batch: int = 8,
    pad_multiple: int = 1,
    pad_mode: str = "ceil",
    pad_kind: str = "symmetric",
    pad_to: tuple[int, int] | None = None,
    packed_c: int = 1,
) -> jnp.ndarray:
    """Fused pad -> tile -> batched forward -> blend -> crop on one image.

    Args:
        fn: batched model forward mapping ``(B, t, t, C) -> (B, t*s, t*s, C')``.
        img: ``(H, W, C)`` float image.
        tile: tile size, or None for whole-image forward (reference
            ``tile is None`` branch).
        overlap: tile overlap in input pixels (reference default 32).
        scale: model output scale factor (4 for SR, 1 otherwise).
        batch: tiles per model invocation.
        pad_multiple: pad H/W to this multiple before tiling (window size for
            SwinIR, 8 for Restormer, ...).
        pad_mode: "ceil" | "extra" (see :func:`core.pad.pad_to_multiple`).
        pad_kind: numpy pad mode for the border pixels.
        pad_to: explicit padded canvas (H', W') overriding pad_multiple —
            the untiled TPU path pads W to a strip-chunkable width
            (ops.pallas_attention.pad_width_for_strips).
        packed_c: when > 1, ``fn`` emits PACKED ``(B, t*s, t*s*packed_c)``
            outputs (channels interleaved into the column axis); blending
            and cropping run in packed space and the return value is
            ``(H*scale, W*scale*packed_c)`` — byte-identical row-major to
            the NHWC image, so the host reshape view is free.

    Returns:
        ``(H*scale, W*scale, C')`` restored image, or the packed 2D form
        when ``packed_c > 1``.
    """
    if pad_to is not None:
        h0, w0 = img.shape[-3], img.shape[-2]
        ph, pw = pad_to[0] - h0, pad_to[1] - w0
        padded = img if ph == 0 and pw == 0 else jnp.pad(
            img, [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)],
            mode=pad_kind if (ph <= h0 and pw <= w0) else "edge")
    else:
        padded, (h0, w0) = pad_to_multiple(
            img, max(pad_multiple, 1), pad_mode, pad_kind)
    h, w = padded.shape[-3], padded.shape[-2]

    th, tw = (tile, tile) if tile is None or isinstance(tile, int) \
        else tile
    scale_w = scale * packed_c if packed_c > 1 else None
    if tile is None or (th >= h and tw >= w):
        out = fn(padded[None])[0]
    else:
        plan = plan_tiles(h, w, tile, overlap)
        tiles = extract_tiles(padded, plan)
        outs = _batched_apply(fn, tiles, batch, scale)
        out = blend_tiles(outs, plan, scale, scale_w=scale_w)
    if packed_c > 1:
        return out[: h0 * scale, : w0 * scale * packed_c]
    return out[: h0 * scale, : w0 * scale, :]
