"""Diagnostic: print the serialized HLO size of the headline bench program.

The axon tunnel rejects remote_compile bodies over its HTTP limit (413);
this measures how close the headline program is, without compiling.

Usage: python scripts/lower_size.py [--tile 0] [--size 1920x1080]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=0)
    p.add_argument("--size", default="1920x1080")
    p.add_argument("--model", default="swinir_sr_x4")
    p.add_argument("--dtype", default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from image_restoration_agent_tpu.core.tiling import tiled_apply
    from image_restoration_agent_tpu.models import build_model
    from image_restoration_agent_tpu.models.registry import get_spec

    w, h = (int(v) for v in args.size.split("x"))
    spec = get_spec(args.model)
    model = build_model(args.model)

    tile = args.tile if args.tile > 0 else None
    init_t = args.tile if args.tile > 0 else spec.pad_multiple * 2
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, init_t, init_t, 3)))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)

    def fwd(batch):
        x = batch.astype(jnp.bfloat16)
        out = model.apply(params, x)
        return out.astype(jnp.float32)

    pad_to = None
    packed_c = 1
    batch = 4
    overlap = 32
    if tile is None and args.model.startswith("swinir"):
        from image_restoration_agent_tpu.ops.pallas_attention import (
            pad_width_for_strips)

        ph = -(-h // spec.pad_multiple) * spec.pad_multiple
        pw = pad_width_for_strips(w)
        pad_to = (ph, pw)
        ov = 16
        n_bands = max(2, -(-(ph * pw) // 1_100_000))
        bh = -(-(ph + (n_bands - 1) * ov) // n_bands // 8) * 8
        tile = (bh, pw)
        overlap, batch = ov, 1
        if spec.scale > 1:
            model = build_model(args.model, packed_output=True)
            packed_c = 3

    pad_multiple = spec.pad_multiple if tile is not None \
        else max(spec.pad_multiple, spec.whole_pad_multiple)

    def run(img):
        return tiled_apply(
            fwd, img, tile=tile, overlap=overlap,
            scale=spec.scale, batch=batch,
            pad_multiple=pad_multiple, pad_mode=spec.pad_mode,
            pad_kind=spec.pad_kind, pad_to=pad_to, packed_c=packed_c)

    img = jnp.zeros((h, w, 3), jnp.float32)
    lowered = jax.jit(run).lower(img)
    proto = lowered.compiler_ir("hlo").as_serialized_hlo_module_proto()
    text = lowered.as_text()
    print(f"serialized_hlo_proto_bytes={len(proto):,}")
    print(f"stablehlo_text_bytes={len(text):,}")


if __name__ == "__main__":
    main()
