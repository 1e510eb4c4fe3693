"""Headline benchmark: megapixels/sec/chip at 4x SR, tiled (BASELINE.json).

Runs SwinIR 4x SR (classical config: embed 180, 6x6 RSTBs, window 8) over a
2K (1920x1080) input with the fused tile pipeline (pad -> tile gather ->
batched forward -> overlap blend -> crop) as one XLA program per tile-chunk,
and reports input megapixels per second per chip.

vs_baseline: the reference serves SwinIR-M x4 via a per-tile Python loop with
one CUDA launch per 256px tile (AgentApp/model_service/denoising/SwinIR/
model_serving.py:148-166). Published SwinIR timings put that pipeline at
~0.65 MP/s on an A100-class GPU for x4 SR (SwinIR paper table: ~1.1s for a
~0.4MP input on V100; A100 ~2x). BASELINE.md's target is >=4x that
(>=2.6 MP/s); vs_baseline below is measured_value / 0.65.

Usage: python bench.py [--tile 256] [--batch 4] [--size 1920x1080]
Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REF_A100_MP_PER_S = 0.65  # documented estimate, see module docstring


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=256,
                   help="tile size; 0 = whole-image (untiled) forward")
    p.add_argument("--overlap", type=int, default=32)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", default="1920x1080")
    p.add_argument("--model", default="swinir_sr_x4")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--config", default=None,
                   choices=[None, "nafnet_denoise", "restormer_720p",
                            "swinir_2k_sr"],
                   help="BASELINE.json preset overriding model/size/tile")
    args = p.parse_args()

    # BASELINE.json configs #1-#3 as presets (config #3 is the default CLI)
    if args.config == "nafnet_denoise":
        args.model, args.size, args.tile = "nafnet", "256x256", 256
    elif args.config == "restormer_720p":
        args.model, args.size, args.tile = "restormer", "1280x720", 256
    elif args.config == "swinir_2k_sr":
        args.model, args.size, args.tile = "swinir_sr_x4", "1920x1080", 256

    import jax
    import jax.numpy as jnp

    from image_restoration_agent_tpu.core.tiling import tiled_apply
    from image_restoration_agent_tpu.models import build_model
    from image_restoration_agent_tpu.models.registry import get_spec

    w, h = (int(v) for v in args.size.split("x"))
    spec = get_spec(args.model)
    model = build_model(args.model)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))

    tile = args.tile if args.tile > 0 else None
    init_t = args.tile if args.tile > 0 else spec.pad_multiple * 2
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, init_t, init_t, 3)))
    if args.dtype == "bf16":
        # bf16 weights/activations: TPU-native inference precision; the
        # overlap-blend accumulates in f32 and quality parity is guarded by
        # the golden tests.
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    def fwd(batch):
        x = batch.astype(jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
        out = model.apply(params, x)
        return out.astype(jnp.float32)

    @jax.jit
    def run(img):
        return tiled_apply(
            fwd, img, tile=tile, overlap=args.overlap,
            scale=spec.scale, batch=args.batch,
            pad_multiple=spec.pad_multiple, pad_mode=spec.pad_mode,
            pad_kind=spec.pad_kind)

    # warmup / compile
    out = run(img)
    out.block_until_ready()

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        run(img).block_until_ready()
        times.append(time.perf_counter() - t0)

    dt = min(times)
    mp = h * w / 1e6
    value = mp / dt
    print(json.dumps({
        "metric": "megapixels_per_sec_per_chip_4x_sr_tiled",
        "value": round(value, 4),
        "unit": "MP/s",
        "vs_baseline": round(value / REF_A100_MP_PER_S, 3),
    }))
    print(f"# {h}x{w} input, tile={args.tile} overlap={args.overlap} "
          f"batch={args.batch} dtype={args.dtype} best={dt:.3f}s "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
