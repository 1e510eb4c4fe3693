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
from pathlib import Path

import numpy as np

REF_A100_MP_PER_S = 0.65  # documented estimate, see module docstring


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache (verified working over the axon
    tunnel): the unrolled Mosaic strip kernels cost ~3 min/variant to
    compile but are compiled once per shape ever, not once per process."""
    import jax

    cache = Path(__file__).resolve().parent / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=0,
                   help="tile size; 0 = whole-canvas full-width row bands "
                        "(default: measured 1.242 vs 1.015 MP/s tiled-256 "
                        "on the 2K x4 headline)")
    p.add_argument("--overlap", type=int, default=32)
    p.add_argument("--batch", type=int, default=None,
                   help="tile batch; default picks the zero-pad-waste size")
    p.add_argument("--size", default="1920x1080")
    p.add_argument("--model", default="swinir_sr_x4")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--config", default=None,
                   choices=[None, "nafnet_denoise", "restormer_720p",
                            "swinir_2k_sr", "gan_sr_jpeg_batch",
                            "agent_p50", "agent_p50_full",
                            "diffbir_sr"],
                   help="BASELINE.json preset overriding model/size/tile")
    args = p.parse_args()

    # BASELINE.json configs #1-#3 as presets (config #3 is the default CLI)
    if args.config == "nafnet_denoise":
        return bench_nafnet_chained(args)
    elif args.config == "restormer_720p":
        # whole-image (tile=0): 2.70 vs 1.86 MP/s tiled-256 — the fused
        # MDTA/GDFN kernels cover all four U-Net levels at 768x1280
        args.model, args.size, args.tile = "restormer", "1280x720", 0
    elif args.config == "swinir_2k_sr":
        args.model, args.size, args.tile = "swinir_sr_x4", "1920x1080", 0
    elif args.config == "gan_sr_jpeg_batch":
        return bench_gan_sr_jpeg_batch(args)
    elif args.config == "agent_p50":
        return bench_agent_p50(args, fast=True)
    elif args.config == "agent_p50_full":
        return bench_agent_p50(args, fast=False)
    elif args.config == "diffbir_sr":
        return bench_diffbir(args)

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from image_restoration_agent_tpu.core.tiling import tiled_apply
    from image_restoration_agent_tpu.models import build_model
    from image_restoration_agent_tpu.models.registry import get_spec

    w, h = (int(v) for v in args.size.split("x"))
    spec = get_spec(args.model)
    model = build_model(args.model)

    # zero-waste tile batching: the tile batch is padded to a multiple of
    # `batch`, so pick the candidate (1..8) minimizing pad tiles for this
    # grid (ties -> larger batch). 1920x1080/t256/o32 -> 45 tiles: batch 5
    # wastes 0 vs batch 4's 3 pad tiles (measured +4% MP/s).
    if args.batch is None and args.tile > 0:
        from image_restoration_agent_tpu.core.tiling import plan_tiles

        pad_h = -(-h // spec.pad_multiple) * spec.pad_multiple
        pad_w = -(-w // spec.pad_multiple) * spec.pad_multiple
        n_tiles = plan_tiles(max(pad_h, args.tile), max(pad_w, args.tile),
                             args.tile, args.overlap).num_tiles
        args.batch = min(range(1, 9),
                         key=lambda b: ((-n_tiles) % b, -b))
    elif args.batch is None:
        args.batch = 4

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))

    tile = args.tile if args.tile > 0 else None
    init_t = args.tile if args.tile > 0 else spec.pad_multiple * 2
    # jit the init: eager flax init dispatches hundreds of tiny ops, each
    # paying the remote-compile RPC (~0.4 s/op over the axon tunnel —
    # measured ~116 s of the round-3 driver timeout); one jitted program
    # compiles in seconds and is persistently cached.
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, init_t, init_t, 3)))
    if args.dtype == "bf16":
        # bf16 weights/activations: TPU-native inference precision; the
        # overlap-blend accumulates in f32 and quality parity is guarded by
        # the golden tests. One jitted cast (not per-leaf eager dispatches).
        params = jax.jit(lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p))(params)

    def fwd(batch):
        x = batch.astype(jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
        out = model.apply(params, x)
        return out.astype(jnp.float32)

    # whole-canvas mode (--tile 0): full-width row bands. The 2D-grid
    # strip kernel runs at the full padded width (chunkable, ceil-pad
    # semantics — the reference's "extra" window only affects borders);
    # banding the rows bounds the x4 pixel-shuffle head's HBM (a true
    # single-shot 1080p x4 head OOMs: ~8GB conv_last activation), at
    # ~1.5% overlap redundancy vs tiled-256's 42%.
    pad_to = None
    packed_c = 1
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
        args.overlap, args.batch = ov, 1
        if spec.scale > 1:
            # packed-RGB output: the x4 head's channels-last device
            # transpose is the head's main cost; packed output is
            # byte-identical row-major (host reshape view is free)
            model = build_model(args.model, packed_output=True)
            packed_c = 3

    pad_multiple = spec.pad_multiple if tile is not None \
        else max(spec.pad_multiple, spec.whole_pad_multiple)

    @jax.jit
    def run(img):
        return tiled_apply(
            fwd, img, tile=tile, overlap=args.overlap,
            scale=spec.scale, batch=args.batch,
            pad_multiple=pad_multiple, pad_mode=spec.pad_mode,
            pad_kind=spec.pad_kind, pad_to=pad_to, packed_c=packed_c)

    # warmup / compile
    out = run(img)
    out.block_until_ready()
    if packed_c > 1:  # free host view back to (H*s, W*s, 3)
        final = np.asarray(out).reshape(h * spec.scale, w * spec.scale, 3)
        assert final.shape[-1] == 3

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        run(img).block_until_ready()
        times.append(time.perf_counter() - t0)

    dt = min(times)
    mp = h * w / 1e6
    value = mp / dt
    # per-config metric names; the A100 estimate (REF_A100_MP_PER_S) only
    # applies to the SwinIR x4-SR serving contract, so non-SR configs
    # report vs_baseline null instead of dividing by an unrelated number
    metric, base = {
        None: ("megapixels_per_sec_per_chip_4x_sr_tiled",
               REF_A100_MP_PER_S),
        "swinir_2k_sr": ("megapixels_per_sec_per_chip_4x_sr_tiled",
                         REF_A100_MP_PER_S),
        "nafnet_denoise": ("megapixels_per_sec_denoise_256", None),
        "restormer_720p": ("megapixels_per_sec_deblur_720p", None),
    }[args.config]
    record = {
        "metric": metric,
        "value": round(value, 4),
        "unit": "MP/s",
        "vs_baseline": round(value / base, 3) if base else None,
    }
    if (metric == "megapixels_per_sec_per_chip_4x_sr_tiled"
            and args.dtype == "bf16"
            and jax.default_backend() == "tpu"):
        record["fastmath_psnr_db"] = fastmath_quality_gate()
    print(json.dumps(record), flush=True)
    print(f"# {h}x{w} input, tile={args.tile} overlap={args.overlap} "
          f"batch={args.batch} dtype={args.dtype} best={dt:.3f}s "
          f"device={jax.devices()[0].platform}", file=sys.stderr,
          flush=True)


def fastmath_quality_gate(floor_db: float = 37.0) -> float:
    """On-chip quality gate for the bf16-fastmath serving path (VERDICT r4
    #4): serve a probe image through the SAME band-mode bf16 Pallas path
    the headline uses (paired2r rolled bodies: tanh-GELU, clamp-exp2
    reciprocal softmax) AND through the f32 XLA exact path (erf GELU,
    max-subtracted softmax — the semantics the CPU golden gates pin), and
    require PSNR between the two >= ``floor_db``. The synthetic golden
    gates can't see this (Pallas is TPU-only; goldens run on CPU), so this
    is the one check that runs where the fastmath kernels run. Fails the
    whole bench loudly on drift. Probe is 480x270 (not the full 2K) to
    keep the extra cold-cache compile under ~1 min; the kernel programs
    are chunk-width-sized, so the probe exercises the same Mosaic bodies.

    Floor calibration: PURE bf16 rounding (bf16-XLA vs f32-XLA, no
    Pallas, same probe/weights) measures 42.16 dB range-normalized on
    CPU — the fastmath claim is "error below bf16 rounding", so a
    healthy TPU path sits at ~42 dB and the 37 dB floor leaves ~5 dB of
    backend noise margin while real drift (a wrong mask, a broken
    softmax) costs tens of dB.
    """
    import jax
    import jax.numpy as jnp

    from image_restoration_agent_tpu.core.tiling import tiled_apply
    from image_restoration_agent_tpu.models import build_model
    from image_restoration_agent_tpu.models.registry import get_spec
    from image_restoration_agent_tpu.ops.pallas_attention import (
        pad_width_for_strips)

    h, w = 270, 480
    spec = get_spec("swinir_sr_x4")
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((h, w, 3), dtype=np.float32))

    model = build_model("swinir_sr_x4")
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 3)))
    params_bf16 = jax.jit(lambda p: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, p))(params)

    # (a) the served path: band-mode bf16 Pallas fastmath (same banding
    # construction as the headline run above)
    ph = -(-h // spec.pad_multiple) * spec.pad_multiple
    pw = pad_width_for_strips(w)
    ov = 16
    n_bands = max(2, -(-(ph * pw) // 1_100_000))
    bh = -(-(ph + (n_bands - 1) * ov) // n_bands // 8) * 8

    def fwd_bf16(batch):
        return model.apply(params_bf16,
                           batch.astype(jnp.bfloat16)).astype(jnp.float32)

    fast = jax.jit(lambda im: tiled_apply(
        fwd_bf16, im, tile=(bh, pw), overlap=ov, scale=spec.scale,
        batch=1, pad_multiple=spec.pad_multiple, pad_mode=spec.pad_mode,
        pad_kind=spec.pad_kind, pad_to=(ph, pw)))(img)

    # (b) the exact reference path: f32, XLA attention, whole-image
    model_xla = build_model("swinir_sr_x4", attention_impl="xla")

    def fwd_f32(batch):
        return model_xla.apply(params, batch.astype(jnp.float32))

    exact = jax.jit(lambda im: tiled_apply(
        fwd_f32, im, tile=None, scale=spec.scale,
        pad_multiple=spec.pad_multiple, pad_mode=spec.pad_mode,
        pad_kind=spec.pad_kind))(img)

    fa = np.asarray(fast, np.float64)
    ex = np.asarray(exact, np.float64)
    # range-normalized PSNR: bench weights are random-init (no released
    # checkpoints in this environment), so outputs are not [0,1] images —
    # normalize by the exact path's dynamic range to make the floor
    # weight-independent (bf16 relative error scales with magnitude)
    rng_span = float(ex.max() - ex.min()) or 1.0
    mse = float(np.mean((fa - ex) ** 2))
    psnr = float(20.0 * np.log10(rng_span)
                 - 10.0 * np.log10(max(mse, 1e-12)))
    if psnr < floor_db:
        print(json.dumps({
            "metric": "fastmath_quality_gate_FAILED",
            "value": round(psnr, 2), "unit": "dB",
            "vs_baseline": None}), flush=True)
        raise SystemExit(
            f"bf16-fastmath serving path drifted: PSNR {psnr:.2f} dB vs "
            f"f32 exact (floor {floor_db}); see bench.fastmath_quality_gate")
    return round(psnr, 2)


def bench_nafnet_chained(args, k: int = 20):
    """BASELINE config #1: NAFNet denoise at 256px, measured as K chained
    serving passes inside ONE jitted dispatch, wall / K.

    A single ~30 ms forward dispatched over the axon tunnel measures the
    tunnel, not the chip (round-3 record wobbled 0.029-0.033 s run to run).
    Denoising is shape-preserving, so the real tiled serving program
    composes with itself: a fori_loop of tiled_apply(pad -> forward ->
    crop) bodies amortizes the one dispatch across K passes and compiles
    one loop body."""
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from image_restoration_agent_tpu.core.tiling import tiled_apply
    from image_restoration_agent_tpu.models import build_model
    from image_restoration_agent_tpu.models.registry import get_spec

    size = 256
    spec = get_spec("nafnet")
    model = build_model("nafnet")
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, size, size, 3)))
    if args.dtype == "bf16":
        params = jax.jit(lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p))(params)

    def fwd(batch):
        x = batch.astype(jnp.bfloat16 if args.dtype == "bf16"
                         else jnp.float32)
        return model.apply(params, x).astype(jnp.float32)

    def serve_once(img):
        return tiled_apply(fwd, img, tile=size, overlap=args.overlap,
                           scale=spec.scale, batch=1,
                           pad_multiple=spec.pad_multiple,
                           pad_mode=spec.pad_mode, pad_kind=spec.pad_kind)

    @jax.jit
    def run(img):
        return jax.lax.fori_loop(0, k, lambda i, x: serve_once(x), img)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((size, size, 3), dtype=np.float32))
    run(img).block_until_ready()  # warmup/compile
    times = []
    for _ in range(max(args.repeats, 5)):
        t0 = time.perf_counter()
        run(img).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times) / k
    value = size * size / 1e6 / dt
    print(json.dumps({
        "metric": "megapixels_per_sec_denoise_256",
        "value": round(value, 4), "unit": "MP/s",
        "vs_baseline": None}), flush=True)
    print(f"# NAFNet {size}px, {k} chained serving passes/dispatch, "
          f"best {dt * 1e3:.2f} ms/pass, "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


def bench_gan_sr_jpeg_batch(args):
    """BASELINE config #4: Real-ESRGAN-class GAN SR over a batch of
    JPEG-degraded images, with host decode -> normalize -> tile fused into
    the serving path (the reference's closest contract is the SwinIR-GAN
    real-SR service; model here is the nearest+conv-head SwinIR)."""
    import io as _io

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from image_restoration_agent_tpu.core.io import to_float
    from image_restoration_agent_tpu.core.tiling import tiled_apply
    from image_restoration_agent_tpu.models import build_model
    from image_restoration_agent_tpu.models.registry import get_spec

    n_imgs, size = 8, 256
    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(n_imgs):
        arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=40)
        blobs.append(buf.getvalue())

    name = "swinir_lightweight_sr_x4"
    spec = get_spec(name)
    model = build_model(name)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
    params = jax.jit(lambda p: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        p))(params)

    def fwd(batch):
        return model.apply(params, batch.astype(jnp.bfloat16)) \
            .astype(jnp.float32)

    @jax.jit
    def run(img):
        return tiled_apply(fwd, img, tile=None, scale=spec.scale,
                           pad_multiple=spec.pad_multiple,
                           pad_kind=spec.pad_kind)

    def pipeline():
        outs = []
        for blob in blobs:
            img = to_float(np.asarray(Image.open(_io.BytesIO(blob))
                                      .convert("RGB")))
            outs.append(run(jnp.asarray(img)))
        jax.block_until_ready(outs)
        return outs

    pipeline()  # warmup/compile
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        pipeline()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mp = n_imgs * size * size / 1e6
    value = mp / dt
    print(json.dumps({
        "metric": "megapixels_per_sec_gan_sr_jpeg_batch",
        "value": round(value, 4), "unit": "MP/s",
        # no comparable published number for the lightweight GAN-SR
        # decode+tile pipeline; the A100 estimate covers SwinIR-M only
        "vs_baseline": None}))
    print(f"# {n_imgs}x{size}x{size} JPEG q40 batch, decode+SRx4, "
          f"best={dt:.3f}s", file=sys.stderr)


def bench_agent_p50(args, fast: bool = True):
    """BASELINE config #5: p50 end-to-end agent restore latency
    (classifier -> plan -> chained tools).

    ``fast=True``: hermetic tiny models on 192px inputs (CI-runnable).
    ``fast=False``: the REAL zoo at full registry sizes (random-init —
    latency does not need converted weights) on a 512px input; this is the
    honest BASELINE #5 number (reference: the per-tool seconds-to-minutes
    subprocess chain, AgenticIR/executor/tool.py:40-49).
    """
    import tempfile
    from pathlib import Path

    enable_compile_cache()
    from image_restoration_agent_tpu.agent import (IRAgent,
                                                   build_default_executor)
    from image_restoration_agent_tpu.core.io import save_image

    size = 192 if fast else 512
    rng = np.random.default_rng(0)
    times = []
    ex = build_default_executor(fast=fast)
    warmup = 2  # shape-bucket compiles amortize across a serving lifetime
    n_runs = max(args.repeats, 5) + warmup
    with tempfile.TemporaryDirectory() as td:
        for i in range(n_runs):
            img = rng.random((size, size, 3), dtype=np.float32) * 0.6
            inp = Path(td) / f"in_{i}.png"
            save_image(img, inp)
            t0 = time.perf_counter()
            agent = IRAgent(inp, Path(td) / f"work_{i}", executor=ex,
                            silent=True)
            agent.run()
            if i >= warmup:
                times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "agent_restore_latency_p50" + ("" if fast
                                                 else "_fullsize"),
        "value": round(p50, 3), "unit": "s",
        "vs_baseline": None}))
    print(f"# n={len(times)} timed (+{warmup} warmup), "
          f"{'tiny models' if fast else 'full-size zoo (random init)'}, "
          f"{size}px input, min={min(times):.2f}s max={max(times):.2f}s",
          file=sys.stderr)


def bench_diffbir(args):
    """DiffBIR serving preset: seconds/image for the heaviest tool (50-step
    spaced sampler, whole-image; reference
    AgentApp/model_service/super_resolution/DiffBIR/model_serving.py:77-131).
    Random-init weights — sampler latency is weight-independent.

    Input size 256: the agent only routes images to x4 SR when they are
    smaller than 300 px (AgenticIR/pipeline/iragent.py extract_agenda), and
    the reference tool runs whole-image at --sr_scale 4 with no --tiled
    (AgenticIR/executor/super_resolution/__init__.py:34-46), so the
    production canvas is ~1024 px — latent 128x128, 50 UNet+ControlNet
    evaluations, VAE encode/decode with chunked-q attention."""
    enable_compile_cache()
    import jax

    from image_restoration_agent_tpu.engine import Engine

    size = int(args.size.split("x")[1]) if "x" in args.size else 256
    size = min(size, 256)
    eng = Engine(allow_random_init=True)
    rng = np.random.default_rng(0)
    img = rng.random((size, size, 3), dtype=np.float32)
    # warmup/compile
    out = eng.restore_array(img, "diffbir")
    times = []
    for _ in range(max(args.repeats, 3)):
        t0 = time.perf_counter()
        out = eng.restore_array(img, "diffbir")
        times.append(time.perf_counter() - t0)
    del out
    dt = min(times)
    print(json.dumps({
        "metric": "diffbir_seconds_per_image",
        "value": round(dt, 3), "unit": f"s@{size}px",
        "vs_baseline": None}))
    print(f"# DiffBIR 50-step sampler, {size}px input, "
          f"best={dt:.2f}s device={jax.devices()[0].platform}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
