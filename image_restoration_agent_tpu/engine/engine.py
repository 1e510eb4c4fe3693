"""Single-process multi-model restoration engine.

Replaces the reference's 26 Flask services + curl contracts
(AgentApp/model_service/*, model_services.yaml) with one process holding a
model registry, a weight store with HBM-LRU residency, and jit caches keyed
by (model, static pipeline config, bucketed shape) so repeated requests hit
compiled programs.

Shape bucketing: arbitrary request sizes are padded up to the model's pad
multiple and then to a bucket grid (default 128px) before tiling, bounding
the number of distinct compiled programs (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.io import load_image, save_image, to_float, to_uint8
from ..core.tiling import tiled_apply
from ..models import build_model
from ..models.registry import MODEL_REGISTRY, ModelSpec, get_spec
from .weights import WeightStore


@dataclasses.dataclass
class RestorationResult:
    image: np.ndarray          # uint8 RGB
    model: str
    seconds: float
    input_shape: tuple
    output_shape: tuple
    random_init: bool = False  # True if the model ran with unloaded weights


def device_hbm_budget(reserve_fraction: float = 0.3,
                      fallback: int = 12 * 1024 ** 3) -> int:
    """Weight-residency budget derived from the serving device itself.

    The reference polls live GPU utilization before deciding to evict
    (AgentApp/utils/GPUServiceManager.py:24-72); the TPU analog reads the
    device's memory stats at engine construction and budgets weights at
    (1 - reserve_fraction) of HBM — the reserve covers compiled programs
    and activation working sets. Falls back to a 12 GiB constant when the
    backend exposes no stats (CPU test meshes)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or \
            stats.get("bytes_reservable_limit")
        if limit:
            in_use = stats.get("bytes_in_use", 0)
            usable = int(limit * (1.0 - reserve_fraction)) - int(in_use)
            return max(usable, 1024 ** 3)
    except Exception:  # backend without memory_stats
        pass
    return fallback


def _bucket(size: int, bucket: int, multiple: int) -> int:
    """Round up to the bucket grid, keeping the model's pad multiple."""
    b = max(bucket, multiple)
    b = b - (b % multiple) if b % multiple else b
    return -(-size // b) * b


class Engine:
    """In-process serving runtime for the whole model zoo."""

    def __init__(
        self,
        weight_dir: Optional[Path] = None,
        hbm_budget_bytes: Optional[int] = None,  # None: size from device
        param_dtype: Any = jnp.float32,
        shape_bucket: int = 128,
        default_batch: int = 4,
        allow_random_init: Optional[bool] = None,
    ):
        self.weight_dir = Path(weight_dir) if weight_dir else None
        self.param_dtype = param_dtype
        self.shape_bucket = shape_bucket
        self.default_batch = default_batch
        # Random-init fallback policy: allowed by default only when the
        # engine was explicitly built without a weight_dir (hermetic/test
        # use); with a weight_dir, a missing checkpoint raises unless the
        # caller opts in — a typo'd path must not silently serve garbage.
        self.allow_random_init = (self.weight_dir is None
                                  if allow_random_init is None
                                  else allow_random_init)
        self.random_init_models: set[str] = set()
        self.store = WeightStore(
            self._load_params,
            device_hbm_budget() if hbm_budget_bytes is None
            else hbm_budget_bytes)
        self._jit_cache: dict[tuple, Callable] = {}
        self.call_log: list[dict] = []

    # ---------------- weights ----------------

    def _load_params(self, name: str):
        """Load params: orbax checkpoint if available, else deterministic
        random init (keeps the engine usable without released weights)."""
        spec = get_spec(name)
        model = build_model(name)
        if self.weight_dir is not None:
            ckpt = self.weight_dir / name
            if ckpt.exists():
                import orbax.checkpoint as ocp

                with ocp.StandardCheckpointer() as ckptr:
                    sample = jnp.zeros((1, 64, 64, 3), self.param_dtype)
                    template = jax.eval_shape(
                        lambda: model.init(jax.random.PRNGKey(0), sample))
                    params = ckptr.restore(ckpt.resolve(), template)
                return params
        if not self.allow_random_init:
            raise FileNotFoundError(
                f"no checkpoint for model '{name}' under {self.weight_dir}; "
                "pass allow_random_init=True to serve with random weights")
        import logging

        logging.getLogger(__name__).warning(
            "model '%s': no checkpoint found%s — serving RANDOM-INIT weights "
            "(outputs are garbage; for tests/dryruns only)", name,
            f" under {self.weight_dir}" if self.weight_dir else
            " (no weight_dir configured)")
        self.random_init_models.add(name)
        tile = spec.tile or 64
        sample = jnp.zeros((1, min(tile, 64), min(tile, 64), 3))
        params = model.init(jax.random.PRNGKey(0), sample)
        if self.param_dtype != jnp.float32:
            params = jax.tree.map(
                lambda x: x.astype(self.param_dtype)
                if x.dtype == jnp.float32 else x, params)
        return params

    # ---------------- inference ----------------

    def _pipeline(self, name: str, h: int, w: int,
                  tile: Optional[int], overlap: int, batch: int,
                  ensemble_times: int = 0):
        key = (name, h, w, tile, overlap, batch, ensemble_times)
        fn = self._jit_cache.get(key)
        if fn is None:
            spec = get_spec(name)
            # whole-canvas band serving (see ModelSpec.band_mode): full-
            # width row bands with packed-RGB SR output; the ensemble path
            # keeps the plain layout (it rotates the output canvas)
            band = (tile is None and spec.band_mode
                    and not ensemble_times)
            pad_to = band_tile = None
            packed_c = 1
            if band:
                from ..ops.pallas_attention import pad_width_for_strips

                ph = -(-h // spec.pad_multiple) * spec.pad_multiple
                pw = pad_width_for_strips(w)
                ov = 16
                n_bands = max(2, -(-(ph * pw) // 1_100_000))
                bh = -(-(ph + (n_bands - 1) * ov) // n_bands // 8) * 8
                pad_to, band_tile, overlap, batch = (ph, pw), (bh, pw), ov, 1
                packed_c = 3 if spec.scale > 1 else 1
            model = build_model(name, **(
                {"packed_output": True} if packed_c > 1 else {}))

            def fwd(params, batch_tiles):
                x = batch_tiles.astype(self.param_dtype)
                return model.apply(params, x).astype(jnp.float32)

            pad_multiple = spec.pad_multiple if tile is not None \
                else max(spec.pad_multiple, spec.whole_pad_multiple)

            def one(params, img):
                return tiled_apply(
                    lambda b: fwd(params, b), img,
                    tile=band_tile if band else tile,
                    overlap=overlap, scale=spec.scale, batch=batch,
                    pad_multiple=pad_multiple, pad_mode=spec.pad_mode,
                    pad_kind=spec.pad_kind, pad_to=pad_to,
                    packed_c=packed_c)

            def pipeline(params, img):
                # geometric self-ensemble x4/x8: average over rotations
                # (+ flips), inverse-transformed back (reference MAXIM
                # serving augment_image/deaugment_image :123-163)
                if not ensemble_times:
                    return one(params, img)
                outs = []
                for k in range(4):
                    outs.append(jnp.rot90(one(params, jnp.rot90(img, k)),
                                          4 - k))
                if ensemble_times == 8:
                    f = jnp.fliplr(img)
                    for k in range(4):
                        outs.append(jnp.fliplr(
                            jnp.rot90(one(params, jnp.rot90(f, k)), 4 - k)))
                return sum(outs) / len(outs)

            fn = (jax.jit(pipeline), packed_c)
            self._jit_cache[key] = fn
        return fn

    def restore_array(self, img: np.ndarray, model_name: str,
                      tile: Optional[int] = "auto",
                      overlap: Optional[int] = None,
                      batch: Optional[int] = None,
                      ensemble: bool = False,
                      ensemble_times: int = 8) -> RestorationResult:
        """Restore a float [0,1] (H, W, 3) array. Pads to the shape-bucket
        grid so arbitrary sizes reuse compiled programs.

        ensemble: geometric self-ensemble (x4 rotations / x8 with flips),
        the reference MAXIM serving's opt-in `geometric_ensemble` flag.
        """
        spec = get_spec(model_name)
        h0, w0 = img.shape[:2]
        if tile == "auto":
            tile = spec.tile
            # whole-image-vs-tile switch (reference RIDCP max_size=1500)
            if tile is None and spec.max_size is not None \
                    and max(h0, w0) > spec.max_size:
                tile = spec.fallback_tile
                if overlap is None:
                    overlap = 16  # reference test_tile tile_pad
        if overlap is None:
            overlap = spec.tile_overlap

        t0 = time.perf_counter()
        hb = _bucket(h0, self.shape_bucket, spec.pad_multiple)
        wb = _bucket(w0, self.shape_bucket, spec.pad_multiple)
        if batch is None:
            batch = self.default_batch
            if tile is not None and min(hb, wb) > tile:
                # zero-waste tile batching: the tile batch pads to a
                # multiple of `batch` — pick 1..8 minimizing pad tiles
                # for this bucketed grid (ties -> larger; +4% measured
                # on the 2K SR headline)
                from ..core.tiling import plan_tiles
                n_tiles = plan_tiles(max(hb, tile), max(wb, tile),
                                     tile, overlap).num_tiles
                batch = min(range(1, 9),
                            key=lambda b: ((-n_tiles) % b, -b))
        if (hb, wb) != (h0, w0):
            pad_kind = "symmetric" if min(h0, w0) >= max(hb - h0, wb - w0) \
                else "edge"
            img = np.pad(img, ((0, hb - h0), (0, wb - w0), (0, 0)),
                         mode=pad_kind)

        params = self.store.get(model_name)
        fn, packed_c = self._pipeline(model_name, hb, wb, tile, overlap,
                                      batch, ensemble_times if ensemble
                                      else 0)
        out = fn(params, jnp.asarray(img, jnp.float32))
        out = np.asarray(jax.device_get(out))
        if packed_c > 1:  # packed-RGB: free row-major view back to NHWC
            out = out.reshape(out.shape[0], out.shape[1] // packed_c,
                              packed_c)
        out = out[: h0 * spec.scale, : w0 * spec.scale]
        out = np.clip(out, 0.0, 1.0)
        dt = time.perf_counter() - t0
        self.call_log.append({"model": model_name, "h": h0, "w": w0,
                              "seconds": dt})
        return RestorationResult(
            image=to_uint8(out), model=model_name, seconds=dt,
            input_shape=(h0, w0), output_shape=out.shape[:2],
            random_init=model_name in self.random_init_models)

    def warmup(self, models: list[str], sizes: list[tuple[int, int]],
               ensemble: bool = False) -> list[dict]:
        """Precompile the serving pipelines for a deployment's expected
        shape buckets so first-request latency is bounded (the reference
        pre-launches every model service before traffic, AgentApp/
        test_env.sh; without this the first full-size request can pay
        hundreds of seconds of fresh XLA compiles).

        Walks each (model, HxW) through the REAL restore path on a zero
        image — exercising bucketing, band planning, and the jit cache —
        and reports per-entry wall seconds plus whether a new pipeline was
        compiled. Combine with a persistent compilation cache (CLI warmup
        enables one) to amortize across process restarts."""
        records = []
        for name in models:
            for h, w in sizes:
                n0 = len(self._jit_cache)
                t0 = time.perf_counter()
                self.restore_array(np.zeros((h, w, 3), np.float32), name,
                                   ensemble=ensemble)
                records.append({
                    "model": name, "h": h, "w": w,
                    "seconds": round(time.perf_counter() - t0, 3),
                    "compiled": len(self._jit_cache) > n0,
                    "random_init": name in self.random_init_models})
        return records

    def restore_file(self, input_path: str | Path, output_path: str | Path,
                     model_name: str, **kw) -> RestorationResult:
        img = to_float(load_image(input_path))
        res = self.restore_array(img, model_name, **kw)
        save_image(res.image, output_path)
        return res

    # ---------------- observability ----------------

    def profile(self, log_dir: str | Path):
        """jax.profiler trace context around engine calls
        (SURVEY.md §5.1: the reference has only wall-clock prints)."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            jax.profiler.start_trace(str(log_dir))
            try:
                yield self
            finally:
                jax.profiler.stop_trace()

        return _ctx()

    def status(self) -> dict:
        """Engine health snapshot (reference: /health endpoints +
        GPUServiceManager.get_service_status)."""
        budget = self.store.budget_bytes
        pressure = self.store.resident_bytes / budget if budget else 0.0
        if pressure > 0.9 or self.store.evictions:
            import logging

            logging.getLogger("engine").warning(
                "HBM eviction pressure: %.0f%% of %.1f GiB weight budget "
                "resident, %d evictions so far", pressure * 100,
                budget / 1024 ** 3, len(self.store.evictions))
        return {
            "device": jax.devices()[0].platform,
            "models_registered": len(MODEL_REGISTRY),
            "models_resident": self.store.resident,
            "resident_bytes": self.store.resident_bytes,
            "hbm_budget_bytes": budget,
            "hbm_pressure": round(pressure, 4),
            "evictions": list(self.store.evictions),
            "compiled_pipelines": len(self._jit_cache),
            "calls": len(self.call_log),
            "random_init_models": sorted(self.random_init_models),
        }
