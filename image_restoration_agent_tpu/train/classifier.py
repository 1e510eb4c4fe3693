"""Degradation-classifier training (the DepictQA fine-tune analog).

The reference teaches a 7B VLM to rate degradation severity with DeepSpeed
(DepictQA/src/train.py, experiments/agenticir/). Here the evaluator is the
small on-TPU classifier (iqa/classifier.py); its training data comes
straight from the degradation synthesizer with severity labels derived from
the synthesis parameters, so the whole loop is self-contained:

    severity level l in {0..4} maps to parameter strength buckets per op
    (e.g. gaussian sigma 0/12/25/37/50 for "noise").

``train_classifier`` runs a jitted multi-head cross-entropy loop and returns
params usable by SeverityEvaluator / LocalEvaluator.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import degrade as D
from ..iqa.classifier import (DEGRADATIONS, DegradationClassifier,
                              SEVERITY_LEVELS, prepare_input)

#: severity level -> synthesis args per degradation (index = level 1..4;
#: level 0 = clean).
_LEVEL_ARGS = {
    "noise": [None, 10, 20, 35, 50],                      # gaussian sigma
    "jpeg compression artifact": [None, 60, 35, 20, 10],  # quality factor
    "dark": [None, 20, 35, 45, 60],                       # constant shift
    "motion blur": [None, 0, 1, 2, 2],                    # severity idx
    "defocus blur": [None, 0, 1, 2, 2],
    "haze": [None, (0.75, 0.6), (0.85, 1.0), (0.95, 1.4), (1.0, 1.8)],
    "rain": [None, 55, 70, 85, 99],                       # value
    "low resolution": [None, None, None, None, None],     # handled by size
}


def synthesize_example(img: np.ndarray, rng: np.random.Generator,
                       relabel: bool = False):
    """Apply one random degradation at a random level; returns
    (degraded image, labels (8,) with the chosen op at its level and all
    others at level 0). Same RNG draw order as v1-v4."""
    name = rng.choice([d for d in DEGRADATIONS if d != "low resolution"])
    level = int(rng.integers(1, 5))
    return _apply_one(img, name, level, rng, relabel=relabel)


def example_stream(hq_images: list[np.ndarray], batch: int, seed: int = 0,
                   size: int = 224):
    rng = np.random.default_rng(seed)
    while True:
        xs, ys = [], []
        for _ in range(batch):
            img = hq_images[rng.integers(len(hq_images))]
            lq, labels = synthesize_example(img, rng)
            xs.append(prepare_input(lq.astype(np.float32) / 255.0, size))
            ys.append(labels)
        yield np.stack(xs), np.stack(ys)


def train_classifier(hq_images: list[np.ndarray], steps: int = 300,
                     batch: int = 8, lr: float = 3e-4, seed: int = 0,
                     size: int = 224,
                     model: Optional[DegradationClassifier] = None):
    """Returns (params, losses). Multi-head 5-way cross entropy."""
    model = model or DegradationClassifier()
    tx = optax.adam(lr)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, size, size, 3)))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)  # (B, 8, 5)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, len(SEVERITY_LEVELS)),
                y.reshape(-1)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    stream = example_stream(hq_images, batch, seed, size)
    for i in range(steps):
        x, y = next(stream)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x),
                                       jnp.asarray(y))
        losses.append(float(loss))
    return params, losses


def evaluate_classifier(params, hq_images: list[np.ndarray], n: int = 64,
                        seed: int = 1, size: int = 224,
                        model: Optional[DegradationClassifier] = None):
    """Accuracy of (a) which degradation is dominant, (b) exact severity of
    the degraded op (reference DepictQA eval scripts' single-distortion
    accuracy)."""
    model = model or DegradationClassifier()
    rng = np.random.default_rng(seed)
    apply = jax.jit(model.apply)
    which_ok = level_ok = 0
    for _ in range(n):
        img = hq_images[rng.integers(len(hq_images))]
        lq, labels = synthesize_example(img, rng)
        logits = np.asarray(apply(
            params, jnp.asarray(prepare_input(
                lq.astype(np.float32) / 255.0, size))[None]))[0]
        pred_levels = logits.argmax(-1)
        true_idx = int(labels.argmax())
        which_ok += int(pred_levels.argmax() == true_idx)
        level_ok += int(pred_levels[true_idx] == labels[true_idx])
    return {"dominant_acc": which_ok / n, "severity_acc": level_ok / n}


def synthesize_multi(img: np.ndarray, rng: np.random.Generator,
                     max_ops: int = 3, relabel: bool = False):
    """Compose 1..max_ops distinct degradations in random order (the
    agent's real inputs carry 2-3 — dataset/degradations.txt combos);
    labels carry each applied op's level.

    ``relabel`` (v5): cap each op's label by its OBSERVABLE pixel effect —
    e.g. blur or JPEG applied to a texture-free gradient changes nothing a
    viewer (or restorer) could act on, so teaching the synthesized level
    there is label noise; it also taught v4 to hallucinate heavy blur/JPEG
    on smooth OOD inputs (docs/NEXT_STEPS.md round-3 note)."""
    labels = np.zeros(len(DEGRADATIONS), np.int64)
    k = int(rng.integers(1, max_ops + 1))
    names = list(rng.choice(
        [d for d in DEGRADATIONS if d != "low resolution"], size=k,
        replace=False))
    out = img
    for name in names:
        level = int(rng.integers(1, 5))
        one = np.zeros(len(DEGRADATIONS), np.int64)
        out, one = _apply_one(out, name, level, rng, relabel=relabel)
        labels = np.maximum(labels, one)
    return out, labels


def observable_level(before: np.ndarray, after: np.ndarray,
                     level: int) -> int:
    """Cap a synthesized severity label by the op's observable effect:
    mean |delta| < 0.4/255 is imperceptible (level 0), < 1.2/255 at most
    'low'. Degradations that matter (noise sigma>=10, shift>=20, visible
    haze) sit far above both cut-offs; blur/JPEG on texture-free content
    sits below the first."""
    d = float(np.mean(np.abs(after.astype(np.float32)
                             - before.astype(np.float32))))
    if d < 0.4:
        return 0
    if d < 1.2:
        return min(level, 1)
    return level


def _apply_one(img: np.ndarray, name: str, level: int,
               rng: np.random.Generator, relabel: bool = False):
    labels = np.zeros(len(DEGRADATIONS), np.int64)
    arg = _LEVEL_ARGS[name][level]
    if name == "noise":
        out = D.add_noise(img, "Gaussian", arg=arg, rng=rng)
    elif name == "jpeg compression artifact":
        out = D.add_jpeg_artifacts(img, quality_factor=arg, rng=rng)
    elif name == "dark":
        out = D.darken(img, "constant shift", arg=arg, rng=rng)
    elif name == "motion blur":
        out = D.add_motion_blur(img, severity=arg, rng=rng)
    elif name == "defocus blur":
        out = D.add_defocus_blur(img, severity=arg, rng=rng)
    elif name == "haze":
        a, beta = arg
        out = D.add_haze(img, A=a, beta=beta, rng=rng)
    elif name == "rain":
        out = D.add_rain(img, value=arg, rng=rng)
    else:
        out = img
    if relabel:
        level = observable_level(img, out, level)
    labels[DEGRADATIONS.index(name)] = level
    return out, labels


def procedural_corpus(n: int = 48, size: int = 288,
                      seed: int = 7, p_flat: float = 0.0) -> list[np.ndarray]:
    """Self-contained HQ corpus: multi-octave value-noise textures,
    gradients, and geometric shapes (uint8 RGB). Rich enough in edges,
    flats, and color structure for the priors and CNN to separate the 8
    degradation signatures.

    ``p_flat`` (v5): fraction of TEXTURE-FREE images (flat colors, linear
    and radial gradients). The v4 corpus had no texture-free regions, so
    the classifier hallucinated heavy blur/JPEG on smooth OOD photos
    (sky, studio backdrops); pair with ``relabel`` so imperceptible ops on
    these images are labeled by their observable effect."""
    rng = np.random.default_rng(seed)
    out = []
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    n_flat = int(round(n * p_flat))
    for i_flat in range(n_flat):
        kind = i_flat % 3
        c0, c1 = rng.random(3), rng.random(3)
        if kind == 0:        # flat color
            img = np.broadcast_to(c0, (size, size, 3)).copy()
        elif kind == 1:      # linear gradient, random direction
            a = rng.random()
            t = (a * yy + (1 - a) * xx)[..., None]
            img = c0 * (1 - t) + c1 * t
        else:                # radial gradient / vignette
            cy, cx = rng.random(2)
            r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            t = np.clip(r / max(float(r.max()), 1e-6), 0, 1)[..., None]
            img = c0 * (1 - t) + c1 * t
        out.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    for _ in range(n - n_flat):
        img = np.zeros((size, size, 3), np.float32)
        # multi-octave smooth noise
        for octave in (4, 8, 16, 32):
            coarse = rng.random((octave, octave, 3)).astype(np.float32)
            idx = (np.linspace(0, octave - 1, size)).astype(np.int64)
            img += coarse[idx][:, idx] / octave * 8
        img /= img.max()
        # gradient wash
        a, b = rng.random(2)
        img = 0.6 * img + 0.4 * (a * yy + (1 - a) * xx)[..., None] \
            * rng.random(3)[None, None]
        # shapes: rectangles + circles with random colors
        for _ in range(int(rng.integers(4, 12))):
            c = rng.random(3)
            x0, y0 = rng.integers(0, size, 2)
            if rng.random() < 0.5:
                w_, h_ = rng.integers(10, size // 2, 2)
                img[y0:y0 + h_, x0:x0 + w_] = \
                    0.3 * img[y0:y0 + h_, x0:x0 + w_] + 0.7 * c
            else:
                r = int(rng.integers(6, size // 4))
                mask = (yy * size - y0) ** 2 + (xx * size - x0) ** 2 < r * r
                img[mask] = 0.3 * img[mask] + 0.7 * c
        # thin lines (rain/blur discriminants need edges)
        for _ in range(int(rng.integers(2, 8))):
            x0 = int(rng.integers(0, size))
            img[:, x0:x0 + 2] = rng.random(3)
        out.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return out


def multi_example_stream(hq_images, batch: int, seed: int = 0,
                         size: int = 224, p_multi: float = 0.5):
    rng = np.random.default_rng(seed)
    while True:
        xs, ys = [], []
        for _ in range(batch):
            img = hq_images[rng.integers(len(hq_images))]
            if rng.random() < p_multi:
                lq, labels = synthesize_multi(img, rng)
            else:
                lq, labels = synthesize_example(img, rng)
            xs.append(prepare_input(lq.astype(np.float32) / 255.0, size))
            ys.append(labels)
        yield np.stack(xs), np.stack(ys)


def train_classifier_v3(hq_images, steps: int = 2000, batch: int = 32,
                        lr: float = 3e-4, seed: int = 0, size: int = 224,
                        p_multi: float = 0.5, model=None,
                        log_every: int = 0):
    """v3 recipe: priors+CNN model, multi-degradation mixing, cosine LR."""
    from ..iqa.classifier import DegradationClassifierV3

    model = model or DegradationClassifierV3()
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, 0.05))
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, size, size, 3)))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, len(SEVERITY_LEVELS)),
                y.reshape(-1)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    stream = multi_example_stream(hq_images, batch, seed, size, p_multi)
    for i in range(steps):
        x, y = next(stream)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x),
                                       jnp.asarray(y))
        losses.append(float(loss))
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}/{steps} loss {np.mean(losses[-50:]):.4f}",
                  flush=True)
    return params, losses


def build_dataset(hq_images, n_examples: int, seed: int = 0,
                  size: int = 224, p_multi: float = 0.5,
                  fast_resize: bool = True, relabel: bool = False):
    """Pre-synthesize a fixed dataset (the per-batch synthesis costs
    ~50 ms/image on one host core — pregeneration keeps the TPU fed).
    ``fast_resize`` uses PIL bicubic on the host instead of the jax
    matlab-resize (which pays device-tunnel latency per item); the mild
    resampling mismatch vs serving is training noise, eval still goes
    through prepare_input."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    xs = np.empty((n_examples, size, size, 3), np.float32)
    ys = np.empty((n_examples, len(DEGRADATIONS)), np.int64)
    for i in range(n_examples):
        img = hq_images[rng.integers(len(hq_images))]
        if rng.random() < p_multi:
            lq, labels = synthesize_multi(img, rng, relabel=relabel)
        else:
            lq, labels = synthesize_example(img, rng, relabel=relabel)
        if fast_resize:
            arr = np.asarray(Image.fromarray(
                np.clip(lq, 0, 255).astype(np.uint8))
                .resize((size, size), Image.BICUBIC), np.float32) / 255.0
            xs[i] = arr
        else:
            xs[i] = prepare_input(lq.astype(np.float32) / 255.0, size)
        ys[i] = labels
    return xs, ys


def evaluate_multi(params, hq_images, n: int = 400, size: int = 224,
                   model=None, seed: int = 5, max_ops: int = 3,
                   relabel: bool = False):
    """Multi-degradation eval with tie-aware dominant accuracy.

    Levels are drawn uniformly from 1..4 per op, so 2-3-op compositions tie
    for the max level in ~25-40% of examples; any max-level op is equally
    "dominant" (the agent may address either first), so tie-credit counts
    pred in the argmax set. The strict number (first-argmax only, the v3
    report's convention) is returned alongside for comparability."""
    from ..iqa.classifier import DegradationClassifierV3

    model = model or DegradationClassifierV3()
    apply = jax.jit(model.apply)
    rng = np.random.default_rng(seed)
    strict = tie = per_op = per_op_exact = per_op_n = 0
    for _ in range(n):
        img = hq_images[rng.integers(len(hq_images))]
        lq, labels = synthesize_multi(img, rng, max_ops=max_ops,
                                      relabel=relabel)
        logits = np.asarray(apply(params, jnp.asarray(
            prepare_input(lq.astype(np.float32) / 255.0, size))[None]))[0]
        pred = logits.argmax(-1)
        dom = int(pred.argmax())
        strict += int(dom == int(labels.argmax()))
        tie += int(labels[dom] == labels.max())
        for i in range(len(labels)):
            if labels[i] > 0:
                per_op_n += 1
                per_op_exact += int(int(pred[i]) == int(labels[i]))
                per_op += int(abs(int(pred[i]) - int(labels[i])) <= 1)
    return {"dominant": tie / n, "dominant_strict": strict / n,
            "per_op_level1": per_op / max(per_op_n, 1),
            "per_op_exact": per_op_exact / max(per_op_n, 1)}


def train_classifier_v3_dataset(xs, ys, steps: int = 2000, batch: int = 32,
                                lr: float = 3e-4, seed: int = 0,
                                model=None, log_every: int = 0,
                                ordinal_smooth: float = 0.0,
                                snapshot_every: int = 0, snapshot_fn=None,
                                coral: bool = False,
                                device_data: bool = False):
    """v3 recipe over a pregenerated dataset (shuffled epochs).

    ``ordinal_smooth`` > 0 (v4) spreads that probability mass onto the two
    adjacent severity levels — severities are ordinal, and the level
    boundaries of the synthesizer's parameter grid are perceptually soft,
    so hard one-hot targets over-penalize off-by-one predictions.

    ``coral`` (v5) trains an ordinal-regression model
    (DegradationClassifierV5) with binary cross-entropy over its 4
    cumulative P(level > k) logits — the CORAL loss; mutually exclusive
    with ``ordinal_smooth``.

    ``snapshot_fn(params, step)`` is called every ``snapshot_every`` steps
    so multi-hour runs survive being killed: the caller can persist the
    latest params and resume/ship from the snapshot.

    ``device_data`` keeps the WHOLE uint8 dataset resident in device HBM
    and runs steps in jitted ``lax.scan`` chunks with on-device batch
    sampling (uniform with replacement). Over the remote-device tunnel
    this is the difference between ~1.4 s/step (9.6 MB batch transfer +
    dispatch round-trip per step — the round-4 run died of it at step
    500/9000) and pure-compute steps: one 3 GB transfer up front, then
    only scalar losses come back per chunk."""
    from ..iqa.classifier import DegradationClassifierV3

    model = model or DegradationClassifierV3()
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, 0.05))
    size = xs.shape[1]
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, size, size, 3)))
    opt_state = tx.init(params)

    nlev = len(SEVERITY_LEVELS)
    if ordinal_smooth > 0.0:
        dist = np.abs(np.arange(nlev)[None, :] - np.arange(nlev)[:, None])
        tgt = np.where(dist == 0, 1.0 - ordinal_smooth,
                       np.where(dist == 1, ordinal_smooth / 2.0, 0.0))
        # edge rows have one neighbor; renormalize so rows sum to 1
        tgt = tgt / tgt.sum(axis=1, keepdims=True)
        tgt_table = jnp.asarray(tgt, jnp.float32)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            if coral:
                cum = model.apply(p, x, cumulative=True)  # (B, nd, L-1)
                tgt = (y[..., None] > jnp.arange(nlev - 1)) \
                    .astype(jnp.float32)
                return optax.sigmoid_binary_cross_entropy(cum, tgt).mean()
            logits = model.apply(p, x)
            flat = logits.reshape(-1, nlev)
            if ordinal_smooth > 0.0:
                return optax.softmax_cross_entropy(
                    flat, tgt_table[y.reshape(-1)]).mean()
            return optax.softmax_cross_entropy_with_integer_labels(
                flat, y.reshape(-1)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # feed batches as uint8 (4x smaller than f32 over a remote-device
    # link) with one-step prefetch: jax dispatch is async, so the next
    # batch's transfer overlaps the current step's compute
    xs8 = np.clip(xs * 255.0, 0, 255).astype(np.uint8)

    if device_data:
        import functools

        n = xs.shape[0]
        # stream the dataset up in ~64 MB slices with progress: a single
        # multi-GB device_put over the remote-device tunnel wedged twice
        # (no data flowing, process unkillable-by-timeout); small slices
        # localize a stall and keep the tunnel's flow control happy
        row_bytes = int(np.prod(xs8.shape[1:])) * xs8.itemsize
        rows = max(1, int(64e6) // row_bytes)
        parts = []
        for i in range(0, n, rows):
            parts.append(jax.device_put(xs8[i:i + rows]))
            if (i // rows) % 16 == 0:
                jax.block_until_ready(parts[-1])
                print(f"  upload {min(i + rows, n)}/{n} rows", flush=True)
        dx = jnp.concatenate(parts, axis=0)
        del parts
        dy = jax.device_put(ys.astype(np.int32))

        @functools.partial(jax.jit, static_argnums=(5,))
        def run_chunk(params, opt_state, dx, dy, base, n_steps):
            key = jax.random.PRNGKey(seed + 1)

            def body(carry, i):
                params, opt_state = carry
                idx = jax.random.randint(
                    jax.random.fold_in(key, base + i), (batch,), 0, n)
                x = dx[idx].astype(jnp.float32) / 255.0
                params, opt_state, loss = step(params, opt_state, x,
                                               dy[idx])
                return (params, opt_state), loss

            (params, opt_state), chunk_losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n_steps))
            return params, opt_state, chunk_losses

        chunk = log_every or min(500, steps)
        losses = []
        done = 0
        while done < steps:
            c = min(chunk, steps - done)
            params, opt_state, cl = run_chunk(params, opt_state, dx, dy,
                                              jnp.int32(done), c)
            losses.extend(np.asarray(cl).tolist())
            done += c
            if log_every:
                print(f"step {done}/{steps} loss "
                      f"{np.mean(losses[-50:]):.4f}", flush=True)
            if (snapshot_every and snapshot_fn
                    and done % snapshot_every == 0 and done < steps):
                snapshot_fn(params, done)
        return params, losses

    rng = np.random.default_rng(seed)
    n = xs.shape[0]
    order = rng.permutation(n)
    pos = 0

    def next_idx():
        nonlocal order, pos
        if pos + batch > n:
            order = rng.permutation(n)
            pos = 0
        idx = order[pos:pos + batch]
        pos += batch
        return idx

    def put(idx):
        return (jax.device_put(xs8[idx]),
                jax.device_put(ys[idx].astype(np.int32)))

    @jax.jit
    def step8(params, opt_state, x8, y):
        x = x8.astype(jnp.float32) / 255.0
        return step(params, opt_state, x, y)

    losses = []
    pending = put(next_idx())
    for i in range(steps):
        cur = pending
        if i + 1 < steps:
            pending = put(next_idx())
        params, opt_state, loss = step8(params, opt_state, *cur)
        losses.append(float(loss))  # blocks: the step has consumed cur
        # free the batch buffers eagerly — the remote-device (axon tunnel)
        # backend does not release transfer buffers on GC alone, which
        # leaked one ~10MB batch per step (OOM after ~11k steps)
        for a in cur:
            a.delete()
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i + 1}/{steps} loss {np.mean(losses[-50:]):.4f}",
                  flush=True)
        if snapshot_every and snapshot_fn and (i + 1) % snapshot_every == 0:
            snapshot_fn(params, i + 1)
    return params, losses
