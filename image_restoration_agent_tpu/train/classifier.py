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


def synthesize_example(img: np.ndarray, rng: np.random.Generator):
    """Apply one random degradation at a random level; returns
    (degraded image, labels (8,) with the chosen op at its level and all
    others at level 0)."""
    labels = np.zeros(len(DEGRADATIONS), np.int64)
    name = rng.choice([d for d in DEGRADATIONS if d != "low resolution"])
    level = int(rng.integers(1, 5))
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
    labels[DEGRADATIONS.index(name)] = level
    return out, labels


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
