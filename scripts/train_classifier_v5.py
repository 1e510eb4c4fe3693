"""Train + evaluate + ship the v5 degradation classifier.

v5 vs v4 (VERDICT r3 #4):
- ORDINAL-REGRESSION severity head (DegradationClassifierV5: per-op scalar
  score vs learned monotone thresholds, CORAL BCE loss) — severity errors
  concentrate on adjacent levels, lifting exact-severity.
- Texture-free corpus slice (p_flat: flats, linear/radial gradients) plus
  OBSERVABLE relabeling (imperceptible ops -> level 0), closing the v4 OOD
  hole where smooth gradients scored heavy blur/JPEG.

Usage: python scripts/train_classifier_v5.py [--steps 12000]
Saves to image_restoration_agent_tpu/weights/degradation_classifier_v5 and
prints single- and multi-degradation accuracies plus the OOD gradient check.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np


def ood_gradient_check(params, model, size: int = 224) -> dict:
    """Smooth clean gradients must score near-zero severity everywhere
    (the v4 failure mode: heavy blur/JPEG on texture-free inputs)."""
    import jax
    import jax.numpy as jnp

    from image_restoration_agent_tpu.iqa.classifier import (
        DEGRADATIONS, prepare_input)

    apply = jax.jit(model.apply)
    worst = {}
    yy, xx = np.mgrid[0:288, 0:288].astype(np.float32) / 288
    for name, img in (
            ("linear", np.stack([0.2 + 0.6 * xx, 0.3 + 0.5 * yy,
                                 np.full_like(xx, 0.55)], -1)),
            ("radial", np.stack([np.clip(1.2 - np.hypot(yy - .5, xx - .5),
                                         0, 1)] * 3, -1) * 0.7),
            ("flat", np.full((288, 288, 3), 0.42, np.float32))):
        lg = np.asarray(apply(params, jnp.asarray(
            prepare_input(img, size))[None]))[0]
        lev = lg.argmax(-1)
        for i, d in enumerate(DEGRADATIONS):
            worst[d] = max(worst.get(d, 0), int(lev[i]))
        worst[f"_max_{name}"] = int(lev.max())
    return worst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--corpus", type=int, default=288)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--eval-n", type=int, default=400)
    p.add_argument("--n-examples", type=int, default=32000)
    p.add_argument("--p-multi", type=float, default=0.75)
    p.add_argument("--p-flat", type=float, default=0.2)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--arch", choices=["coral", "softmax"], default="coral",
                   help="coral = ordinal-regression head "
                        "(DegradationClassifierV5); softmax = the v4 "
                        "recipe (V3 arch + ordinal label smoothing) on "
                        "the texture-free corpus — measured stronger on "
                        "per-op exact severity (see NEXT_STEPS round-5)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    from image_restoration_agent_tpu.convert.torch_import import \
        save_as_orbax
    from image_restoration_agent_tpu.iqa.classifier import (
        DegradationClassifierV3, DegradationClassifierV5)
    from image_restoration_agent_tpu.train.classifier import (
        build_dataset, evaluate_classifier, evaluate_multi,
        procedural_corpus, train_classifier_v3_dataset)

    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    corpus = procedural_corpus(args.corpus, size=288, p_flat=args.p_flat)
    print(f"corpus {len(corpus)} images ({args.p_flat:.0%} texture-free) "
          f"in {time.time() - t0:.1f}s", flush=True)

    coral = args.arch == "coral"
    model = DegradationClassifierV5() if coral else DegradationClassifierV3()
    cache = (f"/tmp/clf_ds_v5_{args.n_examples}_{args.size}_"
             f"{args.p_multi}_{args.p_flat}_{args.corpus}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        xs, ys = d["xs"], d["ys"]
    else:
        xs, ys = build_dataset(corpus, args.n_examples, size=args.size,
                               p_multi=args.p_multi, relabel=True)
        np.savez(cache, xs=xs, ys=ys)
    print(f"dataset {xs.shape} in {time.time() - t0:.1f}s", flush=True)

    out = args.out or ("image_restoration_agent_tpu/weights/"
                       "degradation_classifier_v5")

    def write_arch_marker(path):
        Path(path + ".arch").write_text(args.arch + "\n")

    def snapshot(p_, step_i):
        save_as_orbax(p_, out + "_snap")
        write_arch_marker(out + "_snap")
        print(f"snapshot at step {step_i} -> {out}_snap", flush=True)

    params, losses = train_classifier_v3_dataset(
        xs, ys, steps=args.steps, batch=args.batch, lr=args.lr,
        model=model, log_every=500, coral=coral,
        ordinal_smooth=0.0 if coral else 0.1,
        snapshot_every=1000, snapshot_fn=snapshot, device_data=True)
    print(f"final loss {np.mean(losses[-50:]):.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    eval_corpus = procedural_corpus(24, size=288, seed=1234,
                                    p_flat=args.p_flat)
    acc = evaluate_classifier(params, eval_corpus, n=args.eval_n // 2,
                              size=args.size, model=model)
    print(f"single-degradation: {acc}", flush=True)
    multi = evaluate_multi(params, eval_corpus, n=args.eval_n,
                           size=args.size, model=model, relabel=True)
    print(f"multi-degradation: {multi}", flush=True)
    ood = ood_gradient_check(params, model, size=args.size)
    print(f"OOD gradient check (max levels): {ood}", flush=True)

    # NEVER the shipped path: promotion goes through eval_classifier_v5.py
    # --promote, which enforces the accuracy/OOD gates (ADVICE r4).
    save_as_orbax(params, out + "_final")
    write_arch_marker(out + "_final")
    print(f"saved {out}_final (gate + promote via "
          f"scripts/eval_classifier_v5.py)", flush=True)


if __name__ == "__main__":
    main()
