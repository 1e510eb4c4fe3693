"""Train + evaluate + ship the v4 degradation classifier.

v4 vs v3: multi-degradation-first curriculum (p_multi 0.75 — the agent's
real inputs are 2-3-op compositions, dataset/degradations.txt combos),
ordinal label smoothing, larger dataset, and a tie-aware dominant metric
(any op at the max severity level is equally dominant; ~25-40% of 2-3-op
compositions tie, so the v3 first-argmax convention under-reported).

Usage: python scripts/train_classifier_v4.py [--steps 12000]
Saves to image_restoration_agent_tpu/weights/degradation_classifier_v4 and
prints single- and multi-degradation accuracies (strict + tie-aware).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--corpus", type=int, default=256)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--eval-n", type=int, default=400)
    p.add_argument("--n-examples", type=int, default=32000)
    p.add_argument("--p-multi", type=float, default=0.75)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--ordinal-smooth", type=float, default=0.1)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    from image_restoration_agent_tpu.convert.torch_import import \
        save_as_orbax
    from image_restoration_agent_tpu.iqa.classifier import (
        DegradationClassifierV3)
    from image_restoration_agent_tpu.train.classifier import (
        build_dataset, evaluate_classifier, evaluate_multi,
        procedural_corpus, train_classifier_v3_dataset)

    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    corpus = procedural_corpus(args.corpus, size=288)
    print(f"corpus {len(corpus)} images in {time.time() - t0:.1f}s",
          flush=True)

    model = DegradationClassifierV3()
    cache = (f"/tmp/clf_ds_v4_{args.n_examples}_{args.size}_"
             f"{args.p_multi}_{args.corpus}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        xs, ys = d["xs"], d["ys"]
    else:
        xs, ys = build_dataset(corpus, args.n_examples, size=args.size,
                               p_multi=args.p_multi)
        np.savez(cache, xs=xs, ys=ys)
    print(f"dataset {xs.shape} in {time.time() - t0:.1f}s", flush=True)

    out = args.out or ("image_restoration_agent_tpu/weights/"
                       "degradation_classifier_v4")

    def snapshot(p, step_i):
        save_as_orbax(p, out + "_snap")
        print(f"snapshot at step {step_i} -> {out}_snap", flush=True)

    params, losses = train_classifier_v3_dataset(
        xs, ys, steps=args.steps, batch=args.batch, lr=args.lr,
        model=model, log_every=500, ordinal_smooth=args.ordinal_smooth,
        snapshot_every=1000, snapshot_fn=snapshot)
    print(f"final loss {np.mean(losses[-50:]):.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    eval_corpus = procedural_corpus(24, size=288, seed=1234)
    acc = evaluate_classifier(params, eval_corpus, n=args.eval_n // 2,
                              size=args.size, model=model)
    print(f"single-degradation: {acc}", flush=True)
    multi = evaluate_multi(params, eval_corpus, n=args.eval_n,
                           size=args.size, model=model)
    print(f"multi-degradation: {multi}", flush=True)

    save_as_orbax(params, out)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
