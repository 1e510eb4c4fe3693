"""Train + evaluate + ship the v3 degradation classifier.

Usage: python scripts/train_classifier_v3.py [--steps 1500] [--batch 32]
Saves to image_restoration_agent_tpu/weights/degradation_classifier_v3 and
prints single- and multi-degradation accuracies.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--corpus", type=int, default=64)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--eval-n", type=int, default=200)
    p.add_argument("--n-examples", type=int, default=12000)
    p.add_argument("--p-multi", type=float, default=0.35)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    from image_restoration_agent_tpu.convert.torch_import import \
        save_as_orbax
    from image_restoration_agent_tpu.iqa.classifier import (
        DegradationClassifierV3)
    from image_restoration_agent_tpu.train.classifier import (
        build_dataset, evaluate_classifier, procedural_corpus,
        synthesize_multi, train_classifier_v3_dataset)

    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    corpus = procedural_corpus(args.corpus, size=288)
    print(f"corpus {len(corpus)} images in {time.time() - t0:.1f}s",
          flush=True)

    model = DegradationClassifierV3()
    import os
    cache = f"/tmp/clf_ds_{args.n_examples}_{args.size}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        xs, ys = d["xs"], d["ys"]
    else:
        xs, ys = build_dataset(corpus, args.n_examples, size=args.size,
                               p_multi=args.p_multi)
        np.savez(cache, xs=xs, ys=ys)
    print(f"dataset {xs.shape} in {time.time() - t0:.1f}s", flush=True)
    params, losses = train_classifier_v3_dataset(
        xs, ys, steps=args.steps, batch=args.batch, lr=args.lr,
        model=model, log_every=200)
    print(f"final loss {np.mean(losses[-50:]):.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # held-out corpus for eval
    eval_corpus = procedural_corpus(24, size=288, seed=1234)
    acc = evaluate_classifier(params, eval_corpus, n=args.eval_n,
                              size=args.size, model=model)
    print(f"single-degradation: {acc}", flush=True)

    # multi-degradation dominant accuracy
    import jax.numpy as jnp

    from image_restoration_agent_tpu.iqa.classifier import prepare_input
    rng = np.random.default_rng(5)
    apply = jax.jit(model.apply)
    dom_ok = per_op = per_op_n = 0
    for _ in range(args.eval_n):
        img = eval_corpus[rng.integers(len(eval_corpus))]
        lq, labels = synthesize_multi(img, rng)
        logits = np.asarray(apply(params, jnp.asarray(
            prepare_input(lq.astype(np.float32) / 255.0, args.size))[None]
        ))[0]
        pred = logits.argmax(-1)
        dom_ok += int(pred.argmax() == labels.argmax())
        for i in range(len(labels)):
            if labels[i] > 0:
                per_op_n += 1
                per_op += int(abs(int(pred[i]) - int(labels[i])) <= 1)
    print(f"multi-degradation: dominant {dom_ok / args.eval_n:.3f}, "
          f"per-op level±1 {per_op / max(per_op_n, 1):.3f}", flush=True)

    out = args.out or ("image_restoration_agent_tpu/weights/"
                       "degradation_classifier_v3")
    save_as_orbax(params, out)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
