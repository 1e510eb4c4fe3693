"""Evaluate (and optionally promote) a v5 classifier checkpoint.

Companion to train_classifier_v5.py: the trainer snapshots every 1000
steps to <out>_snap, so a run killed mid-way still leaves shippable
params. This script loads any checkpoint directory, runs the same
single-/multi-degradation accuracies plus the texture-free OOD gate, and
with --promote ships it to the v5 path — ONLY if it clears the gates
(exact-severity >= 0.80, tie-aware multi dominant >= 0.87, OOD max level
<= 1 on every texture-free probe; --force overrides). Promotion is
atomic: the candidate is copied next to the shipped path and renamed
over it, so a failed copy can never leave a half-written checkpoint that
SeverityEvaluator.default() would silently prefer over v4.

Usage:
  python scripts/eval_classifier_v5.py [--ckpt PATH] [--eval-n 400]
      [--promote] [--force]
"""
from __future__ import annotations

import argparse
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

REPO = Path(__file__).resolve().parents[1]
SHIP = (REPO / "image_restoration_agent_tpu" / "weights" /
        "degradation_classifier_v5")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=str(SHIP) + "_snap")
    p.add_argument("--eval-n", type=int, default=400)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--p-flat", type=float, default=0.2)
    p.add_argument("--promote", action="store_true")
    p.add_argument("--force", action="store_true",
                   help="promote even if the gates fail")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from image_restoration_agent_tpu.iqa.classifier import (
        DegradationClassifierV5)
    from image_restoration_agent_tpu.train.classifier import (
        evaluate_classifier, evaluate_multi, procedural_corpus)
    from scripts.train_classifier_v5 import ood_gradient_check

    model = DegradationClassifierV5()
    template = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3))))
    with ocp.StandardCheckpointer() as ck:
        params = ck.restore(Path(args.ckpt).resolve(), template)
    print(f"loaded {args.ckpt}", flush=True)

    t0 = time.time()
    eval_corpus = procedural_corpus(24, size=288, seed=1234,
                                    p_flat=args.p_flat)
    acc = evaluate_classifier(params, eval_corpus, n=args.eval_n // 2,
                              size=args.size, model=model)
    print(f"single-degradation: {acc}", flush=True)
    multi = evaluate_multi(params, eval_corpus, n=args.eval_n,
                           size=args.size, model=model, relabel=True)
    print(f"multi-degradation: {multi}", flush=True)
    ood = ood_gradient_check(params, model, size=args.size)
    print(f"OOD gradient check (max levels): {ood} "
          f"({time.time() - t0:.0f}s)", flush=True)

    gates = {
        "per_op_exact>=0.80": multi["per_op_exact"] >= 0.80,
        "dominant>=0.87": multi["dominant"] >= 0.87,
        "ood_max<=1": all(v <= 1 for k, v in ood.items()
                          if k.startswith("_max_")),
    }
    print(f"gates: {gates}", flush=True)

    if args.promote:
        src = Path(args.ckpt).resolve()
        if src == SHIP.resolve():
            raise SystemExit("refusing: --ckpt is the shipped path")
        failed = [k for k, ok in gates.items() if not ok]
        if failed and not args.force:
            raise SystemExit(f"refusing to promote (gates failed: "
                             f"{failed}); pass --force to override")
        tmp = SHIP.parent / (SHIP.name + ".promote_tmp")
        if tmp.exists():
            shutil.rmtree(tmp)
        shutil.copytree(src, tmp)
        if SHIP.exists():
            old = SHIP.parent / (SHIP.name + ".old")
            if old.exists():
                shutil.rmtree(old)
            SHIP.rename(old)
            tmp.rename(SHIP)
            shutil.rmtree(old)
        else:
            tmp.rename(SHIP)
        print(f"promoted {args.ckpt} -> {SHIP}", flush=True)


if __name__ == "__main__":
    main()
