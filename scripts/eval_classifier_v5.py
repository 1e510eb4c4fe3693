"""Evaluate (and optionally promote) a v5 classifier checkpoint.

Companion to train_classifier_v5.py: the trainer snapshots every 1000
steps to <out>_snap, so a run killed mid-way still leaves shippable
params. This script loads any checkpoint directory (arch read from the
sibling ``<ckpt>.arch`` marker, or ``--arch``), runs the single-/multi-
degradation accuracies plus the texture-free OOD gate, and with
``--promote`` ships it to the v5 path.

Promotion gates (round-5 recalibration): the round-4 absolute thresholds
(exact >= 0.80, dominant >= 0.87) were calibrated on the OLD corpus;
on the v5 corpus (20% texture-free slice + observable relabeling) the
shipped v4 itself measures dominant 0.7325 / per-op exact 0.5495, so
those absolutes are unreachable by construction. The gate is therefore
SELF-CALIBRATING: the candidate and the shipped v4 are evaluated on the
IDENTICAL corpus in the same run, and promotion requires the candidate
to (a) beat-or-match v4 on multi dominant, per-op exact, and per-op
within-1, and (b) pass the texture-free OOD probe (max predicted level
<= 1 on flats/gradients — v4's known hallucination). ``--force``
overrides. Promotion is atomic (copy + rename) and the arch marker
ships with it so ``SeverityEvaluator.default()`` builds the right model.

Usage:
  python scripts/eval_classifier_v5.py [--ckpt PATH] [--eval-n 400]
      [--arch coral|softmax] [--promote] [--force]
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
V4 = SHIP.parent / "degradation_classifier_v4"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=str(SHIP) + "_snap")
    p.add_argument("--arch", choices=["coral", "softmax"], default=None,
                   help="candidate head arch; default: read <ckpt>.arch")
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
        DegradationClassifierV3, DegradationClassifierV5)
    from image_restoration_agent_tpu.train.classifier import (
        evaluate_classifier, evaluate_multi, procedural_corpus)
    from scripts.train_classifier_v5 import ood_gradient_check

    arch = args.arch
    marker = Path(str(args.ckpt) + ".arch")
    if arch is None:
        arch = marker.read_text().strip() if marker.exists() else "coral"
    model = (DegradationClassifierV5() if arch == "coral"
             else DegradationClassifierV3())

    def load(path, mdl):
        template = jax.eval_shape(lambda: mdl.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.size, args.size, 3))))
        with ocp.StandardCheckpointer() as ck:
            return ck.restore(Path(path).resolve(), template)

    params = load(args.ckpt, model)
    print(f"loaded {args.ckpt} (arch={arch})", flush=True)

    t0 = time.time()
    eval_corpus = procedural_corpus(24, size=288, seed=1234,
                                    p_flat=args.p_flat)

    def measure(name, prm, mdl):
        acc = evaluate_classifier(prm, eval_corpus, n=args.eval_n // 2,
                                  size=args.size, model=mdl)
        multi = evaluate_multi(prm, eval_corpus, n=args.eval_n,
                               size=args.size, model=mdl, relabel=True)
        print(f"{name} single: {acc}", flush=True)
        print(f"{name} multi:  {multi}", flush=True)
        return multi

    multi = measure("candidate", params, model)
    ood = ood_gradient_check(params, model, size=args.size)
    print(f"candidate OOD (max levels): {ood} "
          f"({time.time() - t0:.0f}s)", flush=True)

    # the self-calibrating baseline: shipped v4 on the SAME corpus
    v4_multi = measure("v4-baseline",
                       load(V4, DegradationClassifierV3()),
                       DegradationClassifierV3())

    gates = {
        "dominant>=v4": multi["dominant"] >= v4_multi["dominant"],
        "per_op_exact>=v4":
            multi["per_op_exact"] >= v4_multi["per_op_exact"],
        "per_op_level1>=v4":
            multi["per_op_level1"] >= v4_multi["per_op_level1"],
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
        Path(str(SHIP) + ".arch").write_text(arch + "\n")
        print(f"promoted {args.ckpt} -> {SHIP} (arch={arch})", flush=True)


if __name__ == "__main__":
    main()
