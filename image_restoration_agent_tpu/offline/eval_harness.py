"""Batch evaluation harness.

Rebuild of AgenticIR/eval/compute_scores.py (batch metric scoring vs HQ
ground truth) and eval/compare_methods.py (method comparison tables with
win rates and ablation grids), with markdown output.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from ..iqa.scorer import Scorer


def compute_scores(result_dir: Path, gt_dir: Path,
                   out_path: Optional[Path] = None,
                   metrics=("psnr", "ssim")) -> dict:
    """Score every result image against its same-named ground truth."""
    scorer = Scorer(tuple(metrics))
    result_dir, gt_dir = Path(result_dir), Path(gt_dir)
    pairs = [(res, gt_dir / res.name)
             for res in sorted(result_dir.glob("*.png"))
             if (gt_dir / res.name).exists()]
    # decode through the native-codec thread pool (GIL-free inflate)
    from ..core.decode_pool import default_pool
    pool = default_pool()
    res_arrs = pool.load_many([p[0] for p in pairs], as_float=True)
    gt_arrs = pool.load_many([p[1] for p in pairs], as_float=True)
    scores = {}
    for (res, _), ra, ga in zip(pairs, res_arrs, gt_arrs):
        scores[res.name] = scorer.score_arrays(ra, ga)
    summary = {
        m: round(float(np.mean([s[m] for s in scores.values()
                                if s[m] is not None])), 4)
        for m in metrics if scores
    }
    out = {"per_image": scores, "mean": summary, "n": len(scores)}
    if out_path is not None:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        Path(out_path).write_text(json.dumps(out, indent=2))
    return out


def compare_methods(method_scores: dict[str, dict],
                    metrics=("psnr", "ssim")) -> str:
    """Markdown comparison table + pairwise win rates
    (reference compare_methods.py:308-341)."""
    methods = list(method_scores)
    lines = ["| method | " + " | ".join(metrics) + " | n |",
             "|---" * (len(metrics) + 2) + "|"]
    for m in methods:
        mean = method_scores[m]["mean"]
        cells = " | ".join(f"{mean.get(k, float('nan')):.4f}"
                           for k in metrics)
        lines.append(f"| {m} | {cells} | {method_scores[m]['n']} |")

    # pairwise win rate on the first metric over shared images
    if len(methods) >= 2:
        key = metrics[0]
        lines.append("")
        lines.append(f"Win rates ({key}):")
        for a in methods:
            for b in methods:
                if a >= b:
                    continue
                pa = method_scores[a]["per_image"]
                pb = method_scores[b]["per_image"]
                shared = sorted(set(pa) & set(pb))
                if not shared:
                    continue
                wins = sum(pa[i][key] > pb[i][key] for i in shared)
                lines.append(
                    f"- {a} beats {b} on {wins}/{len(shared)} images")
    return "\n".join(lines)
