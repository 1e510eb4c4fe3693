"""Offline pipeline tests: exploration tree invariants, fail rates,
distillation, eval harness."""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from image_restoration_agent_tpu.agent import build_default_executor
from image_restoration_agent_tpu.agent.evaluators import LocalEvaluator
from image_restoration_agent_tpu.agent.llm import MockLLM
from image_restoration_agent_tpu.core import save_image
from image_restoration_agent_tpu.offline import (
    compare_methods, compute_scores, distill_experience, exhaust_sequences,
    expected_tree_counts, explore_fail_rates,
)


@pytest.fixture(scope="module")
def executor():
    return build_default_executor(fast=True)


class TestExploration:
    def test_expected_counts_formula(self):
        # d=2 subtasks with 2 and 3 tools:
        # leaves = 2! * 2 * 3 = 12
        # nodes: prefixes: (a)=2, (b)=3, (a,b)=6, (b,a)=6 -> 17
        c = expected_tree_counts([2, 3])
        assert c["leaves"] == 12
        assert c["nodes"] == 17

    @pytest.mark.slow
    def test_tree_matches_invariants(self, executor, tmp_path, rng):
        src = tmp_path / "in.png"
        save_image(rng.random((24, 24, 3), dtype=np.float32), src)
        subtasks = ["brightening", "denoising"]
        counts = [len(executor.toolbox_router[s]) for s in subtasks]
        leaves = exhaust_sequences(src, tmp_path / "tree", subtasks,
                                   executor)
        want = expected_tree_counts(counts)
        assert len(leaves) == want["leaves"]
        # every generated output is a node
        outputs = list((tmp_path / "tree").rglob("0-img/output.png"))
        assert len(outputs) == want["nodes"]

    def test_fail_rates_structure(self, executor, tmp_path, rng):
        src = tmp_path / "in.png"
        save_image(rng.random((24, 24, 3), dtype=np.float32), src)
        subtasks = ["brightening"]
        exhaust_sequences(src, tmp_path / "tree", subtasks, executor)
        rates = explore_fail_rates(tmp_path / "tree", LocalEvaluator(),
                                   subtasks)
        assert rates
        for plan, rec in rates.items():
            assert 0.0 <= rec["fail_rate_total"] <= 1.0
            assert rec["n"] >= 1


class TestDistill:
    def test_distill_produces_experience_json(self, tmp_path):
        rates = {
            "denoising -> brightening": {
                "n": 180, "fail_rate_total": 0.311,
                "fail_rate[dark]": 0.30, "fail_rate[noise]": 0.322},
            "brightening -> denoising": {
                "n": 180, "fail_rate_total": 0.381,
                "fail_rate[dark]": 0.428, "fail_rate[noise]": 0.333},
        }
        out = distill_experience(rates, MockLLM(),
                                 tmp_path / "schedule_experience.json")
        assert "distilled" in out and out["distilled"]
        data = json.loads((tmp_path / "schedule_experience.json").read_text())
        assert "denoising -> brightening" in data["raw"]


class TestEvalHarness:
    def test_compute_and_compare(self, tmp_path, rng):
        gt_dir = tmp_path / "gt"
        a_dir = tmp_path / "method_a"
        b_dir = tmp_path / "method_b"
        for i in range(3):
            img = rng.random((16, 16, 3), dtype=np.float32)
            save_image(img, gt_dir / f"{i}.png")
            save_image(np.clip(img + 0.01, 0, 1), a_dir / f"{i}.png")
            save_image(np.clip(img + 0.1, 0, 1), b_dir / f"{i}.png")
        sa = compute_scores(a_dir, gt_dir, tmp_path / "a.json")
        sb = compute_scores(b_dir, gt_dir)
        assert sa["n"] == 3
        assert sa["mean"]["psnr"] > sb["mean"]["psnr"]
        table = compare_methods({"a": sa, "b": sb})
        assert "a beats b on 3/3 images" in table


@pytest.mark.slow
class TestAblationGrid:
    def test_grid_runs_and_reports(self, tmp_path):
        """Two-variant rollback ablation on one combo: the grid artifact
        (reference compare_methods.py:308-341) gets written with paired
        stats."""
        from image_restoration_agent_tpu.offline.eval_harness import (
            run_ablation_grid)

        grid = run_ablation_grid(
            tmp_path, combos=["dark + noise"], images_per_combo=1,
            fast=True,
            variants={"default": {}, "worb": {"with_rollback": False}})
        assert set(grid["variants"]) == {"default", "worb"}
        assert grid["pairs"] and grid["pairs"][0]["dim"] == "rollback"
        assert (tmp_path / "ablation_grid.md").exists()
        md = (tmp_path / "ablation_grid.md").read_text()
        assert "| default |" in md and "rollback" in md
        import json as _json
        gj = _json.loads((tmp_path / "ablation_grid.json").read_text())
        assert gj["pairs"][0]["n"] == 1
