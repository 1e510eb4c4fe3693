"""End-to-end benchmark-suite test (one combo, hermetic)."""

import json
from pathlib import Path

import pytest

from image_restoration_agent_tpu.offline.benchmark_suite import (
    ALL_COMBOS, GROUP_A, GROUP_B, GROUP_C, render_table, run_suite,
    synthetic_hq,
)


class TestBenchmarkSuite:
    def test_combo_list_matches_reference(self):
        assert len(ALL_COMBOS) == 16
        assert len(GROUP_A) == 8 and len(GROUP_B) == 4 and len(GROUP_C) == 4
        assert all(c.count("+") == 2 for c in GROUP_C)  # triple combos

    def test_synthetic_hq_deterministic(self):
        a = synthetic_hq(2, seed=3)
        b = synthetic_hq(2, seed=3)
        assert (a[0] == b[0]).all() and (a[1] == b[1]).all()

    @pytest.mark.slow
    def test_single_combo_end_to_end(self, tmp_path):
        rep = run_suite(tmp_path, combos=["dark + noise"], fast=True)
        assert len(rep["records"]) == 1
        rec = rep["records"][0]
        assert rec["plan"], "agent produced no plan"
        assert rec["n_invocations"] >= 1
        assert (tmp_path / "report.json").exists()
        md = (tmp_path / "report.md").read_text()
        assert "dark + noise" in md
        # the degraded input must score worse than the clean reference
        assert rec["input_psnr"] < 40.0

    def test_render_table(self):
        rows = [{"combo": "x", "input_psnr": 1, "output_psnr": 2,
                 "input_ssim": 0.1, "output_ssim": 0.2,
                 "plan": ["denoising"]}]
        md = render_table(rows)
        assert "| x | 1 | 2 |" in md
