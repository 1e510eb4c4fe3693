"""Agent tests: graph wiring, executor contract, IRAgent end-to-end
(hermetic: MockLLM planner + LocalEvaluator, tiny models)."""

import json
from pathlib import Path

import numpy as np
import pytest

from image_restoration_agent_tpu.agent import (
    END, Executor, IRAgent, StateGraph, build_default_executor,
    create_image_analysis_graph, run_agent,
)
from image_restoration_agent_tpu.agent.llm import MockLLM, _loose_json
from image_restoration_agent_tpu.core import save_image


@pytest.fixture(scope="module")
def fast_executor():
    return build_default_executor(fast=True)


@pytest.fixture
def input_png(tmp_path, rng):
    img = rng.random((48, 64, 3), dtype=np.float32)
    p = tmp_path / "inputs" / "img.png"
    save_image(img, p)
    return p


class TestStateGraph:
    def test_linear_flow(self):
        g = StateGraph()
        g.add_node("a", lambda s: {"x": s.get("x", 0) + 1})
        g.add_node("b", lambda s: {"x": s["x"] * 10})
        g.set_entry_point("a")
        g.add_edge("a", "b")
        g.add_edge("b", END)
        out = g.compile().invoke({})
        assert out["x"] == 10

    def test_conditional_self_loop(self):
        g = StateGraph()
        g.add_node("tick", lambda s: {"n": s.get("n", 0) + 1})
        g.set_entry_point("tick")
        g.add_conditional_edges(
            "tick", lambda s: "more" if s["n"] < 5 else "done",
            {"more": "tick", "done": END})
        out = g.compile().invoke({})
        assert out["n"] == 5

    def test_runaway_guard(self):
        g = StateGraph()
        g.add_node("loop", lambda s: s)
        g.set_entry_point("loop")
        g.add_conditional_edges("loop", lambda s: "go", {"go": "loop"})
        with pytest.raises(RuntimeError):
            g.compile().invoke({}, max_steps=10)


class TestMockLLM:
    def test_orders_canonically(self):
        llm = MockLLM()
        ans = llm(
            'tasks: [\'super-resolution\', \'denoising\'] ... "order" must '
            "be a permutation of ['super-resolution', 'denoising']")
        obj = _loose_json(ans)
        assert obj["order"] == ["denoising", "super-resolution"]

    def test_format_check_enforced(self):
        llm = MockLLM()

        def check(obj):
            assert isinstance(obj, dict) and set(obj) == {"thought", "order"}

        llm("give \"order\" permutation of ['denoising', 'brightening']",
            format_check=check)


class TestExecutor:
    def test_tool_contract(self, fast_executor, tmp_path, rng):
        in_dir = tmp_path / "0-img"
        in_dir.mkdir()
        save_image(rng.random((32, 32, 3), dtype=np.float32),
                   in_dir / "input.png")
        out = fast_executor.invoke_a_tool(
            "brightening", "gamma_correction", in_dir, tmp_path / "out")
        assert out.name == "output.png" and out.exists()

    def test_all_subtasks_have_tools(self, fast_executor):
        for subtask, tools in fast_executor.toolbox_router.items():
            assert tools, subtask

    @pytest.mark.slow
    def test_test_all_tools_shape_invariant(self, fast_executor, tmp_path,
                                            rng):
        img = rng.random((24, 24, 3), dtype=np.float32)
        report = fast_executor.test_all_tools(img, tmp_path / "tt")
        assert all(v["ok"] for v in report.values())
        # at least one x4 (super-resolution) and one x1 output
        shapes = {v["shape"] for v in report.values()}
        assert (96, 96) in shapes and (24, 24) in shapes

    def test_brightening_brightens(self, fast_executor, tmp_path):
        in_dir = tmp_path / "0-img"
        in_dir.mkdir()
        dark = np.full((16, 16, 3), 0.2, np.float32)
        save_image(dark, in_dir / "input.png")
        out = fast_executor.invoke_a_tool(
            "brightening", "constant_shift", in_dir, tmp_path / "o")
        from image_restoration_agent_tpu.core import load_image
        res = load_image(out)
        assert res.mean() > 0.2 * 255 + 20


class TestIRAgent:
    @pytest.mark.slow
    def test_run_with_fixed_plan(self, fast_executor, input_png, tmp_path):
        agent = IRAgent(input_png, tmp_path / "out",
                        executor=fast_executor, with_rollback=False)
        result = agent.run(plan=["denoising", "brightening"])
        assert result is not None and result.exists()
        summary = json.loads(agent.summary_path.read_text())
        assert summary["execution_path"]["subtasks"] == \
            ["denoising", "brightening"]
        assert summary["n_invocations"] >= 2
        assert (agent.log_dir / "img_tree.html").exists()
        assert (agent.log_dir / "workflow.log").exists()

    def test_propose_uses_size_heuristic(self, fast_executor, input_png,
                                         tmp_path):
        # 48x64 < 300 -> super-resolution enters the agenda
        agent = IRAgent(input_png, tmp_path / "out2",
                        executor=fast_executor, with_rollback=False)
        agent.propose()
        assert "super-resolution" in agent.plan or not agent.plan or \
            agent.work_mem["plan"]["initial"]
        # plan recorded in working memory
        assert agent.work_mem["plan"]["initial"] == agent.plan

    @pytest.mark.slow
    def test_full_run_autonomous(self, fast_executor, input_png, tmp_path):
        agent = IRAgent(input_png, tmp_path / "out3",
                        executor=fast_executor)
        result = agent.run()
        assert result is not None and result.exists()

    def test_skip_already_processed(self, fast_executor, input_png,
                                    tmp_path):
        out = tmp_path / "out4"
        a1 = IRAgent(input_png, out, executor=fast_executor)
        a1.run(plan=["brightening"])
        a2 = IRAgent(input_png, out, executor=fast_executor)
        assert a2.skip
        assert a2.run() is None

    def test_cache_replay_symlinks(self, fast_executor, input_png, tmp_path):
        a1 = IRAgent(input_png, tmp_path / "o5", executor=fast_executor,
                     with_rollback=False)
        a1.run(plan=["brightening"])
        a2 = IRAgent(input_png, tmp_path / "o6", executor=fast_executor,
                     with_rollback=False)
        a2.run(plan=["brightening"], cache=a1.img_tree_dir)
        # replayed outputs are symlinks into the cache tree
        links = list(a2.img_tree_dir.rglob("output.png"))
        assert links and all(p.is_symlink() for p in links)


class TestGraphApp:
    @pytest.mark.slow
    def test_full_graph_run(self, fast_executor, input_png, tmp_path):
        state = run_agent(input_png, tmp_path / "graph_work",
                          executor=fast_executor)
        assert Path(state["output_path"]).exists()
        assert state["executed"]
        assert "initial_plan" in state

    def test_retrieval_branch(self, fast_executor, input_png, tmp_path):
        class FakeStore:
            def embed(self, path):
                return np.ones(4, np.float32)

            def query(self, emb, topk=1):
                return [{"similarity": 0.95,
                         "res_seq": "brightening_gamma_correction"}]

        state = run_agent(input_png, tmp_path / "gw2",
                          executor=fast_executor,
                          retrieval_store=FakeStore())
        assert state["initial_plan"] == [("brightening", "gamma_correction")]
        assert Path(state["output_path"]).exists()
