"""Agent chain end-to-end on the synthetic-golden model zoo (VERDICT r4 #6).

The full classifier -> plan -> execute -> reflect chain runs with NO
random-init models: every NN tool serves deterministic real-geometry
weights rebuilt from the committed synthetic goldens (goldens/*/spec.json)
through the live convert path, and ``Engine(allow_random_init=False)``
makes any silent random-init fallback a hard error. The resulting plan /
execution trace is pinned against ``tests/data/agent_golden_trace.json``
so the chain's decisions (agenda extraction, MockLLM scheduling,
reflection severities, best-tool choice) stay deterministic.

Quality through the chain still needs real reference checkpoints (no
egress here); this pins chain INTEGRITY. Ref behavior:
/root/reference/AgenticIR/pipeline/iragent.py:857-941 (summary dump).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TRACE_PATH = Path(__file__).parent / "data" / "agent_golden_trace.json"


def test_agent_chain_on_synthetic_golden_zoo(tmp_path):
    from image_restoration_agent_tpu.agent.executor import (
        build_default_executor)
    from image_restoration_agent_tpu.agent.iragent import IRAgent
    from image_restoration_agent_tpu.core.io import (load_image, save_image,
                                                     to_float)
    from image_restoration_agent_tpu.engine import Engine
    from image_restoration_agent_tpu.offline.synthetic_goldens import (
        GOLDEN_ROOT, materialize_synthetic_weights)

    # the two small families keep the single-core CPU runtime bounded; the
    # other goldens flow through the identical convert path in
    # test_validate_weights. with_rollback=False below for the same
    # reason: synthetic weights don't actually restore, so reflection
    # keeps failing subtasks and rollback would loop full-size forwards.
    wroot = tmp_path / "weights"
    mats = materialize_synthetic_weights(
        wroot, names=["nafnet_synth", "fbcnn_synth"])
    assert {"nafnet", "fbcnn_blind"} <= set(mats), mats

    engine = Engine(weight_dir=wroot, allow_random_init=False)
    toolboxes = {
        "denoising": [("nafnet", "nafnet")],
        "motion deblurring": [("nafnet", "nafnet")],
        "defocus deblurring": [("nafnet", "nafnet")],
        "deraining": [("nafnet", "nafnet")],
        "dehazing": [("nafnet", "nafnet")],
        "super-resolution": [],  # input held >= 300 px: never scheduled
        "jpeg compression artifact removal":
            [("fbcnn_blind", "fbcnn_blind")],
    }
    ex = build_default_executor(engine=engine, toolboxes=toolboxes)

    # deterministic degraded input: the committed nafnet golden fixture
    # (256 px, loads bit-exactly), edge-padded past the agent's 300 px
    # SR heuristic, + seeded Gaussian noise
    clean = to_float(load_image(
        GOLDEN_ROOT / "nafnet_synth" / "input.png"))
    clean = np.pad(clean, ((0, 64), (0, 64), (0, 0)), mode="edge")
    rng = np.random.default_rng(42)
    noisy = np.clip(
        clean + rng.normal(0.0, 25.0 / 255.0, clean.shape), 0.0, 1.0
    ).astype(np.float32)
    inp = tmp_path / "case" / "noisy.png"
    inp.parent.mkdir()
    save_image(noisy, inp)

    agent = IRAgent(inp, tmp_path / "out", executor=ex, rng_seed=0,
                    with_rollback=False, silent=True)
    result = agent.run()
    assert result is not None and Path(result).exists()

    summary = json.loads(agent.summary_path.read_text())
    trace = {
        "plan_initial": summary["plan"]["initial"],
        "execution_subtasks": summary["execution_path"]["subtasks"],
        "execution_tools": summary["execution_path"]["tools"],
        "n_invocations": summary["n_invocations"],
    }

    if not TRACE_PATH.exists():  # first run pins the golden
        TRACE_PATH.parent.mkdir(parents=True, exist_ok=True)
        TRACE_PATH.write_text(json.dumps(trace, indent=1) + "\n")
        pytest.fail(f"golden trace created at {TRACE_PATH}; review and "
                    "commit it, then re-run")

    want = json.loads(TRACE_PATH.read_text())
    assert trace == want, (
        f"agent chain trace diverged from the committed golden:\n"
        f"got  {trace}\nwant {want}")
