"""Eval-service contract tests + CLI smoke tests."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from image_restoration_agent_tpu.api.eval_service import make_eval_server
from image_restoration_agent_tpu.core import save_image


@pytest.fixture(scope="module")
def eval_server():
    srv = make_eval_server(host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


class TestEvalService:
    def test_evaluate_degradation_contract(self, eval_server, tmp_path, rng):
        p = tmp_path / "x.png"
        save_image(rng.random((32, 32, 3), dtype=np.float32), p)
        out = _post(f"{eval_server}/evaluate_degradation",
                    {"img_path": str(p), "degradation": "noise"})
        assert out["answer"] in ("very low", "low", "medium", "high",
                                 "very high")

    def test_compare_quality_contract(self, eval_server, tmp_path, rng):
        a = tmp_path / "a.png"
        b = tmp_path / "b.png"
        save_image(rng.random((32, 32, 3), dtype=np.float32), a)
        save_image(rng.random((32, 32, 3), dtype=np.float32) * 0.3, b)
        out = _post(f"{eval_server}/compare_quality",
                    {"img_path_A": str(a), "img_path_B": str(b)})
        assert out["answer"] in ("Image A", "Image B", "similar")

    def test_depictqa_client_roundtrip(self, eval_server, tmp_path, rng):
        """Our DepictQAClient must interoperate with the service."""
        from image_restoration_agent_tpu.agent.evaluators import (
            DepictQAClient)

        class _Session:  # stdlib adapter to avoid requests dependency here
            def post(self, url, json=None, timeout=None):
                class R:
                    def __init__(self, data):
                        self._d = data

                    def json(self):
                        return self._d

                return R(_post(url, json))

        client = DepictQAClient(eval_url=eval_server, comp_url=eval_server,
                                session=_Session())
        p = tmp_path / "q.png"
        save_image(rng.random((32, 32, 3), dtype=np.float32), p)
        assert client.severity_of(p, "haze") in (
            "very low", "low", "medium", "high", "very high")
        ev = client.evaluate(p)
        assert len(ev) == 7


class TestCLI:
    @pytest.mark.slow
    def test_test_tools_command(self, tmp_path, capsys):
        from image_restoration_agent_tpu.cli import main
        rc = main(["test-tools", "--work-dir", str(tmp_path / "tt")])
        assert rc == 0
        report = json.loads(capsys.readouterr().out)
        assert all(v["ok"] for v in report.values())

    @pytest.mark.slow
    def test_infer_command(self, tmp_path, capsys, rng):
        from image_restoration_agent_tpu.cli import main
        src = tmp_path / "in.png"
        save_image(rng.random((32, 32, 3), dtype=np.float32), src)
        rc = main(["infer", str(src), "-o", str(tmp_path / "out"),
                   "--fast", "--no-rollback"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"].endswith("result.png")
