"""Config system + playground tests."""

import json
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from image_restoration_agent_tpu.utils.config import Config, load_config
from image_restoration_agent_tpu.api.playground import make_playground_server
from image_restoration_agent_tpu.agent import build_default_executor
from image_restoration_agent_tpu.core import save_image


class TestConfig:
    def test_defaults(self):
        cfg = load_config(None)
        assert cfg.api.port == 1146
        assert cfg.retrieval.similarity_threshold == 0.9

    def test_yaml_merge(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("engine:\n  hbm_budget_gb: 8\napi:\n  port: 9999\n")
        cfg = load_config(p)
        assert cfg.engine.hbm_budget_gb == 8
        assert cfg.api.port == 9999
        assert cfg.llm.provider == "mock"  # untouched default

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("enginee:\n  foo: 1\n")
        with pytest.raises(KeyError):
            load_config(p)

    def test_dotted_overrides(self):
        cfg = load_config(None, overrides=["agent.with_rollback=false",
                                           "engine.default_batch=16"])
        assert cfg.agent.with_rollback is False
        assert cfg.engine.default_batch == 16

    def test_bad_override_path(self):
        with pytest.raises(KeyError):
            load_config(None, overrides=["agent.nonexistent=1"])


@pytest.fixture(scope="module")
def playground(tmp_path_factory):
    root = tmp_path_factory.mktemp("pg")
    srv = make_playground_server(host="127.0.0.1", port=0,
                                 work_root=root / "work",
                                 executor=build_default_executor(fast=True))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}", root
    srv.shutdown()


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode())
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


class TestPlayground:
    def test_full_flow(self, playground, rng):
        srv, base, root = playground
        src = root / "input.png"
        save_image(rng.random((24, 24, 3), dtype=np.float32), src)

        # UI page served
        with urllib.request.urlopen(f"{base}/") as r:
            assert b"playground" in r.read()

        out = _post(f"{base}/start", {"image_path": str(src)})
        assert out["ok"]

        with urllib.request.urlopen(f"{base}/tree") as r:
            tree = json.loads(r.read())
        assert tree["nodes"] == [{"path": ""}]
        assert "brightening" in tree["toolboxes"]

        out = _post(f"{base}/invoke", {"node": "", "subtask": "brightening",
                                       "tool": "gamma_correction"})
        assert out["ok"]

        with urllib.request.urlopen(f"{base}/tree") as r:
            tree = json.loads(r.read())
        assert len(tree["nodes"]) == 2

        # node image downloadable
        node = tree["nodes"][1]["path"]
        with urllib.request.urlopen(
                f"{base}/image?node={urllib.parse.quote(node)}") as r:
            assert r.read()[:4] == b"\x89PNG"
