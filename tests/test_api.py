"""HTTP API tests: live server on a loopback port, reference contract."""

import json
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from image_restoration_agent_tpu.api import make_server
from image_restoration_agent_tpu.agent import build_default_executor
from image_restoration_agent_tpu.core import save_image


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("api")
    srv = make_server(host="127.0.0.1", port=0, work_root=root,
                      executor=build_default_executor(fast=True))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture
def input_png(server, rng):
    # inside the server work root: image_path references outside it are 403
    p = Path(server[0].app.work_root) / "uploads" / "img.png"
    save_image(rng.random((32, 40, 3), dtype=np.float32), p)
    return p


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, r.read()


def _post_json(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestAPI:
    def test_health(self, server):
        _, base = server
        code, body = _get(f"{base}/health")
        assert code == 200
        assert json.loads(body)["status"] == "ok"

    @pytest.mark.slow
    def test_process_json_and_download(self, server, input_png):
        _, base = server
        code, body = _post_json(f"{base}/process",
                                {"image_path": str(input_png)})
        assert code == 200, body
        assert body["status"] == "success"
        assert body["initial_plan"]
        task_id = body["task_id"]
        code, png = _get(f"{base}/download/{task_id}")
        assert code == 200 and png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_process_missing_image_400(self, server):
        _, base = server
        code, body = _post_json(f"{base}/process",
                                {"image_path": "/nonexistent.png"})
        assert code == 400 and body["status"] == "error"

    def test_download_unknown_404(self, server):
        _, base = server
        try:
            code, _ = _get(f"{base}/download/nope")
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 404

    def test_process_path_outside_roots_403(self, server, tmp_path, rng):
        _, base = server
        p = tmp_path / "outside.png"
        save_image(rng.random((16, 16, 3), dtype=np.float32), p)
        code, body = _post_json(f"{base}/process", {"image_path": str(p)})
        assert code == 403 and body["status"] == "error"

    def test_multipart_trailing_dash_preserved(self, server):
        """Uploads whose payload ends in '-', CR, or LF must round-trip
        byte-exact through the multipart parser."""
        from image_restoration_agent_tpu.api.server import _parse_multipart

        boundary = "----b7"
        for tail in (b"-", b"\r", b"\n", b"\r\n", b"--\r\n"):
            payload = b"\x89PNGdata" + tail
            body = (
                f"--{boundary}\r\n"
                f'Content-Disposition: form-data; name="file"; '
                f'filename="x.bin"\r\n\r\n').encode() + payload + \
                f"\r\n--{boundary}--\r\n".encode()
            fields = _parse_multipart(
                body, f"multipart/form-data; boundary={boundary}")
            assert fields["file"][1] == payload

    def test_multipart_upload(self, server, input_png):
        _, base = server
        boundary = "----testboundary42"
        data = input_png.read_bytes()
        body = (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="file"; '
            f'filename="up.png"\r\n'
            f"Content-Type: image/png\r\n\r\n").encode() + data + \
            f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"{base}/process", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert out["status"] == "success"
