"""Controller dispatch tests + evaluator confidence."""

import numpy as np
import pytest

from image_restoration_agent_tpu.api.controller import (
    Controller, LOTTERY, SHORTEST_QUEUE)


class TestController:
    def test_register_and_dispatch_shortest_queue(self):
        c = Controller(SHORTEST_QUEUE)
        c.register_worker("a", "http://a", speed=1.0)
        c.register_worker("b", "http://b", speed=1.0)
        c.heartbeat("a", queue_length=5)
        c.heartbeat("b", queue_length=0)
        assert c.get_worker_address() == "http://b"

    def test_speed_normalization(self):
        c = Controller(SHORTEST_QUEUE)
        c.register_worker("slow", "http://s", speed=1.0)
        c.register_worker("fast", "http://f", speed=10.0)
        c.heartbeat("slow", 1)
        c.heartbeat("fast", 5)   # 5/10 < 1/1
        assert c.get_worker_address() == "http://f"

    def test_lottery_distribution(self):
        c = Controller(LOTTERY, seed=0)
        c.register_worker("a", "http://a", speed=9.0)
        c.register_worker("b", "http://b", speed=1.0)
        picks = [c.get_worker_address() for _ in range(200)]
        assert picks.count("http://a") > 140

    def test_stale_removal(self):
        c = Controller(heartbeat_expiry_s=0.0)
        c.register_worker("a", "http://a")
        import time
        time.sleep(0.01)
        assert c.get_worker_address() is None
        assert c.list_workers() == {}

    def test_unknown_heartbeat_requests_reregister(self):
        c = Controller()
        assert c.heartbeat("ghost", 0) is False


class TestConfidence:
    @pytest.mark.slow
    def test_severity_with_confidence(self, rng):
        from image_restoration_agent_tpu.iqa.classifier import (
            SEVERITY_LEVELS, SeverityEvaluator)
        ev = SeverityEvaluator()
        img = rng.random((40, 40, 3), dtype=np.float32)
        level, conf = ev.severity_with_confidence(img, "noise")
        assert level in SEVERITY_LEVELS
        assert 0.2 <= conf <= 1.0  # argmax prob of 5 classes >= 1/5
        assert level == ev.severity_of(img, "noise")
