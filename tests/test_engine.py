"""Engine tests: restore contract, shape bucketing, weight LRU eviction."""

import numpy as np
import pytest

from image_restoration_agent_tpu.engine import Engine, WeightStore


class TestWeightStore:
    def _mk(self, budget):
        sizes = {"a": 100, "b": 200, "c": 300}

        def loader(name):
            return {"w": np.zeros(sizes[name] // 8, np.float64)}

        return WeightStore(loader, budget_bytes=budget)

    def test_loads_and_caches(self):
        st = self._mk(10_000)
        p1 = st.get("a")
        p2 = st.get("a")
        assert p1 is p2
        assert st.resident == ["a"]

    def test_evicts_least_used(self):
        st = self._mk(450)
        st.get("a"); st.get("a"); st.get("a")   # a: 3 calls
        st.get("b")                              # b: 1 call
        st.get("c")                              # needs eviction: b goes
        assert "b" in st.evictions
        assert "a" in st.resident and "c" in st.resident

    def test_tie_breaks_newest(self):
        st = self._mk(450)
        st.get("a")  # 1 call, older
        st.get("b")  # 1 call, newer
        st.get("c")  # evict: tie on calls -> newest (b) goes
        assert st.evictions == ["b"]

    def test_reload_after_eviction(self):
        st = self._mk(350)
        st.get("a")
        st.get("c")  # evicts a
        assert "a" in st.evictions
        p = st.get("a")  # reload works
        assert p is not None


class TestEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        return Engine(shape_bucket=32, default_batch=2)

    def test_restore_denoise_shape(self, engine, rng):
        img = rng.random((40, 56, 3), dtype=np.float32)
        res = engine.restore_array(img, "nafnet_small")
        assert res.image.shape == (40, 56, 3)
        assert res.image.dtype == np.uint8

    def test_restore_sr_scales(self, engine, rng):
        img = rng.random((24, 24, 3), dtype=np.float32)
        res = engine.restore_array(img, "swinir_tiny")
        assert res.image.shape == (96, 96, 3)

    def test_bucketing_reuses_compiled(self, engine, rng):
        # 100x90 and 127x94 both bucket to 128x96: second call must not
        # add a compiled pipeline.
        engine.restore_array(rng.random((100, 90, 3), dtype=np.float32),
                             "nafnet_small")
        n1 = len(engine._jit_cache)
        engine.restore_array(rng.random((127, 94, 3), dtype=np.float32),
                             "nafnet_small")
        assert len(engine._jit_cache) == n1

    def test_status(self, engine):
        st = engine.status()
        assert st["models_resident"]
        assert st["calls"] >= 3

    def test_file_roundtrip(self, engine, rng, tmp_path):
        from image_restoration_agent_tpu.core import save_image
        img = rng.random((32, 32, 3), dtype=np.float32)
        src = tmp_path / "in.png"
        dst = tmp_path / "out" / "output.png"
        save_image(img, src)
        res = engine.restore_file(src, dst, "nafnet_small")
        assert dst.exists()
        assert res.output_shape == (32, 32)
