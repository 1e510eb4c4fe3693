"""Retrieval tests: store semantics, combiner shape/norm, embedder."""

import numpy as np
import pytest

from image_restoration_agent_tpu.retrieval import (
    Combiner, NumpyVectorStore, RetrievalEmbedder, RetrievalRecord,
)


class TestNumpyVectorStore:
    def _store(self):
        st = NumpyVectorStore(dim=4)
        st.insert(RetrievalRecord("a", "denoising_nafnet",
                                  np.array([1, 0, 0, 0], np.float32)))
        st.insert(RetrievalRecord("b", "brightening_gamma_correction",
                                  np.array([0, 1, 0, 0], np.float32)))
        return st

    def test_topk_cosine(self):
        st = self._store()
        hits = st.query(np.array([0.9, 0.1, 0, 0], np.float32), topk=2)
        assert hits[0]["name"] == "a" and hits[1]["name"] == "b"
        assert hits[0]["similarity"] > 0.9

    def test_conflict_replaces(self):
        st = self._store()
        st.insert(RetrievalRecord("a", "dehazing_x",
                                  np.array([0, 0, 1, 0], np.float32)))
        hits = st.query(np.array([0, 0, 1, 0], np.float32), topk=1)
        assert hits[0]["name"] == "a"
        assert hits[0]["res_seq"] == "dehazing_x"
        assert len(st) == 2

    def test_save_load_roundtrip(self, tmp_path):
        st = self._store()
        st.save(tmp_path / "store.npz")
        st2 = NumpyVectorStore.load(tmp_path / "store.npz")
        hits = st2.query(np.array([1, 0, 0, 0], np.float32), topk=1)
        assert hits[0]["name"] == "a"

    def test_empty_store_query(self):
        st = NumpyVectorStore(dim=4)
        assert st.query(np.ones(4, np.float32)) == []

    def test_embedder_identity_mismatch_refused(self, tmp_path):
        """A store built with one embedder refuses to load under another
        (both are 640-d, so a silent mix would corrupt retrieval)."""

        class EmbA:
            identity = "trained_standin"

        class EmbB:
            identity = "clip4cir_rn50x4"

        st = NumpyVectorStore(dim=4, embedder=EmbA())
        st.insert(RetrievalRecord("a", "denoising_nafnet",
                                  np.array([1, 0, 0, 0], np.float32)))
        st.save(tmp_path / "s.npz")
        # same identity: fine
        st2 = NumpyVectorStore.load(tmp_path / "s.npz", embedder=EmbA())
        assert st2.embedder_id == "trained_standin"
        # different identity: refused unless overridden
        with pytest.raises(ValueError, match="trained_standin"):
            NumpyVectorStore.load(tmp_path / "s.npz", embedder=EmbB())
        st3 = NumpyVectorStore.load(tmp_path / "s.npz", embedder=EmbB(),
                                    allow_mismatch=True)
        assert len(st3) == 1
        # legacy stores (no embedder recorded) load under any embedder
        st.embedder_id = None
        st.save(tmp_path / "legacy.npz")
        st4 = NumpyVectorStore.load(tmp_path / "legacy.npz",
                                    embedder=EmbB())
        assert st4.embedder_id == "clip4cir_rn50x4"


class TestCombiner:
    def test_output_normalized(self, rng):
        import jax, jax.numpy as jnp
        c = Combiner(feature_dim=8, projection_dim=16, hidden_dim=32)
        img = jnp.asarray(rng.standard_normal((3, 8), dtype=np.float32))
        txt = jnp.asarray(rng.standard_normal((3, 8), dtype=np.float32))
        params = c.init(jax.random.PRNGKey(0), img, txt)
        out = c.apply(params, img, txt)
        norms = np.linalg.norm(np.asarray(out), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestEmbedder:
    @pytest.mark.slow
    def test_embed_is_unit_and_deterministic(self, rng):
        emb = RetrievalEmbedder()
        img = rng.random((60, 60, 3), dtype=np.float32)
        e1 = emb.embed_array(img)
        e2 = emb.embed_array(img)
        assert e1.shape == (640,)
        np.testing.assert_allclose(np.linalg.norm(e1), 1.0, atol=1e-4)
        np.testing.assert_array_equal(e1, e2)

    @pytest.mark.slow
    def test_retrieval_end_to_end(self, rng, tmp_path):
        """Insert two solved images; a near-duplicate must retrieve the
        right plan."""
        from image_restoration_agent_tpu.core import save_image

        emb = RetrievalEmbedder()
        st = NumpyVectorStore(dim=640, embedder=emb)
        img_a = rng.random((64, 64, 3), dtype=np.float32)
        img_b = rng.random((64, 64, 3), dtype=np.float32) * 0.3  # dark
        st.insert(RetrievalRecord("a", "denoising_nafnet",
                                  emb.embed_array(img_a)))
        st.insert(RetrievalRecord("b", "brightening_gamma_correction",
                                  emb.embed_array(img_b)))
        p = tmp_path / "query.png"
        save_image(img_a, p)
        hits = st.query(st.embed(p), topk=1)
        assert hits[0]["name"] == "a"
        assert hits[0]["similarity"] > 0.98
