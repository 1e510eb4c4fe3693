"""Retrieval training + classifier training tests (tiny, CPU)."""

import numpy as np
import pytest

from image_restoration_agent_tpu.iqa.classifier import DegradationClassifier
from image_restoration_agent_tpu.retrieval import (NumpyVectorStore,
                                                   RetrievalEmbedder)
from image_restoration_agent_tpu.retrieval.embedder import RetrievalModel
from image_restoration_agent_tpu.train.classifier import (
    evaluate_classifier, synthesize_example, train_classifier)
from image_restoration_agent_tpu.train.retrieval import (
    info_nce_loss, insert_solved_runs, recall_at_k, train_retrieval_model)

pytestmark = pytest.mark.slow


@pytest.fixture
def hq_images(rng):
    return [(rng.random((64, 64, 3)) * 255).astype(np.uint8)
            for _ in range(4)]


class TestClassifierTraining:
    def test_synthesize_example_labels(self, hq_images):
        rng = np.random.default_rng(0)
        lq, labels = synthesize_example(hq_images[0], rng)
        assert lq.shape == hq_images[0].shape
        assert (labels > 0).sum() == 1
        assert labels.max() <= 4

    def test_training_reduces_loss(self, hq_images):
        model = DegradationClassifier(width=8)
        params, losses = train_classifier(
            hq_images, steps=30, batch=4, size=64, model=model)
        assert losses[-1] < losses[0]
        acc = evaluate_classifier(params, hq_images, n=16, size=64,
                                  model=model)
        assert 0.0 <= acc["dominant_acc"] <= 1.0


class TestRetrievalTraining:
    def test_info_nce_prefers_aligned(self):
        import jax.numpy as jnp
        e = jnp.eye(4)
        aligned = float(info_nce_loss(e, e))
        shuffled = float(info_nce_loss(e, jnp.roll(e, 1, axis=0)))
        assert aligned < shuffled

    def test_train_and_recall(self, rng):
        model = RetrievalModel(feature_dim=32)

        def pairs():
            while True:
                base = rng.random((4, 224, 224, 3)).astype(np.float32)
                noise = rng.normal(0, 0.02, base.shape).astype(np.float32)
                yield base, np.clip(base + noise, 0, 1)

        params, losses = train_retrieval_model(pairs(), steps=5, model=model)
        assert np.isfinite(losses).all()

        emb = RetrievalEmbedder(params=params, feature_dim=32)
        qs = [rng.random((64, 64, 3), dtype=np.float32) for _ in range(3)]
        gallery = [np.clip(q + rng.normal(0, 0.01, q.shape), 0,
                           1).astype(np.float32) for q in qs]
        rec = recall_at_k(emb, qs, gallery, [0, 1, 2], [0, 1, 2], ks=(1,))
        assert 0.0 <= rec["recall@1"] <= 1.0


class TestInsertPipeline:
    def test_insert_solved_runs(self, tmp_path, rng):
        import json
        from image_restoration_agent_tpu.core import save_image
        # fabricate two agent work dirs
        for i, ok in enumerate((True, False)):
            wd = tmp_path / f"run{i}"
            (wd / "logs").mkdir(parents=True)
            (wd / "img_tree" / "0-img").mkdir(parents=True)
            save_image(rng.random((32, 32, 3), dtype=np.float32),
                       wd / "img_tree" / "0-img" / "input.png")
            summary = {"execution_path": {
                "subtasks": ["denoising"] if ok else [],
                "tools": ["nafnet"] if ok else []}}
            (wd / "logs" / "summary.json").write_text(json.dumps(summary))

        emb = RetrievalEmbedder(feature_dim=640)
        store = NumpyVectorStore(dim=640, embedder=emb)
        n = insert_solved_runs(tmp_path, store, emb)
        assert n == 1
        assert len(store) == 1
        hits = store.query(emb.embed_path(
            tmp_path / "run0" / "img_tree" / "0-img" / "input.png"), topk=1)
        assert hits[0]["res_seq"] == "denoising_nafnet"
        assert hits[0]["similarity"] > 0.99


class TestClassifierV3:
    def test_features_respond_to_degradations(self):
        """Each analytic prior moves in the right direction for its
        degradation (dark channel up under haze, blockiness up under
        JPEG, Laplacian MAD up under noise, gradient energy down under
        blur, luminance down under darkening)."""
        import jax.numpy as jnp

        from image_restoration_agent_tpu.data import degrade as D
        from image_restoration_agent_tpu.iqa.classifier import (
            degradation_features)

        rng = np.random.default_rng(0)
        from image_restoration_agent_tpu.train.classifier import (
            procedural_corpus)
        img = procedural_corpus(1, size=128, seed=3)[0]

        def feats(arr):
            x = jnp.asarray(arr.astype(np.float32) / 255.0)[None]
            return np.asarray(degradation_features(x))[0]

        base = feats(img)
        # indices per degradation_features concatenation order
        MEAN_L, LAP_MAD, GRAD_E = 0, 5, 7
        BLOCKINESS, DARK_MEAN = 12, 17

        noisy = feats(D.add_noise(img, "Gaussian", arg=40, rng=rng))
        assert noisy[LAP_MAD] > base[LAP_MAD]

        jpeg = feats(D.add_jpeg_artifacts(img, quality_factor=8, rng=rng))
        assert jpeg[BLOCKINESS] > base[BLOCKINESS]

        dark = feats(D.darken(img, "constant shift", arg=60, rng=rng))
        assert dark[MEAN_L] < base[MEAN_L]

        blur = feats(D.add_defocus_blur(img, severity=2, rng=rng))
        assert blur[GRAD_E] < base[GRAD_E]

        hazy = feats(D.add_haze(img, A=0.95, beta=1.6, rng=rng))
        assert hazy[DARK_MEAN] > base[DARK_MEAN]

    def test_v3_train_smoke(self):
        """A short v3 run learns something (loss drops) and the multi
        synthesizer labels every applied op."""
        from image_restoration_agent_tpu.iqa.classifier import (
            DegradationClassifierV3)
        from image_restoration_agent_tpu.train.classifier import (
            procedural_corpus, synthesize_multi, train_classifier_v3)

        corpus = procedural_corpus(4, size=96, seed=0)
        model = DegradationClassifierV3(width=8)
        params, losses = train_classifier_v3(
            corpus, steps=6, batch=4, size=64, model=model)
        assert np.isfinite(losses).all()

        rng = np.random.default_rng(0)
        lq, labels = synthesize_multi(corpus[0], rng)
        assert lq.shape == corpus[0].shape
        assert 1 <= (labels > 0).sum() <= 3

    def test_dataset_trainer_snapshot_hook(self):
        """The dataset trainer calls snapshot_fn(params, step) on the
        requested cadence so multi-hour runs survive being killed."""
        from image_restoration_agent_tpu.iqa.classifier import (
            DegradationClassifierV3)
        from image_restoration_agent_tpu.train.classifier import (
            SEVERITY_LEVELS, train_classifier_v3_dataset)

        rng = np.random.default_rng(0)
        xs = rng.random((8, 32, 32, 3)).astype(np.float32)
        ys = rng.integers(0, len(SEVERITY_LEVELS), (8, 8))
        snaps = []
        params, losses = train_classifier_v3_dataset(
            xs, ys, steps=5, batch=4, model=DegradationClassifierV3(width=8),
            snapshot_every=2, snapshot_fn=lambda p, s: snaps.append(s))
        assert snaps == [2, 4]
        assert np.isfinite(losses).all()
