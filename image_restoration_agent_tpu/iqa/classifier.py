"""Degradation classifier: the in-process stand-in for DepictQA.

The reference evaluates degradation severity with a 7B VLM behind HTTP
(AgenticIR/llm/depictqa.py, DepictQA/src/app_eval.py): for each of 7
degradations it answers one of five severity levels. Re-training a VLM is out
of scope (SURVEY.md §7 hard part 7); this module supplies the same *decision
interface* with a small Flax CNN (multi-head: 8 degradations x 5 severities)
that can be trained on the degradation synthesizer's outputs
(data/degrade.py), so the full agent loop runs on-TPU with no external
service. The DepictQA HTTP client contract lives in agent/depictqa_client.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SEVERITY_LEVELS = ["very low", "low", "medium", "high", "very high"]

DEGRADATIONS = [
    "low resolution",
    "noise",
    "motion blur",
    "defocus blur",
    "haze",
    "rain",
    "dark",
    "jpeg compression artifact",
]

# The 7 degradations the evaluator scores (low resolution is handled by the
# size heuristic instead — iragent.py extract_agenda:228).
EVALUATED_DEGRADATIONS = [d for d in DEGRADATIONS if d != "low resolution"]


class DegradationClassifier(nn.Module):
    """Small conv net: image -> (8 degradations, 5 severities) logits.

    Works on a fixed 224x224 center-crop/resized input like CLIP-class
    evaluators; severity is an ordinal 5-way head per degradation.
    """

    width: int = 32
    num_levels: int = len(SEVERITY_LEVELS)

    @nn.compact
    def __call__(self, x):  # x: (B, 224, 224, 3)
        w = self.width
        for i, feats in enumerate((w, w * 2, w * 4, w * 4)):
            x = nn.Conv(feats, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, name=f"gn{i}")(x)
            x = nn.gelu(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(w * 8, name="fc1")(x)
        x = nn.gelu(x)
        logits = nn.Dense(len(DEGRADATIONS) * self.num_levels, name="head")(x)
        return logits.reshape(x.shape[0], len(DEGRADATIONS), self.num_levels)


def prepare_input(img: np.ndarray, size: int = 224) -> np.ndarray:
    """Resize (H, W, 3) float image to the classifier's input size."""
    from ..core.resize import resize_matlab
    import jax.numpy as jnp

    return np.asarray(resize_matlab(jnp.asarray(img), out_shape=(size, size)))


class SeverityEvaluator:
    """Callable evaluator with the DepictQA decision contract:
    ``evaluate(img) -> [(degradation, severity), ...]`` for the 7 evaluated
    degradations, and ``severity_of(img, degradation) -> level``.
    """

    def __init__(self, params=None, model: DegradationClassifier | None = None,
                 rng_seed: int = 0, input_size: int = 224):
        self.model = model or DegradationClassifier()
        self.input_size = input_size
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, input_size, input_size, 3)))
        self.params = params
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def from_checkpoint(cls, path, input_size: int = 160,
                        model: "DegradationClassifier | None" = None):
        """Load trained params saved by train/classifier.py (orbax)."""
        import orbax.checkpoint as ocp
        from pathlib import Path

        model = model or DegradationClassifier()
        template = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, input_size, input_size, 3))))
        with ocp.StandardCheckpointer() as ck:
            params = ck.restore(Path(path).resolve(), template)
        return cls(params=params, model=model, input_size=input_size)

    @classmethod
    def default(cls):
        """Best shipped checkpoint (weights/degradation_classifier_v2 at
        224px, then the 160px v1), else random init."""
        from pathlib import Path

        weights = Path(__file__).resolve().parents[1] / "weights"
        for name, size in (("degradation_classifier_v2", 224),
                           ("degradation_classifier", 160)):
            ckpt = weights / name
            if ckpt.exists():
                try:
                    return cls.from_checkpoint(ckpt, input_size=size)
                except Exception:
                    pass
        return cls()

    def logits(self, img: np.ndarray) -> np.ndarray:
        x = jnp.asarray(prepare_input(img, self.input_size))[None]
        return np.asarray(self._apply(self.params, x))[0]

    def evaluate(self, img: np.ndarray) -> list[tuple[str, str]]:
        lg = self.logits(img)
        out = []
        for d in EVALUATED_DEGRADATIONS:
            i = DEGRADATIONS.index(d)
            out.append((d, SEVERITY_LEVELS[int(lg[i].argmax())]))
        return out

    def severity_of(self, img: np.ndarray, degradation: str) -> str:
        lg = self.logits(img)
        i = DEGRADATIONS.index(degradation)
        return SEVERITY_LEVELS[int(lg[i].argmax())]

    def severity_with_confidence(self, img: np.ndarray,
                                 degradation: str) -> tuple[str, float]:
        """Severity plus softmax probability of the chosen level — the
        classifier analog of DepictQA's token-probability confidence
        (DepictQA/src/utils/confidence.py)."""
        lg = self.logits(img)
        i = DEGRADATIONS.index(degradation)
        row = lg[i] - lg[i].max()
        probs = np.exp(row)
        probs /= probs.sum()
        j = int(probs.argmax())
        return SEVERITY_LEVELS[j], float(probs[j])
