"""Retrieval (CLIP4CIR-analog) training: combiner contrastive training +
recall@K validation + embedding insertion.

Rebuild of the reference pipeline (retrival_database/CLIP4CIR/src/
combiner_train.py, validate.py, pipeline/insert_emb_to_postgresql.py):

- ``train_retrieval_model``: contrastive (InfoNCE) training of the image
  tower + combiner on (degraded image, solved-plan) pairs — positives are
  augmentations/same-source degradations sharing a plan signature.
- ``recall_at_k``: retrieval validation (reference validate.py recall@K).
- ``insert_solved_runs``: walk agent work dirs (logs/summary.json), build
  res_seq strings from execution paths, embed the input image, insert into
  a vector store (reference insert_emb_to_postgresql.py:305-320).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.io import load_image, to_float
from ..iqa.classifier import prepare_input
from ..retrieval.embedder import RetrievalEmbedder, RetrievalModel
from ..retrieval.store import RetrievalRecord


def info_nce_loss(emb_a: jnp.ndarray, emb_b: jnp.ndarray,
                  temperature: float = 0.07) -> jnp.ndarray:
    """Symmetric InfoNCE between two views of the same items."""
    logits = emb_a @ emb_b.T / temperature
    labels = jnp.arange(emb_a.shape[0])
    return 0.5 * (
        optax.softmax_cross_entropy_with_integer_labels(logits,
                                                        labels).mean()
        + optax.softmax_cross_entropy_with_integer_labels(logits.T,
                                                          labels).mean())


def train_retrieval_model(
    pair_batches,  # iterable of (view_a, view_b) uint8/float image batches
    steps: int = 200,
    lr: float = 1e-4,
    seed: int = 0,
    model: Optional[RetrievalModel] = None,
):
    """Returns (params, losses). Two views of the same degraded content are
    pulled together; other batch items pushed apart."""
    model = model or RetrievalModel()
    tx = optax.adam(lr)
    sample = jnp.zeros((1, 224, 224, 3))
    params = model.init(jax.random.PRNGKey(seed), sample)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, a, b):
        def loss_fn(p):
            ea = model.apply(p, a)
            eb = model.apply(p, b)
            return info_nce_loss(ea, eb)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    it = iter(pair_batches)
    for i in range(steps):
        a, b = next(it)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(a), jnp.asarray(b))
        losses.append(float(loss))
    return params, losses


def recall_at_k(embedder: RetrievalEmbedder, queries: list, gallery: list,
                labels_q: list, labels_g: list,
                ks=(1, 5)) -> dict:
    """Recall@K: fraction of queries whose top-K gallery hits share the
    query's label (reference validate.py:119-255)."""
    eq = np.stack([embedder.embed_array(q) for q in queries])
    eg = np.stack([embedder.embed_array(g) for g in gallery])
    sims = eq @ eg.T
    order = np.argsort(-sims, axis=1)
    out = {}
    for k in ks:
        hits = 0
        for i in range(len(queries)):
            topk = [labels_g[j] for j in order[i, :k]]
            hits += labels_q[i] in topk
        out[f"recall@{k}"] = hits / max(len(queries), 1)
    return out


def insert_solved_runs(output_dir: Path, store, embedder: RetrievalEmbedder,
                       min_steps: int = 1) -> int:
    """Walk agent work dirs; for each successful run insert
    (input embedding, res_seq). Returns number inserted."""
    n = 0
    for summary_path in sorted(Path(output_dir).glob("*/logs/summary.json")):
        try:
            summary = json.loads(summary_path.read_text())
        except json.JSONDecodeError:
            continue
        ep = summary.get("execution_path", {})
        subtasks, tools = ep.get("subtasks", []), ep.get("tools", [])
        if len(subtasks) < min_steps or len(subtasks) != len(tools):
            continue
        res_seq = "/".join(f"{s}_{t}" for s, t in zip(subtasks, tools))
        input_png = summary_path.parent.parent / "img_tree" / "0-img" / \
            "input.png"
        if not input_png.exists():
            continue
        emb = embedder.embed_path(input_png)
        store.insert(RetrievalRecord(
            name=summary_path.parent.parent.name, res_seq=res_seq,
            embedding=emb))
        n += 1
    return n
