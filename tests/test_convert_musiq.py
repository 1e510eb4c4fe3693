"""MUSIQ conversion parity against an in-test torch implementation of the
multi-scale patch transformer (linear patch encoder, hash-based spatial
embedding, scale embedding, CLS head) at mini scale."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.iqa_rules import (  # noqa: E402
    musiq_rules)
from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_state_dict)
from image_restoration_agent_tpu.iqa import musiq as mq  # noqa: E402

pytestmark = pytest.mark.slow

HIDDEN = 8
LAYERS = 2
HEADS = 2
MLP = 16


class TBlock(tnn.Module):
    def __init__(self, dim, heads, mlp):
        super().__init__()
        self.heads = heads
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, 3 * dim)
        self.attn.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, mlp)
        self.mlp.fc2 = tnn.Linear(mlp, dim)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        qkv = self.attn.qkv(self.norm1(x)) \
            .reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(o)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class TMUSIQ(tnn.Module):
    def __init__(self):
        super().__init__()
        g = mq.HSE_GRID
        self.patch_proj = tnn.Linear(mq.PATCH * mq.PATCH * 3, HIDDEN)
        self.hse_embedding = tnn.Parameter(torch.randn(g * g, HIDDEN) * .02)
        self.scale_embedding = tnn.Parameter(torch.randn(3, HIDDEN) * .02)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, HIDDEN))
        self.blocks = tnn.ModuleList(
            [TBlock(HIDDEN, HEADS, MLP) for _ in range(LAYERS)])
        self.norm = tnn.LayerNorm(HIDDEN, eps=1e-6)
        self.head = tnn.Linear(HIDDEN, 1)

    def forward(self, patches, hash_idx, scale_idx):
        x = self.patch_proj(patches)
        x = x + self.hse_embedding[hash_idx][None] \
            + self.scale_embedding[scale_idx][None]
        x = torch.cat([self.cls_token, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x))[:, 0, 0]


def _mini_flax():
    return mq.MUSIQ(hidden=HIDDEN, num_layers=LAYERS, num_heads=HEADS,
                    mlp_dim=MLP)


def test_musiq_conversion_forward_parity():
    torch.manual_seed(0)
    tm = TMUSIQ().eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = _mini_flax()
    rng = np.random.default_rng(0)
    # two scale patch sets, as the scorer would build them
    p1 = rng.standard_normal((1, 6, mq.PATCH * mq.PATCH * 3)) \
        .astype(np.float32)
    p2 = rng.standard_normal((1, 2, mq.PATCH * mq.PATCH * 3)) \
        .astype(np.float32)
    hash_idx = np.array([0, 5, 11, 23, 47, 99, 3, 88], np.int32)
    scale_idx = np.array([0] * 6 + [1] * 2, np.int32)

    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0),
                        [jnp.asarray(p1), jnp.asarray(p2)],
                        jnp.asarray(hash_idx),
                        jnp.asarray(scale_idx)))["params"]
    params = convert_state_dict(state, musiq_rules(), template=template)

    with torch.no_grad():
        want = tm(torch.from_numpy(np.concatenate([p1, p2], axis=1)),
                  torch.from_numpy(hash_idx).long(),
                  torch.from_numpy(scale_idx).long()).numpy()
    got = np.asarray(fm.apply(
        {"params": params}, [jnp.asarray(p1), jnp.asarray(p2)],
        jnp.asarray(hash_idx), jnp.asarray(scale_idx)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_musiq_scorer_end_to_end():
    """3-scale protocol on an arbitrary-size image: static patch grids,
    finite deterministic score."""
    fm = _mini_flax()
    img = np.random.default_rng(1).random((80, 120, 3), dtype=np.float32)
    sizes = mq._scale_sizes(80, 120, (48, 64))
    assert sizes[0] == (80, 120)
    assert max(sizes[1]) == 48 and max(sizes[2]) == 64

    # init with the real scorer inputs
    x = jnp.asarray(img)
    scales, hashes, sids = [], [], []
    for si, (sh, sw) in enumerate(sizes):
        p, hidx = mq.extract_patches(x, sh, sw)
        scales.append(p)
        hashes.append(hidx)
        sids.append(np.full(hidx.shape, si, np.int32))
    params = fm.init(jax.random.PRNGKey(0), scales,
                     jnp.asarray(np.concatenate(hashes)),
                     jnp.asarray(np.concatenate(sids)))
    sc = mq.MusiqScorer(params, model=fm, longer_sides=(48, 64))
    a, b = sc(img), sc(img)
    assert a == b and math.isfinite(a)


def test_musiq_hash_grid():
    """Hash indices stay in [0, G^2) and spread over the grid."""
    idx = mq._grid(7, 13)
    assert idx.min() >= 0 and idx.max() < mq.HSE_GRID ** 2
    assert len(np.unique(idx)) > 20
