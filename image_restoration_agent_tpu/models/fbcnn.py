"""FBCNN in Flax/NHWC (rebuild of FBCNN/models/network_fbcnn.py).

Flexible blind JPEG artifact removal: a 4-level conv U-Net whose decoder is
modulated by a quality factor. The QF is predicted from the bottleneck
(ResBlocks -> GAP -> MLP -> sigmoid) or supplied by the caller (the
reference serves blind plus pinned-QF variants: fbcnn_blind / fbcnn_5 /
fbcnn_90); a QF embedding MLP emits per-level (gamma, beta) that FiLM-style
modulate QFAttention residual blocks: ``x + (gamma * res(x) + beta)``.
Downs are stride-2 convs (k=2), ups are transposed convs (k=2, s=2); skip
connections are additive (x+x4 before up3, +x3 after, +x2 after up2, +x1
before the tail conv).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import Conv
from .registry import ModelSpec, register_model


class ResBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        r = Conv(self.ch, kernel=3, name="c1")(x)
        r = nn.relu(r)
        r = Conv(self.ch, kernel=3, name="c2")(r)
        return x + r


class QFAttention(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, gamma, beta):
        r = Conv(self.ch, kernel=3, name="c1")(x)
        r = nn.relu(r)
        r = Conv(self.ch, kernel=3, name="c2")(r)
        return x + gamma[:, None, None, :] * r + beta[:, None, None, :]


class MLP(nn.Module):
    dims: Sequence[int]
    final: Optional[str] = None
    relu_between: bool = True

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"fc{i}")(x)
            if self.relu_between and i < len(self.dims) - 1:
                x = nn.relu(x)
        return {"sigmoid": nn.sigmoid, "tanh": nn.tanh, "relu": nn.relu,
                None: lambda v: v}[self.final](x)


class FBCNN(nn.Module):
    nc: Sequence[int] = (64, 128, 256, 512)
    nb: int = 4
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, qf_input: Optional[jnp.ndarray] = None):
        b, h, w, _ = x.shape
        ph, pw = (-h) % 8, (-w) % 8
        if ph or pw:  # replication pad (reference ReplicationPad2d)
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        nc, nb = self.nc, self.nb

        x1 = Conv(nc[0], kernel=3, name="head")(x)
        y = x1
        # skips[lvl] is what the decoder adds after the up to nc[lvl]:
        # lvl 0 -> x1 (head out), lvl 1 -> x2 (post down0), lvl 2 -> x3.
        skips = {0: x1}
        for lvl in range(3):
            for i in range(nb):
                y = ResBlock(nc[lvl], name=f"down{lvl}_res{i}")(y)
            y = Conv(nc[lvl + 1], kernel=2, stride=2,
                     name=f"down{lvl}_stride")(y)
            if lvl < 2:
                skips[lvl + 1] = y
        x4 = y
        for i in range(nb):
            y = ResBlock(nc[3], name=f"body_enc{i}")(y)

        # quality-factor prediction head
        q = y
        for i in range(nb):
            q = ResBlock(nc[3], name=f"qf_pred_res{i}")(q)
        q = jnp.mean(q, axis=(1, 2))
        qf = MLP((512, 512, 1), final="sigmoid", name="qf_pred_mlp")(q)

        for i in range(nb):
            y = ResBlock(nc[3], name=f"body_dec{i}")(y)

        qf_in = qf if qf_input is None else jnp.broadcast_to(
            jnp.asarray(qf_input, jnp.float32).reshape(1, 1), (b, 1))
        emb = MLP((512, 512, 512), final="relu", name="qf_embed")(qf_in)

        y = y + x4
        # up3: nc[3] -> nc[2], modulated, then +x3 (= skips[2])
        for idx, lvl in enumerate((2, 1, 0)):
            gamma = MLP((nc[lvl],), final="sigmoid",
                        name=f"to_gamma_{lvl + 1}")(emb)
            beta = MLP((nc[lvl],), final="tanh",
                       name=f"to_beta_{lvl + 1}")(emb)
            y = nn.ConvTranspose(nc[lvl], (2, 2), strides=(2, 2),
                                 name=f"up{lvl}_t")(y)
            for i in range(nb):
                y = QFAttention(nc[lvl], name=f"up{lvl}_qf{i}")(y, gamma,
                                                                beta)
            y = y + skips[lvl]

        out = Conv(self.out_channels, kernel=3, name="tail")(y)
        return out[:, :h, :w, :]


for _name, _qf in (("fbcnn_blind", None), ("fbcnn_qf5", 5 / 100.0),
                   ("fbcnn_qf90", 90 / 100.0)):
    register_model(ModelSpec(
        name=_name,
        build=(lambda qf: (lambda **kw: _PinnedQF(FBCNN(**kw), qf)))(_qf)
        if _qf is not None else (lambda **kw: FBCNN(**kw)),
        subtasks=("jpeg compression artifact removal",),
        pad_multiple=8, pad_kind="edge",
        tile=None,
        config=dict(),
    ))

register_model(ModelSpec(
    name="fbcnn_tiny",
    build=lambda **kw: FBCNN(**kw),
    subtasks=("jpeg compression artifact removal",),
    pad_multiple=8, pad_kind="edge",
    tile=None,
    config=dict(nc=(8, 12, 16, 24), nb=1),
))


class _PinnedQF(nn.Module):
    """Wrap FBCNN with a fixed quality-factor input (fbcnn_5 / fbcnn_90)."""

    inner: FBCNN
    qf: float

    @nn.compact
    def __call__(self, x):
        return self.inner(x, qf_input=self.qf)
