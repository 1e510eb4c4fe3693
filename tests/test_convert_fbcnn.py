"""Full numerical conversion parity for FBCNN against an in-test torch
implementation (validates the ConvTranspose flip transform and FiLM heads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_state_dict, fbcnn_rules_for)
from image_restoration_agent_tpu.models import build_model  # noqa: E402

pytestmark = pytest.mark.slow

NC = (8, 12, 16, 24)
NB = 1


def crc(c):
    return tnn.Sequential(tnn.Conv2d(c, c, 3, padding=1), tnn.ReLU(),
                          tnn.Conv2d(c, c, 3, padding=1))


class TRes(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.res = crc(c)

    def forward(self, x):
        return x + self.res(x)


class TQF(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.res = crc(c)

    def forward(self, x, g, b):
        return x + g.unsqueeze(-1).unsqueeze(-1) * self.res(x) + \
            b.unsqueeze(-1).unsqueeze(-1)


class TFBCNN(tnn.Module):
    def __init__(self):
        super().__init__()
        nc = NC
        self.m_head = tnn.Conv2d(3, nc[0], 3, padding=1)
        self.m_down1 = tnn.ModuleList(
            [TRes(nc[0]), tnn.Conv2d(nc[0], nc[1], 2, 2)])
        self.m_down2 = tnn.ModuleList(
            [TRes(nc[1]), tnn.Conv2d(nc[1], nc[2], 2, 2)])
        self.m_down3 = tnn.ModuleList(
            [TRes(nc[2]), tnn.Conv2d(nc[2], nc[3], 2, 2)])
        self.m_body_encoder = tnn.ModuleList([TRes(nc[3])])
        self.m_body_decoder = tnn.ModuleList([TRes(nc[3])])
        self.qf_pred = tnn.ModuleList([TRes(nc[3])])
        self.qf_fc = tnn.ModuleList([tnn.Linear(nc[3], 512),
                                     tnn.Linear(512, 512),
                                     tnn.Linear(512, 1)])
        self.qf_embed = tnn.ModuleList([tnn.Linear(1, 512),
                                        tnn.Linear(512, 512),
                                        tnn.Linear(512, 512)])
        self.to_gamma = tnn.ModuleList(
            [tnn.Linear(512, nc[i]) for i in (2, 1, 0)])
        self.to_beta = tnn.ModuleList(
            [tnn.Linear(512, nc[i]) for i in (2, 1, 0)])
        self.m_up3 = tnn.ModuleList(
            [tnn.ConvTranspose2d(nc[3], nc[2], 2, 2), TQF(nc[2])])
        self.m_up2 = tnn.ModuleList(
            [tnn.ConvTranspose2d(nc[2], nc[1], 2, 2), TQF(nc[1])])
        self.m_up1 = tnn.ModuleList(
            [tnn.ConvTranspose2d(nc[1], nc[0], 2, 2), TQF(nc[0])])
        self.m_tail = tnn.Conv2d(nc[0], 3, 3, padding=1)

    def forward(self, x):
        import torch.nn.functional as F

        x1 = self.m_head(x)
        y = self.m_down1[0](x1)
        y = self.m_down1[1](y)
        x2 = y
        y = self.m_down2[0](y)
        y = self.m_down2[1](y)
        x3 = y
        y = self.m_down3[0](y)
        y = self.m_down3[1](y)
        x4 = y
        y = self.m_body_encoder[0](y)
        q = self.qf_pred[0](y).mean((2, 3))
        qf = torch.sigmoid(self.qf_fc[2](F.relu(self.qf_fc[1](
            F.relu(self.qf_fc[0](q))))))
        y = self.m_body_decoder[0](y)
        emb = F.relu(self.qf_embed[2](F.relu(self.qf_embed[1](
            F.relu(self.qf_embed[0](qf))))))
        gammas = [torch.sigmoid(g(emb)) for g in self.to_gamma]
        betas = [torch.tanh(b(emb)) for b in self.to_beta]

        y = y + x4
        for idx, (up, skip) in enumerate(((self.m_up3, x3),
                                          (self.m_up2, x2),
                                          (self.m_up1, x1))):
            y = up[0](y)
            y = up[1](y, gammas[idx], betas[idx])
            y = y + skip
        return self.m_tail(y)


def _reference_names(tm) -> dict:
    out = {}
    for k, v in tm.state_dict().items():
        # map this test model's fc lists to the reference sequential indices
        k = k.replace("m_down1.1.", f"m_down1.{NB}.")
        k = k.replace("m_down2.1.", f"m_down2.{NB}.")
        k = k.replace("m_down3.1.", f"m_down3.{NB}.")
        for j, i in ((2, 6), (1, 4), (0, 2)):  # reverse: avoid re-mapping
            k = k.replace(f"qf_fc.{j}.", f"qf_pred.{NB + i}.")
        for j, i in ((2, 4), (1, 2), (0, 0)):
            k = k.replace(f"qf_embed.{j}.", f"qf_embed.{i}.")
        for j, lvl in ((0, 3), (1, 2), (2, 1)):
            k = k.replace(f"to_gamma.{j}.", f"to_gamma_{lvl}.0.")
            k = k.replace(f"to_beta.{j}.", f"to_beta_{lvl}.0.")
        out[k] = v.detach().numpy()
    return out


class TestFBCNNFullParity:
    def test_converted_model_matches_torch(self, rng):
        torch.manual_seed(0)
        tm = TFBCNN().eval()
        state = _reference_names(tm)

        fm = build_model("fbcnn_tiny")  # nc=(8,12,16,24), nb=1
        template = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        params = convert_state_dict(state, fbcnn_rules_for(NB), template)

        x = rng.random((1, 16, 16, 3), dtype=np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(fm.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                                   atol=5e-5)
