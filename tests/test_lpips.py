"""LPIPS Flax port: conversion + forward parity against an in-test torch
implementation of LPIPS v0.1 'alex' (ScalingLayer -> AlexNet taps ->
unit-normalize -> squared diff -> non-negative 1x1 heads -> spatial mean ->
sum), the metric the reference scores with via pyiqa
(AgenticIR/utils/scorer.py:10-16)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_with_drops, lpips_rules)
from image_restoration_agent_tpu.iqa.lpips import LPIPS  # noqa: E402

pytestmark = pytest.mark.slow

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


class TAlex(tnn.Module):
    """torchvision AlexNet 'features' trunk with post-ReLU taps."""

    def __init__(self):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),
        )

    def forward(self, x):
        taps = []
        for i, m in enumerate(self.features):
            x = m(x)
            if i in (1, 4, 7, 9, 11):
                taps.append(x)
        return taps


class TLPIPS(tnn.Module):
    def __init__(self):
        super().__init__()
        self.trunk = TAlex()
        chans = (64, 192, 384, 256, 256)
        self.lins = tnn.ModuleList([
            tnn.Conv2d(c, 1, 1, bias=False) for c in chans])
        for lin in self.lins:
            with torch.no_grad():
                lin.weight.abs_()

    @staticmethod
    def _norm(x, eps=1e-10):
        return x / (x.pow(2).sum(1, keepdim=True).sqrt() + eps)

    def forward(self, a, b):
        a = (2 * a - 1 - _SHIFT) / _SCALE
        b = (2 * b - 1 - _SHIFT) / _SCALE
        ta, tb = self.trunk(a), self.trunk(b)
        total = 0.0
        for lin, fa, fb in zip(self.lins, ta, tb):
            d = (self._norm(fa) - self._norm(fb)).pow(2)
            total = total + lin(d).mean(dim=(2, 3))
        return total.squeeze(1)


def _convert(tm):
    # emit the merged "torchvision trunk + lin heads" naming scheme
    state = {}
    for k, v in tm.trunk.state_dict().items():
        state[k] = v.numpy()  # features.{idx}.weight/bias
    for i, lin in enumerate(tm.lins):
        state[f"lin{i}.model.1.weight"] = lin.weight.detach().numpy()
    state["scaling_layer.shift"] = _SHIFT.numpy()
    state["scaling_layer.scale"] = _SCALE.numpy()
    model = LPIPS()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3))))
    return convert_with_drops(state, lpips_rules(), template=template)


def test_lpips_conversion_forward_parity():
    torch.manual_seed(0)
    tm = TLPIPS().eval()
    params = _convert(tm)

    rng = np.random.default_rng(2)
    a = rng.random((2, 64, 64, 3), dtype=np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32),
                0, 1)
    with torch.no_grad():
        want = tm(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                  torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(LPIPS().apply(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lpips_zero_for_identical():
    model = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 3),
                                                    dtype=np.float32))
    p = model.init(jax.random.PRNGKey(0), x, x)
    assert float(model.apply(p, x, x)[0]) == pytest.approx(0.0, abs=1e-7)


def test_scorer_lpips_path():
    """Scorer returns a real number for 'lpips' when params are provided,
    None otherwise (no checkpoint dir)."""
    from image_restoration_agent_tpu.iqa.scorer import Scorer

    rng = np.random.default_rng(3)
    img = rng.random((40, 40, 3), dtype=np.float32)
    ref = np.clip(img + 0.05, 0, 1)

    sc_none = Scorer(metrics=("lpips",),
                     lpips_dir="/nonexistent/lpips")
    assert sc_none.score_arrays(img, ref)["lpips"] is None

    model = LPIPS()
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 40, 40, 3)),
                   jnp.zeros((1, 40, 40, 3)))
    sc = Scorer(metrics=("psnr", "lpips"), lpips_params=p)
    out = sc.score_arrays(img, ref)
    assert isinstance(out["lpips"], float) and out["lpips"] > 0
    assert out["psnr"] > 0
