"""IFAN conversion parity against an in-test torch implementation of the
published architecture (IFAN/models/archs/IFAN.py + models/IAC.py +
models/nn_common.py):

- encoder stages = Sequential(conv, LeakyReLU(0.1)) x3, stride 2 on the
  first conv of levels 2-4;
- ResnetBlock applies LeakyReLU AFTER each inner residual add, with an
  outer skip when res_num > 1 (nn_common.py:29-54);
- IAC: N iterations of separable per-pixel filtering (SAC) + bias +
  LeakyReLU, where SAC uses kernel1 in BOTH passes (the acknowledged
  upstream bug at IAC.py:36-37 that released checkpoints bake in);
- out_res is conv+LeakyReLU before the global residual and clip.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from image_restoration_agent_tpu.convert.torch_import import (  # noqa: E402
    convert_state_dict, ifan_rules)
from image_restoration_agent_tpu.models.ifan import IFAN  # noqa: E402

pytestmark = pytest.mark.slow


def _conv(cin, cout, k=3, stride=1, act=True):
    c = tnn.Conv2d(cin, cout, k, stride=stride, padding=(k - 1) // 2)
    return tnn.Sequential(c, tnn.LeakyReLU(0.1)) if act else c


class TResBlock(tnn.Module):
    def __init__(self, c, res_num):
        super().__init__()
        self.res_num = res_num
        self.stem = tnn.ModuleList([
            tnn.Sequential(
                tnn.Conv2d(c, c, 3, padding=1), tnn.LeakyReLU(0.1),
                tnn.Conv2d(c, c, 3, padding=1))
            for _ in range(res_num)])

    def forward(self, x):
        temp = x
        for i in range(self.res_num):
            x = tF.leaky_relu(x + self.stem[i](x), 0.1)
        if self.res_num > 1:
            x = x + temp
        return x


def t_sac(feat, k1, _k2, ksize):
    n, _, h, w = k1.shape
    c = feat.size(1)
    pad = (ksize - 1) // 2
    f = tF.pad(feat, (0, 0, pad, pad), mode="replicate")
    f = f.unfold(2, ksize, 1).permute(0, 2, 3, 1, 4).reshape(n, h, w, c, -1)
    kk = k1.permute(0, 2, 3, 1).reshape(n, h, w, c, ksize)
    f = (f * kk).sum(-1).permute(0, 3, 1, 2)
    f = tF.pad(f, (pad, pad, 0, 0), mode="replicate")
    f = f.unfold(3, ksize, 1).permute(0, 2, 3, 1, 4).reshape(n, h, w, c, -1)
    # upstream bug: kernel1 again
    return (f * kk).sum(-1).permute(0, 3, 1, 2)


def t_iac(feat, filters, n, c, k):
    fs = torch.split(filters[:, : n * c * k * 2], c * k * 2, dim=1)
    bs = torch.split(filters[:, n * c * k * 2:], c, dim=1)
    out = feat
    for i in range(n):
        k1, k2 = torch.split(fs[i], c * k, dim=1)
        out = t_sac(out, k1, k2, k)
        out = tF.leaky_relu(out + bs[i], 0.1)
    return out


class TIFAN(tnn.Module):
    def __init__(self, ch=8, res_num=2, n_iters=2, fs=3):
        super().__init__()
        ch1, ch2, ch3, ch4 = ch, ch * 2, ch * 4, ch * 4
        self.N, self.Fs, self.ch4 = n_iters, fs, ch4
        for pre in ("conv", "kconv"):
            cin = 3
            for lvl, f in ((1, ch1), (2, ch2), (3, ch3), (4, ch4)):
                setattr(self, f"{pre}{lvl}_1",
                        _conv(cin, f, stride=2 if lvl > 1 else 1))
                setattr(self, f"{pre}{lvl}_2", _conv(f, f))
                setattr(self, f"{pre}{lvl}_3", _conv(f, f))
                cin = f
        self.DME = tnn.Sequential(
            _conv(ch4, ch4), TResBlock(ch4, res_num), TResBlock(ch4, res_num),
            _conv(ch4, 1, act=False))
        self.conv_DME = _conv(1, ch4)
        self.conv4_4 = tnn.Sequential(
            _conv(2 * ch4, ch4), TResBlock(ch4, res_num),
            TResBlock(ch4, res_num), _conv(ch4, ch4))
        kernel_dim = n_iters * (ch4 * fs * 2) + n_iters * ch4
        self.F = tnn.Sequential(
            _conv(ch4, ch4), TResBlock(ch4, res_num), TResBlock(ch4, res_num),
            _conv(ch4, kernel_dim, k=1, act=False))
        self.conv_res = tnn.Sequential(
            _conv(ch4, ch4), TResBlock(ch4, 3), _conv(ch4, ch4))
        for lvl, (ci, co) in ((3, (ch4, ch3)), (2, (ch3, ch2)),
                              (1, (ch2, ch1))):
            setattr(self, f"upconv{lvl}_u", tnn.Sequential(
                tnn.ConvTranspose2d(ci, co, 4, stride=2, padding=1),
                tnn.LeakyReLU(0.1)))
            setattr(self, f"upconv{lvl}_1", TResBlock(co, 1))
            setattr(self, f"upconv{lvl}_2", TResBlock(co, 1))
        self.out_res = _conv(ch1, 3)

    def forward(self, x):
        f1 = self.conv1_3(self.conv1_2(self.conv1_1(x)))
        f2 = self.conv2_3(self.conv2_2(self.conv2_1(f1)))
        f3 = self.conv3_3(self.conv3_2(self.conv3_1(f2)))
        f_c = self.conv4_3(self.conv4_2(self.conv4_1(f3)))

        g = self.kconv1_3(self.kconv1_2(self.kconv1_1(x)))
        g = self.kconv2_3(self.kconv2_2(self.kconv2_1(g)))
        g = self.kconv3_3(self.kconv3_2(self.kconv3_1(g)))
        g = self.kconv4_3(self.kconv4_2(self.kconv4_1(g)))

        dm = self.DME(g)
        f_dm = self.conv_DME(dm)
        g = self.conv4_4(torch.cat([g, f_dm], 1))
        filters = self.F(g)

        y = t_iac(f_c, filters, self.N, self.ch4, self.Fs)
        y = self.conv_res(y)
        y = self.upconv3_u(y) + f3
        y = self.upconv3_2(self.upconv3_1(y))
        y = self.upconv2_u(y) + f2
        y = self.upconv2_2(self.upconv2_1(y))
        y = self.upconv1_u(y) + f1
        y = self.upconv1_2(self.upconv1_1(y))
        return torch.clip(self.out_res(y) + x, 0, 1.0)


@pytest.mark.parametrize("res_num", [1, 2])
def test_ifan_conversion_forward_parity(res_num):
    torch.manual_seed(0)
    tm = TIFAN(ch=8, res_num=res_num, n_iters=2, fs=3).eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}

    fm = IFAN(ch=8, res_num=res_num, n_iters=2, filter_size=3)
    template = jax.eval_shape(
        lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    params = convert_state_dict(state, ifan_rules(res_num),
                                template=template)

    rng = np.random.default_rng(1)
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    got = np.asarray(fm.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ifan_registry_shapes():
    from image_restoration_agent_tpu.models import build_model
    m = build_model("ifan_tiny")
    x = jnp.zeros((1, 16, 16, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == (1, 16, 16, 3)
