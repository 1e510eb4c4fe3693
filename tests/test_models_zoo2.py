"""Tests for HAT, MAXIM, RIDCP and the DCNv2 op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.models import build_model, list_models
from image_restoration_agent_tpu.ops.dcn import modulated_deform_conv

pytestmark = pytest.mark.slow


def _run(name, h, w, seed=0):
    m = build_model(name)
    x = jnp.asarray(np.random.default_rng(seed).random((1, h, w, 3),
                                                       dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    return np.asarray(m.apply(p, x))


class TestHAT:
    def test_sr_x4_shape(self):
        out = _run("hat_tiny", 16, 16)
        assert out.shape == (1, 64, 64, 3)

    def test_rpi_oca_matches_torch_negative_indexing(self):
        """Our modulo-wrapped index must equal torch's negative-index gather
        on the reference's raw (possibly negative) indices."""
        torch = pytest.importorskip("torch")
        from image_restoration_agent_tpu.models.hat import rpi_oca
        ws, owin = 8, 12
        idx = rpi_oca(ws, owin)
        assert idx.shape == (64, 144)
        assert idx.min() >= 0 and idx.max() < (ws + owin - 1) ** 2
        # reference raw index computation
        co = torch.stack(torch.meshgrid(
            [torch.arange(ws), torch.arange(ws)], indexing="ij")).flatten(1)
        ce = torch.stack(torch.meshgrid(
            [torch.arange(owin), torch.arange(owin)],
            indexing="ij")).flatten(1)
        rel = (ce[:, None, :] - co[:, :, None]).permute(1, 2, 0) \
            + (ws - owin + 1)
        rel[:, :, 0] *= ws + owin - 1
        raw = rel.sum(-1)
        table = torch.arange((ws + owin - 1) ** 2)
        want = table[raw.view(-1)].view(64, 144).numpy()
        np.testing.assert_array_equal(idx, want)


class TestMAXIM:
    def test_shape_and_finite(self):
        out = _run("maxim_tiny", 32, 32)
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(out).all()

    def test_variants_registered(self):
        assert "maxim_s2" in list_models() and "maxim_s3" in list_models()


class TestRIDCP:
    def test_shape_and_finite(self):
        out = _run("ridcp_tiny", 32, 32)
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(out).all()

    def test_quantizer_snaps_to_codebook(self):
        from image_restoration_agent_tpu.models.ridcp import VectorQuantizer
        vq = VectorQuantizer(n_embed=4, embed_dim=3, use_weight=False)
        z = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 2, 2, 3)).astype(np.float32))
        params = vq.init(jax.random.PRNGKey(0), z)
        zq, idx = vq.apply(params, z)
        cb = np.asarray(params["params"]["codebook"])
        got = np.asarray(zq).reshape(-1, 3)
        ids = np.asarray(idx).reshape(-1)
        np.testing.assert_allclose(got, cb[ids], atol=1e-6)
        # each quantized vector is genuinely the argmin of distances
        z_flat = np.asarray(z).reshape(-1, 3)
        d = ((z_flat[:, None] - cb[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(ids, d.argmin(1))


class TestDCN:
    def test_matches_loop_reference(self, rng):
        B, H, W, Cin, Cout, K, G = 1, 6, 7, 4, 5, 3, 2
        x = rng.standard_normal((B, H, W, Cin), dtype=np.float32)
        off = (rng.standard_normal((B, H, W, 2 * G * K * K)) * 1.5).astype(
            np.float32)
        mask = rng.random((B, H, W, G * K * K), dtype=np.float32)
        w = rng.standard_normal((K, K, Cin, Cout)).astype(np.float32) * 0.2
        bias = rng.standard_normal(Cout).astype(np.float32)

        def bil(img, y, x_):
            h, wd, c = img.shape
            y0, x0 = int(np.floor(y)), int(np.floor(x_))
            out = np.zeros(c, np.float32)
            for (yi, xi, wt) in [
                (y0, x0, (1 - (y - y0)) * (1 - (x_ - x0))),
                (y0, x0 + 1, (1 - (y - y0)) * (x_ - x0)),
                (y0 + 1, x0, (y - y0) * (1 - (x_ - x0))),
                (y0 + 1, x0 + 1, (y - y0) * (x_ - x0)),
            ]:
                if 0 <= yi < h and 0 <= xi < wd:
                    out += wt * img[yi, xi]
            return out

        pad, cg = (K - 1) // 2, Cin // G
        want = np.zeros((B, H, W, Cout), np.float32)
        for b in range(B):
            for i in range(H):
                for j in range(W):
                    acc = np.zeros(Cout, np.float32)
                    for ky in range(K):
                        for kx in range(K):
                            tap = ky * K + kx
                            for g in range(G):
                                dy = off[b, i, j, (g * K * K + tap) * 2]
                                dx = off[b, i, j, (g * K * K + tap) * 2 + 1]
                                m = mask[b, i, j, g * K * K + tap]
                                s = bil(x[b, :, :, g * cg:(g + 1) * cg],
                                        i + ky - pad + dy,
                                        j + kx - pad + dx) * m
                                acc += s @ w[ky, kx, g * cg:(g + 1) * cg, :]
                    want[b, i, j] = acc + bias

        got = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
            jnp.asarray(w), jnp.asarray(bias), kernel=K,
            deformable_groups=G))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_zero_offset_equals_conv(self, rng):
        """With zero offsets and unit mask, DCN == ordinary conv."""
        B, H, W, C = 1, 8, 8, 4
        x = rng.standard_normal((B, H, W, C), dtype=np.float32)
        w = rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.2
        off = np.zeros((B, H, W, 2 * 9), np.float32)
        mask = np.ones((B, H, W, 9), np.float32)
        got = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask),
            jnp.asarray(w), None, kernel=3, deformable_groups=1))
        want = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(x.transpose(0, 3, 1, 2)),
            jnp.asarray(w.transpose(3, 2, 0, 1)),
            (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=1e-4)
