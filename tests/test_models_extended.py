"""Tests for the extended zoo (DehazeFormer, MPRNet, FBCNN, X-Restormer)
and the fused Pallas window-attention kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.models import build_model, list_models

pytestmark = pytest.mark.slow


def _run(name, h, w, **kw):
    m = build_model(name, **kw)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3),
                                                    dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    return np.asarray(m.apply(p, x))


class TestDehazeFormer:
    def test_shape_and_crop(self):
        out = _run("dehazeformer_tiny", 30, 34)
        assert out.shape == (1, 30, 34, 3)

    def test_variants_registered(self):
        for v in ("dehazeformer_t", "dehazeformer_s", "dehazeformer_b"):
            assert v in list_models()

    def test_kb_head_identity_property(self):
        """Output = K*x - B + x; with zeroed final conv, out == input."""
        m = build_model("dehazeformer_tiny")
        x = jnp.asarray(np.random.default_rng(1).random(
            (1, 16, 16, 3), dtype=np.float32))
        p = m.init(jax.random.PRNGKey(0), x)
        p = jax.tree.map(lambda a: a, p)  # copy
        import flax
        flat = flax.traverse_util.flatten_dict(p, sep="/")
        for k in flat:
            if "patch_unembed" in k:
                flat[k] = jnp.zeros_like(flat[k])
        p0 = flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()})
        out = m.apply(p0, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


class TestMPRNet:
    def test_shape(self):
        out = _run("mprnet_tiny", 32, 32)
        assert out.shape == (1, 32, 32, 3)

    def test_requires_even_dims_handled_by_engine_padding(self):
        # model itself assumes H,W divisible by 8 (engine pads)
        out = _run("mprnet_tiny", 40, 48)
        assert out.shape == (1, 40, 48, 3)


class TestFBCNN:
    def test_blind_shape(self):
        out = _run("fbcnn_tiny", 30, 34)
        assert out.shape == (1, 30, 34, 3)

    def test_pinned_qf_changes_output(self):
        from image_restoration_agent_tpu.models.fbcnn import FBCNN
        m = FBCNN(nc=(8, 12, 16, 24), nb=1)
        x = jnp.asarray(np.random.default_rng(2).random(
            (1, 16, 16, 3), dtype=np.float32))
        p = m.init(jax.random.PRNGKey(0), x)
        out_blind = m.apply(p, x)
        out_q5 = m.apply(p, x, qf_input=0.05)
        out_q90 = m.apply(p, x, qf_input=0.9)
        assert not np.allclose(np.asarray(out_q5), np.asarray(out_q90))
        assert out_blind.shape == out_q5.shape


class TestXRestormer:
    def test_shape(self):
        out = _run("xrestormer_tiny", 64, 64)
        assert out.shape == (1, 64, 64, 3)

    def test_ocab_unfold_matches_torch(self, rng):
        """conv_general_dilated_patches must reproduce torch Unfold's
        (c-major, spatial-minor) feature ordering."""
        torch = pytest.importorskip("torch")
        b, h, w, c = 1, 16, 16, 4
        ws, owin, pad = 8, 12, 2
        x = rng.standard_normal((b, h, w, c), dtype=np.float32)

        want = torch.nn.functional.unfold(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            kernel_size=(owin, owin), stride=ws, padding=pad).numpy()
        # want: (b, c*owin*owin, L) with (c, i, j) ordering, c major

        xp = jnp.pad(jnp.asarray(x), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        got = jax.lax.conv_general_dilated_patches(
            xp.transpose(0, 3, 1, 2), filter_shape=(owin, owin),
            window_strides=(ws, ws), padding="VALID")
        got = np.asarray(got).reshape(b, c * owin * owin, -1)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestPallasWMSA:
    def test_matches_xla_reference_interpret(self, rng):
        from image_restoration_agent_tpu.ops.window_attention import (
            relative_position_index, shift_attention_mask, window_attention)
        from image_restoration_agent_tpu.ops.pallas_attention import (
            wmsa_pallas)

        nwb, ws, C, heads = 32, 4, 16, 2
        n = ws * ws
        qkv = jnp.asarray(rng.standard_normal((nwb, n, 3 * C),
                                              dtype=np.float32))
        table = jnp.asarray(
            rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(
                np.float32))
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        rpb = table[idx].reshape(n, n, heads).transpose(2, 0, 1)

        want = window_attention(qkv, heads, table, ws)
        got = wmsa_pallas(qkv, rpb, None, num_heads=heads, g=8,
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)

        mask = jnp.asarray(shift_attention_mask(16, 16, ws, 2))
        want_m = window_attention(qkv, heads, table, ws, mask=mask)
        got_m = wmsa_pallas(qkv, rpb, mask, num_heads=heads, g=8,
                            interpret=True)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   atol=2e-6)

    def test_swinir_pallas_flag_matches_xla_interpret(self, rng):
        """Whole tiny SwinIR with pallas-interpret attention == xla path."""
        from image_restoration_agent_tpu.ops import pallas_attention as pa
        import functools

        # monkeypatch interpret=True for CPU execution
        orig = pa.wmsa_pallas
        try:
            pa_interp = functools.partial(orig, interpret=True)
            from image_restoration_agent_tpu.models import swinir as sw
            sw.wmsa_pallas = pa_interp

            m_x = build_model("swinir_tiny", attention_impl="xla")
            m_p = build_model("swinir_tiny", attention_impl="pallas")
            x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
            p = m_x.init(jax.random.PRNGKey(0), x)
            out_x = m_x.apply(p, x)
            out_p = m_p.apply(p, x)
            np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                       atol=1e-5)
        finally:
            from image_restoration_agent_tpu.models import swinir as sw
            sw.wmsa_pallas = orig

    def test_odd_window_falls_back_to_xla(self, rng):
        """window_size=7 (swinir_jpeg_40) must not enter the Pallas fast
        path: roll2d/mlp_block assume even windows and %8 token counts.
        Forcing pallas_block must silently produce the xla result."""
        from image_restoration_agent_tpu.models.swinir import SwinIR

        kw = dict(embed_dim=16, depths=(2,), num_heads=(2,), window_size=7,
                  upsampler="")
        m_x = SwinIR(attention_impl="xla", **kw)
        m_p = SwinIR(attention_impl="pallas_block", **kw)
        # 21x19: multiple of 7 in H only — exercises both the strip-gate and
        # the windowed path; 1*21*21 tokens are not divisible by 8.
        x = jnp.asarray(rng.random((1, 21, 21, 3), dtype=np.float32))
        p = m_x.init(jax.random.PRNGKey(0), x)
        out_x = m_x.apply(p, x)
        out_p = m_p.apply(p, x)  # would crash at trace time un-gated
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=0, rtol=0)
