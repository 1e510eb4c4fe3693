"""Numeric parity tests for shared ops vs independently-written torch refs.

These guard the "bit-near parity with torch" risk (SURVEY.md §7): each op is
checked against a from-first-principles torch implementation built from
torch.nn primitives inside the test (NOT copied from the reference repo).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from image_restoration_agent_tpu.ops import (  # noqa: E402
    layer_norm_2d, layer_norm_bias_free, layer_norm_with_bias,
    simple_gate, gated_gelu, pixel_shuffle, pixel_unshuffle,
    mdta_attention, window_partition, window_reverse, window_attention,
    relative_position_index,
)


class TestLayerNorms:
    def test_layer_norm_2d_matches_manual_torch(self, rng):
        x = rng.standard_normal((2, 5, 6, 8), dtype=np.float32)
        w = rng.standard_normal(8).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        # NAFNet LayerNorm2d math on NCHW, dim=1:
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        mu = xt.mean(1, keepdim=True)
        var = (xt - mu).pow(2).mean(1, keepdim=True)
        y = (xt - mu) / (var + 1e-6).sqrt()
        want = (torch.from_numpy(w).view(1, 8, 1, 1) * y
                + torch.from_numpy(b).view(1, 8, 1, 1)).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(layer_norm_2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bias_free_keeps_mean(self, rng):
        x = rng.standard_normal((3, 4, 4, 6), dtype=np.float32) + 5.0
        w = np.ones(6, np.float32)
        got = np.asarray(layer_norm_bias_free(jnp.asarray(x), jnp.asarray(w)))
        # mean must NOT be removed: var is central but x is only scaled.
        xt = torch.from_numpy(x)
        sigma = xt.var(-1, keepdim=True, unbiased=False)
        want = (xt / torch.sqrt(sigma + 1e-5)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert np.abs(got).mean() > 1.0  # mean survived

    def test_with_bias_matches_torch_layernorm(self, rng):
        x = rng.standard_normal((2, 3, 3, 16), dtype=np.float32)
        w = rng.standard_normal(16).astype(np.float32)
        b = rng.standard_normal(16).astype(np.float32)
        want = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b),
            eps=1e-5).numpy()
        got = np.asarray(layer_norm_with_bias(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestGates:
    def test_simple_gate(self, rng):
        x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
        got = np.asarray(simple_gate(jnp.asarray(x)))
        np.testing.assert_allclose(got, x[..., :4] * x[..., 4:], atol=1e-6)

    def test_gated_gelu_exact_erf(self, rng):
        x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
        want = (torch.nn.functional.gelu(torch.from_numpy(x[..., :4]))
                * torch.from_numpy(x[..., 4:])).numpy()
        got = np.asarray(gated_gelu(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestPixelShuffle:
    def test_matches_torch(self, rng):
        x = rng.standard_normal((2, 3, 5, 16), dtype=np.float32)
        want = torch.pixel_shuffle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_unshuffle_matches_torch(self, rng):
        x = rng.standard_normal((2, 6, 10, 4), dtype=np.float32)
        want = torch.pixel_unshuffle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 12), dtype=np.float32))
        y = pixel_unshuffle(pixel_shuffle(x, 2), 2)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


class TestMDTA:
    def test_matches_torch_reference_math(self, rng):
        """Independently re-derive MDTA in torch: normalize(q/k over HW),
        (q @ k^T) * temp, softmax over last dim, @ v."""
        b, h, w, c, heads = 2, 6, 5, 8, 2
        q = rng.standard_normal((b, h, w, c), dtype=np.float32)
        k = rng.standard_normal((b, h, w, c), dtype=np.float32)
        v = rng.standard_normal((b, h, w, c), dtype=np.float32)
        temp = rng.standard_normal(heads).astype(np.float32)

        def to_heads(x):
            # NHWC -> (b, heads, c_h, hw) with torch's rearrange semantics
            # 'b (head c) h w -> b head c (h w)' applied to NCHW.
            t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
            return t.reshape(b, heads, c // heads, h * w)

        qt, kt, vt = to_heads(q), to_heads(k), to_heads(v)
        qt = torch.nn.functional.normalize(qt, dim=-1)
        kt = torch.nn.functional.normalize(kt, dim=-1)
        attn = (qt @ kt.transpose(-2, -1)) * torch.from_numpy(temp).view(heads, 1, 1)
        attn = attn.softmax(dim=-1)
        out = attn @ vt
        want = out.reshape(b, c, h, w).numpy().transpose(0, 2, 3, 1)

        got = np.asarray(mdta_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(temp), heads))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestWindowAttention:
    def test_partition_reverse_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 4), dtype=np.float32))
        back = window_reverse(window_partition(x, 8), 8, 16, 24)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)

    def test_relative_position_index_properties(self):
        ws = 4
        idx = relative_position_index(ws)
        assert idx.shape == (16, 16)
        assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2
        # center diagonal: zero relative offset maps to the same table entry
        assert len(set(idx[np.arange(16), np.arange(16)])) == 1

    def test_matches_torch_mha_math(self, rng):
        """Re-derive windowed MHA with RPB in torch primitives."""
        nwb, ws, c, heads = 4, 4, 8, 2
        n = ws * ws
        hd = c // heads
        qkv = rng.standard_normal((nwb, n, 3 * c), dtype=np.float32)
        table = rng.standard_normal(((2 * ws - 1) ** 2, heads)).astype(np.float32)

        t = torch.from_numpy(qkv).reshape(nwb, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = t[0] * hd ** -0.5, t[1], t[2]
        attn = q @ k.transpose(-2, -1)
        idx = torch.from_numpy(relative_position_index(ws).astype(np.int64))
        bias = torch.from_numpy(table)[idx.view(-1)].view(n, n, heads)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        attn = attn.softmax(dim=-1)
        want = (attn @ v).transpose(1, 2).reshape(nwb, n, c).numpy()

        got = np.asarray(window_attention(
            jnp.asarray(qkv), heads, jnp.asarray(table), ws))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_shift_mask_blocks_cross_region(self):
        from image_restoration_agent_tpu.ops.window_attention import (
            shift_attention_mask)
        m = shift_attention_mask(16, 16, 8, 4)
        assert m.shape == (4, 64, 64)
        assert set(np.unique(m)) == {-100.0, 0.0}
        # first window (top-left) is contiguous: no masking
        assert (m[0] == 0).all()
