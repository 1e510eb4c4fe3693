"""Strip-kernel v2 (folded roll + query-major logits + edge-mask bank):
CPU interpret-mode equivalence against the XLA reference paths."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.models import build_model
from image_restoration_agent_tpu.ops.pallas_attention import (
    roll2d_pallas, swin_strip_pallas)
from image_restoration_agent_tpu.ops.window_attention import (
    relative_position_index, shift_attention_mask)

pytestmark = pytest.mark.slow

WS = 4
S = WS // 2
N = WS * WS
C = 8
HEADS = 2


def _strip_args(rng, h, w):
    x = jnp.asarray(rng.standard_normal((1, h, w, C), dtype=np.float32))
    ln_s = jnp.asarray(rng.standard_normal(C).astype(np.float32)) * 0.1 + 1
    ln_b = jnp.asarray(rng.standard_normal(C).astype(np.float32)) * 0.1
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32))
    bqkv = jnp.asarray(rng.standard_normal(3 * C).astype(np.float32))
    wproj = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32))
    bproj = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    table = jnp.asarray(
        rng.standard_normal(((2 * WS - 1) ** 2, HEADS)).astype(np.float32))
    idx = jnp.asarray(relative_position_index(WS).reshape(-1))
    rpb = table[idx].reshape(N, N, HEADS).transpose(2, 0, 1)
    return x, (ln_s, ln_b, wqkv, bqkv, wproj, bproj, rpb)


def _bank():
    m = shift_attention_mask(2 * WS, 2 * WS, WS, S)
    return jnp.asarray(m.reshape(2, 2, N, N))


class TestMaskBank:
    def test_bank_expands_to_full_mask_any_canvas(self):
        """The 4 canonical patterns tile any (H, W) canvas's full mask."""
        bank = np.asarray(_bank())
        for h, w in ((4 * WS, 6 * WS), (2 * WS, 2 * WS), (5 * WS, 3 * WS)):
            full = shift_attention_mask(h, w, WS, S)
            rows, cols = h // WS, w // WS
            full = full.reshape(rows, cols, N, N)
            for r in range(rows):
                for c in range(cols):
                    want = bank[int(r == rows - 1), int(c == cols - 1)]
                    np.testing.assert_array_equal(full[r, c], want)


class TestStripKernelV2:
    def test_dc0_matches_legacy_full_mask(self, rng):
        """Query-major kernel with a full mask == same kernel with the edge
        bank (the masks are equivalent by TestMaskBank)."""
        x, ps = _strip_args(rng, 4 * WS, 6 * WS)
        full = jnp.asarray(shift_attention_mask(4 * WS, 6 * WS, WS, S))
        # pin one mode: this test checks mask semantics, not backends
        # (full-mask mode always routes to stacked)
        a = swin_strip_pallas(x, *ps, full, num_heads=HEADS, ws=WS,
                              attn_mode="stacked", interpret=True)
        b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                              mask_bank=_bank(), attn_mode="stacked",
                              interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_folded_roll_equals_explicit_roll(self, rng):
        """strip(x, dc) == strip(roll(x, dc)) for both directions."""
        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        for dc in (-S, S):
            want = swin_strip_pallas(
                jnp.roll(x, (dc, dc), axis=(1, 2)), *ps, None,
                num_heads=HEADS, ws=WS, interpret=True)
            got = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                    dc=dc, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5)

    def test_matches_unfused_reference(self, rng):
        """Kernel == LN -> qkv -> window attention -> proj -> +residual in
        plain jnp (shifted case with the edge bank)."""
        from image_restoration_agent_tpu.ops.window_attention import (
            window_attention, window_partition, window_reverse)

        h, w = 4 * WS, 6 * WS
        x, (ln_s, ln_b, wqkv, bqkv, wproj, bproj, rpb) = \
            _strip_args(rng, h, w)
        table_like = None  # window_attention takes the raw table
        # rebuild the raw table from rpb is awkward; instead compute the
        # reference directly with einsum using rpb
        full_mask = jnp.asarray(shift_attention_mask(h, w, WS, S))

        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
        yw = window_partition(y, WS).reshape(-1, N, C)
        qkv = yw @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // HEADS

        def heads_of(t):
            return t.reshape(-1, N, HEADS, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads_of(q), heads_of(k), heads_of(v)
        lg = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) * hd ** -0.5
        lg = lg + rpb[None]
        nw = full_mask.shape[0]
        lg = lg + jnp.tile(full_mask[:, None], (yw.shape[0] // nw, 1, 1, 1))
        p = jax.nn.softmax(lg, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, vh).transpose(0, 2, 1, 3)
        o = o.reshape(-1, N, C)
        xw_raw = window_partition(x, WS).reshape(-1, N, C)  # pre-norm shortcut
        o = xw_raw + o @ wproj + bproj
        want = window_reverse(o.reshape(-1, WS, WS, C), WS, h, w)

        got = swin_strip_pallas(
            x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, rpb, None,
            num_heads=HEADS, ws=WS, mask_bank=_bank(), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5)


class TestModelFramesPath:
    def test_pallas_block_model_matches_xla(self, rng):
        """Whole tiny SwinIR through the strip+frames path (interpret) ==
        the XLA path, on a shape with shifts (min(h,w) > ws)."""
        from image_restoration_agent_tpu.models import swinir as sw
        from image_restoration_agent_tpu.ops import pallas_attention as pa

        orig = (sw.swin_strip_pallas, sw.mlp_block_pallas, sw.roll2d_pallas)
        try:
            sw.swin_strip_pallas = functools.partial(
                pa.swin_strip_pallas, interpret=True)
            sw.mlp_block_pallas = functools.partial(
                pa.mlp_block_pallas, interpret=True)
            sw.roll2d_pallas = functools.partial(
                pa.roll2d_pallas, interpret=True)

            m_x = build_model("swinir_tiny", attention_impl="xla")
            m_p = build_model("swinir_tiny", attention_impl="pallas_block")
            x = jnp.asarray(rng.random((1, 16, 24, 3), dtype=np.float32))
            p = m_x.init(jax.random.PRNGKey(0), x)
            out_x = m_x.apply(p, x)
            out_p = m_p.apply(p, x)
            np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                       atol=2e-5)
        finally:
            (sw.swin_strip_pallas, sw.mlp_block_pallas,
             sw.roll2d_pallas) = orig


class TestPairedMode:
    def test_paired_matches_stacked(self, rng):
        """attn_mode='paired' (2 windows per MXU dot group, cross-window
        logits masked by the fused bias constant) == stacked, for the
        unshifted, shifted+bank, and folded-roll cases."""
        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        for dc, bank in ((0, None), (0, _bank()), (-S, _bank()), (S, None)):
            a = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc,
                                  attn_mode="stacked", interpret=True)
            b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc,
                                  attn_mode="paired", interpret=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_odd_window_count_falls_back(self, rng):
        """nwin odd -> the paired path silently routes to stacked."""
        x, ps = _strip_args(rng, 2 * WS, 3 * WS)
        a = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                              attn_mode="stacked", interpret=True)
        b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                              attn_mode="paired", interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestFusedMlp:
    def _mlp_params(self, rng, hidden=2 * C):
        return (
            jnp.asarray(rng.standard_normal(C).astype(np.float32)) * 0.1 + 1,
            jnp.asarray(rng.standard_normal(C).astype(np.float32)) * 0.1,
            jnp.asarray(rng.standard_normal((C, hidden)).astype(np.float32)),
            jnp.asarray(rng.standard_normal(hidden).astype(np.float32)),
            jnp.asarray(rng.standard_normal((hidden, C)).astype(np.float32)),
            jnp.asarray(rng.standard_normal(C).astype(np.float32)),
        )

    def test_paired_fused_mlp_matches_two_kernels(self, rng):
        """paired kernel with the MLP half-block fused in == attention
        kernel followed by mlp_block_pallas (even nwin so the paired body
        actually runs, not the stacked fallback)."""
        from image_restoration_agent_tpu.ops.pallas_attention import (
            mlp_block_pallas)

        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        mlp = self._mlp_params(rng)
        for dc, bank in ((0, None), (-S, _bank())):
            attn_only = swin_strip_pallas(
                x, *ps, None, num_heads=HEADS, ws=WS, mask_bank=bank,
                dc=dc, attn_mode="paired", interpret=True)
            tok = mlp_block_pallas(attn_only.reshape(-1, C), *mlp,
                                   interpret=True)
            want = tok.reshape(attn_only.shape)
            got = swin_strip_pallas(
                x, *ps, None, num_heads=HEADS, ws=WS, mask_bank=bank,
                dc=dc, attn_mode="paired", mlp=mlp, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-5)

    def test_stacked_fallback_applies_mlp(self, rng):
        """Odd nwin routes paired -> stacked; the mlp contract must hold
        there too (applied as a second kernel)."""
        from image_restoration_agent_tpu.ops.pallas_attention import (
            mlp_block_pallas)

        x, ps = _strip_args(rng, 2 * WS, 3 * WS)
        mlp = self._mlp_params(rng)
        attn_only = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                      attn_mode="paired", interpret=True)
        tok = mlp_block_pallas(attn_only.reshape(-1, C), *mlp,
                               interpret=True)
        want = tok.reshape(attn_only.shape)
        got = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                attn_mode="paired", mlp=mlp, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)


class TestFastmath:
    def test_fastmath_close_to_exact(self, rng):
        """fastmath (tanh-GELU + clamp-softmax, the bf16 serving default)
        must track the exact kernel within the GELU-approx error envelope;
        guards the flag threading through the paired body + fused MLP."""
        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        mlp = TestFusedMlp._mlp_params(TestFusedMlp(), rng)
        exact = swin_strip_pallas(
            x, *ps, None, num_heads=HEADS, ws=WS, mask_bank=_bank(),
            dc=-S, attn_mode="paired2", mlp=mlp, interpret=True)
        fast = swin_strip_pallas(
            x, *ps, None, num_heads=HEADS, ws=WS, mask_bank=_bank(),
            dc=-S, attn_mode="paired2", mlp=mlp, fastmath=True,
            interpret=True)
        diff = np.abs(np.asarray(exact) - np.asarray(fast))
        assert diff.max() < 5e-2  # tanh-GELU approx, amplified by fc2
        # mean error stays far below bf16 resolution of O(1) activations
        assert diff.mean() < 2e-3


class TestPerHeadMode:
    def test_perhead_matches_stacked(self, rng):
        """attn_mode='perhead' (32-padded per-head dots via reordered
        weights) must be numerically equivalent to the stacked mode."""
        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        a = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                              mask_bank=_bank(), dc=-S, interpret=True)
        b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                              mask_bank=_bank(), dc=-S,
                              attn_mode="perhead", interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestPaired2Mode:
    def test_paired2_matches_stacked(self, rng):
        """attn_mode='paired2' (2-head block-diagonal K/V groups, 64-wide
        contraction) == stacked, for unshifted, shifted+bank and folded
        roll."""
        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        for dc, bank in ((0, None), (0, _bank()), (-S, _bank()), (S, None)):
            a = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc,
                                  attn_mode="stacked", interpret=True)
            b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc,
                                  attn_mode="paired2", interpret=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_paired2_fused_mlp(self, rng):
        from image_restoration_agent_tpu.ops.pallas_attention import (
            mlp_block_pallas)

        x, ps = _strip_args(rng, 2 * WS, 4 * WS)
        mlp = TestFusedMlp._mlp_params(TestFusedMlp(), rng)
        attn_only = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                      mask_bank=_bank(), dc=-S,
                                      attn_mode="paired2", interpret=True)
        tok = mlp_block_pallas(attn_only.reshape(-1, C), *mlp,
                               interpret=True)
        want = tok.reshape(attn_only.shape)
        got = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                mask_bank=_bank(), dc=-S,
                                attn_mode="paired2", mlp=mlp,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_odd_heads_falls_back(self, rng):
        """num_heads odd -> paired2 silently routes to paired. C=8 with one
        head exercises the fallback (8 % 2 == 0 heads requirement)."""
        x = jnp.asarray(rng.standard_normal((1, 2 * WS, 2 * WS, C),
                                            dtype=np.float32))
        _, ps = _strip_args(rng, 2 * WS, 2 * WS)
        ln_s, ln_b, wqkv, bqkv, wproj, bproj, _ = ps
        table = jnp.asarray(
            rng.standard_normal((N, N, 1)).astype(np.float32))
        rpb1 = table.transpose(2, 0, 1)
        a = swin_strip_pallas(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                              rpb1, None, num_heads=1, ws=WS,
                              attn_mode="stacked", interpret=True)
        b = swin_strip_pallas(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                              rpb1, None, num_heads=1, ws=WS,
                              attn_mode="paired2", interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


class TestPaired2RolledMode:
    """attn_mode='paired2r' (register-fused ROLLED pair bodies, the bf16
    serving default): must match paired2 fastmath exactly — same math, only
    the pair loop is a fori_loop with partial unrolling (keeps Mosaic
    lowering O(unroll) instead of O(strip width), the round-3 driver-bench
    timeout fix)."""

    def test_paired2r_matches_paired2_fastmath(self, rng):
        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        mlp = TestFusedMlp._mlp_params(TestFusedMlp(), rng)
        for dc, bank in ((0, None), (-S, _bank()), (S, _bank())):
            a = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc, mlp=mlp,
                                  attn_mode="paired2", fastmath=True,
                                  interpret=True)
            b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc, mlp=mlp,
                                  attn_mode="paired2r", fastmath=True,
                                  interpret=True)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_packexp_softmax_bit_identical(self, rng):
        """Live-lane packed softmax (ablate="packexp": exp2/normalize run
        on the four live (n, n) diagonal blocks packed dense instead of
        the half-dead (m, 2m) logits) is BIT-identical — dead lanes
        contribute exp2(-1e9) = 0.0 to the sums either way."""
        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        mlp = TestFusedMlp._mlp_params(TestFusedMlp(), rng)
        for dc, bank in ((0, None), (-S, _bank())):
            a = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc, mlp=mlp,
                                  attn_mode="paired2r", fastmath=True,
                                  interpret=True)
            b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc, mlp=mlp,
                                  attn_mode="paired2r", fastmath=True,
                                  ablate="packexp", interpret=True)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"dc={dc}")

    def test_paired2r_unroll_variants(self, rng):
        """fori-rolled (ur=1), partial (ur=2), and full unroll (ur=0) are
        the same program over different loop structures."""
        x, ps = _strip_args(rng, 2 * WS, 4 * WS)
        outs = [swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=_bank(), dc=-S,
                                  attn_mode="paired2r", fastmath=True,
                                  r_unroll=ur, interpret=True)
                for ur in (0, 1, 2)]
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(outs[1]))
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(outs[2]))

    def test_paired2r_chunked_grid(self, rng):
        """paired2r + forced column chunking (the headline's 2D grid) with
        the cyclic roll crossing chunk boundaries via the sliver refs."""
        x, ps = _strip_args(rng, 2 * WS, 4 * WS)
        for dc in (0, -S):
            a = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=_bank() if dc else None, dc=dc,
                                  attn_mode="paired2", fastmath=True,
                                  interpret=True)
            b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=_bank() if dc else None, dc=dc,
                                  attn_mode="paired2r", fastmath=True,
                                  wchunk_override=2 * WS, interpret=True)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestChunkedGrid:
    """Column-chunked 2D-grid mode (full-canvas untiled path): the kernel
    body stays at chunk width while the grid covers the whole canvas; the
    folded roll's column part spans chunk boundaries via paired col refs."""

    def test_chunked_matches_unchunked(self, rng):
        x, ps = _strip_args(rng, 4 * WS, 6 * WS)  # 6 windows wide
        for dc, bank in ((0, None), (0, _bank()), (-S, _bank()), (S, None),
                         (S, _bank()), (-S, None)):
            want = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                     mask_bank=bank, dc=dc,
                                     attn_mode="paired2", interpret=True)
            got = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                    mask_bank=bank, dc=dc,
                                    attn_mode="paired2",
                                    wchunk_override=2 * WS,  # 3 col chunks
                                    interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, err_msg=f"dc={dc}")

    def test_chunked_fused_mlp(self, rng):
        mlp = TestFusedMlp._mlp_params(TestFusedMlp(), rng)
        x, ps = _strip_args(rng, 2 * WS, 8 * WS)
        want = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                 mask_bank=_bank(), dc=-S,
                                 attn_mode="paired2", mlp=mlp,
                                 interpret=True)
        got = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                mask_bank=_bank(), dc=-S,
                                attn_mode="paired2", mlp=mlp,
                                wchunk_override=4 * WS,  # 2 col chunks
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    def test_chunked_multibatch(self, rng):
        """b > 1 (tile batches also ride the 2D grid)."""
        x1, ps = _strip_args(rng, 4 * WS, 4 * WS)
        x = jnp.concatenate([x1, x1[:, ::-1]], axis=0)
        want = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                 mask_bank=_bank(), dc=-S,
                                 attn_mode="paired2", interpret=True)
        got = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                mask_bank=_bank(), dc=-S,
                                attn_mode="paired2",
                                wchunk_override=2 * WS,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_superstrip_rrows(self, rng):
        """rrows > 1 (superstrips: R window-rows per grid step) matches the
        single-row program bit-exactly, chunked and unchunked, all shifts.
        Amortizes the per-grid-step fixed I/O cost (VERDICT r3 #3)."""
        mlp = TestFusedMlp._mlp_params(TestFusedMlp(), rng)
        x, ps = _strip_args(rng, 6 * WS, 6 * WS)  # 6 rows: rrows 2,3 divide
        for dc, bank in ((0, None), (-S, _bank()), (S, _bank())):
            want = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                     mask_bank=bank, dc=dc, mlp=mlp,
                                     attn_mode="paired2", fastmath=True,
                                     interpret=True)
            for wc in (None, 2 * WS):
                for rp in (2, 3):
                    got = swin_strip_pallas(
                        x, *ps, None, num_heads=HEADS, ws=WS,
                        mask_bank=bank, dc=dc, mlp=mlp,
                        attn_mode="paired2r", fastmath=True,
                        wchunk_override=wc, rrows_pref=rp, interpret=True)
                    np.testing.assert_allclose(
                        np.asarray(got), np.asarray(want), atol=2e-5,
                        err_msg=f"dc={dc} wc={wc} rrows={rp}")

    def test_pair_fused_matches_sequential_chain(self, rng):
        """swin_pair_strip_pallas (two full blocks per invocation,
        intermediates VMEM-resident) is bit-identical to the sequential
        paired2r fastmath chain at both RSTB entry frames (dc1=0 for the
        first pair, dc1=+S for subsequent pairs whose input sits in frame
        -S), unchunked and column-chunked."""
        from image_restoration_agent_tpu.ops.pallas_attention import (
            swin_pair_strip_pallas)

        x, ps_a = _strip_args(rng, 4 * WS, 4 * WS)
        _, ps_b = _strip_args(rng, 4 * WS, 4 * WS)
        mk = TestFusedMlp()
        mlp_a, mlp_b = mk._mlp_params(rng), mk._mlp_params(rng)
        bank = _bank()
        blk_a = (*ps_a, *mlp_a)
        blk_b = (*ps_b, *mlp_b)
        for dc1 in (0, S):
            ya = swin_strip_pallas(
                x, *ps_a, None, num_heads=HEADS, ws=WS, dc=dc1, mlp=mlp_a,
                attn_mode="paired2r", fastmath=True, interpret=True)
            want = swin_strip_pallas(
                ya, *ps_b, None, num_heads=HEADS, ws=WS, mask_bank=bank,
                dc=-S, mlp=mlp_b, attn_mode="paired2r", fastmath=True,
                interpret=True)
            for wc in (None, 2 * WS):
                got = swin_pair_strip_pallas(
                    x, blk_a, blk_b, bank, num_heads=HEADS, ws=WS,
                    dc1=dc1, wchunk_override=wc, interpret=True)
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(want),
                    err_msg=f"dc1={dc1} wc={wc}")

    def test_chunk_width_helpers(self):
        from image_restoration_agent_tpu.ops.pallas_attention import (
            pad_width_for_strips, strip_chunk_width)

        assert strip_chunk_width(1920) == 384  # lane-aligned, r4 sweep
        assert strip_chunk_width(1280) == 256
        assert strip_chunk_width(2048) == 256
        assert strip_chunk_width(1928) is None  # 8 * prime
        wp = pad_width_for_strips(1923)
        assert wp >= 1928 and wp % 8 == 0
        assert strip_chunk_width(wp) is not None


class TestHATStripPath:
    def test_hat_pallas_block_matches_xla(self, rng):
        """HAT's HAB attention branch through the strip kernel (folded
        roll + edge bank + roll2d back, CAB added outside) == XLA path."""
        import functools

        import jax

        from image_restoration_agent_tpu.models import build_model
        from image_restoration_agent_tpu.models import swinir as sw
        from image_restoration_agent_tpu.ops import pallas_attention as pa

        orig = (sw.swin_strip_pallas, sw.wmsa_block_pallas,
                sw.mlp_block_pallas)
        import image_restoration_agent_tpu.models.hat as hat_mod
        orig_roll = pa.roll2d_pallas
        try:
            sw.swin_strip_pallas = functools.partial(
                pa.swin_strip_pallas, interpret=True)
            sw.mlp_block_pallas = functools.partial(
                pa.mlp_block_pallas, interpret=True)
            sw.wmsa_block_pallas = functools.partial(
                pa.wmsa_block_pallas, interpret=True)
            pa.roll2d_pallas = functools.partial(
                pa.roll2d_pallas, interpret=True)

            # depth 2 so the second HAB actually shifts
            m_x = build_model("hat_tiny", attention_impl="xla",
                              depths=(2, 2), num_heads=(2, 2))
            m_p = build_model("hat_tiny", attention_impl="pallas_block",
                              depths=(2, 2), num_heads=(2, 2))
            x = jnp.asarray(rng.random((1, 16, 24, 3), dtype=np.float32))
            p = m_x.init(jax.random.PRNGKey(0), x)
            out_x = m_x.apply(p, x)
            out_p = m_p.apply(p, x)
            np.testing.assert_allclose(np.asarray(out_p),
                                       np.asarray(out_x), atol=2e-5)
        finally:
            (sw.swin_strip_pallas, sw.wmsa_block_pallas,
             sw.mlp_block_pallas) = orig
            pa.roll2d_pallas = orig_roll


class TestPaired2Rolled:
    def test_paired2r_matches_stacked(self, rng):
        """attn_mode='paired2r' (fori_loop pair body, npair-independent
        compile) == stacked for unshifted, shifted+bank, folded roll."""
        x, ps = _strip_args(rng, 4 * WS, 4 * WS)
        for dc, bank in ((0, None), (0, _bank()), (-S, _bank()), (S, None)):
            a = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc,
                                  attn_mode="stacked", interpret=True)
            b = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                  mask_bank=bank, dc=dc,
                                  attn_mode="paired2r", interpret=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_paired2r_fused_mlp(self, rng):
        from image_restoration_agent_tpu.ops.pallas_attention import (
            mlp_block_pallas)

        x, ps = _strip_args(rng, 2 * WS, 4 * WS)
        mlp = TestFusedMlp._mlp_params(TestFusedMlp(), rng)
        attn_only = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                      mask_bank=_bank(), dc=-S,
                                      attn_mode="paired2r", interpret=True)
        tok = mlp_block_pallas(attn_only.reshape(-1, C), *mlp,
                               interpret=True)
        want = tok.reshape(attn_only.shape)
        got = swin_strip_pallas(x, *ps, None, num_heads=HEADS, ws=WS,
                                mask_bank=_bank(), dc=-S,
                                attn_mode="paired2r", mlp=mlp,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)
