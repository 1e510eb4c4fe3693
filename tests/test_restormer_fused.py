"""Interpret-mode equivalence of the fused Restormer block kernels
(ops/restormer_fused.py) against the unfused XLA path.

Reference semantics: restormer_arch.py TransformerBlock —
x + Attention(LN(x)); x + FeedForward(LN(x)).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_restoration_agent_tpu.models.common import RestormerLayerNorm
from image_restoration_agent_tpu.models.restormer import GDFN, MDTABlock
from image_restoration_agent_tpu.ops.restormer_fused import (
    gdfn_block_pallas, mdta_block_pallas, restormer_fused_supported)


def _ln_params(key, c, bias_free):
    scale = jax.random.normal(key, (c,)) * 0.1 + 1.0
    if bias_free:
        return {"weight": scale}, (scale,)
    bias = jax.random.normal(jax.random.fold_in(key, 1), (c,)) * 0.1
    return {"weight": scale, "bias": bias}, (scale, bias)


@pytest.mark.parametrize("bias_free", [False, True])
@pytest.mark.parametrize("use_bias", [False, True])
def test_gdfn_fused_matches_xla(bias_free, use_bias):
    key = jax.random.PRNGKey(0)
    b, h, w, c = 2, 16, 128, 24
    x = jax.random.normal(key, (b, h, w, c), jnp.float32)

    ffn = GDFN(expansion=2.66, use_bias=use_bias)
    pf = ffn.init(jax.random.PRNGKey(1), x)
    ln = RestormerLayerNorm(bias_free=bias_free)
    ln_tree, ln_tuple = _ln_params(jax.random.PRNGKey(2), c, bias_free)

    ref = x + ffn.apply(pf, ln.apply({"params": ln_tree}, x))

    p = pf["params"]
    hid = int(c * 2.66)
    get = lambda name: p[name]["Conv_0"]
    out = gdfn_block_pallas(
        x, ln_tuple,
        get("project_in")["kernel"],
        get("project_in").get("bias") if use_bias else None,
        get("dwconv")["kernel"],
        get("dwconv").get("bias") if use_bias else None,
        get("project_out")["kernel"],
        get("project_out").get("bias") if use_bias else None,
        interpret=True)

    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert hid * 2 == p["project_in"]["Conv_0"]["kernel"].shape[-1]


@pytest.mark.parametrize("num_heads", [1, 2])
@pytest.mark.parametrize("use_bias", [False, True])
def test_mdta_fused_matches_xla(num_heads, use_bias):
    key = jax.random.PRNGKey(0)
    b, h, w, c = 2, 16, 128, 24
    x = jax.random.normal(key, (b, h, w, c), jnp.float32)

    attn = MDTABlock(num_heads=num_heads, use_bias=use_bias)
    pa = attn.init(jax.random.PRNGKey(1), x)
    ln = RestormerLayerNorm(bias_free=False)
    ln_tree, ln_tuple = _ln_params(jax.random.PRNGKey(2), c, False)

    y = ln.apply({"params": ln_tree}, x)
    ref = x + attn.apply(pa, y)

    p = pa["params"]
    get = lambda name: p[name]["Conv_0"]
    out = mdta_block_pallas(
        x, ln_tuple,
        get("qkv")["kernel"],
        get("qkv").get("bias") if use_bias else None,
        get("qkv_dwconv")["kernel"],
        get("qkv_dwconv").get("bias") if use_bias else None,
        get("project_out")["kernel"],
        get("project_out").get("bias") if use_bias else None,
        p["temperature"],
        num_heads=num_heads, interpret=True)

    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_supported_shapes():
    assert restormer_fused_supported(256, 256, 96, 510)
    assert restormer_fused_supported(720, 1280, 48, 254)
    assert not restormer_fused_supported(100, 100, 48, 254)  # 100 % 8 != 0
    assert not restormer_fused_supported(256, 64, 48, 254)   # too narrow


def test_gdfn_no_ln():
    """ln=None path (LN applied by the caller)."""
    key = jax.random.PRNGKey(3)
    b, h, w, c = 1, 8, 128, 16
    x = jax.random.normal(key, (b, h, w, c), jnp.float32)
    ffn = GDFN(expansion=2.0, use_bias=False)
    pf = ffn.init(jax.random.PRNGKey(4), x)
    ref = x + ffn.apply(pf, x)
    p = pf["params"]
    out = gdfn_block_pallas(
        x, None,
        p["project_in"]["Conv_0"]["kernel"], None,
        p["dwconv"]["Conv_0"]["kernel"], None,
        p["project_out"]["Conv_0"]["kernel"], None,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_model_fused_path_param_tree_and_output():
    """Init with the XLA path, apply with the fused (interpret) path: the
    param trees must be identical and outputs must match — guards the
    checkpoint-layout compatibility of the raw-param holders."""
    from image_restoration_agent_tpu.models.restormer import (
        TransformerBlock)
    from image_restoration_agent_tpu.ops import restormer_fused as rf

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 128, 16), jnp.float32)
    blk = TransformerBlock(num_heads=2, expansion=2.0)

    rf.set_fused_mode("off")
    try:
        p_off = blk.init(jax.random.PRNGKey(1), x)
        ref = blk.apply(p_off, x)
        rf.set_fused_mode("interpret")
        p_int = blk.init(jax.random.PRNGKey(1), x)
        same = jax.tree_util.tree_all(jax.tree.map(
            lambda a, b: a.shape == b.shape, p_off, p_int))
        assert same
        out = blk.apply(p_off, x)
    finally:
        rf.set_fused_mode("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
