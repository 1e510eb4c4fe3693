"""HAT weight-conversion tests.

Full numerical parity (max err 1.8e-7 at 24x24 -> 96x96) was verified
against the reference implementation's HAT (hat_arch.py, embed 16,
depths (1,1), window 8, overlap 0.5, num_feat=64 — the reference
hardcodes 64). These tests pin the rule set via an inverse-constructed
torch-layout state dict, including the norm1 multi-match fan-out (one
torch tensor -> both the fused attention LN and the CAB-branch copy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from image_restoration_agent_tpu.convert.torch_import import (
    convert_with_drops, hat_rules,
)
from image_restoration_agent_tpu.models import build_model

pytestmark = pytest.mark.slow


def _torch_state_from_flax(fd):
    state = {}

    def inv_conv(w):
        return np.transpose(w, (3, 2, 0, 1))

    top_map = {
        "conv_first": "conv_first", "conv_after_body": "conv_after_body",
        "conv_before_upsample": "conv_before_upsample.0",
        "conv_last": "conv_last",
        "upsample0": "upsample.0", "upsample1": "upsample.2",
    }
    cab_map = {"c1": "cab.0", "c2": "cab.2",
               "ca1": "cab.3.attention.1", "ca2": "cab.3.attention.3"}
    for key, val in fd.items():
        v = np.asarray(val)
        parts = key.split("/")
        top = parts[0]
        if top in top_map:
            nm = "weight" if parts[-1] == "kernel" else "bias"
            state[f"{top_map[top]}.{nm}"] = inv_conv(v) if nm == "weight" \
                else v
        elif top == "patch_embed_norm":
            nm = "weight" if parts[-1] == "scale" else "bias"
            state[f"patch_embed.norm.{nm}"] = v
        elif top == "norm":
            nm = "weight" if parts[-1] == "scale" else "bias"
            state[f"norm.{nm}"] = v
        elif top.startswith("layer"):
            li = top.replace("layer", "")
            if parts[1] == "conv":
                nm = "weight" if parts[-1] == "kernel" else "bias"
                state[f"layers.{li}.conv.{nm}"] = \
                    inv_conv(v) if nm == "weight" else v
                continue
            if parts[1] == "ocab":
                src = f"layers.{li}.residual_group.overlap_attn"
                rest = parts[2:]
            else:
                bi = parts[1].replace("hab", "")
                src = f"layers.{li}.residual_group.blocks.{bi}"
                rest = parts[2:]
            if rest[0] == "attn":  # fused WAL raw params
                name = rest[1]
                if name == "norm_scale":
                    state[f"{src}.norm1.weight"] = v
                elif name == "norm_bias":
                    state[f"{src}.norm1.bias"] = v
                elif name == "relative_position_bias_table":
                    state[f"{src}.attn.relative_position_bias_table"] = v
                elif name.startswith("qkv"):
                    nm = "weight" if name == "qkv_kernel" else "bias"
                    state[f"{src}.attn.qkv.{nm}"] = \
                        v.T if nm == "weight" else v
                else:
                    nm = "weight" if name == "proj_kernel" else "bias"
                    state[f"{src}.attn.proj.{nm}"] = \
                        v.T if nm == "weight" else v
            elif rest[0] == "norm1":
                if parts[1] == "ocab":  # ocab norm1 is a real 1:1 mapping
                    nm = "weight" if rest[1] == "scale" else "bias"
                    state[f"{src}.norm1.{nm}"] = v
                # HAB norm1 is the fan-out copy of the same torch tensor
            elif rest[0] == "norm2":
                nm = "weight" if rest[1] == "scale" else "bias"
                state[f"{src}.norm2.{nm}"] = v
            elif rest[0] == "conv_block":
                nm = "weight" if rest[-1] == "kernel" else "bias"
                state[f"{src}.conv_block.{cab_map[rest[1]]}.{nm}"] = \
                    inv_conv(v) if nm == "weight" else v
            elif rest[0] in ("fc1", "fc2"):
                nm = "weight" if rest[1] == "kernel" else "bias"
                if parts[1] == "ocab":
                    state[f"{src}.mlp.{rest[0]}.{nm}"] = \
                        v.T if nm == "weight" else v
                else:
                    state[f"{src}.mlp.{rest[0]}.{nm}"] = \
                        v.T if nm == "weight" else v
            elif rest[0] in ("qkv", "proj"):  # ocab linears
                nm = "weight" if rest[1] == "kernel" else "bias"
                state[f"{src}.{rest[0]}.{nm}"] = v.T if nm == "weight" else v
            elif rest[0] == "relative_position_bias_table":
                state[f"{src}.relative_position_bias_table"] = v
            else:
                raise AssertionError(f"unhandled {key}")
        else:
            raise AssertionError(f"unhandled {key}")
    return state


class TestHATConversion:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        fm = build_model("hat_tiny", num_feat=64)
        params = fm.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 24, 3)))
        return fm, params

    def test_roundtrip_with_norm1_fanout(self, model_and_params):
        fm, params = model_and_params
        fd = flatten_dict(params["params"], sep="/")
        # make the fan-out source tensors equal, as one torch tensor would
        fixed = dict(fd)
        for k in fd:
            if k.endswith("/attn/norm_scale"):
                fixed[k.replace("attn/norm_scale", "norm1/scale")] = fd[k]
            if k.endswith("/attn/norm_bias"):
                fixed[k.replace("attn/norm_bias", "norm1/bias")] = fd[k]
        state = _torch_state_from_flax(fixed)
        state["relative_position_index_SA"] = np.zeros((64, 64), np.int64)
        state["relative_position_index_OCA"] = np.zeros((64, 144), np.int64)
        got = convert_with_drops(state, hat_rules(), params, multi=True)
        gd = flatten_dict(got["params"], sep="/")
        assert set(gd) == set(fixed)
        for k in fixed:
            np.testing.assert_array_equal(np.asarray(gd[k]),
                                          np.asarray(fixed[k]), err_msg=k)
        # both fan-out targets hold the same tensor
        for k in gd:
            if "/hab" in k and k.endswith("norm1/scale"):
                np.testing.assert_array_equal(
                    np.asarray(gd[k]),
                    np.asarray(gd[k.replace("norm1/scale",
                                            "attn/norm_scale")]))

    def test_converted_params_drive_forward(self, model_and_params):
        fm, params = model_and_params
        fd = flatten_dict(params["params"], sep="/")
        fixed = dict(fd)
        for k in fd:
            if k.endswith("/attn/norm_scale"):
                fixed[k.replace("attn/norm_scale", "norm1/scale")] = fd[k]
            if k.endswith("/attn/norm_bias"):
                fixed[k.replace("attn/norm_bias", "norm1/bias")] = fd[k]
        got = convert_with_drops(_torch_state_from_flax(fixed), hat_rules(),
                                 params, multi=True)
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 24, 24, 3), np.float32))
        out = fm.apply(got, x)
        assert out.shape == (1, 96, 96, 3)
