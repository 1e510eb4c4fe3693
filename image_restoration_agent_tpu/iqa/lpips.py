"""LPIPS (Learned Perceptual Image Patch Similarity) in Flax/NHWC.

TPU rebuild of the metric the reference scores with via pyiqa
(AgenticIR/utils/scorer.py:10-16, FR metric "lpips"). Architecture per the
published LPIPS v0.1 ("alex" net, the pyiqa default):

- ScalingLayer: input in [-1, 1], shifted/scaled by fixed per-channel
  constants;
- AlexNet feature trunk (5 conv stages, taps after each ReLU);
- per-tap channel-unit-normalization, squared diff, learned non-negative
  1x1 conv head (no bias), spatial mean, sum over taps.

Weights convert from the standard ``lpips`` package checkpoint layout
(``net.slice{N}`` torchvision AlexNet features + ``lin{N}.model.1.weight``)
via `convert/torch_import.lpips_rules`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# ScalingLayer constants (LPIPS v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet 'features' config: (out, kernel, stride, pad), maxpool before
# stages 1 and 2.
_ALEX = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1))
_POOL_BEFORE = (1, 2)  # maxpool(3, 2) before these stage indices


class AlexFeatures(nn.Module):
    """AlexNet conv trunk returning the 5 post-ReLU taps."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (f, k, s, p) in enumerate(_ALEX):
            if i in _POOL_BEFORE:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(f, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
        return taps


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """lpips(img0, img1) with inputs in [0, 1] NHWC (converted internally
    to the reference's [-1, 1] + ScalingLayer convention)."""

    @nn.compact
    def __call__(self, x0, x1):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def prep(x):
            x = 2.0 * x - 1.0
            return (x - shift) / scale

        trunk = AlexFeatures(name="net")
        t0 = trunk(prep(x0))
        t1 = trunk(prep(x1))
        total = 0.0
        for i, (a, b) in enumerate(zip(t0, t1)):
            d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (d.shape[-1],))
            # 1x1 conv, no bias == channel-weighted sum
            val = jnp.sum(d * w[None, None, None, :], axis=-1)
            total = total + jnp.mean(val, axis=(1, 2))
        return total
