"""MAXIM (multi-axis gated MLP) in Flax/NHWC.

Rebuild of the published MAXIM architecture (arXiv:2201.02973; reference
vendored Flax at executor/dehazing/tools/maxim/maxim/models/maxim.py —
already JAX upstream, re-implemented here with this repo's conventions).

Structure: ``num_stages`` encoder/bottleneck/decoder stages. The spatial
mixer is the multi-axis gMLP (MAB): channels split in half, one half runs a
*grid* gMLP (global token mixing across a gh x gw grid), the other a *block*
gMLP (local mixing inside fh x fw blocks); gating units multiply one stream
by a learned projection of the other (+1 bias-centered). Channel mixing is
RCAB/RDCAB squeeze-excitation blocks. Skip connections and stage fusion go
through cross-gating blocks (each side gates the other with spatial gating
weights); stages are bridged by MPRNet-style SAM.

TPU notes: grid/block "partitions" are reshapes; the token-mixing Denses
contract the second-to-last axis via swapaxes — XLA keeps lanes on the
channel axis throughout. All shapes static; image sizes must be multiples of
``block size * 2**depth`` (the engine pads to spec.pad_multiple = 64).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Conv
from .registry import ModelSpec, register_model


def to_blocks(x, fh: int, fw: int):
    """(n, H, W, c) -> (n, gh*gw, fh*fw, c)."""
    n, h, w, c = x.shape
    gh, gw = h // fh, w // fw
    x = x.reshape(n, gh, fh, gw, fw, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, gh * gw, fh * fw, c)


def from_blocks(x, gh: int, gw: int, fh: int, fw: int):
    n = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(n, gh, gw, fh, fw, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, gh * fh, gw * fw, c)


class GatingUnit(nn.Module):
    """gMLP spatial gating: u * (W @ v + 1) along the given token axis."""

    axis: int  # -2: within-block tokens; -3: across-grid tokens

    @nn.compact
    def __call__(self, x):
        u, v = jnp.split(x, 2, axis=-1)
        v = nn.LayerNorm(name="norm")(v)
        n = x.shape[self.axis]
        v = jnp.swapaxes(v, -1, self.axis)
        v = nn.Dense(n, kernel_init=nn.initializers.truncated_normal(2e-2),
                     name="proj")(v)
        v = jnp.swapaxes(v, -1, self.axis)
        return u * (v + 1.0)


class AxisGmlp(nn.Module):
    """One gMLP over either the grid axis (global) or block axis (local)."""

    grid: bool  # True: grid mixing (axis -3), False: block mixing (axis -2)
    size: tuple[int, int]
    factor: int = 2

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        if self.grid:
            gh, gw = self.size
            fh, fw = h // gh, w // gw
        else:
            fh, fw = self.size
            gh, gw = h // fh, w // fw
        xb = to_blocks(x, fh, fw)
        y = nn.LayerNorm(name="norm")(xb)
        y = nn.Dense(c * self.factor, name="in_project")(y)
        y = nn.gelu(y)
        y = GatingUnit(axis=-3 if self.grid else -2, name="gate")(y)
        y = nn.Dense(c, name="out_project")(y)
        xb = xb + y
        return from_blocks(xb, gh, gw, fh, fw)


class MAB(nn.Module):
    """Multi-axis gated MLP block (residual split-head)."""

    block_size: tuple[int, int]
    grid_size: tuple[int, int]
    block_factor: int = 2
    grid_factor: int = 2
    input_proj_factor: int = 2

    @nn.compact
    def __call__(self, x):
        shortcut = x
        c = x.shape[-1]
        y = nn.LayerNorm(name="norm_in")(x)
        y = nn.Dense(c * self.input_proj_factor, name="in_project")(y)
        y = nn.gelu(y)
        u, v = jnp.split(y, 2, axis=-1)
        u = AxisGmlp(True, tuple(self.grid_size), self.grid_factor,
                     name="grid_gmlp")(u)
        v = AxisGmlp(False, tuple(self.block_size), self.block_factor,
                     name="block_gmlp")(v)
        y = jnp.concatenate([u, v], axis=-1)
        y = nn.Dense(c, name="out_project")(y)
        return y + shortcut


class CALayer(nn.Module):
    features: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv(self.features // self.reduction, kernel=1, name="c1")(y)
        y = nn.relu(y)
        y = Conv(self.features, kernel=1, name="c2")(y)
        return x * nn.sigmoid(y)


class RCAB(nn.Module):
    features: int
    reduction: int = 4
    lrelu_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(name="norm")(x)
        y = Conv(self.features, kernel=3, name="conv1")(y)
        y = nn.leaky_relu(y, negative_slope=self.lrelu_slope)
        y = Conv(self.features, kernel=3, name="conv2")(y)
        y = CALayer(self.features, self.reduction, name="ca")(y)
        return shortcut + y


class RDCAB(nn.Module):
    """Channel-MLP + channel attention (bottleneck channel mixer)."""

    features: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm")(x)
        y = nn.Dense(self.features, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.features, name="fc2")(y)
        y = CALayer(self.features, self.reduction, name="ca")(y)
        return x + y


class SpatialGatingWeights(nn.Module):
    block_size: tuple[int, int]
    grid_size: tuple[int, int]

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = nn.LayerNorm(name="norm_in")(x)
        y = nn.Dense(c * 2, name="in_project")(y)
        y = nn.gelu(y)
        u, v = jnp.split(y, 2, axis=-1)

        gh, gw = self.grid_size
        fh, fw = h // gh, w // gw
        ub = to_blocks(u, fh, fw)
        ub = jnp.swapaxes(ub, -1, -3)
        ub = nn.Dense(ub.shape[-1],
                      kernel_init=nn.initializers.normal(2e-2),
                      bias_init=nn.initializers.ones, name="grid_proj")(ub)
        ub = jnp.swapaxes(ub, -1, -3)
        u = from_blocks(ub, gh, gw, fh, fw)

        fh, fw = self.block_size
        gh2, gw2 = h // fh, w // fw
        vb = to_blocks(v, fh, fw)
        vb = jnp.swapaxes(vb, -1, -2)
        vb = nn.Dense(vb.shape[-1],
                      kernel_init=nn.initializers.normal(2e-2),
                      bias_init=nn.initializers.ones, name="block_proj")(vb)
        vb = jnp.swapaxes(vb, -1, -2)
        v = from_blocks(vb, gh2, gw2, fh, fw)

        y = jnp.concatenate([u, v], axis=-1)
        return nn.Dense(c, name="out_project")(y)


class CrossGatingBlock(nn.Module):
    features: int
    block_size: tuple[int, int]
    grid_size: tuple[int, int]
    upsample_y: bool = True

    @nn.compact
    def __call__(self, x, y):
        if self.upsample_y:
            y = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                 name="y_up")(y)
        x = Conv(self.features, kernel=1, name="x_proj")(x)
        y = Conv(x.shape[-1], kernel=1, name="y_proj")(y)
        sx, sy = x, y

        x = nn.LayerNorm(name="norm_x")(x)
        x = nn.Dense(x.shape[-1], name="in_project_x")(x)
        x = nn.gelu(x)
        gx = SpatialGatingWeights(tuple(self.block_size),
                                  tuple(self.grid_size), name="gating_x")(x)

        y = nn.LayerNorm(name="norm_y")(y)
        y = nn.Dense(y.shape[-1], name="in_project_y")(y)
        y = nn.gelu(y)
        gy = SpatialGatingWeights(tuple(self.block_size),
                                  tuple(self.grid_size), name="gating_y")(y)

        y = y * gx
        y = nn.Dense(y.shape[-1], name="out_project_y")(y)
        y = y + sy
        x = x * gy
        x = nn.Dense(x.shape[-1], name="out_project_x")(x)
        x = x + y + sx
        return x, y


class SAMBridge(nn.Module):
    features: int
    output_channels: int = 3

    @nn.compact
    def __call__(self, x, x_image):
        x1 = Conv(self.features, kernel=3, name="conv1")(x)
        image = Conv(self.output_channels, kernel=3,
                     name="conv_img")(x) + x_image
        gate = nn.sigmoid(Conv(self.features, kernel=3,
                               name="conv_gate")(image))
        return x1 * gate + x, image


class MAXIM(nn.Module):
    features: int = 32
    depth: int = 3
    num_stages: int = 2
    num_groups: int = 2
    num_supervision_scales: int = 1
    high_res_stages: int = 2
    block_size_hr: tuple[int, int] = (16, 16)
    block_size_lr: tuple[int, int] = (8, 8)
    grid_size_hr: tuple[int, int] = (16, 16)
    num_bottleneck_blocks: int = 2
    channels_reduction: int = 4
    num_outputs: int = 3

    def _sizes(self, level: int):
        if level < self.high_res_stages:
            return tuple(self.block_size_hr), tuple(self.grid_size_hr)
        return tuple(self.block_size_lr), tuple(self.block_size_lr)

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        shortcuts = [x]
        for i in range(1, self.num_supervision_scales):
            shortcuts.append(jax.image.resize(
                x, (n, h // 2 ** i, w // 2 ** i, c), method="nearest"))

        outputs_all = []
        sam_features: list = []
        encs_prev: list = []
        decs_prev: list = []

        for s in range(self.num_stages):
            x_scales = []
            for i in range(self.num_supervision_scales):
                feats = 2 ** i * self.features
                xs = Conv(feats, kernel=3,
                          name=f"stage{s}_input_conv_{i}")(shortcuts[i])
                if s > 0:
                    bs, gs = self._sizes(i)
                    xs, _ = CrossGatingBlock(
                        feats, bs, gs, upsample_y=False,
                        name=f"stage{s}_input_fuse_sam_{i}")(
                        xs, sam_features.pop())
                x_scales.append(xs)

            # ---------- encoder ----------
            encs = []
            y = x_scales[0]
            for i in range(self.depth):
                feats = 2 ** i * self.features
                bs, gs = self._sizes(i)
                # the reference concatenates the scale input even at level 0
                # (encoder block 0 sees [x, x]): UNetEncoderBlock.__call__
                # `if skip is not None: x = concat([x, skip])` with
                # x = x_scales[0] and skip = x_scales[0]
                skip = x_scales[i] if i < self.num_supervision_scales else None
                if skip is not None:
                    y = jnp.concatenate([y, skip], axis=-1)
                y = Conv(feats, kernel=1, name=f"stage{s}_enc{i}_in")(y)
                shortcut_long = y
                for gidx in range(self.num_groups):
                    y = MAB(bs, gs, name=f"stage{s}_enc{i}_mab{gidx}")(y)
                    y = RCAB(feats, self.channels_reduction,
                             name=f"stage{s}_enc{i}_rcab{gidx}")(y)
                y = y + shortcut_long
                if s > 0:
                    y, _ = CrossGatingBlock(
                        feats, bs, gs, upsample_y=False,
                        name=f"stage{s}_enc{i}_xgate")(
                        y, encs_prev.pop() + decs_prev.pop())
                encs.append(y)
                y = Conv(feats, kernel=4, stride=2,
                         name=f"stage{s}_enc{i}_down")(y)

            # ---------- bottleneck ----------
            # each bottleneck block: own input_proj + long residual around
            # num_groups (MAB, RDCAB) pairs (reference BottleneckBlock)
            feats_bn = 2 ** (self.depth - 1) * self.features
            for i in range(self.num_bottleneck_blocks):
                y = Conv(feats_bn, kernel=1, name=f"stage{s}_bn{i}_in")(y)
                shortcut_bn = y
                for gidx in range(self.num_groups):
                    y = MAB(self.block_size_lr, self.block_size_lr,
                            name=f"stage{s}_bn{i}_mab{gidx}")(y)
                    y = RDCAB(feats_bn, self.channels_reduction,
                              name=f"stage{s}_bn{i}_rdcab{gidx}")(y)
                y = y + shortcut_bn
            global_feature = y

            # ---------- cross-gated multi-scale skips ----------
            skip_features = []
            for i in reversed(range(self.depth)):
                feats = 2 ** i * self.features
                bs, gs = self._sizes(i)
                parts = []
                for j, enc in enumerate(encs):
                    ratio = 2.0 ** (j - i)
                    nh = int(enc.shape[1] * ratio)
                    nw = int(enc.shape[2] * ratio)
                    up = jax.image.resize(
                        enc, (n, nh, nw, enc.shape[-1]), method="bilinear")
                    parts.append(Conv(feats, kernel=1,
                                      name=f"stage{s}_sig{i}_from{j}")(up))
                signal = jnp.concatenate(parts, axis=-1)
                skips, global_feature = CrossGatingBlock(
                    feats, bs, gs, upsample_y=True,
                    name=f"stage{s}_xgate{i}")(signal, global_feature)
                skip_features.append(skips)

            # ---------- decoder ----------
            outputs, decs = [], []
            new_sam = []
            for k, i in enumerate(reversed(range(self.depth))):
                feats = 2 ** i * self.features
                bs, gs = self._sizes(i)
                parts = []
                for j, skip in enumerate(skip_features):
                    ratio = 2.0 ** (self.depth - j - 1 - i)
                    nh = int(skip.shape[1] * ratio)
                    nw = int(skip.shape[2] * ratio)
                    up = jax.image.resize(
                        skip, (n, nh, nw, skip.shape[-1]), method="bilinear")
                    parts.append(Conv(feats, kernel=1,
                                      name=f"stage{s}_dsig{i}_from{j}")(up))
                bridge = jnp.concatenate(parts, axis=-1)

                y = nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                     name=f"stage{s}_dec{i}_up")(y)
                y = jnp.concatenate([y, bridge], axis=-1)
                y = Conv(feats, kernel=1, name=f"stage{s}_dec{i}_in")(y)
                shortcut_long = y
                for gidx in range(self.num_groups):
                    y = MAB(bs, gs, name=f"stage{s}_dec{i}_mab{gidx}")(y)
                    y = RCAB(feats, self.channels_reduction,
                             name=f"stage{s}_dec{i}_rcab{gidx}")(y)
                y = y + shortcut_long
                decs.append(y)

                if i < self.num_supervision_scales:
                    if s < self.num_stages - 1:
                        sam, out = SAMBridge(
                            feats, self.num_outputs,
                            name=f"stage{s}_sam_{i}")(y, shortcuts[i])
                        outputs.append(out)
                        new_sam.append(sam)
                    else:
                        out = Conv(self.num_outputs, kernel=3,
                                   name=f"stage{s}_output_conv_{i}")(y)
                        outputs.append(out + shortcuts[i])

            sam_features = new_sam
            encs_prev = encs[::-1]
            decs_prev = decs
            outputs_all.append(outputs)

        # final restored image at full scale
        return outputs_all[-1][-1]


for _name, _cfg, _tasks in (
    ("maxim_s2", dict(features=32, depth=3, num_stages=2, num_groups=2,
                      num_bottleneck_blocks=2),
     ("denoising", "motion deblurring", "deraining", "dehazing")),
    ("maxim_s3", dict(features=32, depth=3, num_stages=3, num_groups=2,
                      num_bottleneck_blocks=2),
     ("deraining",)),
):
    register_model(ModelSpec(
        name=_name,
        build=lambda **kw: MAXIM(**kw),
        subtasks=_tasks,
        pad_multiple=64,  # block 16 x 2^2 downsampling
        pad_kind="symmetric",
        tile=None,
        config=_cfg,
    ))

register_model(ModelSpec(
    name="maxim_tiny",
    build=lambda **kw: MAXIM(**kw),
    subtasks=("dehazing",),
    pad_multiple=32, pad_kind="symmetric",
    tile=None,
    config=dict(features=8, depth=2, num_stages=2, num_groups=1,
                num_supervision_scales=1, high_res_stages=1,
                block_size_hr=(8, 8), block_size_lr=(4, 4),
                grid_size_hr=(4, 4), num_bottleneck_blocks=1),
))
