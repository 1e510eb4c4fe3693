"""DiffBIR two-stage generative SR pipeline.

Rebuild of the reference serving flow (AgentApp/model_service/
super_resolution/DiffBIR/model_serving.py:77-131): a degradation-removal
SwinIR (pixel-unshuffle-8 input, nearest+conv head) cleans the LR image;
the cleaned image is VAE-encoded as the ControlNet hint; a 50-step spaced
DDPM sample of the SD2.1-class ControlLDM produces the latent; the VAE
decodes it; a wavelet color fix transplants the clean image's low
frequencies into the generated output.

Text conditioning: the reference encodes the empty prompt with
FrozenOpenCLIP; since prompts are constant in serving, the (77, 1024)
context here is a learned/loadable constant buffer (fill it with the
precomputed OpenCLIP empty-prompt embedding at weight-conversion time).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import ModelSpec, register_model
from ..swinir import SwinIR
from .sampler import SpacedSampler
from .unet import ControlNet, UNetModel
from .vae import AutoencoderKL, CondEncoder


def wavelet_blur(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Dilated 3x3 binomial blur (the reference wavelet_fix kernel)."""
    k = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]],
                    jnp.float32) / 16.0
    k4 = k[:, :, None, None]
    xc = x.transpose(0, 3, 1, 2)[:, :, None]  # (B, C, 1, H, W)
    b, c = xc.shape[0], xc.shape[1]
    xc = xc.reshape(b * c, 1, *x.shape[1:3])
    out = jax.lax.conv_general_dilated(
        xc, k4.transpose(2, 3, 0, 1), (1, 1),
        [(radius, radius), (radius, radius)],
        rhs_dilation=(radius, radius),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out.reshape(b, c, *x.shape[1:3]).transpose(0, 2, 3, 1)


def wavelet_decompose(x: jnp.ndarray, levels: int = 5):
    high = jnp.zeros_like(x)
    low = x
    for i in range(levels):
        radius = 2 ** i
        blurred = wavelet_blur(low, radius)
        high = high + (low - blurred)
        low = blurred
    return high, low


def wavelet_color_fix(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """Keep the generated detail (high freq) but the clean image's colors
    (low freq)."""
    c_high, _ = wavelet_decompose(content)
    _, s_low = wavelet_decompose(style)
    return c_high + s_low


class DiffBIRPipeline(nn.Module):
    """End-to-end module; __call__ runs the full restoration."""

    sr_scale: int = 4           # upscale applied before stage 1
    num_steps: int = 50
    context_len: int = 77
    context_dim: int = 1024
    model_channels: int = 320
    num_head_channels: int = 64
    swin_depths: tuple = (6,) * 8
    swin_dim: int = 180
    vae_ch: int = 128

    def setup(self):
        heads = 6 if self.swin_dim % 6 == 0 else 2
        self.stage1 = SwinIR(
            embed_dim=self.swin_dim, depths=self.swin_depths,
            num_heads=(heads,) * len(self.swin_depths), window_size=8,
            upscale=8, upsampler="nearest+conv", unshuffle_scale=8,
            img_range=1.0, patch_norm=True, name="preprocess_model")
        self.vae = AutoencoderKL(ch=self.vae_ch, name="first_stage_model")
        # separately-finetuned hint encoder (cldm.py:313-323)
        self.cond_encoder = CondEncoder(ch=self.vae_ch, name="cond_encoder")
        self.unet = UNetModel(model_channels=self.model_channels,
                              num_head_channels=self.num_head_channels,
                              name="diffusion_model")
        self.controlnet = ControlNet(model_channels=self.model_channels,
                                     num_head_channels=self.num_head_channels,
                                     name="control_model")
        # learned constant standing in for the OpenCLIP empty-prompt
        # embedding; overwritten by weight conversion.
        self.empty_context = self.param(
            "empty_context", nn.initializers.normal(0.02),
            (1, self.context_len, self.context_dim))

    def clean(self, lq):
        """Stage 1 only (degradation removal)."""
        b, h, w, c = lq.shape
        if self.sr_scale > 1:
            lq = jax.image.resize(
                lq, (b, h * self.sr_scale, w * self.sr_scale, c),
                method="bicubic")
        return jnp.clip(self.stage1(lq), 0.0, 1.0)

    def eps(self, x, hint, t, context):
        control = self.controlnet(x, hint, t, context)
        return self.unet(x, t, context, control=list(control))

    def __call__(self, lq, rng: Optional[jax.Array] = None,
                 num_steps: Optional[int] = None):
        rng = jax.random.PRNGKey(231) if rng is None else rng
        clean = self.clean(lq)
        b, h, w, _ = clean.shape
        cond_latent = self.cond_encoder(clean * 2.0 - 1.0)
        context = jnp.broadcast_to(
            self.empty_context, (b, self.context_len, self.context_dim))

        n = num_steps or self.num_steps
        sampler = SpacedSampler()
        sched = {k: jnp.asarray(v)
                 for k, v in sampler.make_schedule(n).items()}
        shape = cond_latent.shape
        rng, sub = jax.random.split(rng)
        x0_noise = jax.random.normal(sub, shape, jnp.float32)

        def body(mdl, carry, i):
            x, rng = carry
            idx = n - 1 - i
            t_train = sched["timesteps"][idx]
            eps = mdl.eps(x, cond_latent,
                          jnp.full((shape[0],), t_train, jnp.int32),
                          context)
            x0 = (sched["sqrt_recip_ac"][idx] * x
                  - sched["sqrt_recipm1_ac"][idx] * eps)
            x0 = jnp.clip(x0, -1.0, 1.0)
            mean = (sched["post_mean_c0"][idx] * x0
                    + sched["post_mean_ct"][idx] * x)
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, shape, jnp.float32)
            nz = (idx > 0).astype(jnp.float32)
            x = mean + nz * jnp.exp(0.5 * sched["post_log_var"][idx]) * noise
            return (x, rng), None

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, length=n)
        (z, _), _ = scan(self, (x0_noise, rng), jnp.arange(n))
        out = self.vae.decode(z)
        out = jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)
        return wavelet_color_fix(out, clean)


register_model(ModelSpec(
    name="diffbir",
    build=lambda **kw: DiffBIRPipeline(**kw),
    subtasks=("super-resolution",),
    scale=4,
    pad_multiple=64, pad_kind="reflect",
    tile=None,
    config=dict(),
))

register_model(ModelSpec(
    name="diffbir_tiny",
    build=lambda **kw: DiffBIRPipeline(**kw),
    subtasks=("super-resolution",),
    scale=4,
    pad_multiple=16, pad_kind="reflect",
    tile=None,
    config=dict(num_steps=2, swin_depths=(1,), swin_dim=16,
                model_channels=32, num_head_channels=16, vae_ch=32,
                context_dim=64, context_len=8),
))
