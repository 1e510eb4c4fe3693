from .vae import AutoencoderKL
from .unet import UNetModel, ControlNet
from .sampler import SpacedSampler, space_timesteps
from .pipeline import DiffBIRPipeline

__all__ = ["AutoencoderKL", "UNetModel", "ControlNet", "SpacedSampler",
           "space_timesteps", "DiffBIRPipeline"]
