"""Diffusion process layer (reference gaussian_diffusion.py surface)."""

from video_diffusion_nnx_tpu.diffusion.gaussian_diffusion import GaussianDiffusion

__all__ = ["GaussianDiffusion"]
