"""Model layer: NN building blocks and the Unet3D denoiser.

Mirrors the reference's ``modules.py`` + ``unet3d.py`` public surface
(reference modules.py:9-396, unet3d.py:21-387).
"""

from video_diffusion_nnx_tpu.models.attention import (
    MultiheadAttention,
    RelativePositionBias,
    SpatialLinearAttention,
)
from video_diffusion_nnx_tpu.models.blocks import Block, ResnetBlock
from video_diffusion_nnx_tpu.models.layers import (
    Downsample,
    EinopsToAndFrom,
    Identity,
    Linear,
    PointwiseConv,
    PreNorm,
    PseudoConv3d,
    PseudoConvTranspose3d,
    Residual,
    SinusoidalPosEmb,
    Upsample,
)
from video_diffusion_nnx_tpu.models.dit import VideoDiT
from video_diffusion_nnx_tpu.models.unet3d import Unet3D

__all__ = [
    "Block",
    "Downsample",
    "EinopsToAndFrom",
    "Identity",
    "Linear",
    "MultiheadAttention",
    "PointwiseConv",
    "PreNorm",
    "PseudoConv3d",
    "PseudoConvTranspose3d",
    "RelativePositionBias",
    "Residual",
    "ResnetBlock",
    "SinusoidalPosEmb",
    "SpatialLinearAttention",
    "Unet3D",
    "VideoDiT",
    "Upsample",
]
