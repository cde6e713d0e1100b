"""Fused Pallas TPU kernels for the hot compute paths.

Every kernel has a numerically-equivalent XLA fallback used automatically on
unsupported shapes/backends, and a custom VJP so training gradients are
always correct.
"""

from video_diffusion_nnx_tpu.ops.cross_attention import fused_cross_attention_block
from video_diffusion_nnx_tpu.ops.spatial_linear_attention import (
    fused_spatial_linear_attention_block,
    pack_sla_weights,
)
from video_diffusion_nnx_tpu.ops.temporal_attention import (
    fused_temporal_attention_block,
    pack_mha_weights,
)

__all__ = [
    "fused_cross_attention_block",
    "fused_spatial_linear_attention_block",
    "fused_temporal_attention_block",
    "pack_mha_weights",
    "pack_sla_weights",
]
