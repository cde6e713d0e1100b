"""Training runtime layer (reference trainer.py surface)."""

from video_diffusion_nnx_tpu.training.distill import (
    build_distill_step,
    distill_round,
    progressive_distill,
)
from video_diffusion_nnx_tpu.training.guidance import (
    guidance_distill,
    transfer_teacher_params,
)
from video_diffusion_nnx_tpu.training.metrics import (
    JsonlSummaryWriter,
    create_summary_writer,
)
from video_diffusion_nnx_tpu.training.trainer import NnxTrainState, Trainer

__all__ = [
    "JsonlSummaryWriter",
    "NnxTrainState",
    "Trainer",
    "build_distill_step",
    "create_summary_writer",
    "distill_round",
    "guidance_distill",
    "progressive_distill",
    "transfer_teacher_params",
]
