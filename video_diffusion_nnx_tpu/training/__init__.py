"""Training runtime layer (reference trainer.py surface)."""

from video_diffusion_nnx_tpu.training.metrics import (
    JsonlSummaryWriter,
    create_summary_writer,
)
from video_diffusion_nnx_tpu.training.trainer import NnxTrainState, Trainer

__all__ = ["JsonlSummaryWriter", "NnxTrainState", "Trainer", "create_summary_writer"]
