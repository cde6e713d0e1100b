"""Data layer: datasets and the torch-free prefetching loader."""

from video_diffusion_nnx_tpu.data.gif_dataset import GifVideoDataset
from video_diffusion_nnx_tpu.data.loader import (
    DataLoader,
    device_prefetch,
    endless_prefetching_loader,
)
from video_diffusion_nnx_tpu.data.moving_mnist import MovingMNIST

__all__ = [
    "DataLoader",
    "GifVideoDataset",
    "MovingMNIST",
    "device_prefetch",
    "endless_prefetching_loader",
]
