"""Folder-of-GIFs video dataset with optional filename-derived captions.

The upstream lucidrains training pipeline (which the reference ports) feeds
folders of GIF clips; the reference itself only kept the Moving-MNIST
``.npy`` path but still ships the GIF helpers (reference utils.py:315-337
``seek_all_images``, utils.py:401-416 ``get_text_from_path``). This dataset
completes that capability: it decodes GIFs on the host with PIL, resizes,
normalizes to [0, 1], pads/truncates frames, and can return
``(video, caption)`` pairs for text-conditioned training
(``use_path_as_cond`` in the Trainer).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import numpy as np
from PIL import Image

from video_diffusion_nnx_tpu.utils.functional import get_text_from_path, identity
from video_diffusion_nnx_tpu.utils.image import cast_num_frames
from video_diffusion_nnx_tpu.utils.media import seek_all_images


class GifVideoDataset:
    """Videos from ``folder/**/*.gif`` as ``(channels, frames, h, w)`` float32.

    Args:
        folder: root directory searched recursively for ``.gif`` files.
        image_size: target square size (frames are resized).
        channels: 1 (L), 3 (RGB) or 4 (RGBA).
        num_frames: pad/truncate target when ``force_num_frames``.
        use_path_as_cond: also return the filename-derived caption.
    """

    def __init__(
        self,
        folder: str,
        image_size: int,
        channels: int = 3,
        num_frames: int = 16,
        force_num_frames: bool = True,
        use_path_as_cond: bool = False,
    ):
        self.folder = Path(folder)
        self.image_size = image_size
        self.channels = channels
        self.use_path_as_cond = use_path_as_cond
        self.paths = sorted(self.folder.rglob("*.gif"))
        if not self.paths:
            raise FileNotFoundError(f"no .gif files under {folder}")
        self.cast_num_frames_fn = (
            partial(cast_num_frames, frames=num_frames) if force_num_frames else identity
        )
        # PIL convert modes keyed by true channel count (1/3/4).
        self._mode_channels = {1: 1, 3: 2, 4: 3}[channels]

    def __len__(self) -> int:
        return len(self.paths)

    def _decode(self, path: Path) -> np.ndarray:
        img = Image.open(path)
        frames = []
        for frame in seek_all_images(img, channels=self._mode_channels):
            frame = frame.resize((self.image_size, self.image_size), Image.BILINEAR)
            arr = np.asarray(frame, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            frames.append(arr)
        video = np.stack(frames, axis=0)  # (f, h, w, c)
        return np.transpose(video, (3, 0, 1, 2))  # (c, f, h, w)

    def __getitem__(self, index: int):
        path = self.paths[index]
        video = self.cast_num_frames_fn(self._decode(path))
        if self.use_path_as_cond:
            return video, get_text_from_path(str(path))
        return video
