"""Moving-MNIST ``.npy`` dataset.

Parity surface: reference datasets.py:11-64. Same on-disk contract — a
``.npy`` of shape ``(frames, sequences, h, w)`` — and same per-item output:
``(channels, num_frames, h, w)`` float32, frame-padded/truncated.

Deliberate parity quirks kept (documented because they're user-visible):

* Values are raw (0..255 for the standard file) — the reference builds a
  torchvision transform including ``ToTensor`` scaling but never applies it
  (datasets.py:50-55 vs 61-64), so training consumed raw floats. Pass
  ``normalize=True`` to opt into [0, 1] scaling.
* ``image_size`` is stored but no resize happens (the array must already
  match), exactly like the reference.
* The misspelled attribute ``channnels`` is preserved — the reference's own
  tests assert it (test_datasets.py:46); the correctly-spelled ``channels``
  is also provided.

This class is a plain-Python sequence (``__len__``/``__getitem__``) — it
works standalone with the torch-free loader in ``data/loader.py`` and is
also duck-type compatible with ``torch.utils.data.DataLoader``.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from video_diffusion_nnx_tpu.utils.functional import identity
from video_diffusion_nnx_tpu.utils.image import cast_num_frames


class MovingMNIST:
    def __init__(
        self,
        file_path: str,
        image_size,
        channels: int = 1,
        num_frames: int = 20,
        horizontal_flip: bool = False,
        force_num_frames: bool = True,
        normalize: bool = False,
    ):
        self.file_path = file_path
        self.image_size = image_size
        self.channels = channels
        self.channnels = channels  # parity: reference datasets.py:38
        self.horizontal_flip = horizontal_flip

        arrays = np.load(file_path)
        # (f, b, h, w) -> (b, f, h, w) -> (b, c=1, f, h, w) float32.
        arrays = np.transpose(arrays, (1, 0, 2, 3))
        arrays = arrays[:, None, ...].astype(np.float32)
        if normalize:
            arrays = arrays / 255.0
        self.arrays = arrays

        self.cast_num_frames_fn = (
            partial(cast_num_frames, frames=num_frames) if force_num_frames else identity
        )

    def __len__(self) -> int:
        return self.arrays.shape[0]

    def __getitem__(self, index: int) -> np.ndarray:
        return self.cast_num_frames_fn(self.arrays[index])
