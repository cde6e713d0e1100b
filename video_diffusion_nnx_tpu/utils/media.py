"""GIF / media I/O. Pure PIL + numpy — no torch/torchvision dependency.

Parity surface: reference utils.py:19-23 (CHANNELS_TO_MODE), 315-337
(``seek_all_images``), 343-373 (``video_array_to_gif``). Output naming and
frame ordering match the reference so `sample.py` artifacts are identical.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
from PIL import Image

# Parity note: the reference maps 2 -> 'RGB' and 3 -> 'RGBA'
# (utils.py:19-23), which is an off-by-one; the modes that PIL actually
# accepts for 1/3/4 channels are L/RGB/RGBA. We keep the reference's keys so
# `seek_all_images(img, channels=3)` behaves identically (yields RGBA),
# while `video_array_to_gif` infers the mode from the array itself.
CHANNELS_TO_MODE = {
    1: "L",
    2: "RGB",
    3: "RGBA",
}

_NUM_CHANNELS_TO_MODE = {1: "L", 3: "RGB", 4: "RGBA"}


def seek_all_images(img: Image.Image, channels: int = 3) -> Iterator[Image.Image]:
    """Yield every frame of a (possibly animated) PIL image, converted.

    Parity: reference utils.py:315-337.
    """
    assert channels in CHANNELS_TO_MODE, f"channels {channels} invalid"
    mode = CHANNELS_TO_MODE[channels]
    i = 0
    while True:
        try:
            img.seek(i)
            yield img.convert(mode)
        except EOFError:
            break
        i += 1


def _frame_to_pil(frame: np.ndarray) -> Image.Image:
    """Convert one ``(h, w)`` or ``(h, w, c)`` uint8 frame to a PIL image."""
    frame = np.asarray(frame)
    if frame.ndim == 3 and frame.shape[-1] == 1:
        frame = frame[..., 0]
    if frame.ndim == 2:
        return Image.fromarray(frame, mode="L")
    mode = _NUM_CHANNELS_TO_MODE.get(frame.shape[-1])
    if mode is None:
        raise ValueError(f"unsupported channel count {frame.shape[-1]}")
    return Image.fromarray(frame, mode=mode)


def video_array_to_gif(
    arr: np.ndarray,
    path,
    duration: int = 120,
    loop: int = 0,
    optimize: bool = True,
) -> List[Image.Image]:
    """Save a ``(frames, h, w, c)`` uint8 array as an animated GIF.

    Parity: reference utils.py:343-373 (same frame ordering: axis 0 is split
    into frames, matching how sample.py feeds it), but implemented with PIL
    only — the reference needed torchvision's ``ToPILImage``.
    """
    arr = np.asarray(arr)
    frames = [_frame_to_pil(np.squeeze(f, axis=0)) for f in np.split(arr, arr.shape[0], axis=0)]
    first, *rest = frames
    first.save(
        path,
        save_all=True,
        append_images=rest,
        duration=duration,
        loop=loop,
        optimize=optimize,
    )
    return frames


def write_sample_gifs(videos, out_dir, names=None) -> list:
    """Write a ``(b, c, f, h, w)`` batch as one GIF per clip.

    The reference-compatible artifact format (reference sample.py:105-116):
    batch-GLOBAL min-max scaling to uint8, so clips stay comparable to each
    other, then ``{name}.gif`` per clip (default ``sample_{i}``). The single
    definition shared by sample.py, the trainer's in-training sampling, and
    scripts/interpolate.py.
    """
    from pathlib import Path

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    arr = np.moveaxis(np.asarray(videos), 1, -1)  # b c f h w -> b f h w c
    lo, hi = arr.min(), arr.max()
    scaled = ((arr - lo) / max(float(hi - lo), 1e-12) * 255).astype(np.uint8)
    if names is None:
        names = [f"sample_{i}" for i in range(len(scaled))]
    paths = []
    for name, clip in zip(names, scaled):
        target = out_dir / f"{name}.gif"
        video_array_to_gif(clip, target)
        paths.append(target)
    return paths
