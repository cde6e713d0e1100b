"""Image/video tensor helpers (normalization, frame casting).

Parity surface: reference utils.py:259-280 (normalize/unnormalize) and
utils.py:380-397 (``cast_num_frames``).
"""

from __future__ import annotations

import jax
import numpy as np


def normalize_img(t):
    """Map ``[0, 1]`` pixels to ``[-1, 1]`` (parity: reference utils.py:271)."""
    return t * 2 - 1


def unnormalize_img(t):
    """Map ``[-1, 1]`` pixels back to ``[0, 1]`` (parity: reference utils.py:259)."""
    return (t + 1) * 0.5


def cast_num_frames(t, *, frames: int):
    """Pad (with zeros) or truncate ``(c, f, h, w)`` video to ``frames`` frames.

    Parity: reference utils.py:380-397, but implemented with numpy when given
    a numpy array (the reference always routed through jnp, silently copying
    host data to device inside a torch Dataset worker — a host↔device churn
    we avoid; the data pipeline stays in host memory until the prefetcher
    ships a whole sharded batch).
    """
    num_frames = t.shape[1]
    if num_frames == frames:
        return t
    if num_frames > frames:
        return t[:, :frames, ...]
    pad = ((0, 0), (0, frames - num_frames), (0, 0), (0, 0))
    if isinstance(t, np.ndarray):
        return np.pad(t, pad)
    import jax.numpy as jnp

    return jnp.pad(t, pad)
