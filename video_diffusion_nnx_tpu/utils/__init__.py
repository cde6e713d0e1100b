"""Utility layer (functional core, schedules, media I/O, checkpoints).

Public surface mirrors the reference's flat ``utils.py`` so downstream code
can do ``from video_diffusion_nnx_tpu import utils; utils.cosine_beta_schedule``
exactly as it would against the reference (reference utils.py).
"""

from video_diffusion_nnx_tpu.utils.functional import (
    check_shape,
    cycle,
    default,
    exists,
    get_text_from_path,
    identity,
    is_list_str,
    is_odd,
    noop,
    num_to_groups,
    prob_mask_like,
)
from video_diffusion_nnx_tpu.utils.grad import (
    clip_grad_norm,
    clip_grad_norm_with_tb_logging,
    global_l2_norm,
)
from video_diffusion_nnx_tpu.utils.image import (
    cast_num_frames,
    normalize_img,
    unnormalize_img,
)
from video_diffusion_nnx_tpu.utils.media import (
    CHANNELS_TO_MODE,
    seek_all_images,
    video_array_to_gif,
    write_sample_gifs,
)
from video_diffusion_nnx_tpu.utils.schedule import (
    ScheduleBuffers,
    cosine_beta_schedule,
    extract,
)
from video_diffusion_nnx_tpu.utils.checkpoint import (
    load_checkpoint,
    load_opt_state,
    save_checkpoint,
    save_opt_state,
)
from video_diffusion_nnx_tpu.utils.compile_cache import enable_compilation_cache


def __getattr__(name):
    # Upsample/Downsample live with the model layers but are part of the
    # reference's utils surface (reference utils.py:103-125). Lazy import
    # avoids a utils <-> models circular import.
    if name in ("Upsample", "Downsample"):
        from video_diffusion_nnx_tpu.models import layers

        return getattr(layers, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "CHANNELS_TO_MODE",
    "ScheduleBuffers",
    "cast_num_frames",
    "check_shape",
    "clip_grad_norm",
    "clip_grad_norm_with_tb_logging",
    "cosine_beta_schedule",
    "cycle",
    "default",
    "enable_compilation_cache",
    "exists",
    "extract",
    "get_text_from_path",
    "global_l2_norm",
    "identity",
    "is_list_str",
    "is_odd",
    "load_checkpoint",
    "load_opt_state",
    "noop",
    "normalize_img",
    "num_to_groups",
    "prob_mask_like",
    "save_checkpoint",
    "save_opt_state",
    "seek_all_images",
    "unnormalize_img",
    "video_array_to_gif",
    "write_sample_gifs",
    "Upsample",
    "Downsample",
]
