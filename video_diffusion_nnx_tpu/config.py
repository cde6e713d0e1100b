"""YAML config loading with defaults-merging.

The reference consumes three-section YAML (``unet:``, ``diffusion:``,
``trainer:``) but hard-indexes several trainer keys that only its newest
config file defines (reference train.py:106-111) — so four of its six
shipped configs crash with KeyError. Here every key falls back to the
Trainer/Unet3D constructor default, so all reference configs run unchanged.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import yaml

# Trainer-section defaults (matching Trainer.__init__ and reference train.py
# expectations). Keys absent here pass through verbatim.
_TRAINER_DEFAULTS: dict[str, Any] = {
    "folder": "./results",
    "num_frames": 16,
    "train_batch_size": 4,
    "train_lr": 1e-4,
    "train_num_steps": 100000,
    "gradient_accumulate_every": 2,
    "step_start_ema": 2000,
    "update_ema_every": 10,
    "save_and_sample_every": 100000,
    "results_folder": "./results",
    "num_sample_rows": 4,
    "max_grad_norm": None,
    "use_path_as_cond": False,
    "sample_text": None,
    "cond_scale": 2.0,
    "checkpoint_every_steps": 10,
    "checkpoint_dir_path": "",
    "add_loss_plot": False,
    "tensorboard_dir": "",
    "max_to_keep": None,
    "lr_decay_start_step": 0,
    "lr_decay_steps": 0,
    "lr_decay_coeff": 1.0,
    "ema_decay": 0.9999,
    "profile_flush_step": 100,
    "num_model_shards": 1,
    "resume_training_step": 0,
    "enable_gradient_accumulation": False,
    "dataset_normalize": False,
    "param_sharding": "tensor",
    "save_optimizer_state": False,
    "log_every_steps": 1,
    "sequence_parallel_size": 1,
    "async_checkpointing": False,
}

_UNET_DEFAULTS: dict[str, Any] = {
    "dim": 32,
    "rngs_seed": 0,
    "dim_mults": [1, 2, 4, 8],
    "channels": 1,
    "use_bert_text_cond": False,
    "reference_compat": True,
    "compute_dtype": None,
    "use_fused_attention": False,
    "use_fused_spatial_attention": False,
    "remat_blocks": False,
}

_DIFFUSION_DEFAULTS: dict[str, Any] = {
    "image_size": 64,
    "num_frames": 16,
    "timesteps": 1000,
    "loss_type": "l1",
    "channels": 3,
}


def load_config(path: str | Path) -> dict[str, Any]:
    """Load a config file and merge each section over its defaults."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = dict(raw)
    cfg["unet"] = {**_UNET_DEFAULTS, **raw.get("unet", {})}
    cfg["diffusion"] = {**_DIFFUSION_DEFAULTS, **raw.get("diffusion", {})}
    cfg["trainer"] = {**_TRAINER_DEFAULTS, **raw.get("trainer", {})}
    return cfg


def build_models(config: dict[str, Any]):
    """Instantiate ``(unet, diffusion)`` from a merged config.

    The single place that threads ``unet:``/``diffusion:`` keys into the
    constructors — train.py, sample.py, and scripts all build through here,
    so a new config knob cannot silently diverge between the CLIs (a
    checkpointed model must be rebuilt with the exact architecture flags it
    was trained with).
    """
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D

    u = {**_UNET_DEFAULTS, **config.get("unet", {})}
    d = {**_DIFFUSION_DEFAULTS, **config.get("diffusion", {})}
    unet = Unet3D(
        dim=u["dim"],
        rngs=nnx.Rngs(u["rngs_seed"]),
        dim_mults=tuple(u["dim_mults"]),
        channels=u["channels"],
        use_bert_text_cond=u["use_bert_text_cond"],
        reference_compat=u["reference_compat"],
        compute_dtype=u["compute_dtype"],
        use_fused_attention=u["use_fused_attention"],
        use_fused_spatial_attention=u["use_fused_spatial_attention"],
        remat_blocks=u["remat_blocks"],
    )
    diffusion = GaussianDiffusion(
        denoise_fn=unet,
        image_size=d["image_size"],
        num_frames=d["num_frames"],
        timesteps=d["timesteps"],
        loss_type=d["loss_type"],
        channels=d["channels"],
    )
    return unet, diffusion
