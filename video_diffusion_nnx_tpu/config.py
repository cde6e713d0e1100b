"""YAML config loading with defaults-merging and unknown-key warnings.

The reference consumes three-section YAML (``unet:``, ``diffusion:``,
``trainer:``) but hard-indexes several trainer keys that only its newest
config file defines (reference train.py:106-111) — so four of its six
shipped configs crash with KeyError. Here every key falls back to the
Trainer/Unet3D constructor default, so all reference configs run unchanged.

Every constructor knob of Unet3D (reference unet3d.py:58-75) and
GaussianDiffusion (reference gaussian_diffusion.py:53-65) is YAML-exposed —
the reference's train.py silently dropped keys its narrow plumbing didn't
know (e.g. ``attn_heads``); here an unrecognized key is loudly warned about
instead of silently eaten, and every recognized key actually reaches the
constructor.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import yaml

logger = logging.getLogger(__name__)

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
    # "" -> shared per-user default (~/.cache/video_diffusion_nnx_tpu/xla).
    "compilation_cache_dir": "",
    "prefetch_depth": 2,
    "fsdp_min_size_to_shard": 2**14,
    # CFG conditioning dropout during training (0 = reference parity).
    "null_cond_prob": 0.0,
    # True stops the optimizer from drifting the diffusion-schedule buffers
    # (PARITY.md #11); False reproduces the reference's full-state Adam.
    "freeze_schedule_buffers": False,
    # True collapses Adam's per-leaf moments AND the EMA into single flat
    # buffers (optax.flatten + raveled EMA) — a TPU dispatch optimization
    # for replicated-params runs, measured 6% faster per step
    # (scripts/ab_flat_opt.py). Model/EMA checkpoints keep the canonical
    # tree layout either way; off by default only for OPT-state
    # checkpoint-layout parity.
    "flatten_optimizer": False,
}

# Trainer keys that are legitimate in YAML but have no constructor default
# here (required, or consumed by the CLI rather than Trainer.__init__).
_TRAINER_EXTRA_KEYS = {"dataset_path", "rng_seed"}

# Mirrors the full Unet3D constructor surface (reference unet3d.py:58-75)
# minus runtime-only args (rngs object, sequence_parallel_mesh — derived
# from the trainer's sequence_parallel_size).
_UNET_DEFAULTS: dict[str, Any] = {
    # Model family: "unet3d" (the reference's convolutional denoiser) or
    # "dit" (VideoDiT, the transformer family — models/dit.py). Both plug
    # into the same diffusion/trainer/sampler/serving stack.
    "arch": "unet3d",
    # dit-only knobs (ignored by unet3d):
    "depth": 8,
    "patch_size": 4,
    "mlp_ratio": 4,
    "dim": 32,
    "rngs_seed": 0,
    "dim_mults": [1, 2, 4, 8],
    "cond_dim": None,
    "out_dim": None,
    "channels": 1,
    "attn_heads": 8,
    "attn_dim_head": 32,
    "use_bert_text_cond": False,
    "init_dim": None,
    "init_kernel_size": 7,
    "use_sparse_linear_attn": True,
    "block_type": "resnet",
    "resnet_groups": 8,
    "log_dims": False,
    "reference_compat": True,
    "compute_dtype": None,
    "use_fused_attention": False,
    "use_fused_spatial_attention": False,
    "remat_blocks": False,
    # w-conditioned time embedding for guidance-distilled models
    # (training/guidance.py); False keeps init-RNG/checkpoint parity.
    "guidance_embed": False,
}

# Mirrors the full GaussianDiffusion constructor surface (reference
# gaussian_diffusion.py:53-65).
_DIFFUSION_DEFAULTS: dict[str, Any] = {
    "image_size": 64,
    "num_frames": 16,
    "timesteps": 1000,
    "loss_type": "l1",
    "channels": 3,
    "text_use_bert_cls": False,
    "use_dynamic_thres": False,
    "dynamic_thres_percentile": 0.9,
    # "noise" (reference parity) | "v" (Salimans-Ho velocity, the stable
    # target for progressive distillation) | "x0" (direct data prediction).
    "prediction_type": "noise",
    # Min-SNR loss weighting gamma (Hang et al. 2023; typically 5).
    # null/None = reference parity (unweighted loss).
    "min_snr_gamma": None,
}


def _warn_unknown(section: str, given: dict[str, Any], known: set[str]) -> None:
    unknown = sorted(set(given) - known)
    if unknown:
        logger.warning(
            "config section '%s' has unrecognized key(s) %s — they are "
            "IGNORED. Known keys: %s",
            section, unknown, sorted(known),
        )


def load_config(path: str | Path) -> dict[str, Any]:
    """Load a config file and merge each section over its defaults.

    Unrecognized keys in any section are warned about (not silently
    dropped, and not an error — reference configs stay runnable even if a
    user carries stray keys).
    """
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    _warn_unknown("unet", raw.get("unet", {}), set(_UNET_DEFAULTS))
    _warn_unknown("diffusion", raw.get("diffusion", {}), set(_DIFFUSION_DEFAULTS))
    _warn_unknown(
        "trainer", raw.get("trainer", {}), set(_TRAINER_DEFAULTS) | _TRAINER_EXTRA_KEYS
    )
    _warn_unknown(
        "<top level>",
        {k: v for k, v in raw.items() if not isinstance(v, dict)},
        {"rng_seed"},
    )
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
    was trained with). Every key in ``_UNET_DEFAULTS``/``_DIFFUSION_DEFAULTS``
    reaches its constructor.
    """
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D

    u = {**_UNET_DEFAULTS, **config.get("unet", {})}
    d = {**_DIFFUSION_DEFAULTS, **config.get("diffusion", {})}
    _warn_unknown("unet", u, set(_UNET_DEFAULTS))
    _warn_unknown("diffusion", d, set(_DIFFUSION_DEFAULTS))

    arch = u.get("arch", "unet3d")
    if arch == "dit":
        from video_diffusion_nnx_tpu.models.dit import VideoDiT

        dit_keys = (
            "dim", "depth", "channels", "attn_heads", "attn_dim_head",
            "patch_size", "mlp_ratio", "cond_dim", "use_bert_text_cond",
            "compute_dtype", "guidance_embed", "use_fused_attention",
        )
        unet = VideoDiT(rngs=nnx.Rngs(u["rngs_seed"]), **{k: u[k] for k in dit_keys})
    elif arch == "unet3d":
        unet_kwargs = {
            k: u[k]
            for k in _UNET_DEFAULTS
            if k not in ("rngs_seed", "arch", "depth", "patch_size", "mlp_ratio")
        }
        unet_kwargs["dim_mults"] = tuple(u["dim_mults"])
        unet = Unet3D(rngs=nnx.Rngs(u["rngs_seed"]), **unet_kwargs)
    else:
        raise ValueError(f"unet.arch must be 'unet3d' or 'dit'; got {arch!r}")

    diffusion = GaussianDiffusion(denoise_fn=unet, **{k: d[k] for k in _DIFFUSION_DEFAULTS})
    return unet, diffusion
