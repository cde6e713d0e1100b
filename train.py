"""Training CLI.

Flag-compatible with the reference's train.py (reference train.py:14-122):
``python train.py --config C [--resume_step N] [--rng_seed S]``. Seed
precedence: CLI > config ``rng_seed`` > 0. All six reference YAML configs
run unchanged (missing trainer keys default instead of KeyError-ing).
"""

import argparse
import logging
from pathlib import Path

from video_diffusion_nnx_tpu.config import build_models, load_config
from video_diffusion_nnx_tpu.training import Trainer


def build_from_config(config: dict, resume_step: int = 0, rng_seed: int | None = None):
    """Instantiate (unet, diffusion, trainer) from a merged config dict."""
    master_seed = rng_seed if rng_seed is not None else config.get("rng_seed", 0)
    logging.info("Using master RNG seed: %s", master_seed)

    logging.info("Building Unet3D denoiser + GaussianDiffusion process")
    unet_model, diffusion_model = build_models(config)

    trainer_cfg = config["trainer"]
    logging.info("Building Trainer")
    trainer = Trainer(
        diffusion_model=diffusion_model,
        folder=trainer_cfg["folder"],
        dataset_path=trainer_cfg["dataset_path"],
        num_frames=trainer_cfg["num_frames"],
        train_batch_size=trainer_cfg["train_batch_size"],
        train_lr=trainer_cfg["train_lr"],
        train_num_steps=trainer_cfg["train_num_steps"],
        gradient_accumulate_every=trainer_cfg["gradient_accumulate_every"],
        step_start_ema=trainer_cfg["step_start_ema"],
        update_ema_every=trainer_cfg["update_ema_every"],
        save_and_sample_every=trainer_cfg["save_and_sample_every"],
        results_folder=trainer_cfg["results_folder"],
        num_sample_rows=trainer_cfg["num_sample_rows"],
        max_grad_norm=trainer_cfg["max_grad_norm"],
        use_path_as_cond=trainer_cfg["use_path_as_cond"],
        sample_text=trainer_cfg["sample_text"],
        cond_scale=trainer_cfg["cond_scale"],
        checkpoint_every_steps=trainer_cfg["checkpoint_every_steps"],
        checkpoint_dir_path=trainer_cfg["checkpoint_dir_path"],
        add_loss_plot=trainer_cfg["add_loss_plot"],
        resume_training_step=resume_step,
        tensorboard_dir=trainer_cfg["tensorboard_dir"],
        max_to_keep=trainer_cfg.get("max_to_keep", None),
        lr_decay_start_step=trainer_cfg["lr_decay_start_step"],
        lr_decay_steps=trainer_cfg["lr_decay_steps"],
        lr_decay_coeff=trainer_cfg["lr_decay_coeff"],
        ema_decay=trainer_cfg["ema_decay"],
        profile_flush_step=trainer_cfg["profile_flush_step"],
        rng_seed=master_seed,
        num_model_shards=trainer_cfg["num_model_shards"],
        enable_gradient_accumulation=trainer_cfg["enable_gradient_accumulation"],
        dataset_normalize=trainer_cfg["dataset_normalize"],
        param_sharding=trainer_cfg["param_sharding"],
        save_optimizer_state=trainer_cfg["save_optimizer_state"],
        log_every_steps=trainer_cfg["log_every_steps"],
        sequence_parallel_size=trainer_cfg["sequence_parallel_size"],
        async_checkpointing=trainer_cfg["async_checkpointing"],
        prefetch_depth=trainer_cfg["prefetch_depth"],
        fsdp_min_size_to_shard=trainer_cfg["fsdp_min_size_to_shard"],
        null_cond_prob=trainer_cfg["null_cond_prob"],
        freeze_schedule_buffers=trainer_cfg["freeze_schedule_buffers"],
        flatten_optimizer=trainer_cfg["flatten_optimizer"],
    )
    return unet_model, diffusion_model, trainer


def main():
    logging.basicConfig(
        level=logging.INFO, format="%(levelname)s:%(name)s:%(message)s", force=True
    )
    parser = argparse.ArgumentParser(description="Train diffusion model")
    parser.add_argument(
        "--config",
        type=str,
        default=str(Path(__file__).parent / "configs" / "config.yaml"),
        help="Path to the YAML config file",
    )
    parser.add_argument("--resume_step", type=int, default=0, help="Step to resume training from")
    parser.add_argument("--rng_seed", type=int, default=None, help="RNG seed to use for training")
    args = parser.parse_args()

    logging.info("Loading configuration from: %s", args.config)
    config = load_config(args.config)

    # Persistent XLA compilation cache: the 1-5 min remote compiles are paid
    # once per (shape, config), not once per process start.
    from video_diffusion_nnx_tpu.utils import enable_compilation_cache

    enable_compilation_cache(config["trainer"].get("compilation_cache_dir"))

    _, _, trainer = build_from_config(config, resume_step=args.resume_step, rng_seed=args.rng_seed)

    logging.info("Starting training...")
    trainer.train()
    logging.info("Training finished.")


if __name__ == "__main__":
    main()
