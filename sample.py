"""Sampling CLI.

Flag-compatible with the reference's sample.py (reference sample.py:17-119):
``python sample.py --config C --checkpoint-path P [--step N]
[--output-path O] [--seed S] [--batch-size B] [--load-ema-params]``.
Output naming (``sample_{i}.gif``) and the global min-max -> uint8
normalization match the reference exactly.
"""

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import nnx

from video_diffusion_nnx_tpu.config import load_config
from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import Unet3D
from video_diffusion_nnx_tpu.utils import load_checkpoint, video_array_to_gif

logging.basicConfig(level=logging.INFO, force=True)


def main():
    parser = argparse.ArgumentParser(description="Generate samples using diffusion model")
    parser.add_argument(
        "--config",
        type=str,
        default=str(Path(__file__).parent / "configs" / "config.yaml"),
        help="Path to the YAML config file",
    )
    parser.add_argument(
        "--output-path",
        type=str,
        default=str(Path(__file__).parent / "outputs"),
        help="Directory to save sampled GIFs",
    )
    parser.add_argument(
        "--checkpoint-path", type=str, required=True, help="Path to the model checkpoint file"
    )
    parser.add_argument("--step", type=int, default=0, help="Checkpoint step number to load")
    parser.add_argument("--seed", type=int, default=0, help="Random seed for sampling")
    parser.add_argument("--batch-size", type=int, default=2, help="Number of videos to generate")
    parser.add_argument(
        "--load-ema-params",
        action="store_true",
        default=False,
        help="Whether to load EMA parameters",
    )
    args = parser.parse_args()

    output_path = Path(args.output_path)
    output_path.mkdir(parents=True, exist_ok=True)

    logging.info("Loading configuration from: %s", args.config)
    config = load_config(args.config)

    unet_cfg = config["unet"]
    logging.info("Initializing Unet3D model...")
    rngs = nnx.Rngs(unet_cfg["rngs_seed"])
    unet_model = Unet3D(
        dim=unet_cfg["dim"],
        rngs=rngs,
        dim_mults=tuple(unet_cfg["dim_mults"]),
        channels=unet_cfg["channels"],
        use_bert_text_cond=unet_cfg["use_bert_text_cond"],
        reference_compat=unet_cfg.get("reference_compat", True),
        compute_dtype=unet_cfg.get("compute_dtype", None),
        use_fused_attention=unet_cfg.get("use_fused_attention", False),
    )

    diff_cfg = config["diffusion"]
    logging.info("Initializing GaussianDiffusion model...")
    diffusion_model = GaussianDiffusion(
        denoise_fn=unet_model,
        image_size=diff_cfg["image_size"],
        num_frames=diff_cfg["num_frames"],
        timesteps=diff_cfg["timesteps"],
        loss_type=diff_cfg["loss_type"],
        channels=diff_cfg["channels"],
    )

    checkpoint_path = Path(args.checkpoint_path).resolve()
    diffusion_model, _ = load_checkpoint(
        diffusion_model, args.step, str(checkpoint_path), load_ema_params=args.load_ema_params
    )
    logging.info("Loaded checkpoint from %s at step %d", checkpoint_path, args.step)

    key = jax.random.PRNGKey(args.seed)
    sampled_videos = diffusion_model.sample(key, batch_size=args.batch_size)
    logging.info("Sampled %d videos", len(sampled_videos))

    # Global min-max -> uint8, identical to reference sample.py:105-110.
    sampled_videos = rearrange(sampled_videos, "b c f h w -> b f h w c")
    min_val = jnp.min(sampled_videos)
    max_val = jnp.max(sampled_videos)
    normalized = (sampled_videos - min_val) / (max_val - min_val)
    uint8_videos = (normalized * 255).astype(jnp.uint8)

    for i, video_np in enumerate(np.array(uint8_videos)):
        output_filename = output_path / f"sample_{i}.gif"
        video_array_to_gif(video_np, output_filename)
        logging.info("Saved sample %d to %s", i, output_filename)


if __name__ == "__main__":
    main()
