"""Sampling CLI.

Flag-compatible with the reference's sample.py surface (reference
sample.py:17-119): ``--config --checkpoint-path --step --output-path --seed
--batch-size --load-ema-params``, writing ``sample_{i}.gif`` with the same
global min-max -> uint8 normalization. Beyond the reference it exposes the
fast sampler and classifier-free guidance:

    --sampler ddim --num-steps 50        50-step DDIM instead of full DDPM
    --sampler dpm --num-steps 20         DPM-Solver++(2M), 2nd-order ODE
    --text "a bouncing digit" --cond-scale 2.0   CFG text conditioning
"""

import argparse
import logging
from pathlib import Path

import jax

logging.basicConfig(level=logging.INFO, force=True)
log = logging.getLogger("sample")


def parse_args() -> argparse.Namespace:
    here = Path(__file__).parent
    p = argparse.ArgumentParser(description="Generate video samples from a checkpoint")
    p.add_argument("--config", type=str, default=str(here / "configs" / "config.yaml"))
    p.add_argument("--output-path", type=str, default=str(here / "outputs"))
    p.add_argument("--checkpoint-path", type=str, required=True)
    p.add_argument("--step", type=int, default=0, help="checkpoint step to restore")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--load-ema-params", action="store_true", default=False)
    # Beyond-reference sampler controls.
    p.add_argument(
        "--sampler", choices=("ddpm", "ddim", "dpm"), default="ddpm",
        help="ddpm = full reverse chain (reference behavior); ddim = fast "
             "sampler; dpm = DPM-Solver++(2M) second-order ODE sampler",
    )
    p.add_argument(
        "--num-steps", type=int, default=50,
        help="DDIM step count (ignored for ddpm)",
    )
    p.add_argument("--eta", type=float, default=0.0, help="DDIM stochasticity")
    p.add_argument(
        "--grid", choices=("linspace", "stride"), default="linspace",
        help="DDIM timestep grid; use 'stride' for progressively-distilled "
             "checkpoints (the nested grid they were trained on)",
    )
    p.add_argument(
        "--text", type=str, action="append", default=None,
        help="text condition; repeat for per-sample prompts (needs a "
        "use_bert_text_cond model)",
    )
    p.add_argument("--cond-scale", type=float, default=1.0, help="CFG guidance scale")
    return p.parse_args()


def build_model(config: dict):
    """Construct the diffusion wrapper a config describes (the canonical
    builder lives in config.py so all CLIs thread identical knobs)."""
    from video_diffusion_nnx_tpu.config import build_models

    _, diffusion = build_models(config)
    return diffusion


def write_gifs(videos: jax.Array, out_dir: Path) -> None:
    """Reference-compatible artifact format: one GIF per sample, scaled by
    the batch-global value range (reference sample.py:105-116)."""
    from video_diffusion_nnx_tpu.utils import write_sample_gifs

    for target in write_sample_gifs(videos, out_dir):
        log.info("wrote %s", target)


def main() -> None:
    args = parse_args()

    from video_diffusion_nnx_tpu.config import load_config
    from video_diffusion_nnx_tpu.utils import enable_compilation_cache, load_checkpoint

    config = load_config(args.config)
    enable_compilation_cache(config["trainer"].get("compilation_cache_dir"))
    model = build_model(config)
    try:
        model, _ = load_checkpoint(
            model, args.step, str(Path(args.checkpoint_path).resolve()),
            load_ema_params=args.load_ema_params,
        )
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}") from None
    log.info(
        "restored step %d from %s (ema=%s)",
        args.step, args.checkpoint_path, args.load_ema_params,
    )

    cond = args.text
    if cond is not None and len(cond) == 1 and args.batch_size > 1:
        cond = cond * args.batch_size
    key = jax.random.PRNGKey(args.seed)
    if args.sampler == "ddim":
        log.info("DDIM sampling: %d steps, eta=%.2f", args.num_steps, args.eta)
        videos = model.ddim_sample(
            key, cond=cond, cond_scale=args.cond_scale,
            batch_size=args.batch_size, num_steps=args.num_steps, eta=args.eta,
            grid=args.grid,
        )
    elif args.sampler == "dpm":
        log.info("DPM-Solver++(2M) sampling: %d steps", args.num_steps)
        videos = model.dpm_solver_sample(
            key, cond=cond, cond_scale=args.cond_scale,
            batch_size=args.batch_size, num_steps=args.num_steps,
        )
    else:
        videos = model.sample(
            key, cond=cond, cond_scale=args.cond_scale, batch_size=args.batch_size
        )
    log.info("generated %d clips", videos.shape[0])

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    write_gifs(videos, out_dir)


if __name__ == "__main__":
    main()
