"""Progressive-distillation CLI (capability beyond the reference).

Takes a trained checkpoint and produces students whose stride-grid DDIM
sampler needs half the steps per round:

    python scripts/distill.py --config configs/config_v2_2.yaml \
        --checkpoint-path results/checkpoints --step 100000 \
        --initial-steps 32 --rounds 3 --steps-per-round 2000 \
        --output-path results/distilled

Each round's student is saved as an Orbax checkpoint at step = its sampler
step count, in the standard ``{'model', 'ema_params'}`` layout — so the
result samples with the stock CLI:

    python sample.py --config ... --checkpoint-path results/distilled \
        --step 8 --sampler ddim --num-steps 8 --grid stride
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

log = logging.getLogger("distill")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint-path", type=str, required=True)
    p.add_argument("--step", type=int, required=True, help="teacher checkpoint step")
    p.add_argument(
        "--no-ema", action="store_true",
        help="distill from raw weights instead of EMA (EMA is the default teacher)",
    )
    p.add_argument(
        "--initial-steps", type=int, default=32,
        help="first student's sampler step count (teacher grid = 2x this)",
    )
    p.add_argument("--rounds", type=int, default=3, help="number of halvings")
    p.add_argument(
        "--steps-per-round", type=int, default=2000,
        help="optimizer steps per halving round",
    )
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument(
        "--ema-decay", type=float, default=None,
        help="EMA the student within each round and keep the average "
             "(standard for distilled-student quality); default off",
    )
    p.add_argument(
        "--w-min", type=float, default=1.0,
        help="guidance-scale range for stage-2 distillation of a "
             "guidance_embed checkpoint (ignored otherwise)",
    )
    p.add_argument("--w-max", type=float, default=8.0)
    p.add_argument("--batch-size", type=int, default=None,
                   help="default: trainer.train_batch_size from the config")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--output-path", type=str, default=None,
        help="default: <checkpoint-path>/../distilled",
    )
    return p.parse_args()


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s:%(name)s:%(message)s")
    args = parse_args()

    import jax
    import orbax.checkpoint as ocp

    from video_diffusion_nnx_tpu.config import build_models, load_config
    from video_diffusion_nnx_tpu.data.loader import DataLoader
    from video_diffusion_nnx_tpu.data.moving_mnist import MovingMNIST
    from video_diffusion_nnx_tpu.parallel.mesh import data_parallel_mesh
    from video_diffusion_nnx_tpu.training.distill import progressive_distill
    from video_diffusion_nnx_tpu.utils import (
        enable_compilation_cache,
        load_checkpoint,
        save_checkpoint,
    )
    from video_diffusion_nnx_tpu.utils.functional import cycle

    config = load_config(args.config)
    enable_compilation_cache(config["trainer"].get("compilation_cache_dir"))
    _, teacher = build_models(config)
    try:
        teacher, _ = load_checkpoint(
            teacher, args.step, str(Path(args.checkpoint_path).resolve()),
            load_ema_params=not args.no_ema,
        )
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}") from None
    if teacher.prediction_type == "noise":
        log.warning(
            "teacher is epsilon-parameterized; distillation works but 'v' "
            "(diffusion.prediction_type: v) is the stable choice at low "
            "step counts (Salimans & Ho 2022 §4)"
        )

    # Stage 2 of Meng et al. 2023: a guidance_embed teacher (the output of
    # scripts/distill_guidance.py) is distilled CONDITIONED, with a
    # per-sample guidance scale w fed to teacher and student so the result
    # stays steerable at any cond_scale.
    conditioned = bool(getattr(teacher.denoise_fn, "has_guidance_embed", False))
    w_range = (args.w_min, args.w_max) if conditioned else None

    tcfg = config["trainer"]
    batch_size = args.batch_size or tcfg["train_batch_size"]
    dataset_path = tcfg["dataset_path"]
    collate_fn = None
    if Path(dataset_path).is_dir():
        from video_diffusion_nnx_tpu.data.gif_dataset import GifVideoDataset

        ds = GifVideoDataset(
            dataset_path, image_size=teacher.image_size, channels=teacher.channels,
            num_frames=teacher.num_frames, force_num_frames=True,
            use_path_as_cond=conditioned,
        )
        if conditioned:
            from video_diffusion_nnx_tpu.data.loader import collate_with_text_cond

            collate_fn = collate_with_text_cond
    elif conditioned:
        raise SystemExit(
            "error: a guidance_embed teacher needs a caption-conditioned GIF "
            f"folder dataset; {dataset_path} is not a folder"
        )
    else:
        ds = MovingMNIST(
            dataset_path, image_size=(teacher.image_size, teacher.image_size),
            num_frames=teacher.num_frames, force_num_frames=True,
            normalize=tcfg["dataset_normalize"],
        )
    if len(ds) < batch_size:
        raise SystemExit(
            f"error: dataset has {len(ds)} sequences < batch size {batch_size} "
            "(drop-last loader would yield nothing); lower --batch-size"
        )
    log.info(
        "dataset: %d sequences, batch %d%s", len(ds), batch_size,
        " (conditioned, w-range %s)" % (w_range,) if conditioned else "",
    )
    data_iter = cycle(
        DataLoader(ds, batch_size=batch_size, seed=args.seed, collate_fn=collate_fn)
    )

    out_dir = Path(args.output_path or Path(args.checkpoint_path).parent / "distilled")
    out_dir.mkdir(parents=True, exist_ok=True)
    manager = ocp.CheckpointManager(
        out_dir.resolve(), options=ocp.CheckpointManagerOptions(create=True)
    )

    def save_round(n_steps: int, state) -> None:
        # step number == sampler step count; both slots carry the student
        # so --load-ema-params and the default path restore identically.
        save_checkpoint(manager, state, state, n_steps)
        log.info(
            "saved %d-step student -> sample.py --checkpoint-path %s --step %d "
            "--sampler ddim --num-steps %d --grid stride",
            n_steps, out_dir, n_steps, n_steps,
        )

    mesh = data_parallel_mesh()
    final_state, final_steps = progressive_distill(
        teacher,
        data_iter,
        initial_steps=args.initial_steps,
        rounds=args.rounds,
        steps_per_round=args.steps_per_round,
        key=jax.random.PRNGKey(args.seed),
        learning_rate=args.lr,
        mesh=mesh if batch_size % max(mesh.shape.get("data", 1), 1) == 0 else None,
        conditioned=conditioned,
        w_range=w_range,
        ema_decay=args.ema_decay,
        on_round_end=save_round,
    )
    log.info("distillation done: final student samples in %d steps", final_steps)


if __name__ == "__main__":
    main()
