"""Guidance-distillation CLI (Meng et al. 2023; capability beyond the
reference): distill a CFG teacher into a w-conditioned student that runs
guided sampling at ANY cond_scale in ONE forward pass (CFG costs 2x).

    python scripts/distill_guidance.py --config configs/my_cond.yaml \
        --checkpoint-path results/checkpoints --step 100000 \
        --num-steps 2000 --output-path results/guidance_distilled

The teacher config must describe a conditioned model (``use_path_as_cond``
GIF dataset or bert text cond). The student checkpoint is saved in the
standard ``{'model', 'ema_params'}`` layout at the teacher's step, next to
a derived ``config_guidance.yaml`` (the teacher config plus
``unet.guidance_embed: true``) so sampling is the stock CLI:

    python sample.py --config <out>/config_guidance.yaml \
        --checkpoint-path <out> --step <step> --text "..." --cond-scale 4
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

log = logging.getLogger("distill_guidance")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint-path", type=str, required=True)
    p.add_argument("--step", type=int, required=True, help="teacher checkpoint step")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--num-steps", type=int, default=2000, help="optimizer steps")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--w-min", type=float, default=1.0)
    p.add_argument("--w-max", type=float, default=8.0)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--output-path", type=str, default=None,
        help="default: <checkpoint-path>/../guidance_distilled",
    )
    return p.parse_args()


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s:%(name)s:%(message)s")
    args = parse_args()

    import copy

    import jax
    import orbax.checkpoint as ocp
    import yaml

    from video_diffusion_nnx_tpu.config import build_models, load_config
    from video_diffusion_nnx_tpu.data.gif_dataset import GifVideoDataset
    from video_diffusion_nnx_tpu.data.loader import DataLoader, collate_with_text_cond
    from video_diffusion_nnx_tpu.parallel.mesh import data_parallel_mesh
    from video_diffusion_nnx_tpu.training.guidance import guidance_distill
    from video_diffusion_nnx_tpu.utils import (
        enable_compilation_cache,
        load_checkpoint,
        save_checkpoint,
    )
    from video_diffusion_nnx_tpu.utils.functional import cycle

    config = load_config(args.config)
    enable_compilation_cache(config["trainer"].get("compilation_cache_dir"))
    _, teacher = build_models(config)
    if not getattr(teacher.denoise_fn, "has_cond", False):
        raise SystemExit(
            "error: the config describes an unconditioned model; guidance "
            "distillation needs cond_dim or use_bert_text_cond"
        )
    try:
        teacher, _ = load_checkpoint(
            teacher, args.step, str(Path(args.checkpoint_path).resolve()),
            load_ema_params=not args.no_ema,
        )
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}") from None

    student_config = copy.deepcopy(config)
    student_config["unet"]["guidance_embed"] = True
    _, student = build_models(student_config)

    tcfg = config["trainer"]
    batch_size = args.batch_size or tcfg["train_batch_size"]
    dataset_path = tcfg["dataset_path"]
    if not Path(dataset_path).is_dir():
        raise SystemExit(
            "error: guidance distillation needs a caption-conditioned GIF "
            f"folder dataset (use_path_as_cond); {dataset_path} is not a folder"
        )
    ds = GifVideoDataset(
        dataset_path, image_size=teacher.image_size, channels=teacher.channels,
        num_frames=teacher.num_frames, force_num_frames=True, use_path_as_cond=True,
    )
    if len(ds) < batch_size:
        raise SystemExit(
            f"error: dataset has {len(ds)} clips < batch size {batch_size}"
        )
    log.info("dataset: %d captioned clips, batch %d", len(ds), batch_size)
    data_iter = cycle(
        DataLoader(ds, batch_size=batch_size, seed=args.seed,
                   collate_fn=collate_with_text_cond)
    )

    mesh = data_parallel_mesh()
    state = guidance_distill(
        teacher, student, data_iter,
        num_train_steps=args.num_steps,
        key=jax.random.PRNGKey(args.seed),
        learning_rate=args.lr,
        w_range=(args.w_min, args.w_max),
        mesh=mesh if batch_size % max(mesh.shape.get("data", 1), 1) == 0 else None,
    )

    out_dir = Path(args.output_path or Path(args.checkpoint_path).parent / "guidance_distilled")
    out_dir.mkdir(parents=True, exist_ok=True)
    manager = ocp.CheckpointManager(
        out_dir.resolve(), options=ocp.CheckpointManagerOptions(create=True)
    )
    save_checkpoint(manager, state, state, args.step)
    derived = out_dir / "config_guidance.yaml"
    with open(derived, "w") as f:
        yaml.safe_dump(student_config, f)
    log.info(
        "saved w-conditioned student -> sample.py --config %s "
        "--checkpoint-path %s --step %d --text '...' --cond-scale W",
        derived, out_dir, args.step,
    )


if __name__ == "__main__":
    main()
