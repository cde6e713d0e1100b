"""Production-architecture distillation evidence (full 4-level Unet3D).

The tiny demo (scripts/demo_distillation.py) shows steering survives
distillation at 16x16. This one runs the REAL architecture — dim 32,
mults (1,2,4,8), 64x64, 10 frames, T=1024, v-prediction, bf16 + fused
kernels (the config_distill_ready recipe) — on synthetic moving-squares
video, and measures the claim that matters for few-step sampling:

    Against the teacher's full 32-step stride-DDIM reference (shared init
    noise), a progressively distilled 4-step student must land CLOSER
    than the teacher naively sampled at 4 steps.

That is the direct objective distillation optimizes (the student learns
the teacher's integrator), so it is measurable without subjective sample
quality: endpoint MSE at shared seeds. Writes
``examples/distillation_production/``: stats.json + teacher/student GIFs.

    /opt/venv/bin/python scripts/demo_distillation_production.py \
        [--teacher-steps 3000] [--distill-steps 500]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPO = Path(__file__).resolve().parents[1]

SIZE, FRAMES, T = 64, 10, 1024


def make_dataset(path: Path, n: int = 64) -> None:
    """(F, B, H, W) uint8 .npy of moving bright squares on gray — the
    MovingMNIST on-disk contract, synthesized (no dataset ships here)."""
    rng = np.random.default_rng(0)
    data = np.full((FRAMES, n, SIZE, SIZE), 96, np.uint8)
    for i in range(n):
        x0, y0 = rng.integers(0, SIZE - 16, size=2)
        dx, dy = rng.integers(-3, 4, size=2)
        side = int(rng.integers(8, 17))
        shade = int(rng.integers(200, 256))
        for f in range(FRAMES):
            xx = int(np.clip(x0 + f * dx, 0, SIZE - side))
            yy = int(np.clip(y0 + f * dy, 0, SIZE - side))
            data[f, i, yy:yy + side, xx:xx + side] = shade
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, data)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher-steps", type=int, default=3000)
    ap.add_argument("--distill-steps", type=int, default=500, help="per round")
    ap.add_argument("--out", type=str,
                    default=str(REPO / "examples" / "distillation_production"))
    ap.add_argument("--workdir", type=str, default="/tmp/distill_prod")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    work = Path(args.workdir)
    npy = work / "squares.npy"
    make_dataset(npy)

    import jax
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D
    from video_diffusion_nnx_tpu.training import Trainer
    from video_diffusion_nnx_tpu.training.distill import progressive_distill
    from video_diffusion_nnx_tpu.utils import write_sample_gifs

    unet = Unet3D(
        dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=1,
        attn_heads=8, compute_dtype="bfloat16",
        use_fused_attention=True, use_fused_spatial_attention=True,
    )
    teacher = GaussianDiffusion(
        unet, image_size=SIZE, num_frames=FRAMES, channels=1,
        timesteps=T, loss_type="l2", prediction_type="v",
    )
    trainer = Trainer(
        teacher,
        folder=str(work),
        dataset_path=str(npy),
        train_batch_size=4,
        train_lr=1e-3,
        train_num_steps=args.teacher_steps,
        step_start_ema=200,
        update_ema_every=5,
        ema_decay=0.995,
        checkpoint_every_steps=10**9,
        results_folder=str(work / "results"),
        tensorboard_dir=str(work / "tb"),
        profile_flush_step=0,
        dataset_normalize=True,
        freeze_schedule_buffers=True,
        log_every_steps=250,
    )
    trainer.train()
    teacher = nnx.merge(trainer.graphdef, trainer.state.ema_params)

    # ---- Distill 32 -> 16 -> 8 -> 4 (stride grids). ----
    from video_diffusion_nnx_tpu.data.loader import DataLoader
    from video_diffusion_nnx_tpu.data.moving_mnist import MovingMNIST
    from video_diffusion_nnx_tpu.utils.functional import cycle

    ds = MovingMNIST(
        str(npy), image_size=(SIZE, SIZE), num_frames=FRAMES,
        force_num_frames=True, normalize=True,
    )
    data_iter = cycle(DataLoader(ds, batch_size=4, seed=0))
    final_state, final_steps = progressive_distill(
        teacher, data_iter,
        initial_steps=32, rounds=4, steps_per_round=args.distill_steps,
        key=jax.random.PRNGKey(1), learning_rate=3e-4, ema_decay=0.99,
    )
    graphdef, _ = nnx.split(teacher)
    student = nnx.merge(graphdef, final_state)

    # ---- Endpoint MSE vs the teacher's 32-step reference. ----
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    b = 4
    key = jax.random.PRNGKey(7)
    ref = np.asarray(teacher.ddim_sample(
        key=key, batch_size=b, num_steps=32, grid="stride"))
    naive4 = np.asarray(teacher.ddim_sample(
        key=key, batch_size=b, num_steps=4, grid="stride"))
    dist4 = np.asarray(student.ddim_sample(
        key=key, batch_size=b, num_steps=final_steps, grid="stride"))

    mse_naive = float(np.mean((naive4 - ref) ** 2))
    mse_dist = float(np.mean((dist4 - ref) ** 2))
    stats = {
        "architecture": "dim 32, mults (1,2,4,8), 64x64, 10f, T=1024, v-pred",
        "teacher_train_steps": args.teacher_steps,
        "distill_steps_per_round": args.distill_steps,
        "rounds": "32 -> 16 -> 8 -> 4",
        "mse_teacher4_vs_teacher32": round(mse_naive, 6),
        "mse_distilled4_vs_teacher32": round(mse_dist, 6),
        "improvement": round(mse_naive / max(mse_dist, 1e-12), 2),
    }
    (out_dir / "stats.json").write_text(json.dumps(stats, indent=2))
    print(json.dumps(stats, indent=2))
    write_sample_gifs(ref[:2], out_dir, names=["teacher32_0", "teacher32_1"])
    write_sample_gifs(naive4[:2], out_dir, names=["teacher4_naive_0", "teacher4_naive_1"])
    write_sample_gifs(dist4[:2], out_dir, names=["distilled4_0", "distilled4_1"])

    assert mse_dist < mse_naive, (
        f"distilled 4-step ({mse_dist:.5f}) must beat the naive 4-step "
        f"teacher ({mse_naive:.5f}) against the 32-step reference"
    )
    print(
        f"OK: 4-step endpoint MSE to the 32-step teacher: naive {mse_naive:.5f} "
        f"-> distilled {mse_dist:.5f} ({mse_naive / mse_dist:.1f}x closer)"
    )


if __name__ == "__main__":
    main()
