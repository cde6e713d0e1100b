"""Distillation-on-the-flagship evidence (VERDICT r4 task 7).

Compares the trained bouncing-digits teacher (config_bouncing_digits.yaml,
scripts/eval_bouncing_digits.py) against its progressively-distilled
4-step student (scripts/distill.py) on the SAME held-out criteria the
flagship eval uses, closing the round-3 open end "distillation quality
evidence from a properly trained teacher":

  1. endpoint MSE at shared seeds — DDIM at eta=0 is a deterministic ODE
     in x_T, so teacher-32-step / teacher-4-step / distilled-4-step runs
     from the same key are directly comparable
     (examples/distillation_production methodology);
  2. realism statistics — spatial/temporal autocorrelation + active-pixel
     fraction of the distilled 4-step samples vs the held-out data
     (eval_bouncing_digits.autocorr_stats);
  3. artifacts — side-by-side GIFs (teacher-32 / naive-4 / distilled-4).

Asserts: distilled-4 endpoint MSE < naive-4, and distilled-4 samples are
data-like (spatial autocorr > 0.5), so it doubles as a regression test.

Usage:
    python scripts/distill.py --config configs/config_bouncing_digits.yaml \
        --checkpoint-path results/bouncing_digits/checkpoints --step 20000 \
        --initial-steps 32 --rounds 4 --steps-per-round 1000 \
        --ema-decay 0.99 --output-path results/bouncing_digits/distilled
    python scripts/eval_bouncing_digits_distilled.py \
        --teacher-path results/bouncing_digits/checkpoints --teacher-step 20000 \
        --student-path results/bouncing_digits/distilled --student-step 4
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from eval_bouncing_digits import autocorr_stats  # noqa: E402 — sibling script

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=str(REPO / "configs/config_bouncing_digits.yaml"))
    ap.add_argument("--teacher-path", required=True)
    ap.add_argument("--teacher-step", type=int, required=True)
    ap.add_argument("--student-path", required=True)
    ap.add_argument("--student-step", type=int, default=4,
                    help="distilled checkpoint step = its sampler step count")
    ap.add_argument("--holdout", default=str(REPO / "data/bouncing_digits_val.npy"))
    ap.add_argument("--out", default=str(REPO / "examples/bouncing_digits_distilled"))
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    from video_diffusion_nnx_tpu.config import build_models, load_config
    from video_diffusion_nnx_tpu.utils import (
        enable_compilation_cache,
        load_checkpoint,
        write_sample_gifs,
    )

    enable_compilation_cache()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    config = load_config(args.config)
    n_frames = config["diffusion"]["num_frames"]

    _, teacher = build_models(config)
    teacher, _ = load_checkpoint(
        teacher, args.teacher_step, str(Path(args.teacher_path).resolve()),
        load_ema_params=True,
    )
    _, student = build_models(config)
    student, _ = load_checkpoint(
        student, args.student_step, str(Path(args.student_path).resolve()),
        load_ema_params=True,
    )

    # ---- endpoint MSE at shared seeds (deterministic ODE in x_T) ----
    key = jax.random.PRNGKey(7)
    b, n = args.batch, args.student_step
    ref = np.asarray(teacher.ddim_sample(key=key, batch_size=b, num_steps=32,
                                         grid="stride"))
    naive = np.asarray(teacher.ddim_sample(key=key, batch_size=b, num_steps=n,
                                           grid="stride"))
    dist = np.asarray(student.ddim_sample(key=key, batch_size=b, num_steps=n,
                                          grid="stride"))
    mse_naive = float(np.mean((naive - ref) ** 2))
    mse_dist = float(np.mean((dist - ref) ** 2))

    # ---- realism of the distilled student's samples vs held-out data ----
    hold = np.load(args.holdout)[:n_frames, :32].astype(np.float32) / 255.0
    hold = np.transpose(hold, (1, 0, 2, 3))  # (B, F, H, W)
    dist_c = np.clip(dist, 0.0, 1.0)
    stats = {
        "config": args.config,
        "teacher_step": args.teacher_step,
        "student_sampler_steps": n,
        "mse_naive_vs_teacher32": round(mse_naive, 6),
        "mse_distilled_vs_teacher32": round(mse_dist, 6),
        "improvement": round(mse_naive / max(mse_dist, 1e-12), 2),
        "samples_distilled": autocorr_stats(dist_c[:, 0]),
        "samples_teacher32": autocorr_stats(np.clip(ref, 0, 1)[:, 0]),
        "data_holdout": autocorr_stats(hold),
    }
    (out_dir / "stats.json").write_text(json.dumps(stats, indent=2) + "\n")
    print(json.dumps(stats))

    for arr, tag in ((ref, "teacher32"), (naive, f"naive{n}"), (dist, f"distilled{n}")):
        write_sample_gifs(
            np.clip(arr, 0, 1)[:2], out_dir, names=[f"{tag}_{i}" for i in range(2)]
        )

    assert mse_dist < mse_naive, (
        f"distilled {n}-step ({mse_dist:.5f}) must beat the naive {n}-step "
        f"teacher ({mse_naive:.5f}) against the 32-step reference"
    )
    assert stats["samples_distilled"]["spatial_autocorr"] > 0.5, (
        f"distilled samples are noise-like: {stats['samples_distilled']}"
    )
    print(
        f"EVAL OK: endpoint MSE naive {mse_naive:.5f} -> distilled "
        f"{mse_dist:.5f} ({mse_naive / max(mse_dist, 1e-12):.1f}x closer)"
    )


if __name__ == "__main__":
    main()
