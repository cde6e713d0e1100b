"""Distillation quality demo: the two-stage pipeline keeps CFG steering.

Builds on scripts/demo_text_conditioning.py (same two-caption-class GIF
dataset whose classes have opposite brightness — 'bright square' ~0.85
mean intensity, 'dark square' ~0.15). The measurable claim chain:

1. TEACHER (v-prediction, CFG-dropout trained): guided sampling separates
   the caption classes' mean intensities (two forwards per step).
2. GUIDANCE-DISTILLED student (Meng et al. 2023): the separation persists
   with ONE forward per step at any cond_scale.
3. STAGE-2 progressively distilled student: the separation persists at
   FOUR sampler steps (vs the teacher's full grid), still one forward.

Writes ``examples/distillation/``: stats.json + per-stage sample GIFs.

    /opt/venv/bin/python scripts/demo_distillation.py [--steps 1200]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from scripts.demo_text_conditioning import FRAMES, SIZE, T, make_dataset

REPO = Path(__file__).resolve().parents[1]


def class_separation(model, key, cond_scale, num_steps=None, grid="stride", b=4):
    """Mean-intensity gap between the two caption classes' samples."""
    import jax

    means = {}
    gifs = {}
    for cls in ("bright", "dark"):
        cond = [f"{cls} square"] * b
        if num_steps is None:
            videos = model.sample(key=key, cond=cond, cond_scale=cond_scale)
        else:
            videos = model.ddim_sample(
                key=key, cond=cond, cond_scale=cond_scale,
                num_steps=num_steps, grid=grid,
            )
        arr = np.asarray(videos, np.float32)
        means[cls] = float(arr.mean())
        gifs[cls] = arr
    return means["bright"] - means["dark"], means, gifs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200, help="teacher train steps")
    ap.add_argument("--distill-steps", type=int, default=400, help="per distill stage/round")
    ap.add_argument("--out", type=str, default=str(REPO / "examples" / "distillation"))
    ap.add_argument("--workdir", type=str, default="/tmp/distill_demo")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    work = Path(args.workdir)
    data_dir = work / "clips"
    make_dataset(data_dir)

    import jax
    from flax import nnx

    from video_diffusion_nnx_tpu.data.gif_dataset import GifVideoDataset
    from video_diffusion_nnx_tpu.data.loader import DataLoader, collate_with_text_cond
    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D
    from video_diffusion_nnx_tpu.training import Trainer
    from video_diffusion_nnx_tpu.training.distill import progressive_distill
    from video_diffusion_nnx_tpu.training.guidance import guidance_distill
    from video_diffusion_nnx_tpu.utils import write_sample_gifs
    from video_diffusion_nnx_tpu.utils.functional import cycle

    # ---- 1. Teacher: v-prediction + CFG dropout (same recipe as the ----
    # ---- text-conditioning demo, which validated the separation).   ----
    def build(guidance_embed: bool):
        unet = Unet3D(
            dim=16, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=1,
            attn_heads=2, use_bert_text_cond=True, guidance_embed=guidance_embed,
        )
        return GaussianDiffusion(
            unet, image_size=SIZE, num_frames=FRAMES, channels=1,
            timesteps=T, loss_type="l2", prediction_type="v",
        )

    teacher = build(False)
    trainer = Trainer(
        teacher,
        folder=str(work),
        dataset_path=str(data_dir),
        train_batch_size=8,
        train_lr=2e-3,
        train_num_steps=args.steps,
        step_start_ema=100,
        update_ema_every=5,
        ema_decay=0.99,
        checkpoint_every_steps=10**9,
        results_folder=str(work / "results"),
        tensorboard_dir=str(work / "tb"),
        profile_flush_step=0,
        use_path_as_cond=True,
        null_cond_prob=0.2,
        log_every_steps=100,
    )
    trainer.train()
    teacher = nnx.merge(trainer.graphdef, trainer.state.ema_params)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    stats: dict = {
        "teacher_train_steps": args.steps,
        "distill_steps_per_stage": args.distill_steps,
    }
    key = jax.random.PRNGKey(0)

    sep_t, means_t, gifs_t = class_separation(teacher, key, cond_scale=3.0)
    stats["teacher_cfg_cs3_full_grid"] = {
        "separation": round(sep_t, 4), **{k: round(v, 4) for k, v in means_t.items()},
        "forwards_per_step": 2, "steps": T,
    }
    print(f"[teacher] CFG cs=3 separation: {sep_t:.4f}")
    for cls, arr in gifs_t.items():
        write_sample_gifs(arr[:2], out_dir, names=[f"teacher_{cls}_{i}" for i in range(2)])

    # ---- 2. Guidance distillation: fold CFG into one forward. ----
    student = build(True)
    ds = GifVideoDataset(
        str(data_dir), image_size=SIZE, channels=1, num_frames=FRAMES,
        force_num_frames=True, use_path_as_cond=True,
    )
    data_iter = cycle(
        DataLoader(ds, batch_size=8, seed=0, collate_fn=collate_with_text_cond)
    )
    g_state = guidance_distill(
        teacher, student, data_iter,
        num_train_steps=args.distill_steps,
        key=jax.random.PRNGKey(1),
        learning_rate=1e-3,
        w_range=(1.0, 4.0),
        log_every=100,
    )
    s_graphdef, _ = nnx.split(student)
    g_student = nnx.merge(s_graphdef, g_state)

    sep_g, means_g, gifs_g = class_separation(g_student, key, cond_scale=3.0)
    stats["guidance_distilled_cs3_full_grid"] = {
        "separation": round(sep_g, 4), **{k: round(v, 4) for k, v in means_g.items()},
        "forwards_per_step": 1, "steps": T,
    }
    print(f"[guidance-distilled] cs=3 separation (1 fwd/step): {sep_g:.4f}")
    for cls, arr in gifs_g.items():
        write_sample_gifs(arr[:2], out_dir, names=[f"gdistilled_{cls}_{i}" for i in range(2)])

    # ---- 3. Stage 2: progressive halving of the w-conditioned student ----
    final_state, final_steps = progressive_distill(
        g_student, data_iter,
        initial_steps=8, rounds=2, steps_per_round=args.distill_steps,
        key=jax.random.PRNGKey(2),
        learning_rate=1e-3,
        conditioned=True,
        w_range=(1.0, 4.0),
    )
    p_student = nnx.merge(s_graphdef, final_state)
    sep_p, means_p, gifs_p = class_separation(
        p_student, key, cond_scale=3.0, num_steps=final_steps, grid="stride"
    )
    stats[f"stage2_distilled_cs3_{final_steps}step"] = {
        "separation": round(sep_p, 4), **{k: round(v, 4) for k, v in means_p.items()},
        "forwards_per_step": 1, "steps": final_steps,
    }
    print(
        f"[stage2-distilled] cs=3 separation at {final_steps} steps "
        f"(1 fwd/step): {sep_p:.4f}"
    )
    for cls, arr in gifs_p.items():
        write_sample_gifs(
            arr[:2], out_dir, names=[f"stage2_{final_steps}step_{cls}_{i}" for i in range(2)]
        )

    (out_dir / "stats.json").write_text(json.dumps(stats, indent=2))
    print(json.dumps(stats, indent=2))

    # Claims: the teacher steers; distilled students KEEP steering (>= 60%
    # of the teacher's separation) at 1 forward/step, and stage 2 keeps it
    # at `final_steps` sampler steps.
    assert sep_t > 0.2, f"teacher failed to steer (separation {sep_t:.3f})"
    assert sep_g > 0.6 * sep_t, (
        f"guidance distillation lost the steering ({sep_g:.3f} vs teacher {sep_t:.3f})"
    )
    assert sep_p > 0.5 * sep_t, (
        f"stage-2 distillation lost the steering ({sep_p:.3f} vs teacher {sep_t:.3f})"
    )
    print(
        f"OK: separation teacher {sep_t:.3f} (2 fwd/step, {T} steps) -> "
        f"guidance-distilled {sep_g:.3f} (1 fwd/step) -> stage-2 {sep_p:.3f} "
        f"({final_steps} steps)"
    )


if __name__ == "__main__":
    main()
