"""Semantic text-conditioning demo: CFG steering measurably changes samples.

No BERT weights are obtainable in this environment (zero egress), so this
uses the deterministic hashed-BoW embedding fallback (models/text.py) — the
embeddings are not semantic English, but they ARE distinct and consistent
per caption, which is all conditioning needs: the model learns to associate
each caption class's embedding with its video statistics.

Setup: a folder of GIF clips in two caption classes with opposite
brightness — ``bright square {i}.gif`` (mean intensity ~0.85) and ``dark
square {i}.gif`` (~0.15) — trained with ``use_path_as_cond`` and CFG
conditioning dropout (``null_cond_prob``). After training, sampling with
each class's caption at cond_scale 1 and >1 must separate the classes'
mean intensities, and guidance must widen the separation.

Writes ``examples/text_conditioning/``: per-class sample GIFs + stats.json.

    /opt/venv/bin/python scripts/demo_text_conditioning.py [--steps 600]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPO = Path(__file__).resolve().parents[1]

SIZE, FRAMES, T = 16, 4, 100


def make_dataset(root: Path, n_per_class: int = 16) -> None:
    """GIF clips: a moving 4x4 square on a mid-gray background; 'bright'
    clips live near white, 'dark' clips near black."""
    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for cls, lo, hi in (("bright", 190, 255), ("dark", 0, 65)):
        for i in range(n_per_class):
            x0, y0 = rng.integers(0, SIZE - 6, size=2)
            dx, dy = rng.integers(1, 3, size=2)
            frames = []
            for f in range(FRAMES):
                img = np.full((SIZE, SIZE), (lo + hi) // 2, np.uint8)
                xx = int(np.clip(x0 + f * dx, 0, SIZE - 4))
                yy = int(np.clip(y0 + f * dy, 0, SIZE - 4))
                img[yy : yy + 4, xx : xx + 4] = hi if cls == "bright" else lo
                # Keep the whole clip in the class's intensity band.
                img = np.clip(img, lo, hi).astype(np.uint8)
                frames.append(Image.fromarray(img, mode="L"))
            frames[0].save(
                root / f"{cls} square {i}.gif",
                save_all=True, append_images=frames[1:], duration=100, loop=0,
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--out", type=str, default=str(REPO / "examples" / "text_conditioning"))
    ap.add_argument("--workdir", type=str, default="/tmp/text_cond_demo")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    work = Path(args.workdir)
    data_dir = work / "clips"
    make_dataset(data_dir)

    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D
    from video_diffusion_nnx_tpu.training import Trainer
    from video_diffusion_nnx_tpu.utils import write_sample_gifs

    unet = Unet3D(
        dim=16, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=1,
        attn_heads=2, use_bert_text_cond=True,
    )
    diffusion = GaussianDiffusion(
        unet, image_size=SIZE, num_frames=FRAMES, channels=1,
        timesteps=T, loss_type="l2",
    )
    trainer = Trainer(
        diffusion,
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
        log_every_steps=50,
    )
    trainer.train()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    model = nnx.merge(trainer.graphdef, trainer.state.ema_params)

    import jax

    stats: dict = {"steps": args.steps, "classes": {}}
    b = 4
    for cs in (1.0, 3.0):
        for cls in ("bright", "dark"):
            cond = [f"{cls} square"] * b
            videos = model.sample(
                key=jax.random.PRNGKey(0), cond=cond, cond_scale=cs, batch_size=b
            )
            arr = np.asarray(videos, np.float32)  # [0, 1] after unnormalize
            mean = float(arr.mean())
            stats["classes"][f"{cls}_cs{cs:g}"] = round(mean, 4)
            print(f"cond='{cls} square' cond_scale={cs:g}: mean intensity {mean:.4f}")
            write_sample_gifs(
                arr[:2], out_dir, names=[f"{cls}_cs{cs:g}_{i}" for i in range(2)]
            )

    sep1 = stats["classes"]["bright_cs1"] - stats["classes"]["dark_cs1"]
    sep3 = stats["classes"]["bright_cs3"] - stats["classes"]["dark_cs3"]
    stats["separation_cs1"] = round(sep1, 4)
    stats["separation_cs3"] = round(sep3, 4)
    (out_dir / "stats.json").write_text(json.dumps(stats, indent=2))
    print(json.dumps(stats, indent=2))

    # The demo's claims: (a) conditioning separates the caption classes at
    # all; (b) CFG guidance (cond_scale > 1) WIDENS the separation — the
    # "steering measurably changes sample statistics" evidence.
    assert sep1 > 0.05, (
        f"conditioning failed to separate classes (cs=1 separation {sep1:.3f})"
    )
    assert sep3 > sep1 and sep3 > 0.2, (
        f"CFG failed to widen the separation (cs=1 {sep1:.3f} -> cs=3 {sep3:.3f})"
    )
    print(f"OK: caption classes separated by {sep1:.3f} (cs=1), {sep3:.3f} (cs=3)")


if __name__ == "__main__":
    main()
