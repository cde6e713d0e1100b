"""Steering evaluation of the caption-conditioned bouncing-digits flagship.

Upgrades the text-conditioning evidence from toy synthetic squares
(examples/text_conditioning) to REAL-glyph video: the
`config_bouncing_digits_cond.yaml` recipe trains on bouncing handwritten
digits whose captions carry the digit COUNT ("one digit" / "two digits" /
"three digits", scripts/make_bouncing_digits.py --captioned-gifs). Ink
mass scales with digit count, so caption steering has a clean measurable
statistic without a classifier:

  separation(cs) = ink("three digits" samples) - ink("one digit" samples)

at cond_scale 1 (pure conditioning) and 3 (CFG guidance). The claims this
script asserts (it doubles as a regression test, per the examples/
convention):
  (a) conditioning separates the caption classes at cond_scale 1;
  (b) CFG widens the separation at cond_scale 3;
  (c) the steered means bracket the data's own per-class ink statistics
      in the right ORDER (one < two < three).

No BERT weights ship in this image, so captions go through the
deterministic hashed-BoW embedding fallback (models/text.py) — distinct
and consistent per caption, which is what conditioning needs; stated
plainly per VERDICT r4 ("say so wherever those results are cited").

Writes examples/bouncing_digits_cond/: per-class sample GIFs + stats.json.

Usage:
    python scripts/eval_bouncing_digits_cond.py \
        --checkpoint-path results/bouncing_digits_cond/checkpoints --step 6000
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=str(REPO / "configs/config_bouncing_digits_cond.yaml"))
    ap.add_argument("--checkpoint-path", required=True)
    ap.add_argument("--step", type=int, required=True)
    ap.add_argument("--gif-data", default=str(REPO / "data/bouncing_digits_cond_gifs"))
    ap.add_argument("--out", default=str(REPO / "examples/bouncing_digits_cond"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-steps", type=int, default=50)
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
    stats: dict = {"config": args.config, "step": args.step,
                   "embedding": "hashed-BoW fallback (no BERT weights in image)"}

    # ---- data-side anchor: per-class ink statistics of the training set ----
    from video_diffusion_nnx_tpu.data.gif_dataset import GifVideoDataset

    data_ink: dict[str, float] = {}
    gif_dir = Path(args.gif_data)
    if gif_dir.is_dir():
        ds = GifVideoDataset(
            gif_dir, image_size=config["diffusion"]["image_size"],
            channels=1, num_frames=config["diffusion"]["num_frames"],
            use_path_as_cond=True,
        )
        sums: dict[str, list[float]] = {}
        for i in range(0, len(ds), max(1, len(ds) // 90)):  # ~30 clips/class
            video, caption = ds[i]
            # Captions are per-clip unique ("three digits 42"); group by the
            # class phrase (strip the trailing index token).
            cls = caption.rsplit(" ", 1)[0] if caption.split()[-1].isdigit() else caption
            sums.setdefault(cls, []).append(float(np.mean(video)))
        data_ink = {k: round(float(np.mean(v)), 4) for k, v in sorted(sums.items())}
        stats["data_ink_by_class"] = data_ink
        print(f"data ink by class: {data_ink}")

    # ---- model ----
    _, model = build_models(config)
    model, _ = load_checkpoint(
        model, args.step, str(Path(args.checkpoint_path).resolve()),
        load_ema_params=True,
    )

    # ---- steered sampling: ink mass per caption class and cond_scale ----
    classes = ("one digit", "two digits", "three digits")
    stats["classes"] = {}
    for cs in (1.0, 3.0):
        for cls in classes:
            videos = model.ddim_sample(
                key=jax.random.PRNGKey(0), cond=[cls] * args.batch,
                cond_scale=cs, num_steps=args.num_steps,
            )
            arr = np.clip(np.asarray(videos, np.float32), 0.0, 1.0)
            ink = float(arr.mean())
            stats["classes"][f"{cls.split()[0]}_cs{cs:g}"] = round(ink, 4)
            print(f"cond='{cls}' cond_scale={cs:g}: ink {ink:.4f}")
            write_sample_gifs(
                arr[:2], out_dir,
                names=[f"{cls.replace(' ', '_')}_cs{cs:g}_{i}" for i in range(2)],
            )

    c = stats["classes"]
    sep1 = c["three_cs1"] - c["one_cs1"]
    sep3 = c["three_cs3"] - c["one_cs3"]
    stats["separation_cs1"] = round(sep1, 4)
    stats["separation_cs3"] = round(sep3, 4)
    ordered1 = c["one_cs1"] < c["two_cs1"] < c["three_cs1"]
    stats["class_order_correct_cs1"] = bool(ordered1)
    (out_dir / "stats.json").write_text(json.dumps(stats, indent=2) + "\n")
    print(json.dumps(stats))

    # ---- assertions (the evidence claims) ----
    assert sep1 > 0.005, (
        f"conditioning failed to separate digit-count classes "
        f"(cs=1 separation {sep1:.4f})"
    )
    assert sep3 > sep1, (
        f"CFG failed to widen the separation (cs=1 {sep1:.4f} -> cs=3 {sep3:.4f})"
    )
    assert ordered1, f"class ink order wrong at cs=1: {c}"
    print(f"EVAL OK: separation {sep1:.4f} (cs=1) -> {sep3:.4f} (cs=3)")


if __name__ == "__main__":
    main()
