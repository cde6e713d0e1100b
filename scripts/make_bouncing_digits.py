"""Generate a bouncing-digits video dataset from REAL handwritten digits.

The reference trains on MovingMNIST (bouncing MNIST digits; .npy of shape
(F, B, H, W), raw 0-255 — reference datasets.py:40-45). That file does not
ship in this image, so this script builds the closest real-data analogue
available: sklearn's `load_digits` corpus (1,797 genuine 8x8 handwritten
digit scans from 43 writers, UCI ML hand-written digits) upscaled 2x and
bounced around a 64x64 canvas with the classic MovingMNIST dynamics
(constant velocity, elastic wall reflection, two digits per clip, pixel
max-composition). Output is bit-compatible with the MovingMNIST loader
(`data/moving_mnist.py`): float-ready uint8 (F, B, H, W) in 0..255.

    python scripts/make_bouncing_digits.py --out data/bouncing_digits.npy \
        --clips 2000 --frames 16 [--holdout-out data/bouncing_digits_val.npy]

Determinism: a single numpy Generator seeds digit choice, start position,
and velocity, so the dataset is reproducible byte-for-byte. The holdout
set uses digits from writers excluded from the train split (sklearn orders
the corpus by writer blocks; we split on sample index) so the quality
metric measures generalization to unseen handwriting, not memorization.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _load_glyphs(upscale: int = 2) -> np.ndarray:
    """All 1,797 real digit scans as (N, 8*u, 8*u) float arrays in 0..255."""
    from sklearn.datasets import load_digits

    images = load_digits().images  # (1797, 8, 8), values 0..16
    glyphs = (images / 16.0 * 255.0).astype(np.float32)
    if upscale > 1:
        glyphs = np.repeat(np.repeat(glyphs, upscale, axis=1), upscale, axis=2)
    return glyphs


def make_clips(
    glyphs: np.ndarray,
    n_clips: int,
    n_frames: int,
    canvas: int,
    digits_per_clip: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """(F, B, H, W) uint8 clips of bouncing digits (MovingMNIST dynamics)."""
    g = glyphs.shape[1]
    span = canvas - g  # positions live in [0, span]
    out = np.zeros((n_frames, n_clips, canvas, canvas), np.float32)
    for b in range(n_clips):
        idx = rng.integers(0, glyphs.shape[0], size=digits_per_clip)
        pos = rng.uniform(0, span, size=(digits_per_clip, 2))
        # Speed ~2-4 px/frame at a random angle, like the classic generator.
        angle = rng.uniform(0, 2 * np.pi, size=digits_per_clip)
        speed = rng.uniform(2.0, 4.0, size=digits_per_clip)
        vel = np.stack([np.cos(angle), np.sin(angle)], 1) * speed[:, None]
        for f in range(n_frames):
            frame = out[f, b]
            for d in range(digits_per_clip):
                y, x = int(round(pos[d, 0])), int(round(pos[d, 1]))
                patch = frame[y : y + g, x : x + g]
                np.maximum(patch, glyphs[idx[d]], out=patch)
            pos += vel
            # Elastic reflection off the walls (reflect position, flip v).
            for d in range(digits_per_clip):
                for ax in range(2):
                    if pos[d, ax] < 0:
                        pos[d, ax] = -pos[d, ax]
                        vel[d, ax] = -vel[d, ax]
                    elif pos[d, ax] > span:
                        pos[d, ax] = 2 * span - pos[d, ax]
                        vel[d, ax] = -vel[d, ax]
    return out.astype(np.uint8)


_COUNT_WORDS = {1: "one digit", 2: "two digits", 3: "three digits"}


def make_captioned_gifs(
    glyphs: np.ndarray,
    out_dir: Path,
    clips_per_class: int,
    n_frames: int,
    canvas: int,
    rng: np.random.Generator,
) -> None:
    """Caption-conditioned variant: GIF clips whose filename carries the
    digit COUNT ("one digit {i}.gif" / "two digits ..." / "three digits
    ..."), for `use_path_as_cond` training (data/gif_dataset.py derives the
    caption from the stem). Ink mass scales with digit count, so caption
    steering has a clean measurable statistic
    (scripts/eval_bouncing_digits_cond.py)."""
    from PIL import Image

    out_dir.mkdir(parents=True, exist_ok=True)
    for count, word in _COUNT_WORDS.items():
        clips = make_clips(glyphs, clips_per_class, n_frames, canvas, count, rng)
        for b in range(clips_per_class):
            frames = [Image.fromarray(clips[f, b], mode="L") for f in range(n_frames)]
            frames[0].save(
                out_dir / f"{word} {b}.gif",
                save_all=True, append_images=frames[1:], duration=100, loop=0,
            )
        print(f"wrote {clips_per_class} '{word}' clips to {out_dir}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=str, default=None,
                    help="output .npy (F,B,H,W); optional when only "
                    "--captioned-gifs is requested")
    ap.add_argument("--holdout-out", type=str, default=None)
    ap.add_argument("--clips", type=int, default=2000)
    ap.add_argument("--holdout-clips", type=int, default=64)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--canvas", type=int, default=64)
    ap.add_argument("--digits-per-clip", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--captioned-gifs", type=str, default=None,
        help="also write a caption-conditioned GIF dataset (digit-count "
        "captions) to this directory",
    )
    ap.add_argument("--captioned-clips-per-class", type=int, default=256)
    args = ap.parse_args()

    assert args.out or args.captioned_gifs, "nothing to generate"
    glyphs = _load_glyphs()
    # Writer-disjoint split: sklearn orders samples in writer blocks, so an
    # index split keeps train and holdout handwriting disjoint.
    n_train_glyphs = int(glyphs.shape[0] * 0.9)
    rng = np.random.default_rng(args.seed)

    if args.out:
        train = make_clips(
            glyphs[:n_train_glyphs], args.clips, args.frames, args.canvas,
            args.digits_per_clip, rng,
        )
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        np.save(args.out, train)
        print(f"wrote {args.out}: {train.shape} uint8 (F,B,H,W), "
              f"mean {train.mean():.1f}, max {train.max()}")

    if args.holdout_out:
        holdout = make_clips(
            glyphs[n_train_glyphs:], args.holdout_clips, args.frames,
            args.canvas, args.digits_per_clip, rng,
        )
        np.save(args.holdout_out, holdout)
        print(f"wrote {args.holdout_out}: {holdout.shape}")

    if args.captioned_gifs:
        make_captioned_gifs(
            glyphs[:n_train_glyphs], Path(args.captioned_gifs),
            args.captioned_clips_per_class, args.frames, args.canvas, rng,
        )


if __name__ == "__main__":
    main()
