"""Generate a synthetic bouncing-shapes video dataset in the Moving-MNIST
on-disk format ``(frames, sequences, h, w) uint8`` (reference datasets.py:17).

Usage:
    /opt/venv/bin/python scripts/make_synthetic_dataset.py OUT.npy \
        [--sequences 200] [--frames 20] [--size 64] [--seed 0]
"""

import argparse

import numpy as np


def render_sequence(rng: np.random.Generator, frames: int, size: int) -> np.ndarray:
    """Two bouncing bright squares on black, like Moving-MNIST dynamics."""
    out = np.zeros((frames, size, size), np.uint8)
    for _ in range(2):
        side = int(rng.integers(size // 8, size // 4))
        x, y = rng.uniform(0, size - side, 2)
        vx, vy = rng.uniform(-3, 3, 2)
        brightness = int(rng.integers(160, 256))
        for f in range(frames):
            xi, yi = int(round(x)), int(round(y))
            out[f, yi : yi + side, xi : xi + side] = np.maximum(
                out[f, yi : yi + side, xi : xi + side], brightness
            )
            x, y = x + vx, y + vy
            if x < 0 or x > size - side:
                vx = -vx
                x = np.clip(x, 0, size - side)
            if y < 0 or y > size - side:
                vy = -vy
                y = np.clip(y, 0, size - side)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out")
    parser.add_argument("--sequences", type=int, default=200)
    parser.add_argument("--frames", type=int, default=20)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    seqs = np.stack(
        [render_sequence(rng, args.frames, args.size) for _ in range(args.sequences)], axis=1
    )  # (frames, sequences, h, w)
    np.save(args.out, seqs)
    print(f"wrote {args.out}: {seqs.shape} uint8")


if __name__ == "__main__":
    main()
