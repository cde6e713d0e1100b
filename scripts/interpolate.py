"""Latent interpolation CLI: blend two dataset clips through the diffusion.

A capability the reference advertises but cannot run (its ``interpolate``
calls ``p_sample`` without the required ``key``, reference
gaussian_diffusion.py:360-398) — here the denoising loop is the same
on-device ``lax.scan`` as sampling.

    /opt/venv/bin/python scripts/interpolate.py --config C \
        --checkpoint-path P --step N --dataset D.npy \
        --index-a 0 --index-b 1 --lam 0.5 --t 250

Writes ``interp_{lam}.gif`` per requested blend weight plus the two
endpoint clips for reference.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

logging.basicConfig(level=logging.INFO, force=True)
log = logging.getLogger("interpolate")


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Interpolate two clips in diffusion latent space")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint-path", type=str, required=True)
    p.add_argument("--step", type=int, default=0)
    p.add_argument("--dataset", type=str, required=True, help=".npy in the MovingMNIST (F,B,H,W) layout")
    p.add_argument("--index-a", type=int, default=0)
    p.add_argument("--index-b", type=int, default=1)
    p.add_argument("--lam", type=float, action="append", default=None,
                   help="blend weight(s) in [0,1]; repeat for several (default 0.5)")
    p.add_argument("--t", type=int, default=None,
                   help="diffusion step to blend at (default T-1 = full re-generation)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-path", type=str, default="outputs")
    p.add_argument("--load-ema-params", action="store_true", default=False)
    return p.parse_args()


def main() -> None:
    args = parse_args()

    from sample import build_model

    from video_diffusion_nnx_tpu.config import load_config
    from video_diffusion_nnx_tpu.data import MovingMNIST
    from video_diffusion_nnx_tpu.utils import load_checkpoint, normalize_img

    config = load_config(args.config)
    model = build_model(config)
    try:
        model, _ = load_checkpoint(
            model, args.step, str(Path(args.checkpoint_path).resolve()),
            load_ema_params=args.load_ema_params,
        )
    except FileNotFoundError as e:
        # Same clean exit sample.py uses (which lists the available steps)
        # instead of a raw Orbax traceback.
        raise SystemExit(f"error: {e}") from None

    d = config["diffusion"]
    ds = MovingMNIST(
        args.dataset,
        image_size=d["image_size"],
        channels=d["channels"],
        num_frames=d["num_frames"],
        # Match the scale the checkpoint was TRAINED on: normalize only if
        # the training config did (reference-parity configs feed raw 0-255).
        normalize=config["trainer"]["dataset_normalize"],
    )
    clip_a, clip_b = np.asarray(ds[args.index_a]), np.asarray(ds[args.index_b])
    # Dataset yields (c, f, h, w); normalize_img mirrors the training input
    # path, whatever the dataset scale.
    x1 = normalize_img(jax.numpy.asarray(clip_a)[None])
    x2 = normalize_img(jax.numpy.asarray(clip_b)[None])

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    lams = args.lam if args.lam else [0.5]
    key = jax.random.PRNGKey(args.seed)
    clips, names = [x1[0], x2[0]], ["endpoint_a", "endpoint_b"]
    for lam in lams:
        key, run_key = jax.random.split(key)
        out = model.interpolate(x1, x2, key=run_key, t=args.t, lam=lam)
        clips.append(out[0])
        names.append(f"interp_{lam:g}")
        log.info("interpolated lam=%g at t=%s", lam, args.t if args.t is not None else "T-1")

    # One shared min-max scale so endpoint and blends are comparable (the
    # same batch-global scaling sample.py uses).
    from video_diffusion_nnx_tpu.utils import write_sample_gifs

    batch = np.stack([np.asarray(c) for c in clips])
    for target in write_sample_gifs(batch, out_dir, names=names):
        log.info("wrote %s", target)


if __name__ == "__main__":
    main()
