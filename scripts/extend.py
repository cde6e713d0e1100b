"""Video extension / temporal infill CLI (capability beyond the reference).

Pins frames of an input clip and generates the rest with
``GaussianDiffusion.sample_conditional_frames`` (replacement
conditioning):

    # continue a clip: keep its first 4 frames, generate the rest
    python scripts/extend.py --config configs/config_v2_2.yaml \
        --checkpoint-path results/checkpoints --step 100000 \
        --input clip.gif --keep-frames 4 --output-path outputs/extended

    # temporal infill: regenerate frames 3..6 of the clip
    python scripts/extend.py ... --input clip.gif --regen-frames 3:7

Input: an animated GIF (resized to the model's image size) or a ``.npy``
``(f, h, w)`` / ``(c, f, h, w)`` array in [0, 255]. Output: one GIF per
batch sample (``--batch-size`` continuations of the same input with
different noise).
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

log = logging.getLogger("extend")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint-path", type=str, required=True)
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--load-ema-params", action="store_true", default=False)
    p.add_argument("--input", type=str, required=True, help="GIF or .npy clip")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument(
        "--keep-frames", type=int, default=None,
        help="pin the first N input frames, generate the rest (extension)",
    )
    g.add_argument(
        "--regen-frames", type=str, default=None,
        help="A:B — REgenerate frames [A, B), pin everything else (infill)",
    )
    p.add_argument("--batch-size", type=int, default=2,
                   help="independent continuations of the same input")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--num-steps", type=int, default=None,
        help="fast DDIM conditional sampling with this many steps "
             "(default: full DDPM chain)",
    )
    p.add_argument(
        "--recon-guidance", type=float, default=0.0,
        help="reconstruction-guidance weight w_r (Ho et al. 2022; needs "
             "--num-steps; typical 1-10) — pulls generated frames toward "
             "consistency with the pinned context",
    )
    p.add_argument("--text", type=str, action="append", default=None)
    p.add_argument("--cond-scale", type=float, default=1.0)
    p.add_argument("--output-path", type=str, default="outputs/extended")
    return p.parse_args()


def load_clip(
    path: Path, image_size: int, channels: int, num_frames: int
) -> tuple[np.ndarray, int]:
    """-> ((c, f, h, w) float in [0, 1] padded/truncated to num_frames,
    true input frame count before padding)."""
    if path.suffix == ".npy":
        arr = np.load(path).astype(np.float32)
        if arr.ndim == 3:
            arr = arr[None]  # (f,h,w) -> (1,f,h,w)
        assert arr.ndim == 4, f"npy clip must be (f,h,w) or (c,f,h,w), got {arr.shape}"
    else:
        from PIL import Image

        from video_diffusion_nnx_tpu.utils.media import seek_all_images

        # seek_all_images keeps the reference's off-by-one channel KEYS
        # (3 -> RGBA, parity quirk); remap the true channel count to the
        # key that yields it, exactly as GifVideoDataset does
        # (gif_dataset.py:57).
        try:
            mode_key = {1: 1, 3: 2, 4: 3}[channels]
        except KeyError:
            raise SystemExit(f"error: unsupported channel count {channels}") from None
        img = Image.open(path)
        frames = [
            np.asarray(f.resize((image_size, image_size)), np.float32)
            for f in seek_all_images(img, channels=mode_key)
        ]
        arr = np.stack(frames)  # (f, h, w[, c])
        arr = arr[..., None] if arr.ndim == 3 else arr
        arr = np.moveaxis(arr, -1, 0)  # -> (c, f, h, w)
    if arr.shape[0] != channels:
        raise SystemExit(
            f"error: input clip has {arr.shape[0]} channels; model expects {channels}"
        )
    arr = arr / 255.0
    f = arr.shape[1]
    if f < num_frames:
        pad = np.zeros((arr.shape[0], num_frames - f, *arr.shape[2:]), np.float32)
        arr = np.concatenate([arr, pad], axis=1)
    return arr[:, :num_frames], min(f, num_frames)


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s:%(name)s:%(message)s")
    args = parse_args()

    import jax
    import jax.numpy as jnp

    from video_diffusion_nnx_tpu.config import build_models, load_config
    from video_diffusion_nnx_tpu.utils import (
        enable_compilation_cache,
        load_checkpoint,
        write_sample_gifs,
    )

    config = load_config(args.config)
    enable_compilation_cache(config["trainer"].get("compilation_cache_dir"))
    _, model = build_models(config)
    try:
        model, _ = load_checkpoint(
            model, args.step, str(Path(args.checkpoint_path).resolve()),
            load_ema_params=args.load_ema_params,
        )
    except FileNotFoundError as e:
        raise SystemExit(f"error: {e}") from None

    clip, input_frames = load_clip(
        Path(args.input), model.image_size, model.channels, model.num_frames
    )
    f = model.num_frames
    if args.keep_frames is not None:
        if not 1 <= args.keep_frames < f:
            raise SystemExit(f"error: --keep-frames must be in [1, {f - 1}]")
        if args.keep_frames > input_frames:
            raise SystemExit(
                f"error: --keep-frames {args.keep_frames} exceeds the input's "
                f"{input_frames} frames (the padding is black, not context)"
            )
        mask = np.arange(f) < args.keep_frames
        log.info("extension: pinning first %d of %d frames", args.keep_frames, f)
    else:
        try:
            a, b = map(int, args.regen_frames.split(":"))
        except ValueError:
            raise SystemExit("error: --regen-frames must be A:B") from None
        if not (0 <= a < b <= f):
            raise SystemExit(f"error: --regen-frames range must satisfy 0 <= A < B <= {f}")
        mask = ~((np.arange(f) >= a) & (np.arange(f) < b))
        if not mask.any():
            raise SystemExit(
                "error: --regen-frames covers every frame — nothing is pinned "
                "(use sample.py for unconditional generation)"
            )
        log.info("infill: regenerating frames [%d, %d) of %d", a, b, f)
    if args.num_steps is not None and args.num_steps < 1:
        raise SystemExit("error: --num-steps must be >= 1")

    known = jnp.broadcast_to(
        jnp.asarray(clip)[None], (args.batch_size, *clip.shape)
    )
    cond = args.text
    if cond is not None:
        if len(cond) == 1 and args.batch_size > 1:
            cond = cond * args.batch_size
        if len(cond) != args.batch_size:
            raise SystemExit(
                f"error: --text given {len(args.text)} times but --batch-size "
                f"is {args.batch_size}; give one prompt or one per sample"
            )

    videos = model.sample_conditional_frames(
        key=jax.random.PRNGKey(args.seed),
        known=known,
        frame_mask=jnp.asarray(mask),
        cond=cond,
        cond_scale=args.cond_scale,
        num_steps=args.num_steps,
        recon_guidance_weight=args.recon_guidance,
    )
    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    for target in write_sample_gifs(np.asarray(videos), out_dir):
        log.info("wrote %s", target)


if __name__ == "__main__":
    main()
