"""Quality evaluation of the bouncing-digits flagship run (real-glyph data).

The reference's only trained-model evidence is its MovingMNIST artifacts
(reference README.md:33-54: sample GIFs at step 100k + a training-loss
curve). This script produces the rebuild's analogue from the
`configs/config_bouncing_digits.yaml` recipe — REAL handwritten-digit
video (scripts/make_bouncing_digits.py) — and goes beyond GIFs with
quantitative held-out metrics:

  1. loss curve         — extracted from the run's TensorBoard events
                          (JSONL fallback), written as loss_curve.csv
  2. generalization     — diffusion eps-loss on HELD-OUT clips whose
                          digits come from writers unseen in training,
                          vs the same loss on training clips (same keys,
                          same t draws: the gap isolates memorization)
  3. reconstruction     — q_sample held-out clips to t* then denoise back
                          with a truncated DDIM chain; PSNR/SSIM vs the
                          original measures how much signal the model
                          recovers (t*=T/8, T/4, T/2); the same metric on
                          an UNTRAINED model is the floor
  4. sample statistics  — spatial/temporal autocorrelation of generated
                          clips vs the held-out data distribution
                          (examples/demo methodology), plus active-pixel
                          fraction
  5. artifacts          — DDIM-50 and DDPM sample GIFs + one
                          side-by-side reconstruction GIF

Writes everything to --out (default examples/bouncing_digits) including
stats.json, and ASSERTS the headline claims (generalization gap small,
reconstruction beats the untrained floor) so it doubles as a regression
test, per the examples/ convention.

Usage:
    python scripts/eval_bouncing_digits.py \
        --config configs/config_bouncing_digits.yaml \
        --checkpoint-path results/bouncing_digits/checkpoints --step 20000 \
        --holdout data/bouncing_digits_val.npy --train data/bouncing_digits.npy
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def extract_loss_curve(tb_dir: Path) -> list[tuple[int, float]]:
    """Pull the loss scalar series from TB event files or metrics.jsonl."""
    jsonl = tb_dir / "metrics.jsonl"
    if jsonl.exists():
        rows = []
        for line in jsonl.read_text().splitlines():
            rec = json.loads(line)
            if rec.get("tag") in ("loss", "loss/train"):
                rows.append((int(rec["step"]), float(rec["value"])))
        if rows:
            return rows
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except Exception:
        return []
    rows = []
    # Newest event file only: the dir may hold earlier runs' files (e.g.
    # the discarded eps-prediction run), whose series would interleave.
    ev_files = sorted(tb_dir.glob("events.out.tfevents.*"), key=lambda p: p.name)
    for ev_file in ev_files[-1:]:
        acc = EventAccumulator(str(ev_file))
        acc.Reload()
        tags = acc.Tags().get("scalars", [])
        tag = "loss/train" if "loss/train" in tags else ("loss" if "loss" in tags else None)
        if tag:
            rows.extend((int(s.step), float(s.value)) for s in acc.Scalars(tag))
    rows.sort()
    return rows


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR in dB over [0, 1] videos."""
    mse = float(np.mean((a - b) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Global (non-windowed) SSIM over [0, 1] videos — adequate for a
    relative metric between runs of identical content statistics."""
    c1, c2 = 0.01**2, 0.03**2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    )


def autocorr_stats(clips: np.ndarray) -> dict:
    """Mean spatial (1-px shift) and temporal (1-frame lag) autocorrelation
    of (B, F, H, W) [0,1] clips — the examples/demo realism statistic."""

    def corr(x, y):
        x = x - x.mean()
        y = y - y.mean()
        denom = np.sqrt((x**2).mean() * (y**2).mean())
        return float((x * y).mean() / max(denom, 1e-12))

    spatial = corr(clips[..., :-1], clips[..., 1:])
    temporal = corr(clips[:, :-1], clips[:, 1:])
    return {
        "spatial_autocorr": round(spatial, 4),
        "temporal_autocorr": round(temporal, 4),
        "active_pixel_frac": round(float((clips > 0.2).mean()), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    here = Path(__file__).resolve().parents[1]
    ap.add_argument("--config", default=str(here / "configs/config_bouncing_digits.yaml"))
    ap.add_argument("--checkpoint-path", required=True)
    ap.add_argument("--step", type=int, required=True)
    ap.add_argument("--train", default=str(here / "data/bouncing_digits.npy"))
    ap.add_argument("--holdout", default=str(here / "data/bouncing_digits_val.npy"))
    ap.add_argument("--out", default=str(here / "examples/bouncing_digits"))
    ap.add_argument("--eval-clips", type=int, default=32)
    ap.add_argument("--skip-ddpm", action="store_true",
                    help="skip the full-T DDPM sample GIFs (saves a compile)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from einops import rearrange
    from flax import nnx

    from video_diffusion_nnx_tpu.config import build_models, load_config
    from video_diffusion_nnx_tpu.utils import (
        enable_compilation_cache,
        load_checkpoint,
        write_sample_gifs,
    )
    from video_diffusion_nnx_tpu.utils.image import normalize_img, unnormalize_img

    enable_compilation_cache()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    config = load_config(args.config)
    n_frames = config["diffusion"]["num_frames"]
    stats: dict = {"config": args.config, "step": args.step}

    # ---- loss curve ----
    tb_dir = Path(config["trainer"]["tensorboard_dir"])
    curve = extract_loss_curve(tb_dir)
    if curve:
        with open(out_dir / "loss_curve.csv", "w") as f:
            f.write("step,loss\n")
            for s, v in curve:
                f.write(f"{s},{v:.6f}\n")
        stats["loss_first"] = round(curve[0][1], 4)
        stats["loss_last"] = round(curve[-1][1], 4)
        print(f"loss curve: {curve[0]} -> {curve[-1]} ({len(curve)} points)")

    # ---- models: trained EMA + untrained floor ----
    _, model = build_models(config)
    model, _ = load_checkpoint(
        model, args.step, str(Path(args.checkpoint_path).resolve()),
        load_ema_params=True,
    )
    _, floor_model = build_models(config)  # fresh init = untrained floor

    def load_clips(path, n):
        arr = np.load(path)  # (F, B, H, W) uint8
        arr = arr[:n_frames, :n].astype(np.float32) / 255.0
        return jnp.asarray(rearrange(arr, "f b h w -> b 1 f h w"))

    train_clips = load_clips(args.train, args.eval_clips)
    hold_clips = load_clips(args.holdout, args.eval_clips)

    # ---- generalization: identical-key eps-loss on train vs holdout ----
    graphdef, state = nnx.split(model)

    @jax.jit
    def eval_loss(state, x, key):
        return nnx.merge(graphdef, state)(x, key=key)

    key = jax.random.PRNGKey(0)
    loss_train = float(eval_loss(state, train_clips, key))
    loss_hold = float(eval_loss(state, hold_clips, key))
    stats["eval_loss_train"] = round(loss_train, 5)
    stats["eval_loss_holdout"] = round(loss_hold, 5)
    stats["generalization_gap"] = round(loss_hold - loss_train, 5)
    print(f"eps-loss train {loss_train:.5f} vs holdout {loss_hold:.5f} "
          f"(gap {loss_hold - loss_train:+.5f})")

    # ---- reconstruction from partial noising (truncated DDIM) ----
    T = model.num_timesteps
    acp_np = np.asarray(model.alphas_cumprod[...])

    def make_recon(graphdef, t_start: int, n_steps: int = 25):
        """Jitted: q_sample to t_start, then DDIM back down a linspace grid
        of n_steps points within [0, t_start] (same update rule as
        ddim_sample, gaussian_diffusion.py:472-497)."""
        times = np.unique(np.linspace(0, t_start, n_steps).astype(np.int32))[::-1]
        times_prev = np.concatenate([times[1:], [-1]]).astype(np.int32)

        @jax.jit
        def recon(state, x0, key):
            m = nnx.merge(graphdef, state)
            xn = normalize_img(x0)
            b = x0.shape[0]
            img = m.q_sample(
                xn, t=jnp.full((b,), t_start, jnp.int32), key=key
            )
            acp = m.alphas_cumprod[...]

            def body(img, tt):
                t, t_prev = tt
                t_arr = jnp.full((b,), t, jnp.int32)
                out = m.denoise_fn.forward_with_cond_scale(img, t_arr)
                out = rearrange(out, "b f h w c -> b c f h w")
                x0_hat, _ = m._model_out_to_x0_eps(img, t_arr, out)
                x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
                a_t = acp[t]
                a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
                eps_hat = (img - jnp.sqrt(a_t) * x0_hat) / jnp.sqrt(1.0 - a_t)
                img = (
                    jnp.sqrt(a_prev) * x0_hat
                    + jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * eps_hat
                )
                return img, None

            img, _ = jax.lax.scan(
                body, img, (jnp.asarray(np.ascontiguousarray(times)),
                            jnp.asarray(np.ascontiguousarray(times_prev)))
            )
            return unnormalize_img(img)

        return recon

    hold_np = np.asarray(hold_clips)
    recon_videos = {}
    for frac, label in ((8, "T_8"), (4, "T_4"), (2, "T_2")):
        t_star = T // frac
        recon = make_recon(graphdef, t_star)
        rec = np.asarray(recon(state, hold_clips, jax.random.PRNGKey(1)))
        rec = np.clip(rec, 0.0, 1.0)
        stats[f"recon_psnr_{label}"] = round(psnr(rec, hold_np), 2)
        stats[f"recon_ssim_{label}"] = round(ssim(rec, hold_np), 4)
        recon_videos[label] = rec
        # Untrained floor at the same t* (same noising, fresh denoiser).
        _, floor_state = nnx.split(floor_model)
        rec_floor = np.clip(
            np.asarray(recon(floor_state, hold_clips, jax.random.PRNGKey(1))), 0, 1
        )
        stats[f"recon_psnr_{label}_untrained"] = round(psnr(rec_floor, hold_np), 2)
        print(
            f"recon t*=T/{frac}: PSNR {stats[f'recon_psnr_{label}']:.2f} dB "
            f"(untrained floor {stats[f'recon_psnr_{label}_untrained']:.2f}), "
            f"SSIM {stats[f'recon_ssim_{label}']:.4f}"
        )

    # ---- generated-sample statistics vs the data distribution ----
    ddim = model.ddim_sample(jax.random.PRNGKey(2), batch_size=8, num_steps=50)
    ddim_np = np.clip(np.asarray(ddim), 0.0, 1.0)
    stats["samples_ddim50"] = autocorr_stats(ddim_np[:, 0])
    stats["data_holdout"] = autocorr_stats(hold_np[:, 0])
    print(f"sample stats {stats['samples_ddim50']} vs data {stats['data_holdout']}")

    # ---- artifacts ----
    names = [f"ddim50_sample_{i}" for i in range(4)]
    for p in write_sample_gifs(ddim[:4], out_dir, names=names):
        print("wrote", p)
    if not args.skip_ddpm:
        ddpm = model.sample(key=jax.random.PRNGKey(3), batch_size=4)
        names = [f"ddpm_sample_{i}" for i in range(4)]
        for p in write_sample_gifs(ddpm, out_dir, names=names):
            print("wrote", p)
    # Side-by-side reconstruction GIF: [original | recon@T/4] for 2 clips.
    pair = np.concatenate(
        [hold_np[:2], recon_videos["T_4"][:2]], axis=4  # concat on width
    )
    names = [f"recon_T4_pair_{i}" for i in range(2)]
    for p in write_sample_gifs(jnp.asarray(pair), out_dir, names=names):
        print("wrote", p)

    (out_dir / "stats.json").write_text(json.dumps(stats, indent=2) + "\n")
    print(json.dumps(stats))

    # ---- assertions: this script doubles as a regression test ----
    if curve:
        assert stats["loss_last"] < 0.25 * stats["loss_first"], (
            "training loss did not drop by 4x"
        )
    assert stats["generalization_gap"] < 0.5 * loss_train + 0.02, (
        "holdout loss far above train loss — memorization or broken eval"
    )
    assert stats["recon_psnr_T_4"] > stats["recon_psnr_T_4_untrained"] + 3.0, (
        "reconstruction no better than the untrained floor"
    )
    # Free-running samples must look like data, not noise. This catches the
    # schedule-buffer-drift failure mode (PARITY.md #11): a 20k-step run
    # without trainer.freeze_schedule_buffers drifted sqrt_alphas_cumprod by
    # ~0.1, and every earlier assertion still PASSED while DDIM/DDPM samples
    # were pure white noise (spatial autocorr 0.05 vs data 0.83, active
    # pixel fraction 0.9997 vs data 0.05) — training is self-consistent in
    # the drifted forward process but samplers read the clean
    # alphas_cumprod. Noise has ~0 pixel-shift correlation; any data-like
    # sample is far above it.
    gen = stats["samples_ddim50"]
    assert gen["spatial_autocorr"] > 0.5, (
        f"generated samples are noise-like (spatial autocorr "
        f"{gen['spatial_autocorr']}); schedule buffers drifted?"
    )
    assert gen["active_pixel_frac"] < 6 * stats["data_holdout"]["active_pixel_frac"] + 0.05, (
        f"generated active-pixel fraction {gen['active_pixel_frac']} far "
        f"from data {stats['data_holdout']['active_pixel_frac']}"
    )
    print("EVAL OK")


if __name__ == "__main__":
    main()
