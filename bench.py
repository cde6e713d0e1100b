"""Headline benchmark: 250-step DDPM sampling wall-clock on real hardware.

Scenario (BASELINE.json target: < 60 s on v5e-8): batch-8, 16-frame, 64x64,
1-channel sampling with the config_v2_2-scale Unet3D (dim 32, mults
1/2/4/8, T reduced to 250 reverse steps as specified by the target).

Prints ONE JSON line:
``{"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 60/value}``
plus auxiliary fields (denoise steps/sec/chip, devices). Compilation is
excluded (one warm-up run; the compiled scan is cached).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)

    import jax.numpy as jnp
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D

    batch, channels, frames, size, steps = 8, 1, 16, 64, 250

    unet = Unet3D(dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=channels)
    diffusion = GaussianDiffusion(
        unet,
        image_size=size,
        num_frames=frames,
        channels=channels,
        timesteps=steps,
        loss_type="l2",
    )

    t0 = time.perf_counter()
    out = diffusion.sample(key=jax.random.PRNGKey(0), batch_size=batch)
    out.block_until_ready()
    compile_and_first_run = time.perf_counter() - t0
    print(f"warm-up (compile + run): {compile_and_first_run:.2f}s", file=sys.stderr)

    runs = []
    for i in range(3):
        t0 = time.perf_counter()
        out = diffusion.sample(key=jax.random.PRNGKey(i + 1), batch_size=batch)
        out.block_until_ready()
        runs.append(time.perf_counter() - t0)
        print(f"run {i}: {runs[-1]:.3f}s", file=sys.stderr)

    elapsed = min(runs)
    n_chips = jax.device_count()
    denoise_steps_per_sec_per_chip = steps / elapsed / n_chips

    result = {
        "metric": "ddpm_sample_250step_16f_64x64_b8_wallclock",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / elapsed, 2),
        "denoise_steps_per_sec_per_chip": round(denoise_steps_per_sec_per_chip, 2),
        "devices": n_chips,
        "compile_s": round(compile_and_first_run - elapsed, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
