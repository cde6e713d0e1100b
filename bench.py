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

    def build(compute_dtype, fused=False):
        unet = Unet3D(
            dim=32,
            rngs=nnx.Rngs(0),
            dim_mults=(1, 2, 4, 8),
            channels=channels,
            compute_dtype=compute_dtype,
            use_fused_attention=fused,
        )
        return GaussianDiffusion(
            unet,
            image_size=size,
            num_frames=frames,
            channels=channels,
            timesteps=steps,
            loss_type="l2",
        )

    def measure(diffusion, tag):
        def timed_sample(seed: int) -> float:
            t0 = time.perf_counter()
            out = diffusion.sample(key=jax.random.PRNGKey(seed), batch_size=batch)
            # Force full materialization: block_until_ready alone can be a
            # no-op for remote/tunneled buffers, so fetch a reduction.
            checksum = float(jnp.mean(out))
            dt = time.perf_counter() - t0
            assert checksum == checksum, f"NaN in samples ({tag})"
            return dt

        warmup = timed_sample(0)
        print(f"[{tag}] warm-up (compile + run): {warmup:.2f}s", file=sys.stderr)
        runs = []
        for i in range(3):
            runs.append(timed_sample(i + 1))
            print(f"[{tag}] run {i}: {runs[-1]:.3f}s", file=sys.stderr)
        return min(runs), warmup

    # Production path: bf16 compute + fused Pallas temporal attention.
    prod = build("bfloat16", fused=True)
    fused_s, fused_warm = measure(prod, "bf16+fused")
    # Parity path: pure f32 composite (bit-comparable with the reference math).
    f32_s, f32_warm = measure(build(None), "f32")

    # Fast-sampler capability beyond the reference: 50-step DDIM.
    def timed_ddim(seed: int) -> float:
        t0 = time.perf_counter()
        out = prod.ddim_sample(key=jax.random.PRNGKey(seed), batch_size=batch, num_steps=50)
        assert float(jnp.mean(out)) == float(jnp.mean(out))
        return time.perf_counter() - t0

    timed_ddim(0)  # compile
    ddim_s = min(timed_ddim(i + 1) for i in range(3))
    print(f"[ddim-50] best: {ddim_s:.3f}s", file=sys.stderr)

    elapsed = min(fused_s, f32_s)
    n_chips = jax.device_count()

    result = {
        "metric": "ddpm_sample_250step_16f_64x64_b8_wallclock",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / elapsed, 2),
        "denoise_steps_per_sec_per_chip": round(steps / elapsed / n_chips, 2),
        "f32_parity_s": round(f32_s, 3),
        "bf16_fused_s": round(fused_s, 3),
        "ddim_50step_s": round(ddim_s, 3),
        "devices": n_chips,
        "compile_s": round(fused_warm - fused_s, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
