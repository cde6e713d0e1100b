"""A/B: VideoDiT train step + DDIM-50 sampling, fused Pallas attention
vs composite (VERDICT r3 task 5: give the second denoiser family measured
hardware numbers next to Unet3D's).

Production-ish shape: dim 256, depth 6, heads 8 x 32, 64x64 patch-4
(256 spatial tokens -> the blockwise kernel route), 16 frames (dense
route), batch 2 train / batch 8 DDIM-50 (the Unet3D headline shape,
BASELINE.md), bf16. Run on an idle chip (concurrent CPU load inflates
timings up to 2.5x — CLAUDE.md). Prints one JSON line at the end.

    /opt/venv/bin/python scripts/ab_dit_fused.py [--skip-sampling]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import VideoDiT

B, C, F, SIZE = 2, 1, 16, 64


def build(fused: bool) -> GaussianDiffusion:
    dit = VideoDiT(
        dim=256, rngs=nnx.Rngs(0), depth=6, channels=C, attn_heads=8,
        attn_dim_head=32, patch_size=4, compute_dtype="bfloat16",
        use_fused_attention=fused,
    )
    return GaussianDiffusion(
        dit, image_size=SIZE, num_frames=F, channels=C, timesteps=1000,
        loss_type="l2", prediction_type="v",
    )


def bench_sampling(fused: bool, batch: int = 8, num_steps: int = 50) -> float:
    """DDIM-50 wall-clock at the Unet3D headline shape (b8/16f/64x64)."""
    diff = build(fused)
    key = jax.random.PRNGKey(0)
    out = diff.ddim_sample(key=key, batch_size=batch, num_steps=num_steps)
    float(jnp.mean(out))  # force the fetch (block_until_ready can no-op on axon)
    t0 = time.perf_counter()
    out = diff.ddim_sample(key=key, batch_size=batch, num_steps=num_steps)
    float(jnp.mean(out))
    dt = time.perf_counter() - t0
    print(
        f"dit dim256 d6 16f 64x64 b{batch} bf16 ddim-{num_steps} "
        f"{'fused' if fused else 'composite'}: {dt:.2f} s",
        flush=True,
    )
    return dt


def bench(fused: bool) -> float:
    diff = build(fused)
    graphdef, params = nnx.split(diff)
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, key):
        loss, grads = jax.value_and_grad(
            lambda p: nnx.merge(graphdef, p)(x, key)
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    x = jnp.zeros((B, C, F, SIZE, SIZE), jnp.float32)
    key = jax.random.PRNGKey(0)
    params, opt, loss = step(params, opt, x, key)
    float(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt, loss = step(params, opt, x, key)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"dit dim256 d6 16f 64x64 b2 bf16 {'fused' if fused else 'composite'}: "
          f"{dt * 1000:.1f} ms/step", flush=True)
    return dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--skip-sampling", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), file=sys.stderr)
    results: dict = {"model": "dit_dim256_d6", "frames": F, "size": SIZE}
    f = bench(True)
    c = bench(False)
    results["train_b2_fused_ms"] = round(f * 1000, 1)
    results["train_b2_composite_ms"] = round(c * 1000, 1)
    results["train_speedup"] = round(c / f, 2)
    print(f"train speedup: {c / f:.2f}x")
    if not args.skip_sampling:
        sf = bench_sampling(True)
        sc = bench_sampling(False)
        results["ddim50_b8_fused_s"] = round(sf, 2)
        results["ddim50_b8_composite_s"] = round(sc, 2)
        results["ddim50_speedup"] = round(sc / sf, 2)
        print(f"ddim-50 speedup: {sc / sf:.2f}x")
    print(json.dumps(results))
