"""A/B: VideoDiT train step with fused Pallas attention vs composite.

Production-ish shape: dim 256, depth 6, heads 8 x 32, 64x64 patch-4
(256 spatial tokens -> the blockwise kernel route), 16 frames (dense
route), batch 2, bf16. Run on an idle chip (concurrent CPU load inflates
timings up to 2.5x — CLAUDE.md).

    /opt/venv/bin/python scripts/ab_dit_fused.py
"""

from __future__ import annotations

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


def bench(fused: bool) -> float:
    dit = VideoDiT(
        dim=256, rngs=nnx.Rngs(0), depth=6, channels=C, attn_heads=8,
        attn_dim_head=32, patch_size=4, compute_dtype="bfloat16",
        use_fused_attention=fused,
    )
    diff = GaussianDiffusion(
        dit, image_size=SIZE, num_frames=F, channels=C, timesteps=1000,
        loss_type="l2", prediction_type="v",
    )
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
    print("devices:", jax.devices(), file=sys.stderr)
    f = bench(True)
    c = bench(False)
    print(f"speedup: {c / f:.2f}x")
