"""BASELINE stress config: 32-frame 128x128 Unet3D forward + backward.

Stresses temporal-attention memory (the (b*hw, heads, f, f) blowup the
fused kernels avoid) on real hardware, composite vs fused Pallas
attention (both directions — the kernels have fused backwards):

    /opt/venv/bin/python scripts/stress_32f_128.py

Measured 2026-08-16 (one v5e chip): composite 1705 ms, fused 315 ms.
"""

import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, ".")

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import Unet3D


def measure(tag, fused):
    b, c, f, s = 1, 1, 32, 128
    unet = Unet3D(
        dim=32,
        rngs=nnx.Rngs(0),
        dim_mults=(1, 2, 4, 8),
        channels=c,
        compute_dtype="bfloat16",
        use_fused_attention=fused,
        use_fused_spatial_attention=fused,
    )
    diffusion = GaussianDiffusion(
        unet, image_size=s, num_frames=f, channels=c, timesteps=1000, loss_type="l2"
    )
    graphdef, state = nnx.split(diffusion)

    @jax.jit
    def loss_and_grads(state, x, key):
        def loss_fn(st):
            return nnx.merge(graphdef, st)(x, key=key)

        return jax.value_and_grad(loss_fn)(state)

    x = jnp.zeros((b, c, f, s, s), jnp.float32)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    loss, grads = loss_and_grads(state, x, key)
    print(f"[{tag}] compile+step: {time.perf_counter()-t0:.1f}s loss={float(loss):.4f}", file=sys.stderr)

    t0 = time.perf_counter()
    loss, grads = loss_and_grads(state, x, key)
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)[:3])
    dt = time.perf_counter() - t0
    print(f"[{tag}] train fwd+bwd @ 32f 128x128 batch 1: {dt*1000:.1f} ms (loss {float(loss):.4f}, grad-probe {gsum:.3e})")


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    measure("composite", fused=False)
    measure("fused", fused=True)


if __name__ == "__main__":
    main()
