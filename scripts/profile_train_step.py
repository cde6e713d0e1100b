"""Train-step (fwd+bwd+Adam+EMA) throughput at config_v2_2 scale.

Usage: /opt/venv/bin/python scripts/profile_train_step.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import optax
from flax import nnx

sys.path.insert(0, ".")

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import Unet3D


def measure(tag, batch, frames=10, size=64, **unet_kwargs):
    unet = Unet3D(dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=1, **unet_kwargs)
    diff = GaussianDiffusion(
        unet, image_size=size, num_frames=frames, channels=1, timesteps=1000, loss_type="l2"
    )
    graphdef, params = nnx.split(diff)
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    @jax.jit
    def step(params, opt, ema, x, key):
        def loss_fn(p):
            return nnx.merge(graphdef, p)(x, key=key)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(lambda e, p: 0.9999 * e + 0.0001 * p, ema, params)
        return params, opt, ema, loss

    x = jnp.zeros((batch, 1, frames, size, size), jnp.float32)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params, opt, ema, loss = step(params, opt, ema, x, key)
    float(loss)
    compile_t = time.perf_counter() - t0

    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt, ema, loss = step(params, opt, ema, x, key)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(
        f"{tag:40s} {dt*1000:8.1f} ms/step  {batch/dt:7.1f} samples/s  (compile {compile_t:.0f}s)"
    )


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    measure("v2_2 batch4 f32", batch=4)
    measure("v2_2 batch4 bf16", batch=4, compute_dtype="bfloat16")
    measure("v2_2 batch8 bf16", batch=8, compute_dtype="bfloat16")
    measure("v2_2 batch8 bf16+remat", batch=8, compute_dtype="bfloat16", remat_blocks=True)


if __name__ == "__main__":
    main()
