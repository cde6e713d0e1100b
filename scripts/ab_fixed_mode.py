"""A/B on real hardware: FIXED-math mode train step, fused vs composite.

The fixed-math mode (``reference_compat=False``: PreNorm applied, rel-pos
bias on the logits — reference modules.py:247-326 as intended) routes
through the biased Pallas kernel variants when fused. This script measures
the whole train step (fwd+bwd+Adam) both ways at the config_tpu_v2_2 train
shape, plus the compat-mode forward with/without the fused bottleneck
spatial attention (``_mid_spatial``).

Measured 2026-08-17, one v5e chip, idle machine:
  FIXED-mode train step composite   189.8 ms
  FIXED-mode train step fused        93.6 ms   (2.03x)
  compat fwd, mid-spatial composite  48.5 ms
  compat fwd, mid-spatial fused      47.9 ms   (neutral at 64px; the mid
                                     block is hw=64 there. At 128px inputs
                                     hw=256 routes blockwise.)

Usage: /opt/venv/bin/python scripts/ab_fixed_mode.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import optax
from flax import nnx

sys.path.insert(0, ".")

from video_diffusion_nnx_tpu.models import Unet3D

C, S = 1, 64


def _force(x):
    return float(jnp.sum(x))


def timeit(fn, n=10):
    _force(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _force(out)
    return (time.perf_counter() - t0) / n


def train_time(tag: str, fused: bool) -> None:
    unet = Unet3D(
        dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=C,
        compute_dtype="bfloat16", reference_compat=False,
        use_fused_attention=fused, use_fused_spatial_attention=fused,
    )
    graphdef, params = nnx.split(unet)
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, C, 10, S, S))
    t = jnp.full((4,), 3.0)

    @jax.jit
    def step(params, opt, x, t):
        def loss_fn(p):
            out = nnx.merge(graphdef, p)(x, t)
            return jnp.mean(out**2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    dt = timeit(lambda: step(params, opt, x, t)[2])
    print(f"{tag:45s} {dt * 1000:8.2f} ms")


def main() -> None:
    print("devices:", jax.devices())
    train_time("FIXED-mode train step, composite", fused=False)
    train_time("FIXED-mode train step, fused", fused=True)


if __name__ == "__main__":
    main()
