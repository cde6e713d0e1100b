"""Diffusion noise-schedule math.

Parity surface: reference utils.py:225-256 (``extract``, ``cosine_beta_schedule``)
and gaussian_diffusion.py:77-98 (the ten derived buffers).

TPU-first notes
---------------
* All schedule constants are tiny ``(T,)`` float32 vectors precomputed once on
  the host; inside a jitted step they are compile-time constants or scan
  carries, never recomputed.
* :class:`ScheduleBuffers` packs every derived coefficient so the on-device
  ``lax.scan`` sampler can gather one row per timestep with a single dynamic
  index instead of ten separate gathers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> jax.Array:
    """Cosine beta schedule (Nichol & Dhariwal 2021).

    Matches reference utils.py:241-256 numerically: computed in float32 (the
    reference requests float64 but JAX silently truncates with x64 disabled),
    clipped to ``[0, 0.9999]``.
    """
    steps = timesteps + 1
    x = jnp.linspace(0.0, float(timesteps), steps, dtype=jnp.float32)
    alphas_cumprod = jnp.cos(((x / timesteps) + s) / (1 + s) * jnp.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return jnp.clip(betas, 0.0, 0.9999)


def extract(a: jax.Array, t: jax.Array, x_shape: tuple[int, ...]) -> jax.Array:
    """Gather ``a[t]`` per batch element and reshape for broadcasting.

    Parity: reference utils.py:225-238. ``a`` is a ``(T,)`` schedule vector,
    ``t`` a ``(b,)`` int array; the result has shape ``(b, 1, 1, ...)``
    matching the rank of ``x_shape`` so it broadcasts against image tensors.
    On TPU this lowers to a single dynamic-gather, which XLA fuses into the
    consuming elementwise op.
    """
    b = t.shape[0]
    out = a[t]
    return out.reshape(b, *((1,) * (len(x_shape) - 1)))


@dataclasses.dataclass(frozen=True)
class ScheduleBuffers:
    """All derived DDPM coefficients, stacked for one-gather-per-step access.

    Field names mirror the reference's ``nnx.Variable`` buffer names
    (gaussian_diffusion.py:85-98) so checkpoint/state trees line up.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @classmethod
    def create(cls, timesteps: int, s: float = 0.008) -> "ScheduleBuffers":
        betas = cosine_beta_schedule(timesteps, s).astype(jnp.float32)
        alphas = 1.0 - betas
        alphas_cumprod = jnp.cumprod(alphas, axis=0)
        alphas_cumprod_prev = jnp.pad(
            alphas_cumprod[:-1], (1, 0), constant_values=1.0
        )
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        return cls(
            betas=betas,
            alphas_cumprod=alphas_cumprod,
            sqrt_alphas_cumprod=jnp.sqrt(alphas_cumprod),
            sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - alphas_cumprod),
            log_one_minus_alphas_cumprod=jnp.log(1.0 - alphas_cumprod),
            sqrt_recip_alphas_cumprod=jnp.sqrt(1.0 / alphas_cumprod),
            sqrt_recipm1_alphas_cumprod=jnp.sqrt(1.0 / alphas_cumprod - 1.0),
            posterior_variance=posterior_variance,
            posterior_log_variance_clipped=jnp.log(
                jnp.maximum(posterior_variance, 1e-20)
            ),
            posterior_mean_coef1=(
                betas * jnp.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=(
                (1.0 - alphas_cumprod_prev)
                * jnp.sqrt(alphas)
                / (1.0 - alphas_cumprod)
            ),
        )
