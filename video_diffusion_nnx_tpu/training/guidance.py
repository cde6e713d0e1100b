"""Guidance distillation (Meng et al., "On Distillation of Guided Diffusion
Models", CVPR 2023) — remove classifier-free guidance's 2x FLOP cost.

A capability beyond the reference. CFG evaluates the denoiser twice per
step (conditioned + null) and combines ``null + (cond - null) * w``; the
repo's batched-CFG path halves dispatches but the FLOPs still double — the
measured wall (CLAUDE.md: "CFG sampling is FLOP-bound 2x at saturated
batch; only a distilled model could beat it"). This module trains that
model: a student with a ``guidance_embed`` pathway (``Unet3D`` knob) learns
to reproduce the teacher's GUIDED output in ONE forward, conditioned on a
per-sample guidance scale ``w`` drawn from a training range. After
distillation, every sampler works unchanged at 1x cost for any
``cond_scale``: the student's ``forward_with_cond_scale`` folds the scale
into its w-embedding instead of running two passes.

The student is the teacher's architecture plus the w-embedding MLP
(zero-initialized output layer, so the graft starts as an exact no-op);
all shared parameters are copied from the teacher. The loss matches
student and teacher model outputs (eps/v/x0 space — whatever the shared
``prediction_type`` is) under the same truncated-SNR x0-space weighting as
progressive distillation. Stage 2 of Meng et al. — progressively
distilling the w-conditioned student — is :func:`distill.progressive_distill`
with ``cond``/``w`` sampling threaded through.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import optax
from einops import rearrange
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_diffusion_nnx_tpu.diffusion.gaussian_diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.training.distill import (
    _gather_acp,
    split_trainable,
)
from video_diffusion_nnx_tpu.utils.image import normalize_img

logger = logging.getLogger(__name__)

PyTree = Any


def transfer_teacher_params(student: GaussianDiffusion, teacher_state: PyTree) -> PyTree:
    """Student state with every shared leaf copied from the teacher.

    The student's state paths are a strict superset of the teacher's (it
    adds only ``guidance_mlp``); unmatched student leaves keep their fresh
    init (whose output layer is zero, so the grafted student initially
    computes exactly the teacher's unguided forward).
    """
    _, s_state = nnx.split(student)
    flat_s = dict(s_state.flat_state())
    transferred = 0
    for path, leaf in teacher_state.flat_state():
        if path not in flat_s:
            raise ValueError(f"teacher path {path} missing from student tree")
        flat_s[path].value = jnp.copy(leaf.value)
        transferred += 1
    logger.info(
        "transferred %d teacher leaves into student (%d total)",
        transferred, len(flat_s),
    )
    return nnx.from_flat_state(flat_s)


def build_guidance_distill_step(
    student_graphdef,
    teacher_graphdef,
    tx: optax.GradientTransformation,
    num_timesteps: int,
    w_range: tuple[float, float] = (1.0, 8.0),
    mesh: Mesh | None = None,
) -> Callable:
    """One jitted guidance-distillation step.

    Returns ``step(student_state, opt_state, teacher_state, batch, cond,
    key) -> (student_state, opt_state, loss)``; student state donated.
    ``batch`` is raw data (normalized inside); ``cond`` is the dense
    conditioning batch (text embeddings).
    """
    w_lo, w_hi = float(w_range[0]), float(w_range[1])

    def loss_fn(s_params, s_rest, t_state, x0, cond, key):
        student: GaussianDiffusion = nnx.merge(student_graphdef, s_params, s_rest)
        teacher: GaussianDiffusion = nnx.merge(teacher_graphdef, t_state)
        b = x0.shape[0]
        t_key, eps_key, w_key = jax.random.split(key, 3)
        t = jax.random.randint(t_key, (b,), 0, num_timesteps)
        w = jax.random.uniform(w_key, (b,), minval=w_lo, maxval=w_hi)

        eps = jax.random.normal(eps_key, x0.shape)
        acp = teacher.alphas_cumprod[...]
        a_t, s_t = _gather_acp(acp, t, x0.ndim)
        x_t = a_t * x0 + s_t * eps

        # Teacher CFG target: per-sample w (the batched 2b trick folds a
        # scalar scale, so run the two halves explicitly here).
        cond_out = teacher.denoise_fn(x_t, t, cond=cond, null_cond_prob=0.0)
        null_out = teacher.denoise_fn(x_t, t, cond=cond, null_cond_prob=1.0)
        w_b = w.reshape(-1, 1, 1, 1, 1)
        target = null_out + (cond_out - null_out) * rearrange(
            w_b, "b c f h w -> b f h w c"
        )
        target = jax.lax.stop_gradient(target)

        student_out = student.denoise_fn(
            x_t, t, cond=cond, null_cond_prob=0.0, guidance_scale=w
        )

        # Match in x0 SPACE with truncated-SNR weighting — the same loss
        # geometry as progressive distillation. Raw-output MSE is NOT
        # equivalent for v/eps parameterizations: with x_t fixed,
        # ||delta_v||^2 = ||delta_x0||^2 / sigma_t^2, so an out-space loss
        # silently over-weights the low-noise steps by 1/sigma^2 and
        # starves the high-noise steps where the CFG steering signal lives
        # (measured: the out-space variant retained only ~50% of a strong
        # teacher's steering; the x0-space loss recovers it). The target's
        # conversion is affine in the model output, so converting the
        # combined CFG target equals combining converted outputs.
        target_x0, _ = teacher._model_out_to_x0_eps(
            x_t, t, rearrange(target, "b f h w c -> b c f h w")
        )
        student_x0, _ = student._model_out_to_x0_eps(
            x_t, t, rearrange(student_out, "b f h w c -> b c f h w")
        )
        wgt = jnp.maximum(1.0, (a_t**2) / (s_t**2))
        return jnp.mean(wgt * (student_x0 - target_x0) ** 2)

    def step(s_state, opt_state, t_state, batch, cond, key):
        x0 = normalize_img(batch)
        # Param-only optimization — the schedule buffers are constants of
        # the process (see distill.split_trainable); ``opt_state`` is over
        # the Param subtree.
        s_params, s_rest = split_trainable(s_state)
        loss, grads = jax.value_and_grad(loss_fn)(
            s_params, s_rest, t_state, x0, cond, key
        )
        updates, opt_state = tx.update(grads, opt_state, s_params)
        s_params = optax.apply_updates(s_params, updates)
        return nnx.merge_state(s_params, s_rest), opt_state, loss

    if mesh is not None and mesh.shape.get("data", 1) > 1:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, repl, repl, data, data, repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
    return jax.jit(step, donate_argnums=(0, 1))


def guidance_distill(
    teacher: GaussianDiffusion,
    student: GaussianDiffusion,
    data_iter: Iterator[Any],
    *,
    num_train_steps: int,
    key: jax.Array,
    learning_rate: float = 1e-4,
    w_range: tuple[float, float] = (1.0, 8.0),
    mesh: Mesh | None = None,
    log_every: int = 50,
    log_fn: Callable[[int, float], None] | None = None,
) -> PyTree:
    """Distill the teacher's CFG into the w-conditioned student.

    ``student`` must be the teacher's architecture with
    ``guidance_embed=True`` (build via config). ``data_iter`` yields
    ``(batch, cond)`` pairs — raw clips plus dense conditioning embeddings.
    Returns the trained student state; merge with the student graphdef and
    sample at any ``cond_scale`` for single-forward guided sampling.
    """
    if not getattr(student.denoise_fn, "has_guidance_embed", False):
        raise ValueError("student must be built with guidance_embed=True")
    if not getattr(teacher.denoise_fn, "has_cond", False):
        raise ValueError("guidance distillation needs a conditioned teacher")

    student_graphdef, _ = nnx.split(student)
    teacher_graphdef, teacher_state = nnx.split(teacher)
    student_state = transfer_teacher_params(student, teacher_state)

    tx = optax.adam(learning_rate)
    step_fn = build_guidance_distill_step(
        student_graphdef, teacher_graphdef, tx, teacher.num_timesteps,
        w_range=w_range, mesh=mesh,
    )
    opt_state = tx.init(split_trainable(student_state)[0])

    for n in range(num_train_steps):
        key, step_key = jax.random.split(key)
        batch, cond = next(data_iter)
        student_state, opt_state, loss = step_fn(
            student_state, opt_state, teacher_state, batch, cond, step_key
        )
        if log_every and (n % log_every == 0 or n == num_train_steps - 1):
            loss_val = float(loss)
            logger.info(
                "guidance distill step %d/%d loss %.5f", n + 1, num_train_steps, loss_val
            )
            if log_fn is not None:
                log_fn(n, loss_val)
    return student_state
