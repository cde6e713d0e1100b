"""Progressive distillation (Salimans & Ho, "Progressive Distillation for
Fast Sampling of Diffusion Models", 2022).

A capability beyond the reference (which has no distillation of any kind):
each round trains a student — initialized from the teacher — to integrate
TWO teacher DDIM steps in ONE of its own, halving the sampler step count
per round. Four rounds turn a 64-step DDIM sampler into a 4-step one.
Combined with :mod:`guidance` (CFG distillation) this removes the two
measured FLOP walls of sampling: step count and the 2x guidance cost.

TPU-first design: one jitted distillation step — teacher double-step,
target synthesis, student forward/backward, and the Adam update fuse into a
single XLA program with donated student state; the batch shards over the
``'data'`` mesh axis like the trainer's step (the teacher double-step is
embarrassingly data-parallel, so no extra collectives beyond the gradient
all-reduce appear).

Timestep grids are the NESTED stride family ``t_i = (i+1)*T//N - 1`` (see
``sampling_times(..., grid="stride")``): the student's N-step grid is every
other point of the teacher's 2N-step grid (exact whenever ``2N | T``), so a
distilled model is sampled with ``ddim_sample(num_steps=N, grid="stride")``
— the exact grid it was trained on.

The math, per sampled student step ``t -> t_next`` with midpoint ``t_mid``
(all from the nested grids; ``alpha = sqrt(acp)``, ``sigma = sqrt(1-acp)``):

    x_t       = alpha_t x0 + sigma_t eps,   eps ~ N(0, 1)
    x_mid     = DDIM(teacher, x_t,  t    -> t_mid)
    x_next    = DDIM(teacher, x_mid, t_mid -> t_next)
    x_tilde   = (x_next - (sigma_next/sigma_t) x_t)
                / (alpha_next - (sigma_next/sigma_t) alpha_t)

``x_tilde`` is the x0 prediction that makes ONE student DDIM step from
``x_t`` land exactly on ``x_next`` (Salimans & Ho, eq. 7 in appendix G).
The loss is truncated-SNR-weighted MSE in x0 space,
``max(1, alpha_t^2/sigma_t^2) * ||x_tilde - x0_student||^2`` — the paper's
recommended weighting, stable at the high-SNR end where an epsilon loss
degenerates. The student may use any ``prediction_type`` ("v" is the
paper's recommendation and the stable choice as N shrinks); its output is
converted through ``_model_out_to_x0_eps``.
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

from video_diffusion_nnx_tpu.diffusion.gaussian_diffusion import (
    GaussianDiffusion,
    sampling_times,
)
from video_diffusion_nnx_tpu.utils.image import normalize_img

logger = logging.getLogger(__name__)

PyTree = Any


def copy_state(state: PyTree) -> PyTree:
    """Deep-copy a parameter pytree (student init = teacher weights)."""
    return jax.tree.map(jnp.copy, state)


def split_trainable(state):
    """Split a full module state into (trainable nnx.Param, frozen rest).

    The rest is the diffusion schedule ``nnx.Variable`` buffers — they are
    *constants* of the noising process and must NOT receive optimizer
    updates. (The reference's trainer differentiates its full state, so its
    schedule buffers drift during training — see PARITY.md #11; the
    distillation steps here optimize Param leaves only.)
    """
    return nnx.split_state(state, nnx.Param, ...)


def _gather_acp(acp: jax.Array, t: jax.Array, ndim: int) -> tuple[jax.Array, jax.Array]:
    """(alpha, sigma) at per-sample timesteps ``t``; ``t = -1`` means clean
    data (alpha=1, sigma=0). Broadcast to ``ndim`` trailing axes."""
    a = jnp.where(t >= 0, acp[jnp.maximum(t, 0)], 1.0)
    a = a.reshape((-1,) + (1,) * (ndim - 1))
    return jnp.sqrt(a), jnp.sqrt(jnp.maximum(1.0 - a, 0.0))


def _model_x0(
    model: GaussianDiffusion,
    x: jax.Array,
    t: jax.Array,
    clip: bool,
    cond: jax.Array | None = None,
    w: jax.Array | None = None,
) -> jax.Array:
    """Denoiser forward -> x0 prediction under the model's prediction_type.

    ``cond``/``w`` thread conditioning and a PER-SAMPLE guidance scale into
    a ``guidance_embed`` model (stage 2 of Meng et al. 2023: progressively
    distilling the w-conditioned student). A per-sample w only makes sense
    on such a model — the vanilla CFG combination takes a scalar scale —
    so that is the supported shape here."""
    kwargs = {}
    if cond is not None:
        kwargs["cond"] = cond
    if w is not None:
        kwargs["guidance_scale"] = w
        out = model.denoise_fn(x, t, null_cond_prob=0.0, **kwargs)
    else:
        # cond_scale=1 => ONE plain (possibly conditioned) forward — the
        # same function ddim_sample evaluates at its default scale, so
        # the distilled student is trained on exactly what it samples.
        # (forward_with_cond_scale's default of 2.0 would silently distill
        # a CFG-at-2 chain for conditioned non-guidance models.)
        out = model.denoise_fn.forward_with_cond_scale(x, t, cond_scale=1.0, **kwargs)
    out = rearrange(out, "b f h w c -> b c f h w")
    x0, _ = model._model_out_to_x0_eps(x, t, out)
    return jnp.clip(x0, -1.0, 1.0) if clip else x0


def _ddim_jump(acp, x, x0, t, t_next):
    """Deterministic DDIM update t -> t_next given the x0 prediction."""
    a_t, s_t = _gather_acp(acp, t, x.ndim)
    a_n, s_n = _gather_acp(acp, t_next, x.ndim)
    eps_hat = (x - a_t * x0) / s_t
    return a_n * x0 + s_n * eps_hat


def distill_targets(
    teacher: GaussianDiffusion,
    x_t: jax.Array,
    t: jax.Array,
    t_mid: jax.Array,
    t_next: jax.Array,
    clip_denoised: bool = True,
    cond: jax.Array | None = None,
    w: jax.Array | None = None,
) -> jax.Array:
    """Two teacher DDIM steps ``t -> t_mid -> t_next``, solved for the x0
    target that one student step must predict. Differentiation never flows
    through the teacher (targets are stop-gradient)."""
    acp = teacher.alphas_cumprod[...]
    x_mid = _ddim_jump(
        acp, x_t, _model_x0(teacher, x_t, t, clip_denoised, cond, w), t, t_mid
    )
    x_next = _ddim_jump(
        acp, x_mid, _model_x0(teacher, x_mid, t_mid, clip_denoised, cond, w),
        t_mid, t_next,
    )
    a_t, s_t = _gather_acp(acp, t, x_t.ndim)
    a_n, s_n = _gather_acp(acp, t_next, x_t.ndim)
    ratio = s_n / s_t
    x_tilde = (x_next - ratio * x_t) / (a_n - ratio * a_t)
    return jax.lax.stop_gradient(x_tilde)


def nested_grids(num_timesteps: int, student_steps: int):
    """(times_N, times_2N) ascending stride grids; asserts the teacher grid
    is resolvable (T >= 2N)."""
    if num_timesteps < 2 * student_steps:
        raise ValueError(
            f"student_steps={student_steps} needs timesteps >= {2 * student_steps}"
        )
    tN = sampling_times(num_timesteps, student_steps, "stride")
    t2N = sampling_times(num_timesteps, 2 * student_steps, "stride")
    return tN, t2N


def build_distill_step(
    graphdef,
    tx: optax.GradientTransformation,
    num_timesteps: int,
    student_steps: int,
    mesh: Mesh | None = None,
    clip_denoised: bool = True,
    conditioned: bool = False,
    w_range: tuple[float, float] | None = None,
    ema_decay: float | None = None,
) -> Callable:
    """One jitted distillation step.

    Returns ``step(student_state, opt_state, teacher_state, batch, key) ->
    (student_state, opt_state, loss)`` with the student state donated.
    ``batch`` is raw data in the dataset's range (``normalize_img`` is
    applied inside, matching the trainer's step); when ``conditioned`` it
    is a ``(clips, cond)`` pair instead.

    ``w_range`` enables stage 2 of Meng et al. 2023: teacher AND student
    must be ``guidance_embed`` models (stage-1 output); a per-sample
    guidance scale ``w ~ U[w_range]`` is fed to both, so the student stays
    w-conditioned while its step count halves.

    ``ema_decay`` fuses the student-EMA update into the SAME program (one
    dispatch per step, EMA buffers donated — matching the trainer's EMA
    placement): the step becomes ``step(student_state, opt_state,
    ema_params, teacher_state, batch, key) -> (student_state, opt_state,
    ema_params, loss)`` with ``ema_params`` a Param-subtree pytree.
    """
    tN, t2N = nested_grids(num_timesteps, student_steps)

    def loss_fn(s_params, s_rest, t_state, x0, cond, key):
        student: GaussianDiffusion = nnx.merge(graphdef, s_params, s_rest)
        teacher: GaussianDiffusion = nnx.merge(graphdef, t_state)
        b = x0.shape[0]
        i_key, eps_key, w_key = jax.random.split(key, 3)
        i = jax.random.randint(i_key, (b,), 0, student_steps)
        t = tN[i]
        t_mid = t2N[2 * i]
        t_next = jnp.where(i > 0, tN[jnp.maximum(i - 1, 0)], -1)
        gw = (
            jax.random.uniform(
                w_key, (b,), minval=float(w_range[0]), maxval=float(w_range[1])
            )
            if w_range is not None
            else None
        )

        eps = jax.random.normal(eps_key, x0.shape)
        acp = teacher.alphas_cumprod[...]
        a_t, s_t = _gather_acp(acp, t, x0.ndim)
        x_t = a_t * x0 + s_t * eps

        x_tilde = distill_targets(
            teacher, x_t, t, t_mid, t_next, clip_denoised, cond=cond, w=gw
        )
        x0_hat = _model_x0(student, x_t, t, clip=False, cond=cond, w=gw)

        # Truncated SNR weighting: max(1, alpha^2/sigma^2) in x0 space.
        w = jnp.maximum(1.0, (a_t**2) / (s_t**2))
        return jnp.mean(w * (x0_hat - x_tilde) ** 2)

    def _update(s_state, opt_state, batch, cond, key, t_state):
        x0 = normalize_img(batch)
        # Optimize nnx.Param leaves ONLY: the schedule buffers are process
        # constants, and x0/eps conversions give them real gradients that
        # would otherwise drift them (``opt_state`` is over the Param
        # subtree — see tx.init in distill_round).
        s_params, s_rest = split_trainable(s_state)
        loss, grads = jax.value_and_grad(loss_fn)(
            s_params, s_rest, t_state, x0, cond, key
        )
        updates, opt_state = tx.update(grads, opt_state, s_params)
        s_params = optax.apply_updates(s_params, updates)
        return s_params, s_rest, opt_state, loss

    if ema_decay is not None:
        d = float(ema_decay)

        def step(s_state, opt_state, ema_params, t_state, batch, key):
            if conditioned:
                batch, cond = batch
            else:
                cond = None
            s_params, s_rest, opt_state, loss = _update(
                s_state, opt_state, batch, cond, key, t_state
            )
            ema_params = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, ema_params, s_params
            )
            return nnx.merge_state(s_params, s_rest), opt_state, ema_params, loss

        donate = (0, 1, 2)
        n_repl_lead = 4  # s_state, opt_state, ema_params, t_state
    else:

        def step(s_state, opt_state, t_state, batch, key):
            if conditioned:
                batch, cond = batch
            else:
                cond = None
            s_params, s_rest, opt_state, loss = _update(
                s_state, opt_state, batch, cond, key, t_state
            )
            return nnx.merge_state(s_params, s_rest), opt_state, loss

        donate = (0, 1)
        n_repl_lead = 3

    if mesh is not None and mesh.shape.get("data", 1) > 1:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        batch_sh = (data, data) if conditioned else data
        return jax.jit(
            step,
            in_shardings=(repl,) * n_repl_lead + (batch_sh, repl),
            out_shardings=(repl,) * (n_repl_lead - 1) + (repl,),
            donate_argnums=donate,
        )
    return jax.jit(step, donate_argnums=donate)


def distill_round(
    teacher_state: PyTree,
    graphdef,
    data_iter: Iterator[Any],
    *,
    num_timesteps: int,
    student_steps: int,
    num_train_steps: int,
    key: jax.Array,
    learning_rate: float = 1e-4,
    mesh: Mesh | None = None,
    clip_denoised: bool = True,
    conditioned: bool = False,
    w_range: tuple[float, float] | None = None,
    ema_decay: float | None = None,
    log_every: int = 50,
    log_fn: Callable[[int, float], None] | None = None,
) -> PyTree:
    """One halving round: train a student (init = teacher) whose
    ``student_steps``-step stride-grid DDIM matches the teacher's
    ``2*student_steps``-step one. Returns the trained student state.

    ``ema_decay`` maintains an exponential moving average of the student's
    Param leaves and returns THAT as the round's result (standard practice
    for distilled-student quality); ``None`` returns the raw student.
    """
    tx = optax.adam(learning_rate)
    step_fn = build_distill_step(
        graphdef, tx, num_timesteps, student_steps, mesh=mesh,
        clip_denoised=clip_denoised, conditioned=conditioned, w_range=w_range,
        ema_decay=ema_decay,
    )
    student_state = copy_state(teacher_state)
    opt_state = tx.init(split_trainable(student_state)[0])
    ema_params = (
        copy_state(split_trainable(student_state)[0]) if ema_decay is not None else None
    )
    for n in range(num_train_steps):
        key, step_key = jax.random.split(key)
        batch = next(data_iter)
        if ema_params is not None:
            student_state, opt_state, ema_params, loss = step_fn(
                student_state, opt_state, ema_params, teacher_state, batch, step_key
            )
        else:
            student_state, opt_state, loss = step_fn(
                student_state, opt_state, teacher_state, batch, step_key
            )
        if log_every and (n % log_every == 0 or n == num_train_steps - 1):
            loss_val = float(loss)
            logger.info(
                "distill N=%d step %d/%d loss %.5f",
                student_steps, n + 1, num_train_steps, loss_val,
            )
            if log_fn is not None:
                log_fn(n, loss_val)
    if ema_params is not None:
        return nnx.merge_state(ema_params, split_trainable(student_state)[1])
    return student_state


def progressive_distill(
    teacher: GaussianDiffusion,
    data_iter: Iterator[Any],
    *,
    initial_steps: int,
    rounds: int,
    steps_per_round: int,
    key: jax.Array,
    learning_rate: float = 1e-4,
    mesh: Mesh | None = None,
    clip_denoised: bool = True,
    conditioned: bool = False,
    w_range: tuple[float, float] | None = None,
    ema_decay: float | None = None,
    on_round_end: Callable[[int, PyTree], None] | None = None,
) -> tuple[PyTree, int]:
    """Full progressive-distillation schedule.

    Starting from ``teacher`` (any prediction_type; "v" recommended),
    produces students at ``initial_steps, initial_steps/2, ...`` for
    ``rounds`` halvings; each round's student becomes the next teacher.
    ``on_round_end(student_steps, state)`` fires after each round (e.g. to
    checkpoint). Returns ``(final_state, final_steps)``; sample the result
    with ``ddim_sample(num_steps=final_steps, grid="stride")``.
    """
    graphdef, teacher_state = nnx.split(teacher)
    steps = initial_steps
    state = teacher_state
    for r in range(rounds):
        key, round_key = jax.random.split(key)
        logger.info(
            "progressive distillation round %d/%d: %d-step teacher -> %d-step student",
            r + 1, rounds, 2 * steps, steps,
        )
        state = distill_round(
            state, graphdef, data_iter,
            num_timesteps=teacher.num_timesteps,
            student_steps=steps,
            num_train_steps=steps_per_round,
            key=round_key,
            learning_rate=learning_rate,
            mesh=mesh,
            clip_denoised=clip_denoised,
            conditioned=conditioned,
            w_range=w_range,
            ema_decay=ema_decay,
        )
        if on_round_end is not None:
            on_round_end(steps, state)
        if r + 1 < rounds:
            if steps % 2 != 0:
                logger.warning("stopping early: %d steps is odd, cannot halve", steps)
                break
            steps //= 2
    return state, steps
