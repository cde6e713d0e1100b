"""DDPM Gaussian diffusion: forward noising, training loss, reverse sampling.

Parity surface: reference gaussian_diffusion.py:23-502. All q/p math, the
buffer names (``nnx.Variable`` members, so the state tree — and therefore
Orbax checkpoints — match the reference), the loss key-split chain, and the
sampling key-split chain are reproduced exactly, which is what makes
fixed-seed samples comparable to the reference per BASELINE.json.

TPU-first design
----------------
The reference's ``p_sample_loop`` dispatches T separate pjit calls from a
host ``tqdm`` loop (gaussian_diffusion.py:311-316) — T host->device round
trips, T times the dispatch latency, and the model graph re-merged per step.
Here the full reverse process is ONE compiled XLA program: a ``lax.scan``
over timesteps whose carried state is ``(img, key)``, with the model weights
as scan constants resident in HBM and the per-step schedule coefficients
gathered from stacked ``(T,)`` buffers by a single dynamic index. The batch
is sharded over the ``'data'`` mesh axis; XLA inserts no collectives in the
loop body (sampling is embarrassingly data-parallel), so scaling is linear
in devices.

Key-split chain parity (reference gaussian_diffusion.py:286, 311-316):
``key -> (key, init_noise_key)`` before the loop, then per step
``key -> (key, step_key)`` with ``step_key`` used whole for the sampling
noise. The reference also computes per-device ``step_keys`` it never uses —
dead code with no effect on the chain, so not reproduced.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import nnx
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_diffusion_nnx_tpu.models.text import bert_embed, tokenize
from video_diffusion_nnx_tpu.parallel.mesh import data_parallel_mesh
from video_diffusion_nnx_tpu.utils.functional import check_shape, exists, is_list_str
from video_diffusion_nnx_tpu.utils.image import normalize_img, unnormalize_img
from video_diffusion_nnx_tpu.utils.schedule import ScheduleBuffers, extract

logger = logging.getLogger(__name__)

# Compiled-sampler cache: the scan program depends only on (graphdef, shape,
# T, mesh, batch spec, cond_scale, has_cond) — re-sampling with new weights
# or keys reuses the compiled executable. Bounded LRU: each entry pins a
# compiled XLA executable, so an unbounded dict would leak one per
# (model, shape, cond) variant for the process lifetime.
_SAMPLE_SCAN_CACHE: OrderedDict = OrderedDict()
_SAMPLE_SCAN_CACHE_MAX = 8


def _cache_get(key):
    fn = _SAMPLE_SCAN_CACHE.get(key)
    if fn is not None:
        _SAMPLE_SCAN_CACHE.move_to_end(key)
    return fn


def _cache_put(key, fn):
    _SAMPLE_SCAN_CACHE[key] = fn
    while len(_SAMPLE_SCAN_CACHE) > _SAMPLE_SCAN_CACHE_MAX:
        _SAMPLE_SCAN_CACHE.popitem(last=False)
    return fn


def sampling_times(num_timesteps: int, num_steps: int, grid: str = "linspace") -> jax.Array:
    """Ascending timestep subsequence for strided samplers.

    ``"linspace"``: endpoints included (the historical DDIM grid here).
    ``"stride"``: ``t_i = (i+1) * T // N - 1`` — the nested family where
    the N-step grid is a subset of the 2N-step grid whenever ``2N | T``;
    progressive distillation trains the student exactly on this grid.
    """
    if grid == "linspace":
        return jnp.linspace(0, num_timesteps - 1, num_steps).round().astype(jnp.int32)
    if grid == "stride":
        return (jnp.arange(1, num_steps + 1) * num_timesteps) // num_steps - 1
    raise ValueError(f"grid must be 'linspace' or 'stride'; got {grid!r}")


def _sampler_batch_spec(batch_size: int, mesh: Mesh) -> P:
    """Data-sharded batch spec, or replicated (with a warning) when the
    batch does not divide across the mesh's data axis."""
    n_shards = mesh.shape.get("data", 1)
    if n_shards <= 1:
        return P()
    if batch_size % n_shards == 0:
        return P("data")
    logger.warning(
        "sampling batch %d does not divide across %d data shards; running "
        "replicated (no data parallelism). Pad the batch to a multiple of "
        "%d to engage all devices.",
        batch_size, n_shards, n_shards,
    )
    return P()


def _build_sample_scan(
    graphdef,
    shape: tuple[int, ...],
    num_timesteps: int,
    mesh: Mesh,
    batch_spec: P,
    cond_scale: float,
    has_cond: bool,
):
    cache_key = (graphdef, shape, num_timesteps, mesh, batch_spec, cond_scale, has_cond)
    cached = _cache_get(cache_key)
    if cached is not None:
        return cached

    batch_size = shape[0]
    repl = NamedSharding(mesh, P())
    img_sharding = NamedSharding(mesh, batch_spec)

    def run(state, key, cond=None):
        model = nnx.merge(graphdef, state)
        key, init_noise_key = jax.random.split(key)
        img = jax.random.normal(init_noise_key, shape)
        img = jax.lax.with_sharding_constraint(img, img_sharding)

        def body(carry, i):
            img, key = carry
            key, step_key = jax.random.split(key)
            t_arr = jnp.full((batch_size,), i, jnp.int32)
            img = model.p_sample(
                img, t_arr, key=step_key, cond=cond, cond_scale=cond_scale
            )
            img = jax.lax.with_sharding_constraint(img, img_sharding)
            return (img, key), None

        (img, _), _ = jax.lax.scan(
            body, (img, key), jnp.arange(num_timesteps - 1, -1, -1)
        )
        return unnormalize_img(img)

    if has_cond:
        jitted = jax.jit(
            run, in_shardings=(repl, repl, repl), out_shardings=img_sharding
        )
    else:
        jitted = jax.jit(
            lambda state, key: run(state, key),
            in_shardings=(repl, repl),
            out_shardings=img_sharding,
        )
    return _cache_put(cache_key, jitted)


class GaussianDiffusion(nnx.Module):
    """DDPM wrapper around a denoiser (reference gaussian_diffusion.py:23-98).

    ``denoise_fn`` is any module with the Unet3D calling convention:
    ``denoise_fn(x_bcfhw, t, cond=...) -> eps_bfhwc`` plus
    ``forward_with_cond_scale`` for classifier-free guidance.
    """

    def __init__(
        self,
        denoise_fn: nnx.Module,
        *,
        image_size: int,
        num_frames: int,
        text_use_bert_cls: bool = False,
        channels: int = 3,
        timesteps: int = 1000,
        loss_type: str = "l1",
        use_dynamic_thres: bool = False,
        dynamic_thres_percentile: float = 0.9,
        prediction_type: str = "noise",
        min_snr_gamma: float | None = None,
    ):
        self.channels = channels
        self.image_size = image_size
        self.num_frames = num_frames
        self.denoise_fn = denoise_fn
        self.loss_type = loss_type
        # What the denoiser's output parameterizes (all samplers convert
        # through _model_out_to_x0_eps, so every sampler works with every
        # parameterization):
        #   "noise" — epsilon prediction, the reference's (only) convention;
        #   "v"     — velocity prediction, v = alpha*eps - sigma*x0
        #             (Salimans & Ho 2022) — the stable target for
        #             progressive distillation, where at the student's
        #             terminal SNR an eps target carries no signal about x0;
        #   "x0"    — direct clean-data prediction.
        if prediction_type not in ("noise", "v", "x0"):
            raise ValueError(
                f"prediction_type must be 'noise', 'v', or 'x0'; got {prediction_type!r}"
            )
        self.prediction_type = prediction_type
        # Min-SNR loss weighting (Hang et al. 2023): clamp each timestep's
        # effective x0-space weight at gamma (typically 5), preventing the
        # low-noise steps from dominating training. None (default) keeps the
        # reference's unweighted loss bitwise.
        if min_snr_gamma is not None and float(min_snr_gamma) <= 0:
            raise ValueError(f"min_snr_gamma must be > 0; got {min_snr_gamma}")
        self.min_snr_gamma = None if min_snr_gamma is None else float(min_snr_gamma)
        self.text_use_bert_cls = text_use_bert_cls
        self.use_dynamic_thres = use_dynamic_thres
        self.dynamic_thres_percentile = dynamic_thres_percentile
        self.num_timesteps = int(timesteps)

        # Buffer names and dtypes mirror reference gaussian_diffusion.py:85-98
        # (checkpoint-tree parity); values come from the shared schedule
        # module so the sampler can also use them stacked.
        buf = ScheduleBuffers.create(self.num_timesteps)
        self.alphas_cumprod = nnx.Variable(buf.alphas_cumprod)
        self.sqrt_alphas_cumprod = nnx.Variable(buf.sqrt_alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = nnx.Variable(buf.sqrt_one_minus_alphas_cumprod)
        self.log_one_minus_alphas_cumprod = nnx.Variable(buf.log_one_minus_alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = nnx.Variable(buf.sqrt_recip_alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = nnx.Variable(buf.sqrt_recipm1_alphas_cumprod)
        self.posterior_variance = nnx.Variable(buf.posterior_variance)
        self.posterior_log_variance_clipped = nnx.Variable(buf.posterior_log_variance_clipped)
        self.posterior_mean_coef1 = nnx.Variable(buf.posterior_mean_coef1)
        self.posterior_mean_coef2 = nnx.Variable(buf.posterior_mean_coef2)

    # ------------------------------------------------------------------ #
    # Forward (q) process                                                 #
    # ------------------------------------------------------------------ #

    def q_mean_variance(self, x_start: jax.Array, t: jax.Array):
        """Mean/var/log-var of q(x_t | x_0) (reference gaussian_diffusion.py:101-117)."""
        mean = extract(self.sqrt_alphas_cumprod[...], t, x_start.shape) * x_start
        variance = extract(1.0 - self.alphas_cumprod[...], t, x_start.shape)
        log_variance = extract(self.log_one_minus_alphas_cumprod[...], t, x_start.shape)
        return mean, variance, log_variance

    def q_sample(
        self,
        x_start: jax.Array,
        t: jax.Array,
        key: jax.Array | None = None,
        noise: jax.Array | None = None,
    ) -> jax.Array:
        """Sample x_t ~ q(x_t | x_0) (reference gaussian_diffusion.py:401-420)."""
        if noise is None:
            assert key is not None, "q_sample needs a key when noise is not given"
            noise = jax.random.normal(key, shape=x_start.shape)
        return (
            extract(self.sqrt_alphas_cumprod[...], t, x_start.shape) * x_start
            + extract(self.sqrt_one_minus_alphas_cumprod[...], t, x_start.shape) * noise
        )

    def predict_start_from_noise(self, x_t: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """x_0 = sqrt(1/acp)*x_t - sqrt(1/acp - 1)*eps (reference gaussian_diffusion.py:120-136)."""
        return (
            extract(self.sqrt_recip_alphas_cumprod[...], t, x_t.shape) * x_t
            - extract(self.sqrt_recipm1_alphas_cumprod[...], t, x_t.shape) * noise
        )

    def predict_v(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """v = alpha_t * eps - sigma_t * x0 (Salimans & Ho 2022, eq. 8) —
        the angular velocity of (x_t, t) along the noising trajectory."""
        return (
            extract(self.sqrt_alphas_cumprod[...], t, x_start.shape) * noise
            - extract(self.sqrt_one_minus_alphas_cumprod[...], t, x_start.shape) * x_start
        )

    def predict_start_from_v(self, x_t: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
        """x0 = alpha_t * x_t - sigma_t * v (inverse of predict_v given x_t)."""
        return (
            extract(self.sqrt_alphas_cumprod[...], t, x_t.shape) * x_t
            - extract(self.sqrt_one_minus_alphas_cumprod[...], t, x_t.shape) * v
        )

    def _model_out_to_x0_eps(self, x_t: jax.Array, t: jax.Array, model_out: jax.Array):
        """Convert the denoiser's output to ``(x0, eps)`` under
        ``self.prediction_type`` — the single place parameterization enters
        the reverse process, so every sampler (DDPM/DDIM/DPM-Solver++)
        supports every parameterization."""
        if self.prediction_type == "noise":
            x0 = self.predict_start_from_noise(x_t, t=t, noise=model_out)
            return x0, model_out
        if self.prediction_type == "v":
            x0 = self.predict_start_from_v(x_t, t=t, v=model_out)
            eps = (
                extract(self.sqrt_alphas_cumprod[...], t, x_t.shape) * model_out
                + extract(self.sqrt_one_minus_alphas_cumprod[...], t, x_t.shape) * x_t
            )
            return x0, eps
        # x0-prediction: eps = (x_t - alpha_t * x0) / sigma_t. sigma_t > 0
        # for every t in the schedule (the cosine betas are clipped below
        # 0.9999 but alpha_cumprod < 1 everywhere, reference utils.py:252).
        x0 = model_out
        sigma = extract(self.sqrt_one_minus_alphas_cumprod[...], t, x_t.shape)
        alpha = extract(self.sqrt_alphas_cumprod[...], t, x_t.shape)
        return x0, (x_t - alpha * x0) / sigma

    def q_posterior(self, x_start: jax.Array, x_t: jax.Array, t: jax.Array):
        """Mean/var/clipped-log-var of q(x_{t-1} | x_t, x_0) (reference :139-159)."""
        posterior_mean = (
            extract(self.posterior_mean_coef1[...], t, x_t.shape) * x_start
            + extract(self.posterior_mean_coef2[...], t, x_t.shape) * x_t
        )
        posterior_variance = extract(self.posterior_variance[...], t, x_t.shape)
        posterior_log_variance = extract(
            self.posterior_log_variance_clipped[...], t, x_t.shape
        )
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------------ #
    # Reverse (p) process                                                 #
    # ------------------------------------------------------------------ #

    def p_mean_variance(
        self,
        x: jax.Array,
        t: jax.Array,
        clip_denoised: bool,
        cond: jax.Array | None = None,
        cond_scale: float = 1.0,
    ):
        """Reverse-step distribution via the denoiser (reference :162-228)."""
        out_bfhwc = self.denoise_fn.forward_with_cond_scale(
            x, t, cond=cond, cond_scale=cond_scale
        )
        model_out = rearrange(out_bfhwc, "b f h w c -> b c f h w")
        x_recon, _ = self._model_out_to_x0_eps(x, t, model_out)

        if clip_denoised:
            s = 1.0
            if self.use_dynamic_thres:
                # Imagen dynamic thresholding: per-sample percentile of |x0|,
                # floored at 1 (reference :205-217).
                abs_flat = jnp.abs(x_recon.reshape(x_recon.shape[0], -1))
                s = jnp.quantile(abs_flat, self.dynamic_thres_percentile, axis=-1)
                s = jnp.maximum(s, 1.0)
                s = s.reshape(-1, 1, 1, 1, 1)
            x_recon = jnp.clip(x_recon, -s, s) / s

        return self.q_posterior(x_start=x_recon, x_t=x, t=t)

    def p_sample(
        self,
        x: jax.Array,
        t: jax.Array,
        key: jax.Array,
        cond: jax.Array | None = None,
        cond_scale: float = 1.0,
        clip_denoised: bool = True,
    ) -> jax.Array:
        """One reverse step x_t -> x_{t-1} (reference :231-261)."""
        model_mean, _, model_log_variance = self.p_mean_variance(
            x=x, t=t, clip_denoised=clip_denoised, cond=cond, cond_scale=cond_scale
        )
        noise = jax.random.normal(key, shape=x.shape, dtype=x.dtype)
        nonzero_mask = (1.0 - (t == 0).astype(jnp.float32)).reshape(-1, 1, 1, 1, 1)
        return model_mean + nonzero_mask * jnp.exp(0.5 * model_log_variance) * noise

    def p_sample_loop(
        self,
        shape: tuple[int, ...],
        key: jax.Array,
        cond: jax.Array | None = None,
        cond_scale: float = 1.0,
        mesh: Mesh | None = None,
    ) -> jax.Array:
        """Full reverse process as one on-device ``lax.scan`` (see module doc).

        Improvements over reference :264-320 (kept semantically identical at
        fixed seed for the unconditional path):

        * single compiled program instead of T host dispatches;
        * ``cond``/``cond_scale`` actually reach the denoiser (the reference's
          distributed path silently dropped them, :299-301);
        * the requested ``shape`` is honored (the reference rebuilt it from
          model attributes, ignoring the argument beyond batch size).
        """
        batch_size = shape[0]
        graphdef, state = nnx.split(self)

        if mesh is None:
            mesh = data_parallel_mesh()
        batch_spec = _sampler_batch_spec(batch_size, mesh)
        run = _build_sample_scan(
            graphdef,
            tuple(shape),
            self.num_timesteps,
            mesh,
            batch_spec,
            float(cond_scale),
            has_cond=cond is not None,
        )
        if cond is None:
            return run(state, key)
        return run(state, key, cond)

    def ddim_sample(
        self,
        key: jax.Array,
        cond: Any = None,
        cond_scale: float = 1.0,
        batch_size: int = 16,
        num_steps: int = 50,
        eta: float = 0.0,
        mesh: Mesh | None = None,
        grid: str = "linspace",
        init_noise: jax.Array | None = None,
    ) -> jax.Array:
        """DDIM sampling (Song et al. 2021) — a fast sampler beyond the
        reference's capabilities: 20-50 denoise steps instead of the full
        T-step DDPM chain, deterministic at ``eta=0``.

        Runs as one on-device ``lax.scan`` over a strided timestep
        subsequence, reusing the same trained denoiser and schedule buffers.

        ``grid`` selects the timestep subsequence: ``"linspace"`` (default,
        endpoints included) or ``"stride"`` (``t_i = (i+1)*T//N - 1`` — the
        nested family where the N-step grid is every other point of the
        2N-step grid, which is what progressive distillation trains on; use
        it when sampling a distilled student).

        ``init_noise`` (optional, shape ``(b, c, f, h, w)``) supplies the
        starting x_T instead of drawing it from ``key``. At ``eta=0`` the
        chain is a deterministic ODE in x_T, so the output is then fully
        determined per-sample regardless of how samples are batched — the
        property the serving micro-batcher (scripts/serve.py) relies on to
        coalesce requests while keeping each request seed-reproducible.
        """
        if is_list_str(cond):
            cond = jnp.asarray(
                bert_embed(tokenize(cond), return_cls_repr=self.text_use_bert_cls)
            )
        if exists(cond):
            batch_size = cond.shape[0]
        shape = (batch_size, self.channels, self.num_frames, self.image_size, self.image_size)
        if init_noise is not None and tuple(init_noise.shape) != shape:
            raise ValueError(f"init_noise must have shape {shape}, got {init_noise.shape}")

        graphdef, state = nnx.split(self)
        if mesh is None:
            mesh = data_parallel_mesh()
        batch_spec = _sampler_batch_spec(batch_size, mesh)
        repl = NamedSharding(mesh, P())
        img_sharding = NamedSharding(mesh, batch_spec)

        cs = float(cond_scale)
        et = float(eta)
        cache_key = (
            graphdef, shape, self.num_timesteps, num_steps, mesh, batch_spec, cs, et,
            cond is not None, grid, init_noise is not None,
        )
        cached = _cache_get(cache_key)
        if cached is not None:
            args = [state, key]
            if cond is not None:
                args.append(cond)
            if init_noise is not None:
                args.append(init_noise)
            return cached(*args)

        # Timestep subsequence T-1 -> 0 and its shifted successor
        # (prev index; -1 terminates at alpha_cumprod = 1).
        times = sampling_times(self.num_timesteps, num_steps, grid)[::-1]
        times_prev = jnp.concatenate([times[1:], jnp.array([-1], jnp.int32)])
        acp = self.alphas_cumprod[...]

        def run(state, key, cond=None, x_T=None):
            model = nnx.merge(graphdef, state)
            key, init_key = jax.random.split(key)
            img = jax.random.normal(init_key, shape) if x_T is None else x_T
            img = jax.lax.with_sharding_constraint(img, img_sharding)

            def body(carry, tt):
                img, key = carry
                t, t_prev = tt
                key, step_key = jax.random.split(key)
                t_arr = jnp.full((batch_size,), t, jnp.int32)

                out = model.denoise_fn.forward_with_cond_scale(
                    img, t_arr, cond=cond, cond_scale=cs
                )
                out = rearrange(out, "b f h w c -> b c f h w")
                x0, _ = model._model_out_to_x0_eps(img, t_arr, out)
                x0 = jnp.clip(x0, -1.0, 1.0)

                a_t = acp[t]
                a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
                # Re-derive eps from the clipped x0 (standard DDIM practice).
                eps_hat = (img - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
                sigma = (
                    et
                    * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t))
                    * jnp.sqrt(1.0 - a_t / a_prev)
                )
                dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps_hat
                noise = jax.random.normal(step_key, img.shape, img.dtype)
                img = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * noise
                img = jax.lax.with_sharding_constraint(img, img_sharding)
                return (img, key), None

            (img, _), _ = jax.lax.scan(body, (img, key), (times, times_prev))
            return unnormalize_img(img)

        has_c, has_n = cond is not None, init_noise is not None
        if has_c and has_n:
            fn, shardings = run, (repl, repl, repl, img_sharding)
        elif has_c:
            fn, shardings = (lambda s, k, c: run(s, k, c)), (repl, repl, repl)
        elif has_n:
            fn, shardings = (lambda s, k, xT: run(s, k, None, xT)), (repl, repl, img_sharding)
        else:
            fn, shardings = (lambda s, k: run(s, k)), (repl, repl)
        jitted = jax.jit(fn, in_shardings=shardings, out_shardings=img_sharding)
        _cache_put(cache_key, jitted)
        args = [state, key]
        if has_c:
            args.append(cond)
        if has_n:
            args.append(init_noise)
        return jitted(*args)

    def dpm_solver_sample(
        self,
        key: jax.Array,
        cond: Any = None,
        cond_scale: float = 1.0,
        batch_size: int = 16,
        num_steps: int = 20,
        mesh: Mesh | None = None,
        init_noise: jax.Array | None = None,
    ) -> jax.Array:
        """DPM-Solver++(2M) sampling (Lu et al. 2022) — a second-order
        multistep ODE solver beyond the reference's capabilities: 10-20
        denoise steps for quality comparable to DDIM at 50. Deterministic.

        ``init_noise`` supplies the starting x_T instead of drawing it from
        ``key`` — same per-sample-determinism contract as ``ddim_sample``
        (this solver is an ODE, so the output is a function of x_T alone),
        used by the serving micro-batcher.

        Data-prediction formulation: each step evaluates the denoiser once
        and combines the current and previous clipped x0 predictions with
        log-SNR (lambda) spacing weights. The first step and the final step
        (whose target is sigma = 0, where the second-order ratio r = h'/h
        degenerates) use the first-order update — the standard
        ``lower_order_final`` stabilization. Runs as one on-device
        ``lax.scan``; same sharding/cache plumbing as ``ddim_sample``.
        """
        if is_list_str(cond):
            cond = jnp.asarray(
                bert_embed(tokenize(cond), return_cls_repr=self.text_use_bert_cls)
            )
        if exists(cond):
            batch_size = cond.shape[0]
        shape = (batch_size, self.channels, self.num_frames, self.image_size, self.image_size)
        if init_noise is not None and tuple(init_noise.shape) != shape:
            raise ValueError(f"init_noise must have shape {shape}, got {init_noise.shape}")

        graphdef, state = nnx.split(self)
        if mesh is None:
            mesh = data_parallel_mesh()
        batch_spec = _sampler_batch_spec(batch_size, mesh)
        repl = NamedSharding(mesh, P())
        img_sharding = NamedSharding(mesh, batch_spec)

        cs = float(cond_scale)
        cache_key = (
            "dpm2m", graphdef, shape, self.num_timesteps, num_steps, mesh,
            batch_spec, cs, cond is not None, init_noise is not None,
        )
        cached = _cache_get(cache_key)
        if cached is not None:
            args = [state, key]
            if cond is not None:
                args.append(cond)
            if init_noise is not None:
                args.append(init_noise)
            return cached(*args)

        times = jnp.linspace(0, self.num_timesteps - 1, num_steps).round().astype(jnp.int32)
        times = times[::-1]
        times_prev = jnp.concatenate([times[1:], jnp.array([-1], jnp.int32)])
        acp = self.alphas_cumprod[...]

        def lam(a):
            a = jnp.clip(a, 1e-12, 1.0 - 1e-12)
            return 0.5 * (jnp.log(a) - jnp.log1p(-a))

        def run(state, key, cond=None, x_T=None):
            model = nnx.merge(graphdef, state)
            # Same init-noise key chain as ddim_sample: dpm(num_steps=N) and
            # ddim(eta=0) integrate the SAME ODE from the SAME x_T, so their
            # outputs converge to each other as N grows (tested).
            key, init_key = jax.random.split(key)
            img = jax.random.normal(init_key, shape) if x_T is None else x_T
            img = jax.lax.with_sharding_constraint(img, img_sharding)

            def body(carry, step):
                img, x0_prev, h_prev = carry
                t, t_prev, i = step
                t_arr = jnp.full((batch_size,), t, jnp.int32)

                out = model.denoise_fn.forward_with_cond_scale(
                    img, t_arr, cond=cond, cond_scale=cs
                )
                out = rearrange(out, "b f h w c -> b c f h w")
                x0, _ = model._model_out_to_x0_eps(img, t_arr, out)
                x0 = jnp.clip(x0, -1.0, 1.0)

                a_cur = acp[t]
                a_next = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
                alpha_c, sigma_c = jnp.sqrt(a_cur), jnp.sqrt(1.0 - a_cur)
                alpha_n = jnp.sqrt(a_next)
                sigma_n = jnp.sqrt(jnp.maximum(1.0 - a_next, 0.0))
                # exp(-h) computed exactly from the schedule (0 when
                # sigma_n = 0, i.e. the final step to clean data).
                exp_neg_h = (alpha_c * sigma_n) / (sigma_c * alpha_n)
                h = lam(a_next) - lam(a_cur)

                # Second-order multistep correction from the previous x0.
                r = h_prev / h
                d2 = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
                first_order = jnp.logical_or(i == 0, t_prev < 0)
                d = jnp.where(first_order, x0, d2)

                img = (sigma_n / sigma_c) * img + alpha_n * (1.0 - exp_neg_h) * d
                img = jax.lax.with_sharding_constraint(img, img_sharding)
                return (img, x0, h), None

            steps = (times, times_prev, jnp.arange(num_steps))
            init = (img, jnp.zeros_like(img), jnp.ones(()))
            (img, _, _), _ = jax.lax.scan(body, init, steps)
            return unnormalize_img(img)

        has_c, has_n = cond is not None, init_noise is not None
        if has_c and has_n:
            fn, shardings = run, (repl, repl, repl, img_sharding)
        elif has_c:
            fn, shardings = (lambda s, k, c: run(s, k, c)), (repl, repl, repl)
        elif has_n:
            fn, shardings = (lambda s, k, xT: run(s, k, None, xT)), (repl, repl, img_sharding)
        else:
            fn, shardings = (lambda s, k: run(s, k)), (repl, repl)
        jitted = jax.jit(fn, in_shardings=shardings, out_shardings=img_sharding)
        _cache_put(cache_key, jitted)
        args = [state, key]
        if has_c:
            args.append(cond)
        if has_n:
            args.append(init_noise)
        return jitted(*args)

    def sample(
        self,
        key: jax.Array,
        cond: Any = None,
        cond_scale: float = 1.0,
        batch_size: int = 16,
        mesh: Mesh | None = None,
    ) -> jax.Array:
        """Generate samples; text conditions are tokenized+BERT-embedded.

        Parity: reference :323-357.
        """
        if is_list_str(cond):
            cond = jnp.asarray(
                bert_embed(tokenize(cond), return_cls_repr=self.text_use_bert_cls)
            )
        if exists(cond):
            batch_size = cond.shape[0]
        sample_shape = (
            batch_size,
            self.channels,
            self.num_frames,
            self.image_size,
            self.image_size,
        )
        return self.p_sample_loop(
            shape=sample_shape, key=key, cond=cond, cond_scale=cond_scale, mesh=mesh
        )

    def sample_conditional_frames(
        self,
        key: jax.Array,
        known: jax.Array,
        frame_mask: jax.Array,
        cond: Any = None,
        cond_scale: float = 1.0,
        mesh: Mesh | None = None,
        num_steps: int | None = None,
        grid: str = "linspace",
        recon_guidance_weight: float = 0.0,
    ) -> jax.Array:
        """Generate a clip whose frames at ``frame_mask`` are pinned to
        ``known`` — video extension (mask the leading frames), temporal
        infill (mask any subset), or frame prediction, via replacement
        conditioning (the RePaint/Song et al. baseline: after every reverse
        step the known frames are swapped for their forward-noised
        counterparts at the new noise level, so the denoiser always sees
        consistent context and the t=0 output carries the known frames
        exactly).

        Capability beyond the reference (its only conditional-inference
        surface is ``interpolate``). One compiled ``lax.scan`` like every
        other sampler here.

        Args:
          known: ``(b, c, f, h, w)`` in the sampler's output range [0, 1];
            values at unmasked frames are ignored.
          frame_mask: ``(f,)`` bool — True where ``known`` pins the frame.
          num_steps: ``None`` runs the full T-step DDPM chain; an int runs
            a deterministic DDIM chain over that many ``grid`` steps with
            the same replacement conditioning (fast extension/infill).
          recon_guidance_weight: ``w_r > 0`` adds reconstruction-guided
            sampling (Ho et al., "Video Diffusion Models", §3.2) on the
            DDIM path: the unknown frames' x0 prediction is corrected by
            the gradient of the known frames' reconstruction error,
            ``x0 <- x0 - (w_r a_t / 2) grad_z ||mask*(x0(z) - known)||^2``,
            pulling the generated frames toward temporal consistency with
            the pinned context (the paper uses w_r in the 1-10 range).
            Doubles the per-step cost (a VJP through the denoiser);
            requires ``num_steps``.
        """
        if is_list_str(cond):
            cond = jnp.asarray(
                bert_embed(tokenize(cond), return_cls_repr=self.text_use_bert_cls)
            )
        batch_size = known.shape[0]
        shape = tuple(known.shape)
        assert shape[2] == self.num_frames, (
            f"known must carry all {self.num_frames} frames (got {shape[2]}); "
            "unmasked positions are ignored"
        )
        frame_mask = jnp.asarray(frame_mask, bool).reshape(1, 1, -1, 1, 1)

        graphdef, state = nnx.split(self)
        if mesh is None:
            mesh = data_parallel_mesh()
        batch_spec = _sampler_batch_spec(batch_size, mesh)
        repl = NamedSharding(mesh, P())
        img_sharding = NamedSharding(mesh, batch_spec)
        cs = float(cond_scale)

        wr = float(recon_guidance_weight)
        if wr > 0.0 and num_steps is None:
            raise ValueError("recon_guidance_weight needs the DDIM path (num_steps)")
        if num_steps is not None and not 1 <= int(num_steps) <= self.num_timesteps:
            raise ValueError(
                f"num_steps must be in [1, {self.num_timesteps}]; got {num_steps}"
            )
        cache_key = (
            "cond_frames", graphdef, shape, self.num_timesteps, mesh, batch_spec,
            cs, cond is not None, num_steps,
            grid if num_steps is not None else None, wr,
        )
        cached = _cache_get(cache_key)
        if cached is None:
            acp = self.alphas_cumprod[...]
            if num_steps is not None:
                times = sampling_times(self.num_timesteps, num_steps, grid)[::-1]
                times_prev = jnp.concatenate([times[1:], jnp.array([-1], jnp.int32)])

            def run(state, key, known, frame_mask, cond=None):
                model = nnx.merge(graphdef, state)
                x0_known = normalize_img(known)
                key, init_key = jax.random.split(key)
                img = jax.random.normal(init_key, shape)
                img = jax.lax.with_sharding_constraint(img, img_sharding)

                def replace_known(img, t_to, mix_key):
                    """Swap pinned frames for their forward-noised values at
                    level ``t_to`` (clean when t_to < 0)."""
                    known_noisy = model.q_sample(
                        x0_known,
                        jnp.full((batch_size,), jnp.maximum(t_to, 0), jnp.int32),
                        key=mix_key,
                    )
                    known_t = jnp.where(t_to >= 0, known_noisy, x0_known)
                    return jnp.where(frame_mask, known_t, img)

                if num_steps is None:

                    def body(carry, i):
                        img, key = carry
                        key, step_key, mix_key = jax.random.split(key, 3)
                        t_arr = jnp.full((batch_size,), i, jnp.int32)
                        img = model.p_sample(
                            img, t_arr, key=step_key, cond=cond, cond_scale=cs
                        )
                        img = replace_known(img, i - 1, mix_key)
                        img = jax.lax.with_sharding_constraint(img, img_sharding)
                        return (img, key), None

                    (img, _), _ = jax.lax.scan(
                        body, (img, key), jnp.arange(self.num_timesteps - 1, -1, -1)
                    )
                else:

                    def predict_x0(z, t_arr):
                        out = model.denoise_fn.forward_with_cond_scale(
                            z, t_arr, cond=cond, cond_scale=cs
                        )
                        out = rearrange(out, "b f h w c -> b c f h w")
                        x0, _ = model._model_out_to_x0_eps(z, t_arr, out)
                        return x0

                    def body(carry, tt):
                        img, key = carry
                        t, t_prev = tt
                        key, mix_key = jax.random.split(key)
                        t_arr = jnp.full((batch_size,), t, jnp.int32)
                        if wr > 0.0:
                            # Reconstruction guidance (Ho et al. 2022 eq. 6):
                            # one VJP through the denoiser pulls the unknown
                            # frames toward consistency with the context.
                            def recon_err(z):
                                x0 = predict_x0(z, t_arr)
                                err = jnp.where(frame_mask, x0 - x0_known, 0.0)
                                return 0.5 * jnp.sum(err**2), x0

                            (_, x0), g = jax.value_and_grad(recon_err, has_aux=True)(img)
                            # Ho et al.'s alpha_t is the SIGNAL RATE —
                            # sqrt(acp) in this repo's discrete convention
                            # (q_sample scales x0 by sqrt_alphas_cumprod);
                            # recon_err already carries the paper's 1/2.
                            x0 = x0 - (wr * jnp.sqrt(acp[t])) * jnp.where(
                                frame_mask, 0.0, g
                            )
                        else:
                            x0 = predict_x0(img, t_arr)
                        x0 = jnp.clip(x0, -1.0, 1.0)
                        a_t = acp[t]
                        a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
                        eps_hat = (img - jnp.sqrt(a_t) * x0) / jnp.sqrt(1.0 - a_t)
                        img = (
                            jnp.sqrt(a_prev) * x0
                            + jnp.sqrt(jnp.maximum(1.0 - a_prev, 0.0)) * eps_hat
                        )
                        img = replace_known(img, t_prev, mix_key)
                        img = jax.lax.with_sharding_constraint(img, img_sharding)
                        return (img, key), None

                    (img, _), _ = jax.lax.scan(body, (img, key), (times, times_prev))
                return unnormalize_img(img)

            if cond is not None:
                cached = jax.jit(
                    run,
                    in_shardings=(repl, repl, img_sharding, repl, repl),
                    out_shardings=img_sharding,
                )
            else:
                cached = jax.jit(
                    lambda state, key, known, frame_mask: run(state, key, known, frame_mask),
                    in_shardings=(repl, repl, img_sharding, repl),
                    out_shardings=img_sharding,
                )
            _cache_put(cache_key, cached)

        if cond is None:
            return cached(state, key, known, frame_mask)
        return cached(state, key, known, frame_mask, cond)

    def interpolate(
        self,
        x1: jax.Array,
        x2: jax.Array,
        key: jax.Array,
        t: int | None = None,
        lam: float = 0.5,
    ) -> jax.Array:
        """Diffuse both inputs to step ``t``, lerp, and denoise back to 0.

        Parity: reference :360-398, with its crash fixed — the reference
        called ``p_sample`` without the required ``key`` (reference :396),
        so its interpolate path could never run. Here the denoising loop is
        the same on-device scan as sampling.
        """
        batch_size = x1.shape[0]
        t = int(t) if exists(t) else self.num_timesteps - 1
        lam = float(lam)
        assert x1.shape == x2.shape, "inputs must have the same shape"
        assert 0.0 <= lam <= 1.0, "lambda must be in [0, 1]"

        graphdef, state = nnx.split(self)

        # Each (t, lam, shape) pair is its own compiled program (t fixes the
        # scan length; lam is folded in as a constant) — cached in the same
        # bounded LRU as the samplers so sweeping lambda cannot accumulate
        # unbounded executables.
        cache_key = ("interpolate", graphdef, x1.shape, t, lam)
        run = _cache_get(cache_key)
        if run is None:

            @jax.jit
            def run(state, x1, x2, key):
                model = nnx.merge(graphdef, state)
                t_batched = jnp.full((batch_size,), t, jnp.int32)
                key, k1, k2 = jax.random.split(key, 3)
                xt1 = model.q_sample(x1, t=t_batched, key=k1)
                xt2 = model.q_sample(x2, t=t_batched, key=k2)
                img = (1 - lam) * xt1 + lam * xt2

                def body(carry, i):
                    img, key = carry
                    key, step_key = jax.random.split(key)
                    cur_t = jnp.full((batch_size,), i, jnp.int32)
                    img = model.p_sample(img, cur_t, key=step_key)
                    return (img, key), None

                (img, _), _ = jax.lax.scan(
                    body, (img, key), jnp.arange(t - 1, -1, -1)
                )
                return img

            _cache_put(cache_key, run)

        return run(state, x1, x2, key)

    # ------------------------------------------------------------------ #
    # Training                                                            #
    # ------------------------------------------------------------------ #

    def p_losses(
        self,
        x_start: jax.Array,
        t: jax.Array,
        key: jax.Array,
        cond: Any = None,
        noise: jax.Array | None = None,
        **kwargs: Any,
    ) -> jax.Array:
        """Denoising loss at timesteps ``t`` (reference :423-470).

        Key chain parity: ``key -> (key, noise_key, q_sample_key)`` with the
        noise drawn from ``noise_key``.
        """
        key, noise_key, q_sample_key = jax.random.split(key, 3)
        if noise is None:
            noise = jax.random.normal(noise_key, shape=x_start.shape)

        x_noisy = self.q_sample(x_start=x_start, t=t, key=q_sample_key, noise=noise)

        if is_list_str(cond):
            cond = jnp.asarray(
                bert_embed(tokenize(cond), return_cls_repr=self.text_use_bert_cls)
            )

        # The leftover ``key`` threads device-side randomness into the
        # denoiser's CFG null-cond dropout / focus-present draws (the
        # reference leaves those host-seeded, SURVEY §3.3 determinism hole);
        # with both probabilities at 0 (every parity surface) the key is
        # never consumed, so the reference PRNG chain is unchanged.
        out_bfhwc = self.denoise_fn(x_noisy, t, cond=cond, key=key, **kwargs)
        model_out = rearrange(out_bfhwc, "b f h w c -> b c f h w")

        if self.prediction_type == "noise":
            target = noise
        elif self.prediction_type == "v":
            # stop_gradient: the target is supervision, not a function to
            # differentiate — without it the v target's schedule-buffer
            # dependence would add a second gradient path into the
            # nnx.Variable buffers under a full-state optimizer (the
            # reference's trainer optimizes the full state; PARITY.md #11).
            # No-op for the "noise" branch (the target has no such deps),
            # so reference-parity gradients are untouched.
            target = jax.lax.stop_gradient(self.predict_v(x_start, t, noise))
        else:  # "x0"
            target = x_start

        if self.loss_type == "l1":
            err = jnp.abs(model_out - target)
        elif self.loss_type == "l2":
            err = (model_out - target) ** 2
        else:
            raise ValueError(f"Unsupported loss type: {self.loss_type}")

        if self.min_snr_gamma is None:
            return jnp.mean(err)
        # Min-SNR-gamma (Hang et al. 2023): the x0-space weight min(SNR, g)
        # expressed in each parameterization's native loss space —
        # eps: min(SNR,g)/SNR; v: min(SNR,g)/(SNR+1); x0: min(SNR,g).
        acp_t = extract(self.alphas_cumprod[...], t, x_start.shape)
        snr = acp_t / (1.0 - acp_t)
        clamped = jnp.minimum(snr, self.min_snr_gamma)
        if self.prediction_type == "noise":
            w = clamped / snr
        elif self.prediction_type == "v":
            w = clamped / (snr + 1.0)
        else:  # "x0"
            w = clamped
        if self.loss_type == "l1":
            # The min-SNR weights are derived for SQUARED error; |e| scales
            # linearly in the residual, so the equivalent per-sample
            # weighting is sqrt(w) (w * e^2 == (sqrt(w) * e)^2).
            w = jnp.sqrt(w)
        return jnp.mean(w * err)

    def __call__(self, x: jax.Array, key: jax.Array, *args: Any, **kwargs: Any) -> jax.Array:
        """Training entry: sample t, normalize, compute loss (reference :473-502).

        Key chain parity: ``key -> (key, t_key, loss_key)``.
        """
        batch_size = x.shape[0]
        check_shape(
            x,
            "b c f h w",
            b=batch_size,
            c=self.channels,
            f=self.num_frames,
            h=self.image_size,
            w=self.image_size,
        )
        key, t_key, loss_key = jax.random.split(key, 3)
        t = jax.random.randint(t_key, (batch_size,), 0, self.num_timesteps, dtype=jnp.int32)
        x_normalized = normalize_img(x)
        return self.p_losses(x_normalized, t, key=loss_key, *args, **kwargs)
