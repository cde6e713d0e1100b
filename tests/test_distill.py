"""Progressive distillation tests (capability beyond the reference).

The load-bearing check is the oracle test: with a teacher whose x0
prediction is EXACT, the synthesized distillation target must equal the
true x0 — any error in the two-step DDIM rollout or the target algebra
(Salimans & Ho eq. 7) breaks it immediately. The end-to-end tests then
verify the training step optimizes a real Unet3D student and that the
distilled model samples on its stride grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.diffusion.gaussian_diffusion import sampling_times
from video_diffusion_nnx_tpu.training.distill import (
    build_distill_step,
    distill_targets,
    nested_grids,
    progressive_distill,
)

B, C, F, H, W = 2, 1, 2, 8, 8
SHAPE = (B, C, F, H, W)


class _OracleX0(nnx.Module):
    """Exact x0 oracle in eps parameterization."""

    def __init__(self, x0, acp):
        self.x0 = nnx.Variable(x0)
        self.acp = nnx.Variable(acp)

    def forward_with_cond_scale(self, x, t, cond=None, cond_scale=1.0, **kwargs):
        a = self.acp[...][t].reshape(-1, 1, 1, 1, 1)
        eps = (x - jnp.sqrt(a) * self.x0[...]) / jnp.sqrt(1.0 - a)
        return jnp.transpose(eps, (0, 2, 3, 4, 1))

    __call__ = forward_with_cond_scale


def _tiny_unet_diffusion(prediction_type="v", timesteps=16):
    from video_diffusion_nnx_tpu.models import Unet3D

    unet = Unet3D(dim=8, rngs=nnx.Rngs(0), dim_mults=(1,), channels=1, attn_heads=2)
    return GaussianDiffusion(
        unet, image_size=H, num_frames=F, channels=C, timesteps=timesteps,
        loss_type="l2", prediction_type=prediction_type,
    )


class TestGrids:
    def test_stride_grid_nests(self):
        """The N-step stride grid is exactly every other point of the
        2N-step grid — the property distillation relies on."""
        for T, N in [(1000, 8), (16, 4), (10, 4), (200, 25)]:
            tN, t2N = nested_grids(T, N)
            np.testing.assert_array_equal(np.asarray(t2N[1::2]), np.asarray(tN))

    def test_stride_full_grid_is_ddpm(self):
        np.testing.assert_array_equal(
            np.asarray(sampling_times(10, 10, "stride")), np.arange(10)
        )

    def test_too_few_timesteps_raises(self):
        with pytest.raises(ValueError):
            nested_grids(10, 8)


class TestTargets:
    def test_oracle_teacher_target_is_x0(self):
        """Exact teacher => the distillation target IS the clean data."""
        x0 = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), SHAPE)) * 0.9
        teacher = GaussianDiffusion(
            _OracleX0(jnp.zeros(SHAPE), jnp.ones(4)),  # placeholder
            image_size=H, num_frames=F, channels=C, timesteps=16, loss_type="l2",
        )
        teacher.denoise_fn = _OracleX0(x0, teacher.alphas_cumprod[...])

        tN, t2N = nested_grids(16, 4)
        i = jnp.array([3, 1])
        t, t_mid = tN[i], t2N[2 * i]
        t_next = jnp.where(i > 0, tN[jnp.maximum(i - 1, 0)], -1)
        eps = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
        acp = teacher.alphas_cumprod[...]
        a = acp[t].reshape(-1, 1, 1, 1, 1)
        x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps

        x_tilde = distill_targets(teacher, x_t, t, t_mid, t_next)
        # float32: the eps reconstruction divides by sigma_t, which is
        # ill-conditioned at t = T-1 where acp ~ 0 — 5e-4 abs is the
        # closed-form float32 floor, not an algebra error.
        np.testing.assert_allclose(np.asarray(x_tilde), np.asarray(x0), atol=5e-4)

    def test_final_step_target(self):
        """i = 0 (t_next = -1, sigma_next = 0): target = x_next exactly."""
        x0 = jnp.tanh(jax.random.normal(jax.random.PRNGKey(2), SHAPE)) * 0.5
        teacher = GaussianDiffusion(
            _OracleX0(jnp.zeros(SHAPE), jnp.ones(4)),
            image_size=H, num_frames=F, channels=C, timesteps=16, loss_type="l2",
        )
        teacher.denoise_fn = _OracleX0(x0, teacher.alphas_cumprod[...])
        tN, t2N = nested_grids(16, 4)
        i = jnp.zeros((B,), jnp.int32)
        t, t_mid = tN[i], t2N[2 * i]
        t_next = jnp.full((B,), -1, jnp.int32)
        eps = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
        acp = teacher.alphas_cumprod[...]
        a = acp[t].reshape(-1, 1, 1, 1, 1)
        x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps
        x_tilde = distill_targets(teacher, x_t, t, t_mid, t_next)
        np.testing.assert_allclose(np.asarray(x_tilde), np.asarray(x0), atol=1e-4)


class TestDistillStep:
    def test_loss_decreases_on_fixed_batch(self):
        import optax

        diff = _tiny_unet_diffusion("v")
        graphdef, state = nnx.split(diff)
        tx = optax.adam(1e-3)
        step = build_distill_step(graphdef, tx, diff.num_timesteps, 4)

        from video_diffusion_nnx_tpu.training.distill import copy_state, split_trainable

        s_state = copy_state(state)
        opt_state = tx.init(split_trainable(s_state)[0])
        batch = jax.random.uniform(jax.random.PRNGKey(0), SHAPE)  # [0,1] data
        losses = []
        for n in range(12):
            s_state, opt_state, loss = step(
                s_state, opt_state, state, batch, jax.random.PRNGKey(42)
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_progressive_two_rounds_and_sampling(self):
        diff = _tiny_unet_diffusion("v")

        def data_iter():
            key = jax.random.PRNGKey(0)
            while True:
                key, k = jax.random.split(key)
                yield jax.random.uniform(k, SHAPE)

        seen = []
        final_state, final_steps = progressive_distill(
            diff, data_iter(),
            initial_steps=4, rounds=2, steps_per_round=2,
            key=jax.random.PRNGKey(1),
            on_round_end=lambda n, s: seen.append(n),
        )
        assert seen == [4, 2]
        assert final_steps == 2

        graphdef, _ = nnx.split(diff)
        student = nnx.merge(graphdef, final_state)
        out = student.ddim_sample(
            key=jax.random.PRNGKey(0), batch_size=1,
            num_steps=final_steps, grid="stride",
        )
        assert out.shape == (1, C, F, H, W)
        assert np.isfinite(np.asarray(out)).all()


class TestStage2GuidanceProgressive:
    def test_conditioned_w_distill_round(self):
        """Stage 2 of Meng et al.: progressively distill a w-conditioned
        (guidance_embed) model with per-sample w — one round runs, the loss
        is finite and decreases on a fixed batch, and the result samples
        via the single-forward CFG path."""
        import optax

        from video_diffusion_nnx_tpu.models import Unet3D
        from video_diffusion_nnx_tpu.training.distill import copy_state, split_trainable

        COND_DIM = 16
        unet = Unet3D(
            dim=8, rngs=nnx.Rngs(0), dim_mults=(1,), channels=1, attn_heads=2,
            cond_dim=COND_DIM, guidance_embed=True,
        )
        diff = GaussianDiffusion(
            unet, image_size=H, num_frames=F, channels=C, timesteps=16,
            loss_type="l2", prediction_type="v",
        )
        graphdef, state = nnx.split(diff)
        tx = optax.adam(1e-3)
        step = build_distill_step(
            graphdef, tx, diff.num_timesteps, 4,
            conditioned=True, w_range=(1.0, 4.0),
        )
        s_state = copy_state(state)
        opt_state = tx.init(split_trainable(s_state)[0])
        clips = jax.random.uniform(jax.random.PRNGKey(0), SHAPE)
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, COND_DIM))
        losses = []
        for _ in range(8):
            s_state, opt_state, loss = step(
                s_state, opt_state, state, (clips, cond), jax.random.PRNGKey(7)
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

        student = nnx.merge(graphdef, s_state)
        out = student.ddim_sample(
            key=jax.random.PRNGKey(0), cond=cond[:1], cond_scale=3.0,
            num_steps=4, grid="stride",
        )
        assert out.shape == (1, C, F, H, W)
        assert np.isfinite(np.asarray(out)).all()


class TestShardedDistill:
    def test_dp_matches_single_device_loss(self):
        """The data-sharded distill step computes the same loss as the
        unsharded one (batch 8 over an 8-device 'data' mesh) — the same
        equivalence contract the trainer's DP tests pin."""
        import optax

        from video_diffusion_nnx_tpu.parallel import data_parallel_mesh
        from video_diffusion_nnx_tpu.training.distill import copy_state, split_trainable

        diff = _tiny_unet_diffusion("v")
        graphdef, state = nnx.split(diff)
        tx = optax.adam(1e-3)
        batch = jax.random.uniform(jax.random.PRNGKey(0), (8, C, F, H, W))
        key = jax.random.PRNGKey(5)

        losses = {}
        states = {}
        for tag, mesh in (("single", None), ("dp8", data_parallel_mesh(8))):
            step = build_distill_step(graphdef, tx, diff.num_timesteps, 4, mesh=mesh)
            s_state = copy_state(state)
            opt_state = tx.init(split_trainable(s_state)[0])
            traj = []
            for _ in range(3):
                s_state, opt_state, loss = step(s_state, opt_state, state, batch, key)
                traj.append(float(loss))
            losses[tag] = traj
            states[tag] = s_state

        np.testing.assert_allclose(losses["single"], losses["dp8"], rtol=2e-4)

    def test_guidance_distill_sharded_runs(self):
        """The conditioned+w step runs over a (data,) mesh with both batch
        members sharded."""
        import optax

        from video_diffusion_nnx_tpu.models import Unet3D
        from video_diffusion_nnx_tpu.parallel import data_parallel_mesh
        from video_diffusion_nnx_tpu.training.distill import copy_state, split_trainable

        COND_DIM = 16
        unet = Unet3D(
            dim=8, rngs=nnx.Rngs(0), dim_mults=(1,), channels=1, attn_heads=2,
            cond_dim=COND_DIM, guidance_embed=True,
        )
        diff = GaussianDiffusion(
            unet, image_size=H, num_frames=F, channels=C, timesteps=16,
            loss_type="l2", prediction_type="v",
        )
        graphdef, state = nnx.split(diff)
        tx = optax.adam(1e-3)
        step = build_distill_step(
            graphdef, tx, diff.num_timesteps, 4,
            mesh=data_parallel_mesh(8), conditioned=True, w_range=(1.0, 4.0),
        )
        s_state = copy_state(state)
        opt_state = tx.init(split_trainable(s_state)[0])
        clips = jax.random.uniform(jax.random.PRNGKey(0), (8, C, F, H, W))
        cond = jax.random.normal(jax.random.PRNGKey(1), (8, COND_DIM))
        s_state, opt_state, loss = step(
            s_state, opt_state, state, (clips, cond), jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(loss))


class TestBufferFreeze:
    def test_distill_step_leaves_schedule_buffers_untouched(self):
        """The distill step must optimize nnx.Param leaves ONLY: the
        schedule nnx.Variable buffers receive real gradients through the
        x0/eps conversions, and an unfiltered optimizer would drift the
        student's noise schedule away from the teacher's every step
        (compounding across progressive rounds)."""
        import optax

        from video_diffusion_nnx_tpu.training.distill import copy_state, split_trainable

        diff = _tiny_unet_diffusion("v")
        graphdef, state = nnx.split(diff)
        tx = optax.adam(1e-2)  # large LR: any drift is glaring
        step = build_distill_step(graphdef, tx, diff.num_timesteps, 4)
        s_state = copy_state(state)
        opt_state = tx.init(split_trainable(s_state)[0])
        batch = jax.random.uniform(jax.random.PRNGKey(0), SHAPE)
        for _ in range(3):
            s_state, opt_state, _ = step(
                s_state, opt_state, state, batch, jax.random.PRNGKey(1)
            )
        before = dict(state.flat_state())
        after = dict(s_state.flat_state())
        for path in (
            ("alphas_cumprod",),
            ("sqrt_alphas_cumprod",),
            ("sqrt_one_minus_alphas_cumprod",),
            ("posterior_mean_coef1",),
        ):
            np.testing.assert_array_equal(
                np.asarray(after[path].value), np.asarray(before[path].value),
                err_msg=f"schedule buffer {path} drifted",
            )
        # ...and the actual parameters DID move.
        moved = any(
            not np.array_equal(np.asarray(after[p].value), np.asarray(v.value))
            for p, v in before.items()
            if "alphas" not in str(p) and "posterior" not in str(p)
        )
        assert moved, "no parameter changed — the step is inert"


class TestDistillEMA:
    def test_ema_round_returns_averaged_params(self):
        """ema_decay=0 => the returned params are the FIRST post-step EMA
        seed-update chain's limit... with decay 0 the EMA tracks the raw
        student exactly; with decay 1 it stays at the init. Both pins."""
        import optax  # noqa: F401  (parity with sibling tests)

        from video_diffusion_nnx_tpu.training.distill import (
            distill_round,
            split_trainable,
        )

        diff = _tiny_unet_diffusion("v")
        graphdef, state = nnx.split(diff)

        def data_iter():
            while True:
                yield jax.random.uniform(jax.random.PRNGKey(0), SHAPE)

        common = dict(
            num_timesteps=diff.num_timesteps, student_steps=4,
            num_train_steps=2, key=jax.random.PRNGKey(1),
            learning_rate=1e-3, log_every=0,
        )
        raw = distill_round(state, graphdef, data_iter(), **common)
        ema0 = distill_round(state, graphdef, data_iter(), ema_decay=0.0, **common)
        ema1 = distill_round(state, graphdef, data_iter(), ema_decay=1.0, **common)

        raw_p = dict(split_trainable(raw)[0].flat_state())
        ema0_p = dict(split_trainable(ema0)[0].flat_state())
        ema1_p = dict(split_trainable(ema1)[0].flat_state())
        init_p = dict(split_trainable(state)[0].flat_state())
        for p in raw_p:
            np.testing.assert_allclose(
                np.asarray(ema0_p[p].value), np.asarray(raw_p[p].value), atol=1e-6,
                err_msg=f"decay=0 EMA must track the raw student at {p}",
            )
            np.testing.assert_array_equal(
                np.asarray(ema1_p[p].value), np.asarray(init_p[p].value),
                err_msg=f"decay=1 EMA must stay at init at {p}",
            )
