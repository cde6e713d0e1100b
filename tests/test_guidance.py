"""Guidance-distillation tests (capability beyond the reference).

Load-bearing checks: (1) the zero-initialized w-embedding graft makes the
fresh student EXACTLY the teacher's unguided forward (so distillation
starts from a correct model, and init-RNG parity of all non-guidance
configs is untouched); (2) a guidance-embed model's
``forward_with_cond_scale`` is ONE forward whose output moves with
cond_scale through the embedding, not two CFG passes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import Unet3D
from video_diffusion_nnx_tpu.training.guidance import (
    guidance_distill,
    transfer_teacher_params,
)

B, C, F, H, W = 2, 1, 2, 8, 8
SHAPE = (B, C, F, H, W)
COND_DIM = 16


def _make(guidance_embed: bool, seed: int = 0):
    unet = Unet3D(
        dim=8, rngs=nnx.Rngs(seed), dim_mults=(1,), channels=1, attn_heads=2,
        cond_dim=COND_DIM, guidance_embed=guidance_embed,
    )
    return GaussianDiffusion(
        unet, image_size=H, num_frames=F, channels=C, timesteps=8,
        loss_type="l2", prediction_type="v",
    )


@pytest.fixture(scope="module")
def teacher():
    return _make(False)


@pytest.fixture(scope="module")
def fresh_student(teacher):
    student = _make(True, seed=1)
    _, t_state = nnx.split(teacher)
    s_state = transfer_teacher_params(student, t_state)
    graphdef, _ = nnx.split(student)
    return nnx.merge(graphdef, s_state)


class TestGraft:
    def test_transfer_is_superset(self, teacher, fresh_student):
        _, t_state = nnx.split(teacher)
        _, s_state = nnx.split(fresh_student)
        t_paths = {p for p, _ in t_state.flat_state()}
        s_paths = {p for p, _ in s_state.flat_state()}
        extra = {p for p in s_paths - t_paths}
        assert extra, "student must add guidance_mlp leaves"
        assert all("guidance_mlp" in str(p) for p in extra), extra

    def test_zero_graft_matches_teacher_unguided(self, teacher, fresh_student):
        """Zero-init output layer => the fresh student IS the teacher at
        w=anything (the w pathway contributes exactly zero)."""
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, SHAPE)
        t = jnp.array([3, 6])
        cond = jax.random.normal(jax.random.fold_in(key, 1), (B, COND_DIM))
        ref = teacher.denoise_fn(x, t, cond=cond, null_cond_prob=0.0)
        out = fresh_student.denoise_fn(
            x, t, cond=cond, null_cond_prob=0.0,
            guidance_scale=jnp.full((B,), 5.0),
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_missing_teacher_path_raises(self, teacher):
        student = _make(True, seed=1)
        _, t_state = nnx.split(teacher)
        flat = dict(t_state.flat_state())
        # Abuse: a "teacher" with an alien path must be rejected.
        _, s_state = nnx.split(student)
        bogus = nnx.from_flat_state(
            {(("nonexistent", "leaf")): list(flat.values())[0]}
        )
        with pytest.raises(ValueError):
            transfer_teacher_params(student, bogus)


class TestForwardWithCondScale:
    def test_single_forward_equals_explicit_w(self, fresh_student):
        """forward_with_cond_scale folds cond_scale into the embedding —
        identical to calling the model with guidance_scale directly."""
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, SHAPE)
        t = jnp.array([1, 4])
        cond = jax.random.normal(jax.random.fold_in(key, 3), (B, COND_DIM))
        via_cfg = fresh_student.denoise_fn.forward_with_cond_scale(
            x, t, cond=cond, cond_scale=3.0
        )
        direct = fresh_student.denoise_fn(
            x, t, cond=cond, null_cond_prob=0.0,
            guidance_scale=jnp.full((B,), 3.0),
        )
        np.testing.assert_allclose(np.asarray(via_cfg), np.asarray(direct), atol=0)

    def test_w_changes_output_after_training_pathway(self, fresh_student):
        """Once the output layer is nonzero, different w give different
        outputs (the embedding actually reaches the computation)."""
        student = fresh_student
        # Nudge the zeroed layer so the pathway is live.
        mlp = student.denoise_fn.guidance_mlp
        last = mlp.layers[-1]
        last.kernel[...] = jnp.ones_like(last.kernel[...]) * 0.01
        key = jax.random.PRNGKey(4)
        x = jax.random.normal(key, SHAPE)
        t = jnp.array([2, 5])
        cond = jax.random.normal(jax.random.fold_in(key, 5), (B, COND_DIM))
        o1 = student.denoise_fn(x, t, cond=cond, guidance_scale=jnp.full((B,), 1.0))
        o2 = student.denoise_fn(x, t, cond=cond, guidance_scale=jnp.full((B,), 6.0))
        assert float(jnp.abs(o1 - o2).max()) > 1e-6
        # Restore the zero graft for other tests in this module.
        last.kernel[...] = jnp.zeros_like(last.kernel[...])


class TestGuidanceDistill:
    def test_loss_decreases(self, teacher):
        """Fixed batch/key => a deterministic objective the optimizer must
        descend (per-step random t/w would swamp 10 steps with variance)."""
        import optax

        from video_diffusion_nnx_tpu.training.distill import split_trainable
        from video_diffusion_nnx_tpu.training.guidance import (
            build_guidance_distill_step,
        )

        student = _make(True, seed=1)
        s_graphdef, _ = nnx.split(student)
        t_graphdef, t_state = nnx.split(teacher)
        s_state = transfer_teacher_params(student, t_state)
        tx = optax.adam(1e-3)
        step = build_guidance_distill_step(
            s_graphdef, t_graphdef, tx, teacher.num_timesteps, w_range=(1.0, 4.0)
        )
        opt_state = tx.init(split_trainable(s_state)[0])
        batch = jax.random.uniform(jax.random.PRNGKey(0), SHAPE)
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, COND_DIM))
        losses = []
        for _ in range(10):
            s_state, opt_state, loss = step(
                s_state, opt_state, t_state, batch, cond, jax.random.PRNGKey(42)
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_requires_guidance_student(self, teacher):
        with pytest.raises(ValueError):
            guidance_distill(
                teacher, teacher, iter([]), num_train_steps=0,
                key=jax.random.PRNGKey(0),
            )

    def test_distilled_student_samples_all_samplers(self, teacher):
        """A (briefly) distilled student drives every sampler at 1x cost."""
        student = _make(True, seed=1)

        def data_iter():
            key = jax.random.PRNGKey(9)
            while True:
                key, k1, k2 = jax.random.split(key, 3)
                yield (
                    jax.random.uniform(k1, SHAPE),
                    jax.random.normal(k2, (B, COND_DIM)),
                )

        state = guidance_distill(
            teacher, student, data_iter(),
            num_train_steps=2, key=jax.random.PRNGKey(2), log_every=0,
        )
        graphdef, _ = nnx.split(student)
        distilled = nnx.merge(graphdef, state)
        cond = jax.random.normal(jax.random.PRNGKey(3), (1, COND_DIM))
        out = distilled.ddim_sample(
            key=jax.random.PRNGKey(0), cond=cond, cond_scale=4.0, num_steps=3
        )
        assert out.shape == (1, C, F, H, W)
        assert np.isfinite(np.asarray(out)).all()


class TestConfig:
    def test_guidance_embed_via_yaml(self):
        from video_diffusion_nnx_tpu.config import build_models

        unet, _ = build_models({
            "unet": {
                "dim": 8, "dim_mults": [1], "channels": 1, "attn_heads": 2,
                "cond_dim": COND_DIM, "guidance_embed": True,
            },
            "diffusion": {
                "image_size": 8, "num_frames": 2, "channels": 1, "timesteps": 4,
            },
        })
        assert unet.has_guidance_embed


class TestShardedGuidanceDistill:
    def test_step_runs_on_data_mesh(self):
        """The guidance-distill step's (data, data) batch sharding compiles
        and runs over 8 virtual devices."""
        import optax

        from video_diffusion_nnx_tpu.parallel import data_parallel_mesh
        from video_diffusion_nnx_tpu.training.distill import copy_state, split_trainable
        from video_diffusion_nnx_tpu.training.guidance import (
            build_guidance_distill_step,
        )

        teacher = _make(False)
        student = _make(True, seed=1)
        s_graphdef, _ = nnx.split(student)
        t_graphdef, t_state = nnx.split(teacher)
        s_state = transfer_teacher_params(student, t_state)
        tx = optax.adam(1e-3)
        step = build_guidance_distill_step(
            s_graphdef, t_graphdef, tx, teacher.num_timesteps,
            mesh=data_parallel_mesh(8),
        )
        opt_state = tx.init(split_trainable(s_state)[0])
        clips = jax.random.uniform(jax.random.PRNGKey(0), (8, C, F, H, W))
        cond = jax.random.normal(jax.random.PRNGKey(1), (8, COND_DIM))
        s_state, opt_state, loss = step(
            s_state, opt_state, copy_state(t_state), clips, cond,
            jax.random.PRNGKey(2),
        )
        assert np.isfinite(float(loss))
