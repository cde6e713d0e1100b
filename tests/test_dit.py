"""VideoDiT tests — the transformer denoiser family (beyond the reference).

The family's contract is the Unet3D calling convention, so the checks are
about plug-compatibility: shapes, the DiT init invariants (adaLN-Zero =>
zero output at init), actual learning through GaussianDiffusion, CFG
equivalence, sampler integration, checkpoint round trip, and the config
routing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import VideoDiT

B, C, F, H, W = 2, 1, 3, 8, 8
SHAPE = (B, C, F, H, W)
COND_DIM = 16


def make_dit(cond_dim=None, seed=0, **kw):
    return VideoDiT(
        dim=32, rngs=nnx.Rngs(seed), depth=2, channels=C, attn_heads=2,
        attn_dim_head=16, patch_size=4, cond_dim=cond_dim, **kw,
    )


def make_diffusion(cond_dim=None, timesteps=8, **kw):
    return GaussianDiffusion(
        make_dit(cond_dim, **kw), image_size=H, num_frames=F, channels=C,
        timesteps=timesteps, loss_type="l2", prediction_type="v",
    )


class TestForward:
    def test_shape_contract(self):
        dit = make_dit()
        x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
        t = jnp.array([1.0, 5.0])
        out = dit(x, t)
        assert out.shape == (B, F, H, W, C)
        assert out.dtype == jnp.float32

    def test_zero_output_at_init(self):
        """adaLN-Zero + zero-init final projection => the denoiser is
        exactly the zero function at init (the DiT stability recipe)."""
        dit = make_dit()
        x = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
        out = dit(x, jnp.array([3.0, 7.0]))
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_patch_divisibility_asserted(self):
        dit = make_dit()
        bad = jnp.zeros((B, C, F, 10, 10))
        with pytest.raises(AssertionError):
            dit(bad, jnp.zeros((B,)))

    def test_any_frame_count_and_size(self):
        """Positions are computed, not stored: one model serves any frame
        count / any divisible resolution."""
        dit = make_dit()
        for f, hw in [(1, 8), (5, 16), (2, 12)]:
            out = dit(jnp.zeros((1, C, f, hw, hw)), jnp.zeros((1,)))
            assert out.shape == (1, f, hw, hw, C)


class TestConditioning:
    def test_cfg_batched_equals_two_pass(self):
        dit = make_dit(cond_dim=COND_DIM, seed=3)
        # Make blocks non-trivial: nudge the zeroed modulation layers.
        for blk in dit.blocks:
            blk.ada.kernel[...] = (
                jax.random.normal(jax.random.PRNGKey(7), blk.ada.kernel[...].shape) * 0.02
            )
        dit.final_proj.kernel[...] = (
            jax.random.normal(jax.random.PRNGKey(8), dit.final_proj.kernel[...].shape) * 0.02
        )
        x = jax.random.normal(jax.random.PRNGKey(4), SHAPE)
        t = jnp.array([2.0, 6.0])
        cond = jax.random.normal(jax.random.PRNGKey(5), (B, COND_DIM))
        scale = 3.0
        got = dit.forward_with_cond_scale(x, t, cond=cond, cond_scale=scale)
        c_out = dit(x, t, cond=cond, null_cond_prob=0.0)
        n_out = dit(x, t, cond=cond, null_cond_mask=jnp.ones((B,), bool))
        want = n_out + (c_out - n_out) * scale
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_guidance_embed_graft_is_noop_at_init(self):
        dit_g = make_dit(cond_dim=COND_DIM, seed=3, guidance_embed=True)
        x = jax.random.normal(jax.random.PRNGKey(6), SHAPE)
        t = jnp.array([1.0, 2.0])
        cond = jax.random.normal(jax.random.PRNGKey(7), (B, COND_DIM))
        a = dit_g(x, t, cond=cond, guidance_scale=jnp.full((B,), 5.0))
        b = dit_g(x, t, cond=cond, guidance_scale=jnp.full((B,), 1.0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTrainingAndSampling:
    def test_loss_decreases(self):
        diff = make_diffusion()
        graphdef, state = nnx.split(diff)
        tx = optax.adam(1e-3)
        opt = tx.init(state)
        batch = jax.random.uniform(jax.random.PRNGKey(0), SHAPE)

        @jax.jit
        def step(state, opt, key):
            def loss_fn(s):
                return nnx.merge(graphdef, s)(batch, key)

            loss, grads = jax.value_and_grad(loss_fn)(state)
            updates, opt = tx.update(grads, opt, state)
            return optax.apply_updates(state, updates), opt, loss

        losses = []
        for i in range(10):
            state, opt, loss = step(state, opt, jax.random.PRNGKey(42))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_all_samplers_run(self):
        diff = make_diffusion()
        out = diff.ddim_sample(key=jax.random.PRNGKey(0), batch_size=1, num_steps=3)
        assert out.shape == (1, C, F, H, W)
        out = diff.dpm_solver_sample(key=jax.random.PRNGKey(0), batch_size=1, num_steps=3)
        assert np.isfinite(np.asarray(out)).all()
        out = diff.sample_conditional_frames(
            key=jax.random.PRNGKey(1),
            known=jnp.zeros(SHAPE) + 0.5,
            frame_mask=jnp.array([True, False, False]),
            num_steps=3,
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_distill_step_runs(self):
        """The distillation subsystem is family-agnostic."""
        from video_diffusion_nnx_tpu.training.distill import (
            build_distill_step,
            copy_state,
            split_trainable,
        )

        diff = make_diffusion(timesteps=8)
        graphdef, state = nnx.split(diff)
        tx = optax.adam(1e-3)
        step = build_distill_step(graphdef, tx, 8, 2)
        s_state = copy_state(state)
        opt = tx.init(split_trainable(s_state)[0])
        s_state, opt, loss = step(
            s_state, opt, state, jax.random.uniform(jax.random.PRNGKey(0), SHAPE),
            jax.random.PRNGKey(1),
        )
        assert np.isfinite(float(loss))


class TestCheckpointAndConfig:
    def test_checkpoint_round_trip(self, tmp_path):
        import orbax.checkpoint as ocp

        from video_diffusion_nnx_tpu.utils import load_checkpoint, save_checkpoint

        diff = make_diffusion()
        graphdef, state = nnx.split(diff)
        mgr = ocp.CheckpointManager(
            tmp_path / "ckpt", options=ocp.CheckpointManagerOptions(create=True)
        )
        save_checkpoint(mgr, state, state, 7)
        fresh = make_diffusion()
        restored, _ = load_checkpoint(fresh, 7, str(tmp_path / "ckpt"))
        a = dict(nnx.split(diff)[1].flat_state())
        b = dict(nnx.split(restored)[1].flat_state())
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k].value), np.asarray(b[k].value), err_msg=str(k)
            )

    def test_build_models_arch_dit(self):
        from video_diffusion_nnx_tpu.config import build_models

        unet, diff = build_models({
            "unet": {
                "arch": "dit", "dim": 32, "depth": 2, "channels": 1,
                "attn_heads": 2, "attn_dim_head": 16, "patch_size": 4,
            },
            "diffusion": {
                "image_size": 8, "num_frames": 2, "channels": 1, "timesteps": 4,
            },
        })
        assert isinstance(unet, VideoDiT)
        out = diff.ddim_sample(key=jax.random.PRNGKey(0), batch_size=1, num_steps=2)
        assert out.shape == (1, 1, 2, 8, 8)

    def test_build_models_bad_arch(self):
        from video_diffusion_nnx_tpu.config import build_models

        with pytest.raises(ValueError):
            build_models({"unet": {"arch": "mamba"}})


class TestTrainerIntegration:
    def test_sharded_trainer_runs_dit(self, tmp_path):
        """The full Trainer (8-device data mesh, prefetch loader, EMA,
        checkpointing) drives a VideoDiT diffusion model unchanged — the
        param-sharding heuristics are family-agnostic."""
        from video_diffusion_nnx_tpu.training import Trainer

        rng = np.random.default_rng(0)
        npy = tmp_path / "seq.npy"
        np.save(npy, rng.integers(0, 256, size=(4, 16, H, W), dtype=np.uint8))

        diff = make_diffusion(timesteps=5)
        tr = Trainer(
            diff,
            folder=str(tmp_path),
            dataset_path=str(npy),
            train_batch_size=8,
            train_lr=1e-3,
            train_num_steps=2,
            step_start_ema=1,
            update_ema_every=1,
            checkpoint_every_steps=10**9,
            results_folder=str(tmp_path / "results"),
            tensorboard_dir=str(tmp_path / "tb"),
            profile_flush_step=0,
            dataset_normalize=True,
        )
        tr.train()
        assert tr.step == 2


class TestFusedAttention:
    def test_fused_matches_composite(self):
        """use_fused_attention routes both attentions through the Pallas
        kernel (interpret mode on CPU); outputs match the composite path."""
        a = make_dit(seed=5)
        b_ = make_dit(seed=5, use_fused_attention=True)
        # Make the blocks non-trivial (adaLN gates are zero at init).
        for m in (a, b_):
            for blk in m.blocks:
                blk.ada.kernel[...] = (
                    jax.random.normal(jax.random.PRNGKey(9), blk.ada.kernel[...].shape)
                    * 0.05
                )
            m.final_proj.kernel[...] = (
                jax.random.normal(jax.random.PRNGKey(10), m.final_proj.kernel[...].shape)
                * 0.05
            )
        x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
        t = jnp.array([2.0, 6.0])
        np.testing.assert_allclose(
            np.asarray(b_(x, t)), np.asarray(a(x, t)), atol=2e-4,
        )
