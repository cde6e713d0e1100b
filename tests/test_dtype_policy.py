"""Tests for the bf16 compute policy (params f32, MXU-native activations)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import Unet3D


def _nets():
    f32 = Unet3D(dim=16, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=1)
    bf16 = Unet3D(
        dim=16, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=1, compute_dtype="bfloat16"
    )
    return f32, bf16


class TestComputeDtype:
    def test_params_stay_float32(self):
        _, bf16 = _nets()
        _, state = nnx.split(bf16)
        dtypes = {str(v[...].dtype) for _, v in state.flat_state()}
        assert dtypes == {"float32"}

    def test_output_is_float32(self):
        _, bf16 = _nets()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, 16, 16))
        out = bf16(x, jnp.array([3.0]))
        assert out.dtype == jnp.float32

    def test_bf16_close_to_f32(self):
        """bf16 compute must track the f32 forward within bf16 noise."""
        f32, bf16 = _nets()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 2, 16, 16))
        t = jnp.array([3.0])
        a = np.asarray(f32(x, t))
        b = np.asarray(bf16(x, t))
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-8)
        assert rel < 0.05, rel

    def test_state_tree_identical_across_policies(self):
        """Checkpoints are interchangeable between f32 and bf16 models."""
        f32, bf16 = _nets()
        _, sa = nnx.split(f32)
        _, sb = nnx.split(bf16)
        assert dict(sa.flat_state()).keys() == dict(sb.flat_state()).keys()

    def test_diffusion_sampling_under_bf16(self):
        _, bf16 = _nets()
        diff = GaussianDiffusion(
            bf16, image_size=16, num_frames=2, channels=1, timesteps=4, loss_type="l2"
        )
        out = diff.sample(key=jax.random.PRNGKey(0), batch_size=1)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_training_loss_under_bf16(self):
        _, bf16 = _nets()
        diff = GaussianDiffusion(
            bf16, image_size=16, num_frames=2, channels=1, timesteps=4, loss_type="l2"
        )
        graphdef, state = nnx.split(diff)

        @jax.jit
        def loss_fn(state, x, key):
            model = nnx.merge(graphdef, state)
            return model(x, key=key)

        loss, grads = jax.value_and_grad(
            lambda s: loss_fn(s, jnp.zeros((2, 1, 2, 16, 16)), jax.random.PRNGKey(0))
        )(state)
        assert np.isfinite(float(loss))
        # Gradients exist and are finite f32.
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
