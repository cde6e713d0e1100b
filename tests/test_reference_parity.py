"""Numerical parity against the actual reference implementation.

These tests import the read-only reference package from /root/reference
(stubbing its torch-only dependencies) and assert that this framework's
modules produce the *same numbers* at the same nnx.Rngs seed — the strongest
form of the BASELINE fidelity requirement that is checkable in-process.

The reference's Unet3D/Trainer cannot be constructed under flax >= 0.12
(plain-list module attributes were outlawed), so full-model parity is
covered indirectly: every building block matches bit-for-bit here, the
construction order of our Unet3D mirrors the reference source, and the
diffusion process (which constructs fine) is compared end-to-end including
the sampling loop PRNG chain.
"""

import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

REFERENCE = Path("/root/reference")


def _install_stubs():
    """Stub the reference's torch-only deps (video_diffusion_pytorch, einops_exts)."""
    if "video_diffusion_pytorch" not in sys.modules:
        pkg = types.ModuleType("video_diffusion_pytorch")
        text = types.ModuleType("video_diffusion_pytorch.text")
        text.BERT_MODEL_DIM = 768
        text.bert_embed = lambda ids, return_cls_repr=False: np.zeros((len(ids), 768))
        text.tokenize = lambda texts: np.zeros((len(texts), 4), np.int64)
        pkg.text = text
        sys.modules["video_diffusion_pytorch"] = pkg
        sys.modules["video_diffusion_pytorch.text"] = text
    if "einops_exts" not in sys.modules:
        ee = types.ModuleType("einops_exts")

        def check_shape(x, pattern, **kwargs):
            return None

        ee.check_shape = check_shape
        sys.modules["einops_exts"] = ee
    if "torchvision" not in sys.modules:
        # The reference's utils.py imports torchvision.transforms at module
        # scope but the parity-relevant code paths never execute them.
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        for name in (
            "Compose",
            "Resize",
            "RandomHorizontalFlip",
            "CenterCrop",
            "ToTensor",
            "Lambda",
            "ToPILImage",
        ):
            setattr(tf, name, lambda *a, **k: (lambda x: x))
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf


@pytest.fixture(scope="module")
def ref():
    """Import reference modules (skip cleanly if the reference isn't mounted)."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    _install_stubs()
    sys.path.insert(0, str(REFERENCE))
    try:
        import modules as ref_modules  # noqa: F401
        import gaussian_diffusion as ref_gd  # noqa: F401
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(str(REFERENCE))
    return types.SimpleNamespace(modules=ref_modules, gd=ref_gd)


def _close(a, b, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=1e-5)


class TestModuleParity:
    def test_sinusoidal_pos_emb(self, ref):
        from video_diffusion_nnx_tpu.models import SinusoidalPosEmb

        t = jnp.array([0.0, 1.0, 17.0, 999.0])
        _close(SinusoidalPosEmb(32)(t), ref.modules.SinusoidalPosEmb(32)(t))

    def test_block(self, ref):
        from video_diffusion_nnx_tpu.models import Block

        ours = Block(4, 8, rngs=nnx.Rngs(0))
        theirs = ref.modules.Block(4, 8, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 4))
        _close(ours(x), theirs(x))
        scale = jnp.ones((2, 1, 1, 1, 8)) * 0.3
        shift = jnp.ones((2, 1, 1, 1, 8)) * 0.1
        _close(ours(x, scale_shift=(scale, shift)), theirs(x, scale_shift=(scale, shift)))

    def test_resnet_block(self, ref):
        from video_diffusion_nnx_tpu.models import ResnetBlock

        ours = ResnetBlock(4, 8, rngs=nnx.Rngs(0), time_emb_dim=16)
        theirs = ref.modules.ResnetBlock(4, 8, rngs=nnx.Rngs(0), time_emb_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 4))
        t = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        _close(ours(x, t), theirs(x, t))

    def test_spatial_linear_attention(self, ref):
        from video_diffusion_nnx_tpu.models import SpatialLinearAttention

        ours = SpatialLinearAttention(16, heads=4, D=8, rngs=nnx.Rngs(0))
        theirs = ref.modules.SpatialLinearAttention(16, heads=4, D=8, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 16))
        _close(ours(x), theirs(x))

    def test_multihead_attention(self, ref):
        from video_diffusion_nnx_tpu.models import MultiheadAttention

        ours = MultiheadAttention(in_features=16, dim=8, num_heads=4, rngs=nnx.Rngs(0))
        theirs = ref.modules.MultiheadAttention(
            in_features=16, dim=8, num_heads=4, rngs=nnx.Rngs(0)
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 6, 16))
        _close(ours(x), theirs(x))

    def test_multihead_attention_all_focus(self, ref):
        from video_diffusion_nnx_tpu.models import MultiheadAttention

        ours = MultiheadAttention(in_features=16, dim=8, num_heads=4, rngs=nnx.Rngs(0))
        theirs = ref.modules.MultiheadAttention(
            in_features=16, dim=8, num_heads=4, rngs=nnx.Rngs(0)
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
        mask = jnp.ones((2,), jnp.bool_)
        _close(ours(x, focus_present_mask=mask), theirs(x, focus_present_mask=mask))

    def test_relative_position_bias(self, ref):
        from video_diffusion_nnx_tpu.models import RelativePositionBias

        # Constructor defaults match the reference's effective behavior
        # (its bucket fn always runs with num_buckets=32/max_distance=128).
        ours = RelativePositionBias(rngs=nnx.Rngs(0), heads=8)
        theirs = ref.modules.RelativePositionBias(rngs=nnx.Rngs(0), heads=8)
        _close(ours(16), theirs(16))

    def test_prenorm_compat(self, ref):
        from video_diffusion_nnx_tpu.models import Identity, PreNorm

        ours = PreNorm(8, Identity(), rngs=nnx.Rngs(0), reference_compat=True)
        theirs = ref.modules.PreNorm(8, ref.modules.Identity(), rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8)) * 3 + 1
        _close(ours(x, pos_bias=jnp.zeros(())), theirs(x, pos_bias=jnp.zeros(())))

    def test_upsample_downsample(self, ref):
        import utils as ref_utils_mod  # resolved inside /root/reference via ref fixture

        sys.path.insert(0, str(REFERENCE))
        try:
            import importlib

            ref_utils = importlib.import_module("utils")
        finally:
            sys.path.remove(str(REFERENCE))

        from video_diffusion_nnx_tpu.models import Downsample, Upsample

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
        _close(Downsample(4, nnx.Rngs(0))(x), ref_utils.Downsample(4, nnx.Rngs(0))(x), atol=1e-5)
        _close(Upsample(4, nnx.Rngs(0))(x), ref_utils.Upsample(4, nnx.Rngs(0))(x), atol=1e-5)


class ZeroDenoiser(nnx.Module):
    def __call__(self, x, t, cond=None, **kwargs):
        return jnp.zeros((x.shape[0], x.shape[2], x.shape[3], x.shape[4], x.shape[1]), x.dtype)

    def forward_with_cond_scale(self, x, t, cond=None, cond_scale=1.0, **kwargs):
        return self(x, t, cond=cond, **kwargs)


class TestDiffusionParity:
    @pytest.fixture(scope="class")
    def pair(self, ref):
        from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion

        ours = GaussianDiffusion(
            ZeroDenoiser(), image_size=8, num_frames=2, channels=1, timesteps=16, loss_type="l2"
        )
        theirs = ref.gd.GaussianDiffusion(
            denoise_fn=ZeroDenoiser(),
            image_size=8,
            num_frames=2,
            channels=1,
            timesteps=16,
            loss_type="l2",
        )
        return ours, theirs

    def test_schedule_buffers_bitwise(self, pair):
        ours, theirs = pair
        for name in (
            "alphas_cumprod",
            "sqrt_alphas_cumprod",
            "sqrt_one_minus_alphas_cumprod",
            "log_one_minus_alphas_cumprod",
            "sqrt_recip_alphas_cumprod",
            "sqrt_recipm1_alphas_cumprod",
            "posterior_variance",
            "posterior_log_variance_clipped",
            "posterior_mean_coef1",
            "posterior_mean_coef2",
        ):
            np.testing.assert_array_equal(
                np.asarray(getattr(ours, name)[...]),
                np.asarray(getattr(theirs, name).value),
                err_msg=name,
            )

    def test_q_sample(self, pair):
        ours, theirs = pair
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 2, 8, 8))
        t = jnp.array([3, 9])
        key = jax.random.PRNGKey(5)
        _close(ours.q_sample(x, t, key=key), theirs.q_sample(x, t, key=key))

    def test_p_losses_key_chain(self, pair):
        """Loss must match bitwise — same key-split tree."""
        ours, theirs = pair
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 2, 8, 8))
        t = jnp.array([3, 9])
        key = jax.random.PRNGKey(7)
        np.testing.assert_array_equal(
            np.asarray(ours.p_losses(x, t, key=key)),
            np.asarray(theirs.p_losses(x, t, key=key)),
        )

    def test_call_key_chain(self, pair):
        ours, theirs = pair
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (2, 1, 2, 8, 8)))
        key = jax.random.PRNGKey(11)
        np.testing.assert_array_equal(
            np.asarray(ours(x, key=key)), np.asarray(theirs(x, key=key))
        )

    def test_p_sample(self, pair):
        ours, theirs = pair
        x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 1, 2, 8, 8))
        t = jnp.array([4, 4])
        key = jax.random.PRNGKey(3)
        _close(ours.p_sample(x, t, key=key), theirs.p_sample(x, t, key=key))

    def test_full_sampling_loop_parity(self, pair, monkeypatch, ref):
        """Our fused scan vs the reference's host pjit loop, same key.

        The reference loop can only run on ONE device here: it shards the
        batch AND the (2,)-shaped PRNG key over every local device
        (gaussian_diffusion.py:290-298), which fails outright for >2
        devices. We pin its device view to 1 and compare our sharded
        sampler's output against it — the math and key chain must agree to
        well below the 1e-4 MSE target.
        """
        ours, theirs = pair
        key = jax.random.PRNGKey(42)
        got = ours.p_sample_loop((8, 1, 2, 8, 8), key=key)  # sharded, 8 devices

        import numpy as _np

        all_devices = jax.devices()
        monkeypatch.setattr(jax, "local_device_count", lambda *a, **k: 1)
        monkeypatch.setattr(jax, "local_devices", lambda *a, **k: all_devices[:1])
        monkeypatch.setattr(
            ref.gd.mesh_utils,
            "create_device_mesh",
            lambda shape, **k: _np.asarray(all_devices[:1]).reshape(shape),
        )
        want = theirs.p_sample_loop((8, 1, 2, 8, 8), key=key)
        # Pull both to host before comparing (they live on different device sets).
        mse = float(np.mean((np.asarray(got) - np.asarray(want)) ** 2))
        assert mse <= 1e-8, mse  # far below the 1e-4 target
