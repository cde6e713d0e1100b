"""Tests for the Unet3D denoiser.

Coverage model: reference test_unet3d.py:1-60 (forward shapes with/without
conditioning) — rebuilt, not ported — plus new checks: state-tree structure
(checkpoint parity contract), jit-compilability, CFG behavior, and
determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from video_diffusion_nnx_tpu.models import Unet3D

DIM = 16
B, C, F, H, W = 2, 3, 4, 16, 16


@pytest.fixture(scope="module")
def unet():
    return Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C)


@pytest.fixture(scope="module")
def video():
    return jax.random.normal(jax.random.PRNGKey(0), (B, C, F, H, W))


@pytest.fixture(scope="module")
def times():
    return jnp.array([1.0, 7.0])


class TestForward:
    def test_output_shape_channels_last(self, unet, video, times):
        out = unet(video, times)
        assert out.shape == (B, F, H, W, C)

    def test_forward_deterministic(self, unet, video, times):
        a = unet(video, times)
        b = unet(video, times)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_forward_jittable(self, unet, video, times):
        graphdef, state = nnx.split(unet)

        @jax.jit
        def fwd(state, x, t):
            return nnx.merge(graphdef, state)(x, t)

        out = fwd(state, video, times)
        assert out.shape == (B, F, H, W, C)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(unet(video, times)), atol=1e-4
        )

    def test_custom_out_dim(self):
        net = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, out_dim=1)
        x = jnp.zeros((1, C, 2, 16, 16))
        assert net(x, jnp.array([0.0])).shape == (1, 2, 16, 16, 1)

    def test_focus_present_prob_one(self, unet, video, times):
        out = unet(video, times, prob_focus_present=1.0)
        assert out.shape == (B, F, H, W, C)

    def test_requires_cond_when_configured(self):
        net = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, cond_dim=8)
        x = jnp.zeros((1, C, 2, 16, 16))
        with pytest.raises(AssertionError):
            net(x, jnp.array([0.0]))

    def test_conditioned_forward(self):
        net = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, cond_dim=8)
        x = jnp.zeros((1, C, 2, 16, 16))
        cond = jnp.ones((1, 8))
        out = net(x, jnp.array([0.0]), cond=cond)
        assert out.shape == (1, 2, 16, 16, C)

    def test_odd_init_kernel_size_required(self):
        with pytest.raises(AssertionError):
            Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), init_kernel_size=4)


class TestCFG:
    def test_cond_scale_one_single_pass(self, unet, video, times):
        got = unet.forward_with_cond_scale(video, times, cond_scale=1.0)
        want = unet(video, times)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_no_cond_model_ignores_scale(self, unet, video, times):
        a = unet.forward_with_cond_scale(video, times, cond_scale=3.0)
        b = unet(video, times)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_cfg_combination(self):
        """With conditioning: out = null + (cond - null) * scale."""
        net = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, cond_dim=8)
        x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (1, C, 2, 16, 16))
        t = jnp.array([3.0])
        cond = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
        cond_logits = net(x, t, cond=cond, null_cond_prob=0.0)
        null_logits = net(x, t, cond=cond, null_cond_prob=1.0)
        want = null_logits + (cond_logits - null_logits) * 2.0
        got = net.forward_with_cond_scale(x, t, cond=cond, cond_scale=2.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_batched_cfg_bitwise_matches_two_pass(self):
        """The single 2b-batched CFG forward == two b-sized passes, bitwise.

        Per-sample math is batch-independent (convs, norms, softmaxes all
        reduce within a sample), so batching the null and cond passes
        (SURVEY §7 hard part #4) must not change a single bit.
        """
        net = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, cond_dim=8)
        x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (3, C, 2, 16, 16))
        t = jnp.array([3.0, 1.0, 7.0])
        cond = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
        scale = 1.7
        cond_logits = net(x, t, cond=cond, null_cond_prob=0.0)
        null_logits = net(x, t, cond=cond, null_cond_prob=1.0)
        want = null_logits + (cond_logits - null_logits) * scale
        got = net.forward_with_cond_scale(x, t, cond=cond, cond_scale=scale)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_batched_cfg_positional_cond(self):
        """cond may be passed positionally (reference call style)."""
        net = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, cond_dim=8)
        x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (1, C, 2, 16, 16))
        t = jnp.array([3.0])
        cond = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
        got = net.forward_with_cond_scale(x, t, cond, cond_scale=2.0)
        want = net.forward_with_cond_scale(x, t, cond=cond, cond_scale=2.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_batched_cfg_shares_focus_mask(self):
        """With prob_focus_present active and a key, the conditioned and null
        halves must see the SAME focus mask (a (2b,) draw would give the two
        halves different masks and break parity with a same-key two-pass).
        Fixed mode: in compat mode PreNorm drops the mask before attention,
        which would make any mask mismatch invisible to this test."""
        net = Unet3D(
            dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, cond_dim=8,
            reference_compat=False,
        )
        x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (4, C, 2, 16, 16))
        t = jnp.array([3.0, 1.0, 7.0, 2.0])
        cond = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        key = jax.random.PRNGKey(42)
        scale = 2.0
        cond_logits = net(x, t, cond=cond, null_cond_prob=0.0,
                          prob_focus_present=0.5, key=key)
        null_logits = net(x, t, cond=cond, null_cond_prob=1.0,
                          prob_focus_present=0.5, key=key)
        want = null_logits + (cond_logits - null_logits) * scale
        got = net.forward_with_cond_scale(
            x, t, cond=cond, cond_scale=scale, prob_focus_present=0.5, key=key
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestStateTree:
    """The nnx state tree is the checkpoint format — its paths are a contract
    (reference unet3d.py attribute names + nested-list structure)."""

    def test_top_level_paths(self, unet):
        _, state = nnx.split(unet)
        roots = {p[0] for p, _ in state.flat_state()}
        assert {
            "time_rel_pos_bias",
            "init_conv",
            "init_temporal_attn",
            "time_mlp",
            "downs",
            "mid_block1",
            "mid_spatial_attn",
            "mid_temporal_attn",
            "mid_block2",
            "ups",
            "final_conv",
        } <= roots

    def test_downs_nested_list_paths(self, unet):
        _, state = nnx.split(unet)
        flat = dict(state.flat_state())
        # downs[0][0] is a ResnetBlock: its block_1.proj conv kernel.
        key = ("downs", 0, 0, "block_1", "proj", "kernel")
        assert key in flat, sorted(k for k in flat if k[:2] == ("downs", 0))[:5]
        assert flat[key][...].shape == (1, 3, 3, DIM, DIM)

    def test_temporal_attn_wrapper_paths(self, unet):
        _, state = nnx.split(unet)
        flat = dict(state.flat_state())
        # Residual(PreNorm(EinopsToAndFrom(MultiheadAttention))) nesting:
        # init_temporal_attn.fn(.PreNorm).fn(.EinopsToAndFrom).fn(.MHA).q
        key = ("init_temporal_attn", "fn", "fn", "fn", "q", "kernel")
        assert key in flat
        assert flat[key][...].shape == (DIM, 8, 32)

    def test_prenorm_layernorm_materialized(self, unet):
        """Inert-but-present LayerNorm params (reference modules.py:144)."""
        _, state = nnx.split(unet)
        flat = dict(state.flat_state())
        assert ("init_temporal_attn", "fn", "norm", "scale") in flat

    def test_time_mlp_sequential_paths(self, unet):
        _, state = nnx.split(unet)
        flat = dict(state.flat_state())
        assert ("time_mlp", "layers", 1, "kernel") in flat
        assert flat[("time_mlp", "layers", 1, "kernel")][...].shape == (DIM, 4 * DIM)
        assert ("time_mlp", "layers", 3, "kernel") in flat

    def test_final_conv_paths(self, unet):
        _, state = nnx.split(unet)
        flat = dict(state.flat_state())
        assert ("final_conv", "layers", 0, "block_1", "proj", "kernel") in flat
        assert ("final_conv", "layers", 1, "kernel") in flat
        assert flat[("final_conv", "layers", 1, "kernel")][...].shape == (1, DIM, C)

    def test_init_seed_reproducible(self):
        a = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C)
        b = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C)
        _, sa = nnx.split(a)
        _, sb = nnx.split(b)
        fa, fb = dict(sa.flat_state()), dict(sb.flat_state())
        assert fa.keys() == fb.keys()
        for k in fa:
            np.testing.assert_array_equal(np.asarray(fa[k][...]), np.asarray(fb[k][...]))


class TestReferenceCompatSwitch:
    def test_fixed_mode_differs_from_compat(self, video, times):
        compat = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C)
        fixed = Unet3D(
            dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, reference_compat=False
        )
        out_c = compat(video, times)
        out_f = fixed(video, times)
        # Same params, different math (prenorm applied, pos_bias used).
        assert out_c.shape == out_f.shape
        assert not np.allclose(np.asarray(out_c), np.asarray(out_f), atol=1e-3)

    def test_fixed_mode_jittable(self, video, times):
        fixed = Unet3D(
            dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, reference_compat=False
        )
        graphdef, state = nnx.split(fixed)

        @jax.jit
        def fwd(state, x, t):
            return nnx.merge(graphdef, state)(x, t)

        assert fwd(state, video, times).shape == (B, F, H, W, C)


class TestRemat:
    def test_remat_forward_matches(self, video, times):
        base = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C)
        rem = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, remat_blocks=True)
        np.testing.assert_allclose(
            np.asarray(base(video, times)), np.asarray(rem(video, times)), atol=1e-5
        )

    def test_remat_gradients_match(self, video, times):
        def grads_of(net):
            graphdef, state = nnx.split(net)

            def loss(state):
                return jnp.sum(nnx.merge(graphdef, state)(video, times) ** 2)

            return jax.grad(loss)(state)

        base = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C)
        rem = Unet3D(dim=DIM, rngs=nnx.Rngs(0), dim_mults=(1, 2), channels=C, remat_blocks=True)
        ga = jax.tree_util.tree_leaves(grads_of(base))
        gb = jax.tree_util.tree_leaves(grads_of(rem))
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
