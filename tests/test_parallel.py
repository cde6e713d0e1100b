"""Tests for the parallelism layer (meshes + sharding rules)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from video_diffusion_nnx_tpu.parallel import (
    data_model_mesh,
    data_parallel_mesh,
    make_mesh,
    optimizer_partition_specs,
    param_partition_spec,
    params_partition_specs,
)


class TestMesh:
    def test_data_parallel_mesh(self):
        mesh = data_parallel_mesh(8)
        assert dict(mesh.shape) == {"data": 8}

    def test_data_model_mesh(self):
        mesh = data_model_mesh(8, 2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}

    def test_data_model_mesh_divisibility(self):
        with pytest.raises(AssertionError):
            data_model_mesh(8, 3)

    def test_make_mesh_too_many_devices(self):
        with pytest.raises(ValueError):
            make_mesh((16,), ("x",))


class TestParamSpecs:
    def test_kernel_last_dim_sharded(self):
        leaf = jax.ShapeDtypeStruct((3, 3, 8, 16), jnp.float32)
        spec = param_partition_spec(("downs", "0", "proj", "kernel"), leaf, "model", 2)
        assert spec == P(None, None, None, "model")

    def test_bias_sharded(self):
        leaf = jax.ShapeDtypeStruct((16,), jnp.float32)
        spec = param_partition_spec(("proj", "bias"), leaf, "model", 2)
        assert spec == P("model")

    def test_scale_replicated(self):
        leaf = jax.ShapeDtypeStruct((16,), jnp.float32)
        assert param_partition_spec(("norm", "scale"), leaf, "model", 2) == P(None)

    def test_scalar_replicated(self):
        leaf = jax.ShapeDtypeStruct((), jnp.float32)
        assert param_partition_spec(("anything", "kernel"), leaf, "model", 2) == P()

    def test_indivisible_last_dim_replicated(self):
        """Safety improvement over the reference: odd dims don't crash."""
        leaf = jax.ShapeDtypeStruct((4, 7), jnp.float32)
        assert param_partition_spec(("x", "kernel"), leaf, "model", 2) == P(None, None)

    def test_tree_mapping(self):
        params = {
            "layer": {
                "kernel": jax.ShapeDtypeStruct((4, 8), jnp.float32),
                "bias": jax.ShapeDtypeStruct((8,), jnp.float32),
                "scale": jax.ShapeDtypeStruct((8,), jnp.float32),
            }
        }
        specs = params_partition_specs(params, "model", 2)
        assert specs["layer"]["kernel"] == P(None, "model")
        assert specs["layer"]["bias"] == P("model")
        assert specs["layer"]["scale"] == P(None)


class TestOptimizerSpecs:
    def test_adam_state_mirrors_params(self):
        params = {"w": jnp.zeros((4, 8)), "b": jnp.zeros((8,))}
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        param_specs = {"w": P(None, "model"), "b": P("model")}
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x,
            opt_state,
        )
        specs = optimizer_partition_specs(param_specs, abstract)
        adam = specs[0]
        assert adam.mu == {"w": P(None, "model"), "b": P("model")}
        assert adam.nu == {"w": P(None, "model"), "b": P("model")}
        assert adam.count == P()
        # Trailing schedule states replicate.
        for other in specs[1:]:
            assert other == P()


class TestShardedExecution:
    def test_tp_matmul_runs_sharded(self):
        """A last-dim-sharded kernel executes correctly over the mesh."""
        mesh = data_model_mesh(8, 2)
        from jax.sharding import NamedSharding

        w = jax.device_put(
            jnp.arange(4 * 8, dtype=jnp.float32).reshape(4, 8),
            NamedSharding(mesh, P(None, "model")),
        )
        x = jax.device_put(
            jnp.ones((8, 4), jnp.float32), NamedSharding(mesh, P("data", None))
        )

        @jax.jit
        def f(x, w):
            return x @ w

        out = f(x, w)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.ones((8, 4)) @ w), atol=1e-5
        )


class TestSequenceParallelAttention:
    def test_matches_unsharded_reference(self):
        """Frame-sharded attention over a 'seq' axis == single-device MHA."""
        from flax import nnx

        from video_diffusion_nnx_tpu.models import MultiheadAttention
        from video_diffusion_nnx_tpu.ops.temporal_attention import pack_mha_weights
        from video_diffusion_nnx_tpu.parallel.sequence import (
            sequence_parallel_temporal_attention,
        )

        heads, dim, c = 2, 4, 8
        mha = MultiheadAttention(in_features=c, dim=dim, num_heads=heads, rngs=nnx.Rngs(0))
        wqkv, bqkv, wo, bo = pack_mha_weights(mha)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, c))  # 16 frames

        mesh = make_mesh((8,), ("seq",))
        got = sequence_parallel_temporal_attention(
            x, wqkv, bqkv, wo, bo, heads, dim, mesh=mesh
        )
        want = x + mha(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_pallas_kernel_inside_shard(self):
        """The per-shard attention runs through the fused rectangular Pallas
        kernel (interpret mode) inside shard_map on 8 devices and still
        matches the single-device reference (VERDICT r2 task 3)."""
        from flax import nnx

        from video_diffusion_nnx_tpu.models import MultiheadAttention
        from video_diffusion_nnx_tpu.ops import cross_attention as xa
        from video_diffusion_nnx_tpu.ops.temporal_attention import pack_mha_weights
        from video_diffusion_nnx_tpu.parallel.sequence import (
            sequence_parallel_temporal_attention,
        )

        heads, dim, c = 2, 4, 8
        mha = MultiheadAttention(in_features=c, dim=dim, num_heads=heads, rngs=nnx.Rngs(0))
        wqkv, bqkv, wo, bo = pack_mha_weights(mha)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, c))

        mesh = make_mesh((8,), ("seq",))
        xa.FORCE_INTERPRET = True
        try:
            assert xa._route(x[:, :, :2], x) == "pallas"
            got = sequence_parallel_temporal_attention(
                x, wqkv, bqkv, wo, bo, heads, dim, mesh=mesh
            )
        finally:
            xa.FORCE_INTERPRET = False
        want = x + mha(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_jit_with_sharded_input(self):
        from flax import nnx

        from video_diffusion_nnx_tpu.models import MultiheadAttention
        from video_diffusion_nnx_tpu.ops.temporal_attention import pack_mha_weights
        from video_diffusion_nnx_tpu.parallel.sequence import (
            sequence_parallel_temporal_attention,
        )

        heads, dim, c = 2, 4, 8
        mha = MultiheadAttention(in_features=c, dim=dim, num_heads=heads, rngs=nnx.Rngs(0))
        wqkv, bqkv, wo, bo = pack_mha_weights(mha)
        mesh = make_mesh((8,), ("seq",))
        from jax.sharding import NamedSharding

        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, c)),
            NamedSharding(mesh, P(None, None, "seq", None)),
        )

        @jax.jit
        def f(x):
            return sequence_parallel_temporal_attention(
                x, wqkv, bqkv, wo, bo, heads, dim, mesh=mesh
            )

        out = f(x)
        assert out.shape == x.shape
        # Output stays frame-sharded.
        assert "seq" in str(out.sharding)
