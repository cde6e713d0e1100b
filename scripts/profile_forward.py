"""Component-level timing of the Unet3D forward on real hardware.

Usage: /opt/venv/bin/python scripts/profile_forward.py
Times full-forward variants to locate the bottleneck (attention vs convs vs
dtype), plus the fused Pallas temporal-attention kernel in isolation.
"""

import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

sys.path.insert(0, ".")

from video_diffusion_nnx_tpu.models import MultiheadAttention, Unet3D
from video_diffusion_nnx_tpu.ops import temporal_attention as ta

B, C, F, S = 8, 1, 16, 64


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), out)  # force
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), out)
    return (time.perf_counter() - t0) / n


def forward_time(tag, **kwargs):
    unet = Unet3D(dim=32, rngs=nnx.Rngs(0), dim_mults=(1, 2, 4, 8), channels=C, **kwargs)
    graphdef, state = nnx.split(unet)

    @jax.jit
    def fwd(state, x, t):
        return nnx.merge(graphdef, state)(x, t)

    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, F, S, S))
    t = jnp.zeros((B,))
    dt = timeit(fwd, state, x, t)
    print(f"{tag:50s} {dt*1000:8.2f} ms")
    return dt


def main():
    print("devices:", jax.devices())
    forward_time("baseline f32")
    forward_time("bf16", compute_dtype="bfloat16")
    forward_time("no spatial linear attn", use_sparse_linear_attn=False)
    forward_time("fused temporal attention", use_fused_attention=True)
    forward_time("fused + bf16", use_fused_attention=True, compute_dtype="bfloat16")
    forward_time(
        "fused + no spatial attn", use_fused_attention=True, use_sparse_linear_attn=False
    )
    forward_time(
        "fused temporal + fused spatial",
        use_fused_attention=True,
        use_fused_spatial_attention=True,
    )
    forward_time(
        "all fused + bf16",
        use_fused_attention=True,
        use_fused_spatial_attention=True,
        compute_dtype="bfloat16",
    )

    # Isolated fused kernel vs composite at level-0 shape.
    c, heads, d = 32, 8, 32
    mha = MultiheadAttention(in_features=c, dim=d, num_heads=heads, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S * S, F, c))
    wqkv, bqkv, wo, bo = ta.pack_mha_weights(mha)

    fused = jax.jit(lambda x: ta.fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads, d))
    comp = jax.jit(lambda x: ta._composite_xla(x, wqkv, bqkv, wo, bo, heads, d))
    print(f"{'L0 temporal attn composite':50s} {timeit(comp, x)*1000:8.2f} ms")
    print(f"{'L0 temporal attn fused pallas':50s} {timeit(fused, x)*1000:8.2f} ms")


if __name__ == "__main__":
    main()
