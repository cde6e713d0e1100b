"""Micro-benchmarks for the training hot path on the real TPU.

Times the fused attention kernels (fwd and fwd+bwd) against the XLA
composite at the v2_2 train shape, then the full train step under each
attention configuration — the numbers that decide which paths the
production config enables.

Usage: /opt/venv/bin/python scripts/profile_train_step.py [--quick]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import optax
from flax import nnx

sys.path.insert(0, ".")

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import MultiheadAttention, SpatialLinearAttention, Unet3D
from video_diffusion_nnx_tpu.ops import spatial_linear_attention as sla_ops
from video_diffusion_nnx_tpu.ops import temporal_attention as ta


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.mean(a.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.mean(a.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / n * 1000.0


def bench_temporal(dtype):
    # v2_2 train shape at L0: batch 4, 64x64 spatial tokens, 10 frames, c=32.
    c, heads, dim = 32, 8, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4096, 10, c)).astype(dtype)
    mha = MultiheadAttention(in_features=c, dim=dim, num_heads=heads, rngs=nnx.Rngs(0))
    wqkv, bqkv, wo, bo = ta.pack_mha_weights(mha)

    def fused(x):
        return ta.fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads, dim)

    def comp(x):
        return ta._composite_xla(x, wqkv, bqkv, wo, bo, heads, dim)

    def loss_of(f):
        return jax.jit(jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32) ** 2)))

    print(f"[temporal L0 {dtype}] fwd fused   {timeit(jax.jit(fused), x):7.2f} ms")
    print(f"[temporal L0 {dtype}] fwd comp    {timeit(jax.jit(comp), x):7.2f} ms")
    print(f"[temporal L0 {dtype}] f+b fused   {timeit(loss_of(fused), x):7.2f} ms")
    print(f"[temporal L0 {dtype}] f+b comp    {timeit(loss_of(comp), x):7.2f} ms")


def bench_spatial(dtype):
    c, heads, dim = 32, 8, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 64, 64, c)).astype(dtype)
    sla = SpatialLinearAttention(c, heads=heads, D=dim, rngs=nnx.Rngs(0))
    wqkv, wo = sla_ops.pack_sla_weights(sla)

    def fused(x):
        return sla_ops.fused_spatial_linear_attention_block(x, wqkv, wo, heads, dim, 1.0)

    def comp(x):
        return sla_ops._composite_xla(x, wqkv, wo, heads, dim, 1.0)

    def loss_of(f):
        return jax.jit(jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32) ** 2)))

    print(f"[spatial L0 {dtype}] fwd fused   {timeit(jax.jit(fused), x):7.2f} ms")
    print(f"[spatial L0 {dtype}] fwd comp    {timeit(jax.jit(comp), x):7.2f} ms")
    print(f"[spatial L0 {dtype}] f+b fused   {timeit(loss_of(fused), x):7.2f} ms")
    print(f"[spatial L0 {dtype}] f+b comp    {timeit(loss_of(comp), x):7.2f} ms")


def bench_train_step(fused_temporal, fused_spatial, tag, dim=32, batch=4):
    unet = Unet3D(
        dim=dim,
        rngs=nnx.Rngs(0),
        dim_mults=(1, 2, 4, 8),
        channels=1,
        compute_dtype="bfloat16",
        use_fused_attention=fused_temporal,
        use_fused_spatial_attention=fused_spatial,
    )
    diff = GaussianDiffusion(
        unet, image_size=64, num_frames=10, channels=1, timesteps=1000, loss_type="l2"
    )
    graphdef, params = nnx.split(diff)
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    @jax.jit
    def step(params, opt, ema, x, key):
        def loss_fn(p):
            return nnx.merge(graphdef, p)(x, key=key)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(lambda e, p: 0.9999 * e + 0.0001 * p, ema, params)
        return params, opt, ema, loss

    x = jnp.zeros((batch, 1, 10, 64, 64), jnp.float32)
    key = jax.random.PRNGKey(0)
    params, opt, ema, loss = step(params, opt, ema, x, key)
    float(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt, ema, loss = step(params, opt, ema, x, key)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"[train dim{dim} b{batch} bf16 {tag}] {dt * 1000:.1f} ms/step")
    return dt


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    quick = "--quick" in sys.argv
    bench_temporal(jnp.bfloat16)
    bench_spatial(jnp.bfloat16)
    if not quick:
        bench_train_step(False, False, "composite")
        bench_train_step(True, False, "fused-temporal")
        bench_train_step(True, True, "fused-both")
    if "--v2_3" in sys.argv:
        # Production-scale recipe (config_v2_3: dim 128) — the MXU-bound
        # regime where MFU, not dispatch, decides throughput.
        bench_train_step(False, False, "composite", dim=128)
        bench_train_step(True, True, "fused-both", dim=128)


if __name__ == "__main__":
    main()
