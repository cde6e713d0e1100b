"""On-hardware validation of the blockwise temporal-attention kernels.

Parity (fwd + grads) vs the XLA composite at f in {128, 256}, plus timing
of fused vs composite fwd and fwd+bwd at a long-clip train-ish shape.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_nnx_tpu.ops import temporal_attention as ta


def mk(c, heads, dim, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    wqkv = jax.random.normal(k1, (c, 3 * heads * dim)) * 0.05
    bqkv = jax.random.normal(k2, (3 * heads * dim,)) * 0.01
    wo = jax.random.normal(k3, (heads * dim, c)) * 0.05
    bo = jax.random.normal(k4, (c,)) * 0.01
    return wqkv, bqkv, wo, bo


def parity(b, s, f, c, heads, dim, dtype):
    wqkv, bqkv, wo, bo = mk(c, heads, dim)
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, s, f, c))).astype(dtype)
    route = ta._route(x, f)
    assert route == "blockwise", (route, f)

    got = jax.jit(lambda x: ta.fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads, dim))(x)
    want = jax.jit(lambda x: ta._composite_xla(x, wqkv, bqkv, wo, bo, heads, dim))(x)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-9
    print(f"fwd  f={f} c={c} {dtype}: max abs err {err:.2e} (rel {err/ref:.2e})")
    tol = 0.08 if dtype == jnp.bfloat16 else 1e-4
    assert err / ref < tol, (err, ref)

    def loss_fused(x, wqkv, bqkv, wo, bo):
        return jnp.sum(ta.fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads, dim).astype(jnp.float32) ** 2)

    def loss_ref(x, wqkv, bqkv, wo, bo):
        return jnp.sum(ta._composite_xla(x, wqkv, bqkv, wo, bo, heads, dim).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))(x, wqkv, bqkv, wo, bo)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(x, wqkv, bqkv, wo, bo)
    for name, a, bb in zip(("dx", "dwqkv", "dbqkv", "dwo", "dbo"), gf, gr):
        a32, b32 = np.asarray(a, np.float32), np.asarray(bb, np.float32)
        scale = np.max(np.abs(b32)) + 1e-9
        rel = np.max(np.abs(a32 - b32)) / scale
        print(f"  grad {name}: rel {rel:.2e}")
        # f32 tolerance is set by TPU matmul precision, not the kernel:
        # measured on this chip, the default-precision composite VJP is
        # itself 3.5e-3 from a highest-precision reference and the fused
        # kernel is equidistant (3.46e-3) — interpret-mode tests pin the
        # exact math at 2e-4.
        assert rel < (0.08 if dtype == jnp.bfloat16 else 6e-3), (name, rel)


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / n


def bench(b, s, f, c, heads, dim, dtype=jnp.bfloat16):
    wqkv, bqkv, wo, bo = mk(c, heads, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, f, c)).astype(dtype)

    fused_f = jax.jit(lambda x: ta.fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads, dim))
    comp_f = jax.jit(lambda x: ta._composite_xla(x, wqkv, bqkv, wo, bo, heads, dim))
    t_fused = timeit(fused_f, x)
    t_comp = timeit(comp_f, x)

    fused_g = jax.jit(jax.grad(lambda x: jnp.sum(ta.fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads, dim).astype(jnp.float32) ** 2)))
    comp_g = jax.jit(jax.grad(lambda x: jnp.sum(ta._composite_xla(x, wqkv, bqkv, wo, bo, heads, dim).astype(jnp.float32) ** 2)))
    t_fused_g = timeit(fused_g, x)
    t_comp_g = timeit(comp_g, x)
    print(
        f"bench b={b} s={s} f={f} c={c}: fwd fused {t_fused*1e3:.2f} ms vs comp {t_comp*1e3:.2f} ms | "
        f"fwd+bwd fused {t_fused_g*1e3:.2f} ms vs comp {t_comp_g*1e3:.2f} ms"
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    parity(1, 16, 128, 32, 8, 32, jnp.float32)
    parity(1, 16, 128, 32, 8, 32, jnp.bfloat16)
    parity(1, 8, 256, 64, 8, 32, jnp.bfloat16)
    parity(1, 4, 200, 32, 8, 32, jnp.bfloat16)  # ragged: f_pad=200->200? 200%8=0, kb=8
    # Long-clip L0-ish shape: batch 1, 32x32 tokens, 128 frames, c=32.
    bench(1, 1024, 128, 32, 8, 32)
    bench(1, 256, 256, 64, 8, 32)
    print("OK")
