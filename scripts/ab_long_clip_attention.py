"""A/B long-clip (f > 64) temporal attention strategies on hardware.

Candidates:
  A. blockwise self-attention kernel (ops/temporal_attention._forward_blockwise)
     — projections recomputed per head/block inside the kernel.
  B. cross-kernel composition — K/V projected ONCE by XLA (packed, MXU-
     efficient), then ops/cross_attention fuses q-proj + online-softmax
     attention + out-proj + residual.
  C. XLA composite (materializes the f x f panels in HBM).

Times fwd and fwd+bwd for each at long-clip shapes; parity-checks B vs C.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_nnx_tpu.ops import cross_attention as xa
from video_diffusion_nnx_tpu.ops import temporal_attention as ta
from scripts.check_blockwise_hw import mk, timeit


def self_attn_via_cross(x, wqkv, bqkv, wo, bo, heads, dim):
    hd = heads * dim
    kv = jnp.einsum("bsfc,ck->bsfk", x, wqkv[:, hd:].astype(x.dtype)) + bqkv[hd:].astype(x.dtype)
    return xa.fused_cross_attention_block(
        x, kv[..., :hd], kv[..., hd:], wqkv[:, :hd], bqkv[:hd], wo, bo, heads, dim
    )


def run(b, s, f, c, heads, dim, dtype=jnp.bfloat16):
    wqkv, bqkv, wo, bo = mk(c, heads, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, f, c)).astype(dtype)

    fns = {
        "A blockwise": lambda x: ta.fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads, dim),
        "B cross    ": lambda x: self_attn_via_cross(x, wqkv, bqkv, wo, bo, heads, dim),
        "C composite": lambda x: ta._composite_xla(x, wqkv, bqkv, wo, bo, heads, dim),
    }
    # Parity of B against C first.
    got = np.asarray(jax.jit(fns["B cross    "])(x), np.float32)
    want = np.asarray(jax.jit(fns["C composite"])(x), np.float32)
    rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"shape b={b} s={s} f={f} c={c}: B-vs-C fwd rel err {rel:.2e}")
    assert rel < 0.05, rel

    for name, fn in fns.items():
        t_f = timeit(jax.jit(fn), x)
        grad_fn = jax.jit(jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2)))
        t_g = timeit(grad_fn, x)
        print(f"  {name}: fwd {t_f*1e3:7.2f} ms | fwd+bwd {t_g*1e3:7.2f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices(), file=sys.stderr)
    run(1, 1024, 128, 32, 8, 32)
    run(1, 256, 256, 64, 8, 32)
    print("OK")
