"""Fused temporal-attention block as a Pallas TPU kernel.

Replaces the composite XLA path for the Unet3D temporal attention block
(``Residual(PreNorm(EinopsToAndFrom('b f h w c', 'b (h w) f c', MHA)))`` in
reference-compat mode, reference unet3d.py:86-96 + modules.py:247-326):

    out = x + out_proj( softmax(q(x) @ k(x)^T / sqrt(D)) @ v(x) )

Why fuse
--------
The unfused path materializes q, k, v (each ``tokens x heads x D`` — at the
U-Net's top level that is ~0.5 GB in f32), the ``f x f`` attention matrix
(~0.25 GB), and the attention output, all in HBM. The arithmetic is trivial
(f <= 32 frames), so the block is purely HBM-bandwidth-bound. This kernel
streams a tile of spatial tokens into VMEM, computes QKV projection ->
attention -> output projection -> residual entirely on-chip, and writes only
the final residual sum back: HBM traffic drops from ~9 tensors to 2 (read x,
write out).

Kernel shape strategy
---------------------
* QKV and output projections are single 2-D matmuls per tile
  (``(BT*F, C) @ (C, 3*H*D)`` and ``(BT*F, H*D) @ (H*D, C)``) — proper MXU
  shapes with f32 accumulation.
* The attention core is evaluated on the VPU via a static unroll over the
  ``F`` query frames (broadcast-multiply-reduce), avoiding batched
  ``dot_general`` (small ``F x D`` matmuls would waste the 128x128 MXU and
  batched dots are fragile in Mosaic). Its FLOP count is negligible next to
  the projections.
* Softmax is computed in f32 with the usual max-subtraction.

The public wrapper handles tiling (largest power-of-two tile that divides
the token count within a VMEM budget), falls back to pure-XLA composite math
when shapes are unsupported, and defines a custom VJP whose backward pass
recomputes through the XLA composite (correct gradients; the fusion win is
inference/sampling, which is gradient-free).
"""

from __future__ import annotations

import functools
import math


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max frames supported by the static unroll (reference max_distance=32 and
# the rel-pos bias docstring note that more frames are unrealistic).
MAX_FRAMES = 32
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024

# Test hook: run the Pallas kernel in interpreter mode on CPU so the kernel
# math itself is exercised without TPU hardware.
FORCE_INTERPRET = False

# Token-tile envelope: largest bt*f per program, by channel width.
# Empirically VMEM-validated on this toolchain with the per-head output
# accumulation below: narrow levels (c<=64, where lane padding dominates)
# fit 2048 tokens*frames (~5% faster than 1024; 4096 blows the 16 MB VMEM
# stack); wide levels (c=128..256) only fit 1024 (the y/x buffers scale
# with c).
_ENVELOPE_NARROW = 2048
_ENVELOPE_WIDE = 1024


def _fused_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, out_ref, *, f, heads, dim):
    """Mosaic-lowerable kernel body.

    Constraints honored (verified against this Mosaic version): no integer
    indexing on >2-D arrays (gathers), no reshapes that split the lane
    (last) dimension. Heads are therefore peeled by *lane slicing* the
    packed QKV matmul output, and the per-head attention runs as batched
    ``dot_general`` over the token tile (supported).
    """
    bt = x_ref.shape[0]
    c = x_ref.shape[-1]
    hd = heads * dim
    x = x_ref[...]  # (BT, F, C)

    xf = x.reshape(bt * f, c).astype(jnp.float32)
    qkv = jnp.dot(xf, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[0]  # (BT*F, 3*H*D), packed q|k|v then per-head
    scale = 1.0 / math.sqrt(dim)

    # Accumulate the output projection per head (y += o_h @ wo_h) instead of
    # concatenating per-head outputs — holding every head's attention output
    # live simultaneously is what blows the VMEM stack at larger tiles.
    y = None
    for h in range(heads):
        # Lane slices (static) for this head's q/k/v columns.
        qh = (qkv[:, h * dim : (h + 1) * dim] * scale).reshape(bt, f, dim)
        kh = qkv[:, hd + h * dim : hd + (h + 1) * dim].reshape(bt, f, dim)
        vh = qkv[:, 2 * hd + h * dim : 2 * hd + (h + 1) * dim].reshape(bt, f, dim)

        sim = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BT, F, F)
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)

        oh = jax.lax.dot_general(
            attn, vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BT, F, D)
        contrib = jnp.dot(
            oh.reshape(bt * f, dim),
            wo_ref[h * dim : (h + 1) * dim, :],
            preferred_element_type=jnp.float32,
        )  # (BT*F, C)
        y = contrib if y is None else y + contrib

    y = y + bo_ref[0]
    out_ref[...] = x + y.reshape(bt, f, c).astype(x.dtype)


def _choose_tile(tokens: int, f: int, c: int, heads: int, dim: int) -> int:
    # Mosaic pads the lane (last) dim to 128 and keeps every unrolled head's
    # q/k/v slices live simultaneously, so the binding constraint is
    # bt * f * max(c, 128) lanes * heads-unroll staying inside VMEM.
    envelope = _ENVELOPE_NARROW if c <= 64 else _ENVELOPE_WIDE
    bt = max(1, min(512, envelope // max(f, 1)))
    bt = 1 << (bt.bit_length() - 1)  # floor to power of two
    while bt > 1 and tokens % bt != 0:
        bt //= 2
    return bt


def _composite_xla(x, wqkv, bqkv, wo, bo, heads: int, dim: int):
    """Reference math in plain XLA (fallback + custom-VJP backward).

    Output dtype is exactly ``x.dtype`` — the custom VJP requires forward
    (Pallas) and backward-recompute paths to agree on JAX types.
    """
    b, s, f, c = x.shape
    scale = 1.0 / math.sqrt(dim)
    qkv = (
        jnp.einsum("bsfc,ck->bsfk", x, wqkv.astype(x.dtype)) + bqkv.astype(x.dtype)
    )
    qkv = qkv.reshape(b, s, f, 3, heads, dim)
    q, k, v = qkv[..., 0, :, :] * scale, qkv[..., 1, :, :], qkv[..., 2, :, :]
    sim = jnp.einsum("bsihd,bsjhd->bshij", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1)
    o = jnp.einsum("bshij,bsjhd->bsihd", attn.astype(x.dtype), v)
    o = o.reshape(b, s, f, heads * dim)
    y = jnp.einsum("bsfk,kc->bsfc", o, wo.astype(x.dtype)) + bo.astype(x.dtype)
    return x + y.astype(x.dtype)


def _supported(x, f: int) -> bool:
    if FORCE_INTERPRET:
        return f <= MAX_FRAMES and x.ndim == 4
    return jax.default_backend() == "tpu" and f <= MAX_FRAMES and x.ndim == 4


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads: int, dim: int):
    """``x + MHA(x)`` over the second-to-last axis; x is ``(b, s, f, c)``.

    ``wqkv``: ``(c, 3*heads*dim)`` (concatenated q|k|v kernels),
    ``bqkv``: ``(3*heads*dim,)``, ``wo``: ``(heads*dim, c)``, ``bo``: ``(c,)``.
    """
    return _forward(x, wqkv, bqkv, wo, bo, heads, dim)


def _forward(x, wqkv, bqkv, wo, bo, heads, dim):
    b, s, f, c = x.shape
    if not _supported(x, f):
        return _composite_xla(x, wqkv, bqkv, wo, bo, heads, dim)

    tokens = b * s
    bt = _choose_tile(tokens, f, c, heads, dim)
    xt = x.reshape(tokens, f, c)

    kernel = functools.partial(_fused_kernel, f=f, heads=heads, dim=dim)
    hd3 = 3 * heads * dim
    out = pl.pallas_call(
        kernel,
        grid=(tokens // bt,),
        in_specs=[
            pl.BlockSpec((bt, f, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hd3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((heads * dim, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, f, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tokens, f, c), x.dtype),
        interpret=FORCE_INTERPRET,
    )(xt, wqkv, bqkv.reshape(1, hd3), wo, bo.reshape(1, c))
    return out.reshape(b, s, f, c)


def _fwd(x, wqkv, bqkv, wo, bo, heads, dim):
    return _forward(x, wqkv, bqkv, wo, bo, heads, dim), (x, wqkv, bqkv, wo, bo)


def _bwd(heads, dim, residuals, g):
    # Gradients via the XLA composite (numerically equivalent math). The
    # fused kernel's value is inference-path bandwidth; training recomputes.
    x, wqkv, bqkv, wo, bo = residuals
    _, vjp = jax.vjp(lambda *a: _composite_xla(*a, heads, dim), x, wqkv, bqkv, wo, bo)
    return vjp(g)


fused_temporal_attention_block.defvjp(_fwd, _bwd)


def pack_mha_weights(mha) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Concatenate a MultiheadAttention module's q/k/v/out params for the kernel.

    q/k/v kernels are ``(C, H, D)`` -> packed ``(C, 3*H*D)``; out kernel is
    ``(H, D, C)`` -> ``(H*D, C)``.
    """
    c = mha.q.kernel[...].shape[0]
    wq = mha.q.kernel[...].reshape(c, -1)
    wk = mha.k.kernel[...].reshape(c, -1)
    wv = mha.v.kernel[...].reshape(c, -1)
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)
    bqkv = jnp.concatenate(
        [mha.q.bias[...].reshape(-1), mha.k.bias[...].reshape(-1), mha.v.bias[...].reshape(-1)]
    )
    wo = mha.out.kernel[...].reshape(-1, c)
    bo = mha.out.bias[...]
    return wqkv, bqkv, wo, bo
