"""Fused temporal-attention block (forward + backward) as Pallas TPU kernels.

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
write out). The backward kernel does the same for training: one pass that
recomputes the per-head attention on-chip and emits dx plus all four weight
gradients, instead of XLA re-materializing every intermediate in HBM.

Kernel shape strategy
---------------------
* Heads are processed one at a time with ``jax.lax.fori_loop`` over
  *head-major* weight views (``(heads, c, 3*dim)`` packed q|k|v): dynamic
  leading-dim ref indexing lowers to a VMEM slice (supported by Mosaic),
  and only ONE head's buffers are live at a time — this is what lets the
  token tile grow past the old Python-unrolled kernel's 1024/2048 envelope.
* Per-head projections are ``(BT*F, C) @ (C, 3*D)`` matmuls (3*D = 96 lanes
  pads to 128 — 25% pad waste vs 4x for D=32-wide per-head views).
* Matmul operands stay in the input dtype (bf16 in the production policy ->
  native MXU bf16 throughput) with f32 accumulation
  (``preferred_element_type``); softmax statistics are always f32.
* The attention core is batched ``dot_general`` over the token tile;
  weight-gradient outputs accumulate across the (sequential) TPU grid via
  a constant out-block index map.

The public wrapper handles tiling, falls back to pure-XLA composite math
when shapes are unsupported, and defines a custom VJP: the backward pass is
the fused Pallas kernel on TPU (verified against the composite VJP in
interpret mode) and the XLA-composite VJP elsewhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max frames for the DENSE kernels (whole f x f attention panel per tile).
# The envelope math shrinks the token tile as f grows (at f=64 bf16: 32
# tokens/tile), so the cap is about keeping the per-tile (BT, F, F) panel
# reasonable; validated fwd+bwd vs composite on hardware at f=40 and f=64.
# Beyond this the BLOCKWISE (flash-style) kernels below take over: online-
# softmax accumulation over KV frame blocks bounds VMEM by the block, not
# f^2, lifting the old 64-frame capability ceiling (VERDICT r2 task 1).
MAX_FRAMES = 64

# Test hook: run the Pallas kernel in interpreter mode on CPU so the kernel
# math itself is exercised without TPU hardware.
FORCE_INTERPRET = False

# Token-tile envelopes: largest *padded* bt*f per program (halved for f32).
# Forward (packed projection + Python-unrolled heads) keeps every head's
# buffers live, so it is tighter per token but needs fewer MXU N-tiles;
# the fori-loop backward holds one head at a time. Both validated on this
# toolchain against the 16 MB VMEM stack (incl. double-buffered blocks).
_ENVELOPE_FWD = 2048
_ENVELOPE_BWD = 2048


def _head_attention(xf, wqkv_ref, bqkv_ref, h, bt, f, dim, scale, kv_len, bias_ref=None):
    """One head's q/k/v projection + softmax attention (shared fwd/bwd).

    Returns (q_scaled, k, v, attn): q/k/v in the input dtype (the per-head
    ``(bt, f, dim)`` panels pad dim->128 lanes and f->8k sublanes, so keeping
    them f32 doubles the dominant VMEM cost — and the composite computes its
    qkv einsum in the input dtype anyway); attn is the f32 softmax.

    ``kv_len < f`` means the trailing frames are zero-padding added by the
    wrapper (Mosaic cannot merge a non-8-multiple frame axis into the token
    axis): those key columns get -1e9 before softmax, which underflows to an
    exactly-zero attention weight, so padding never leaks into real outputs
    or gradients.
    """
    qkv = jnp.dot(xf, wqkv_ref[h], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[h]).astype(xf.dtype)  # (BT*F, 3*D)
    q = (qkv[:, :dim] * jnp.asarray(scale, xf.dtype)).reshape(bt, f, dim)
    k = qkv[:, dim : 2 * dim].reshape(bt, f, dim)
    v = qkv[:, 2 * dim :].reshape(bt, f, dim)
    sim = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BT, F, F)
    if bias_ref is not None:
        sim = sim + bias_ref[h]
    if kv_len < f:
        col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 2)
        sim = jnp.where(col >= kv_len, -1e9, sim)
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    return q, k, v, attn


def _fwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, out_ref, *, f, heads, dim, kv_len,
    bias_ref=None,
):
    """Forward: out = x + sum_h attn_h(x) @ Wo_h + bo, one token tile.

    Unlike the backward, the forward projects ALL heads in one packed
    ``(BT*F, C) @ (C, 3*H*D)`` matmul — 3*H*D is a multiple of 128 lanes, so
    the MXU sweeps 25% fewer N-tiles than per-head 96-lane dots — and peels
    heads by *static* lane slicing (Python unroll). The resulting extra
    buffer liveness is why the forward envelope is tile-count-bound while the
    fori-loop backward can recompute head-by-head.

    ``bias_ref`` (optional, ``(H, F, F)`` f32): additive pre-softmax logits
    bias — the FIXED-math rel-pos-bias path (reference modules.py:320-321
    adds it post-softmax, which compat callers never reach).
    """
    bt = x_ref.shape[0]
    c = x_ref.shape[-1]
    hd = heads * dim
    x = x_ref[...]  # (BT, F, C)
    xf = x.reshape(bt * f, c)
    scale = jnp.asarray(1.0 / math.sqrt(dim), x.dtype)

    qkv = jnp.dot(xf, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0]).astype(x.dtype)  # (BT*F, 3*H*D), q|k|v packed

    # Accumulate the output projection per head (y += o_h @ wo_h) instead of
    # concatenating per-head outputs — holding every head's attention output
    # live simultaneously is what blows the VMEM stack at larger tiles.
    y = None
    for h in range(heads):
        q = (qkv[:, h * dim : (h + 1) * dim] * scale).reshape(bt, f, dim)
        k = qkv[:, hd + h * dim : hd + (h + 1) * dim].reshape(bt, f, dim)
        v = qkv[:, 2 * hd + h * dim : 2 * hd + (h + 1) * dim].reshape(bt, f, dim)
        sim = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BT, F, F)
        if bias_ref is not None:
            sim = sim + bias_ref[h]
        if kv_len < f:
            col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 2)
            sim = jnp.where(col >= kv_len, -1e9, sim)
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        oh = jax.lax.dot_general(
            attn, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BT, F, D)
        contrib = jnp.dot(
            oh.reshape(bt * f, dim).astype(x.dtype),
            wo_ref[h * dim : (h + 1) * dim, :],
            preferred_element_type=jnp.float32,
        )  # (BT*F, C)
        y = contrib if y is None else y + contrib

    y = y + bo_ref[0]
    out_ref[...] = x + y.reshape(bt, f, c).astype(x.dtype)


def _bwd_kernel(
    x_ref, g_ref, wqkv_ref, bqkv_ref, wo_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
    *, f, heads, dim, kv_len,
    bias_ref=None, dbias_ref=None,
):
    """Backward: recompute per-head attention on-chip, emit dx + weight grads.

    Weight-gradient refs use a constant block index map, so every grid
    program sees the same VMEM block; the TPU grid is sequential, so
    zero-at-program-0 + accumulate is race-free. With ``bias_ref`` set
    (fixed-math rel-pos bias), ``dbias_ref`` accumulates the pre-softmax
    gradient summed over the token tile.
    """
    bt = x_ref.shape[0]
    c = x_ref.shape[-1]
    x = x_ref[...]
    g = g_ref[...]
    xf = x.reshape(bt * f, c)
    gf32 = g.reshape(bt * f, c).astype(jnp.float32)
    gc = gf32.astype(x.dtype)  # compute-dtype view for MXU operands
    scale = 1.0 / math.sqrt(dim)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros(dwqkv_ref.shape, dwqkv_ref.dtype)
        dbqkv_ref[...] = jnp.zeros(dbqkv_ref.shape, dbqkv_ref.dtype)
        dwo_ref[...] = jnp.zeros(dwo_ref.shape, dwo_ref.dtype)
        dbo_ref[...] = jnp.zeros(dbo_ref.shape, dbo_ref.dtype)
        if dbias_ref is not None:
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    dbo_ref[...] = dbo_ref[...] + jnp.sum(gf32, axis=0, keepdims=True)

    def head_body(h, dxf):
        q, k, v, attn = _head_attention(
            xf, wqkv_ref, bqkv_ref, h, bt, f, dim, scale, kv_len, bias_ref=bias_ref
        )
        attn_c = attn.astype(x.dtype)
        oh = jax.lax.dot_general(
            attn_c, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BT, F, D)

        # d(out-proj): dWo_h = oh^T @ g ; do = g @ Wo_h^T
        dwo_ref[h] = dwo_ref[h] + jax.lax.dot_general(
            oh.reshape(bt * f, dim).astype(x.dtype), gc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, C)
        do = jax.lax.dot_general(
            gc, wo_ref[h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bt, f, dim)  # (BT, F, D)
        do_c = do.astype(x.dtype)

        # d(attention): softmax VJP in f32.
        dattn = jax.lax.dot_general(
            do_c, v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BT, F, F)
        dv = jax.lax.dot_general(
            attn_c, do_c,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BT, F, D)
        ds = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
        if dbias_ref is not None:
            # ds IS the pre-softmax (logit) gradient; the bias enters the
            # logits additively, so dbias_h = sum over the tile's tokens.
            dbias_ref[h] = dbias_ref[h] + jnp.sum(ds, axis=0)
        ds_c = ds.astype(x.dtype)

        # d(projections): q was pre-scaled, so dq_raw = (ds @ k) * scale.
        dq = jax.lax.dot_general(
            ds_c, k.astype(x.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (BT, F, D)
        dk = jax.lax.dot_general(
            ds_c, q.astype(x.dtype),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BT, F, D)

        dqkv = jnp.concatenate(
            [dq.reshape(bt * f, dim), dk.reshape(bt * f, dim), dv.reshape(bt * f, dim)],
            axis=-1,
        )  # (BT*F, 3*D) f32
        dqkv_c = dqkv.astype(x.dtype)

        dwqkv_ref[h] = dwqkv_ref[h] + jax.lax.dot_general(
            xf, dqkv_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, 3*D)
        dbqkv_ref[h] = dbqkv_ref[h] + jnp.sum(dqkv, axis=0, keepdims=True)

        return dxf + jax.lax.dot_general(
            dqkv_c, wqkv_ref[h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BT*F, C)

    dxf = jax.lax.fori_loop(
        0, heads, head_body, jnp.zeros((bt * f, c), jnp.float32)
    )
    # Residual path: dx = g + attention-path gradient.
    dx_ref[...] = (gf32 + dxf).reshape(bt, f, c).astype(x.dtype)


# ----------------------------------------------------------------------- #
# Blockwise (flash-style) kernels for f > MAX_FRAMES                        #
# ----------------------------------------------------------------------- #
#
# Online-softmax accumulation over KV frame blocks: per (token-tile, head)
# the kernel holds q for ALL frames (bt, f, D) but only ONE (bt, f, KB)
# attention panel at a time, so VMEM scales linearly in f instead of
# quadratically. The q axis is deliberately NOT blocked — at video scales
# (f <= ~2048) the (bt, f, D) panels are small; it is the f x f panel that
# blows up. K/V are re-projected per block from the x tile (same total
# projection FLOPs as projecting once — blocks partition the frames).
#
# Numerics: softmax statistics (m, l) and accumulators are f32; matmul
# operands stay in the input dtype with f32 accumulation, exactly like the
# dense kernels. Frame padding (to a sublane multiple) is masked with -1e9
# before the online max, so padded KV columns contribute exp(-1e9 - m) = 0.

# Largest padded token-tile (bt * f_pad) per program; the blockwise buffers
# are leaner than the dense kernel's f x f panels, but the backward holds
# q/oh/do panels plus a (bt, f, c) f32 dx accumulator, so it gets half.
_ENVELOPE_BLOCKWISE_FWD = 2048
_ENVELOPE_BLOCKWISE_BWD = 1024


# KV block width cap. 128 = one full MXU N-tile per attention matmul and
# a single block (no online-rescale traffic) at f = 128, at the cost of a
# (bt, f, 128) f32 score panel per step.
KV_BLOCK_CAP = 128


def _kv_block_size(f_pad: int) -> int:
    """Largest ``8 * 2**k <= KV_BLOCK_CAP`` dividing ``f_pad`` (f_pad is a
    multiple of 8, so at worst KB = 8)."""
    kb = 8
    while kb * 2 <= KV_BLOCK_CAP and f_pad % (kb * 2) == 0:
        kb *= 2
    return kb


def _choose_tile_blockwise(tokens: int, f_pad: int, c: int, envelope: int, dtype) -> int:
    """Token tile for the blockwise kernels; 0 means "does not fit"."""
    if c > 64:
        envelope = (64 * envelope) // c
    if jnp.dtype(dtype).itemsize > 2:
        envelope //= 2
    bt = min(256, envelope // f_pad)
    if bt < 1:
        return 0
    bt = 1 << (bt.bit_length() - 1)
    while bt > 1 and tokens % bt != 0:
        bt //= 2
    return bt


def _online_softmax_pass(x_ref, w_h, b_h, q, f, dim, kv_len, kb, dtype, h=None, bias_ref=None):
    """Shared fwd/bwd sweep: online-softmax stats + output accumulator.

    Returns ``(m, l, acc)`` — running row max, denominator, and the
    UN-normalized output accumulator ``sum_j exp(s_j - m) @ v_j``, all f32.
    With ``bias_ref`` set, head ``h``'s bias panel is added to the logits
    per KV block (fixed-math rel-pos bias). The blockwise bias is stored
    KV-MAJOR — ``(H, F_kv, F_q)`` — so the per-block dynamic slice lands on
    the sublane dim (provably a multiple of 8 via ``pl.multiple_of``);
    Mosaic rejects dynamic LANE-dim slices unless 128-aligned, and ``kb``
    can be as small as 8.
    """
    bt = x_ref.shape[0]
    c = x_ref.shape[-1]
    nblk = f // kb

    def kv_body(j, carry):
        m, l, acc = carry
        start = pl.multiple_of(j * kb, kb)
        xj = x_ref[:, pl.ds(start, kb), :].reshape(bt * kb, c)
        kvj = jnp.dot(xj, w_h[:, dim:], preferred_element_type=jnp.float32)
        kvj = (kvj + b_h[0, dim:]).astype(dtype)  # (bt*kb, 2D)
        kj = kvj[:, :dim].reshape(bt, kb, dim)
        vj = kvj[:, dim:].reshape(bt, kb, dim)
        s = jax.lax.dot_general(
            q, kj,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bt, f, kb)
        if bias_ref is not None:
            s = s + jnp.transpose(bias_ref[h, pl.ds(start, kb), :])[None]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + j * kb
        s = jnp.where(col >= kv_len, -1e9, s)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(dtype), vj,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bt, f, D)
        return m_new, l, acc * alpha + pv

    bt_f = (bt, f)
    init = (
        jnp.full((*bt_f, 1), -1e30, jnp.float32),
        jnp.zeros((*bt_f, 1), jnp.float32),
        jnp.zeros((*bt_f, dim), jnp.float32),
    )
    return jax.lax.fori_loop(0, nblk, kv_body, init)


def _project_q(x_ref, w_h, b_h, f, dim, scale, dtype):
    bt = x_ref.shape[0]
    c = x_ref.shape[-1]
    xf = x_ref[...].reshape(bt * f, c)
    q = jnp.dot(xf, w_h[:, :dim], preferred_element_type=jnp.float32)
    q = (q + b_h[0, :dim]) * scale
    return q.astype(dtype).reshape(bt, f, dim)


def _fwd_blockwise_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, out_ref, *, f, heads, dim, kv_len, kb,
    bias_ref=None,
):
    """Blockwise forward: fori over heads, online softmax over KV blocks."""
    bt = x_ref.shape[0]
    c = x_ref.shape[-1]
    x = x_ref[...]
    scale = 1.0 / math.sqrt(dim)

    def head_body(h, y):
        w_h = wqkv_ref[h]  # (c, 3D) packed q|kv
        b_h = bqkv_ref[h]  # (1, 3D)
        q = _project_q(x_ref, w_h, b_h, f, dim, scale, x.dtype)
        m, l, acc = _online_softmax_pass(
            x_ref, w_h, b_h, q, f, dim, kv_len, kb, x.dtype, h=h, bias_ref=bias_ref
        )
        oh = (acc / l).reshape(bt * f, dim)
        return y + jnp.dot(
            oh.astype(x.dtype), wo_ref[h], preferred_element_type=jnp.float32
        )  # (bt*f, c)

    y = jax.lax.fori_loop(0, heads, head_body, jnp.zeros((bt * f, c), jnp.float32))
    y = y + bo_ref[0]
    out_ref[...] = x + y.reshape(bt, f, c).astype(x.dtype)


def _bwd_blockwise_kernel(
    x_ref, g_ref, wqkv_ref, bqkv_ref, wo_ref,
    dx_ref, dwq_ref, dwkv_ref, dbq_ref, dbkv_ref, dwo_ref, dbo_ref,
    dx_acc,
    *, f, heads, dim, kv_len, kb,
    bias_ref=None, dbias_ref=None,
):
    """Blockwise backward: per head, one stats sweep + one gradient sweep.

    Sweep 1 recomputes the online-softmax statistics (oh, lse) — no
    residuals beyond (x, g, weights) are saved to HBM. Sweep 2 walks the KV
    blocks again with the closed-form stats: p = exp(s - lse), emitting
    dv/dk per block and accumulating dq across blocks. Weight gradients
    accumulate across the (sequential) grid via constant out index maps;
    dx accumulates across heads in an f32 VMEM scratch.
    """
    bt = x_ref.shape[0]
    c = x_ref.shape[-1]
    x = x_ref[...]
    scale = 1.0 / math.sqrt(dim)
    xf = x.reshape(bt * f, c)
    gf32 = g_ref[...].reshape(bt * f, c).astype(jnp.float32)
    gc = gf32.astype(x.dtype)
    nblk = f // kb

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwq_ref[...] = jnp.zeros(dwq_ref.shape, dwq_ref.dtype)
        dwkv_ref[...] = jnp.zeros(dwkv_ref.shape, dwkv_ref.dtype)
        dbq_ref[...] = jnp.zeros(dbq_ref.shape, dbq_ref.dtype)
        dbkv_ref[...] = jnp.zeros(dbkv_ref.shape, dbkv_ref.dtype)
        dwo_ref[...] = jnp.zeros(dwo_ref.shape, dwo_ref.dtype)
        dbo_ref[...] = jnp.zeros(dbo_ref.shape, dbo_ref.dtype)
        if dbias_ref is not None:
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    dbo_ref[...] = dbo_ref[...] + jnp.sum(gf32, axis=0, keepdims=True)
    # Residual path: dx starts at g, heads accumulate their projections.
    dx_acc[...] = gf32.reshape(bt, f, c)

    def head_body(h, _):
        w_h = wqkv_ref[h]
        b_h = bqkv_ref[h]
        q = _project_q(x_ref, w_h, b_h, f, dim, scale, x.dtype)

        # Sweep 1: stats + attention output for this head.
        m, l, acc = _online_softmax_pass(
            x_ref, w_h, b_h, q, f, dim, kv_len, kb, x.dtype, h=h, bias_ref=bias_ref
        )
        lse = m + jnp.log(l)  # (bt, f, 1)
        oh = (acc / l).reshape(bt * f, dim)
        oh_c = oh.astype(x.dtype)

        # Out-projection gradients.
        dwo_ref[h] = dwo_ref[h] + jax.lax.dot_general(
            oh_c, gc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, C)
        do = jax.lax.dot_general(
            gc, wo_ref[h],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bt*f, D)
        di = jnp.sum(do * oh, axis=-1, keepdims=True).reshape(bt, f, 1)  # rowsum(dO*O)
        do_c = do.astype(x.dtype).reshape(bt, f, dim)

        # Sweep 2: per KV block, finish the softmax VJP with closed stats.
        def kv_body(j, dq_acc):
            start = pl.multiple_of(j * kb, kb)
            xj = x_ref[:, pl.ds(start, kb), :].reshape(bt * kb, c)
            kvj = jnp.dot(xj, w_h[:, dim:], preferred_element_type=jnp.float32)
            kvj = (kvj + b_h[0, dim:]).astype(x.dtype)
            kj = kvj[:, :dim].reshape(bt, kb, dim)
            vj = kvj[:, dim:].reshape(bt, kb, dim)
            s = jax.lax.dot_general(
                q, kj,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (bt, f, kb)
            if bias_ref is not None:
                s = s + jnp.transpose(bias_ref[h, pl.ds(start, kb), :])[None]
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + j * kb
            s = jnp.where(col >= kv_len, -1e9, s)
            p = jnp.exp(s - lse)  # exact probabilities (masked cols -> 0)
            p_c = p.astype(x.dtype)

            dv = jax.lax.dot_general(
                p_c, do_c,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (bt, kb, D)
            dp = jax.lax.dot_general(
                do_c, vj,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (bt, f, kb)
            ds = p * (dp - di)
            if dbias_ref is not None:
                # KV-major store (see _online_softmax_pass): sublane slice.
                dbias_ref[h, pl.ds(start, kb), :] = (
                    dbias_ref[h, pl.ds(start, kb), :]
                    + jnp.transpose(jnp.sum(ds, axis=0))
                )
            ds_c = ds.astype(x.dtype)
            dq_acc = dq_acc + jax.lax.dot_general(
                ds_c, kj,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (bt, f, D); * scale applied after the loop
            dk = jax.lax.dot_general(
                ds_c, q,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (bt, kb, D)

            dkv = jnp.concatenate(
                [dk.reshape(bt * kb, dim), dv.reshape(bt * kb, dim)], axis=-1
            )  # (bt*kb, 2D) f32
            dkv_c = dkv.astype(x.dtype)
            dwkv_ref[h] = dwkv_ref[h] + jax.lax.dot_general(
                xj, dkv_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, 2D)
            dbkv_ref[h] = dbkv_ref[h] + jnp.sum(dkv, axis=0, keepdims=True)
            dx_acc[:, pl.ds(start, kb), :] = dx_acc[:, pl.ds(start, kb), :] + jax.lax.dot_general(
                dkv_c, w_h[:, dim:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(bt, kb, c)
            return dq_acc

        dq = jax.lax.fori_loop(
            0, nblk, kv_body, jnp.zeros((bt, f, dim), jnp.float32)
        ) * scale  # q was pre-scaled: dq_raw = (ds @ k) * scale
        dqf = dq.reshape(bt * f, dim)
        dq_c = dqf.astype(x.dtype)
        dwq_ref[h] = dwq_ref[h] + jax.lax.dot_general(
            xf, dq_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, D)
        dbq_ref[h] = dbq_ref[h] + jnp.sum(dqf, axis=0, keepdims=True)
        dx_acc[...] = dx_acc[...] + jax.lax.dot_general(
            dq_c, w_h[:, :dim],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bt, f, c)
        return 0

    jax.lax.fori_loop(0, heads, head_body, 0)
    dx_ref[...] = dx_acc[...].astype(x.dtype)


def _pad_bias(pos_bias, heads: int, f: int, f_pad: int):
    """(H, f, f) f32 bias padded to (H, f_pad, f_pad) (padded cols are
    masked to -1e9 in-kernel; padded rows are discarded)."""
    bias = pos_bias.astype(jnp.float32)
    if f_pad != f:
        bias = jnp.pad(bias, ((0, 0), (0, f_pad - f), (0, f_pad - f)))
    return bias


def _pad_bias_t(pos_bias, heads: int, f: int, f_pad: int):
    """Blockwise-kernel bias layout: padded AND transposed to KV-major
    ``(H, F_kv, F_q)`` so the kernels' per-KV-block dynamic slice is a
    sublane slice (Mosaic requires 128-alignment for lane-dim dynamic
    slices; kb can be 8)."""
    return _pad_bias(pos_bias, heads, f, f_pad).transpose(0, 2, 1)


def _forward_blockwise(x, wqkv, bqkv, wo, bo, heads, dim, bt, pos_bias=None):
    b, s, f, c = x.shape
    tokens = b * s
    xt = x.reshape(tokens, f, c)
    f_pad = max(8, -(-f // 8) * 8)
    if f_pad != f:
        xt = jnp.pad(xt, ((0, 0), (0, f_pad - f), (0, 0)))
    kb = _kv_block_size(f_pad)
    wq_h, bq_h, wo_h = _head_major(wqkv, bqkv, wo, heads, dim)

    const = lambda i: (0, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, c, 3 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, 1, 3 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, dim, c), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [
        xt,
        wq_h.astype(x.dtype),
        bq_h.astype(jnp.float32),
        wo_h.astype(x.dtype),
        bo.reshape(1, c).astype(jnp.float32),
    ]
    if pos_bias is None:
        kernel = functools.partial(
            _fwd_blockwise_kernel, f=f_pad, heads=heads, dim=dim, kv_len=f, kb=kb
        )
    else:
        def kernel(x_ref, w_ref, b_ref, wo_ref, bo_ref, bias_ref, out_ref):
            _fwd_blockwise_kernel(
                x_ref, w_ref, b_ref, wo_ref, bo_ref, out_ref,
                f=f_pad, heads=heads, dim=dim, kv_len=f, kb=kb, bias_ref=bias_ref,
            )

        in_specs.append(
            pl.BlockSpec((heads, f_pad, f_pad), const, memory_space=pltpu.VMEM)
        )
        args.append(_pad_bias_t(pos_bias, heads, f, f_pad))

    out = pl.pallas_call(
        kernel,
        grid=(tokens // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tokens, f_pad, c), x.dtype),
        interpret=FORCE_INTERPRET,
    )(*args)
    if f_pad != f:
        out = out[:, :f]
    return out.reshape(b, s, f, c)


def _backward_blockwise(x, wqkv, bqkv, wo, bo, g, heads, dim, bt, pos_bias=None):
    b, s, f, c = x.shape
    tokens = b * s
    xt = x.reshape(tokens, f, c)
    gt = g.reshape(tokens, f, c)
    f_pad = max(8, -(-f // 8) * 8)
    if f_pad != f:
        xt = jnp.pad(xt, ((0, 0), (0, f_pad - f), (0, 0)))
        gt = jnp.pad(gt, ((0, 0), (0, f_pad - f), (0, 0)))
    kb = _kv_block_size(f_pad)
    wq_h, bq_h, wo_h = _head_major(wqkv, bqkv, wo, heads, dim)

    const = lambda i: (0, 0, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, c, 3 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, 1, 3 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, dim, c), const, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, c, dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, c, 2 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, 1, dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, 1, 2 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, dim, c), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((tokens, f_pad, c), x.dtype),
        jax.ShapeDtypeStruct((heads, c, dim), jnp.float32),
        jax.ShapeDtypeStruct((heads, c, 2 * dim), jnp.float32),
        jax.ShapeDtypeStruct((heads, 1, dim), jnp.float32),
        jax.ShapeDtypeStruct((heads, 1, 2 * dim), jnp.float32),
        jax.ShapeDtypeStruct((heads, dim, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
    ]
    args = [xt, gt, wq_h.astype(x.dtype), bq_h.astype(jnp.float32), wo_h.astype(x.dtype)]
    if pos_bias is None:
        kernel = functools.partial(
            _bwd_blockwise_kernel, f=f_pad, heads=heads, dim=dim, kv_len=f, kb=kb
        )
    else:
        def kernel(x_ref, g_ref, w_ref, b_ref, wo_ref, bias_ref, *rest):
            *outs, dx_acc = rest
            _bwd_blockwise_kernel(
                x_ref, g_ref, w_ref, b_ref, wo_ref, *outs[:-1], dx_acc,
                f=f_pad, heads=heads, dim=dim, kv_len=f, kb=kb,
                bias_ref=bias_ref, dbias_ref=outs[-1],
            )

        in_specs.append(
            pl.BlockSpec((heads, f_pad, f_pad), const, memory_space=pltpu.VMEM)
        )
        args.append(_pad_bias_t(pos_bias, heads, f, f_pad))
        out_specs.append(
            pl.BlockSpec((heads, f_pad, f_pad), const, memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((heads, f_pad, f_pad), jnp.float32))

    results = pl.pallas_call(
        kernel,
        grid=(tokens // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, f_pad, c), jnp.float32)],
        interpret=FORCE_INTERPRET,
    )(*args)
    if pos_bias is None:
        dx, dwq, dwkv, dbq, dbkv, dwo_h, dbo = results
        dbias = None
    else:
        dx, dwq, dwkv, dbq, dbkv, dwo_h, dbo, dbias = results
        # KV-major (H, F_kv, F_q) back to (H, F_q, F_kv).
        dbias = dbias.transpose(0, 2, 1)[:, :f, :f].astype(pos_bias.dtype)

    if f_pad != f:
        dx = dx[:, :f]
    # Reassemble head-major (H, c, D)+(H, c, 2D) -> (H, c, 3D) packed q|k|v,
    # then back to the public packed layouts.
    dw_h = jnp.concatenate([dwq, dwkv], axis=-1)
    db_h = jnp.concatenate([dbq, dbkv], axis=-1)
    dwqkv, dbqkv, dwo = _from_head_major(dw_h, db_h, dwo_h, heads, dim)
    grads = (
        dx.reshape(b, s, f, c),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwo.astype(wo.dtype),
        dbo.reshape(c).astype(bo.dtype),
    )
    return grads if pos_bias is None else grads + (dbias,)


def _choose_tile(tokens: int, f: int, c: int, envelope: int, dtype) -> int:
    """Largest power-of-two token tile whose *padded* footprint fits.

    The per-head ``(bt, f, dim)`` panels pad f up to a multiple of 8
    sublanes, so the VMEM cost scales with the padded frame count. Beyond
    c = 64 the c-proportional buffers dominate (x/g/out tiles plus the
    backward's f32 ``(bt*f, c)`` accumulators), so the padded-token
    envelope scales as ~1/c: tokens*c <= 64*2048 = 128Ki. Calibrated on
    this toolchain — c=128 at 1024 padded tokens fits, while c=1024 at
    1024 tokens overflows the 16 MB stack by 6.8 MB (the deepest
    dim-128-model level). f32 buffers cost 2x bf16, halving the envelope
    again.
    """
    f_pad = max(8, -(-f // 8) * 8)
    if c > 64:
        envelope = min(envelope, (64 * 2048) // c)
    if jnp.dtype(dtype).itemsize > 2:
        envelope //= 2
    bt = max(1, min(512, envelope // f_pad))
    bt = 1 << (bt.bit_length() - 1)  # floor to power of two
    while bt > 1 and tokens % bt != 0:
        bt //= 2
    return bt


def _head_major(wqkv, bqkv, wo, heads: int, dim: int):
    """Packed (C, 3HD)/(3HD,)/(HD, C) params -> head-major kernel views."""
    c = wqkv.shape[0]
    hd = heads * dim
    # (C, 3, H, D) -> (H, C, 3, D) -> (H, C, 3D): per-head packed q|k|v.
    w = wqkv.reshape(c, 3, heads, dim).transpose(2, 0, 1, 3).reshape(heads, c, 3 * dim)
    b = bqkv.reshape(3, heads, dim).transpose(1, 0, 2).reshape(heads, 1, 3 * dim)
    wo_h = wo.reshape(heads, dim, c)
    return w, b, wo_h


def _from_head_major(dw, db, dwo, heads: int, dim: int):
    """Head-major gradients back to the public packed layouts."""
    c = dw.shape[1]
    dwqkv = dw.reshape(heads, c, 3, dim).transpose(1, 2, 0, 3).reshape(c, 3 * heads * dim)
    dbqkv = db.reshape(heads, 3, dim).transpose(1, 0, 2).reshape(3 * heads * dim)
    dwo = dwo.reshape(heads * dim, c)
    return dwqkv, dbqkv, dwo


def _composite_xla(x, wqkv, bqkv, wo, bo, heads: int, dim: int, pos_bias=None):
    """Reference math in plain XLA (fallback + non-TPU backward).

    Output dtype is exactly ``x.dtype`` — the custom VJP requires forward
    (Pallas) and backward-recompute paths to agree on JAX types.
    ``pos_bias`` ((heads, f, f)) is the fixed-math pre-softmax logits bias.
    """
    b, s, f, c = x.shape
    scale = 1.0 / math.sqrt(dim)
    qkv = (
        jnp.einsum("bsfc,ck->bsfk", x, wqkv.astype(x.dtype)) + bqkv.astype(x.dtype)
    )
    qkv = qkv.reshape(b, s, f, 3, heads, dim)
    q, k, v = qkv[..., 0, :, :] * scale, qkv[..., 1, :, :], qkv[..., 2, :, :]
    sim = jnp.einsum("bsihd,bsjhd->bshij", q, k, preferred_element_type=jnp.float32)
    if pos_bias is not None:
        sim = sim + pos_bias.astype(jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1)
    o = jnp.einsum("bshij,bsjhd->bsihd", attn.astype(x.dtype), v)
    o = o.reshape(b, s, f, heads * dim)
    y = jnp.einsum("bsfk,kc->bsfc", o, wo.astype(x.dtype)) + bo.astype(x.dtype)
    return x + y.astype(x.dtype)


def _supported(x, f: int) -> bool:
    if FORCE_INTERPRET:
        return f <= MAX_FRAMES and x.ndim == 4
    return jax.default_backend() == "tpu" and f <= MAX_FRAMES and x.ndim == 4


def _route(x, f: int) -> str:
    """Pick the kernel family for this shape: dense (f <= MAX_FRAMES),
    blockwise (longer clips, as long as one frame column fits a program),
    or the XLA composite. Shape-deterministic, so forward and backward
    always agree."""
    if x.ndim != 4:
        return "composite"
    if not (FORCE_INTERPRET or jax.default_backend() == "tpu"):
        return "composite"
    if f <= MAX_FRAMES:
        return "dense"
    b, s, f, c = x.shape
    f_pad = max(8, -(-f // 8) * 8)
    bt = _choose_tile_blockwise(b * s, f_pad, c, _ENVELOPE_BLOCKWISE_BWD, x.dtype)
    return "blockwise" if bt >= 1 else "composite"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_temporal_attention_block(x, wqkv, bqkv, wo, bo, heads: int, dim: int):
    """``x + MHA(x)`` over the second-to-last axis; x is ``(b, s, f, c)``.

    ``wqkv``: ``(c, 3*heads*dim)`` (concatenated q|k|v kernels),
    ``bqkv``: ``(3*heads*dim,)``, ``wo``: ``(heads*dim, c)``, ``bo``: ``(c,)``.
    """
    return _forward(x, wqkv, bqkv, wo, bo, heads, dim)


def _forward(x, wqkv, bqkv, wo, bo, heads, dim, pos_bias=None):
    b, s, f, c = x.shape
    route = _route(x, f)
    if route == "composite":
        return _composite_xla(x, wqkv, bqkv, wo, bo, heads, dim, pos_bias=pos_bias)
    if route == "blockwise":
        f_pad = max(8, -(-f // 8) * 8)
        bt = _choose_tile_blockwise(b * s, f_pad, c, _ENVELOPE_BLOCKWISE_FWD, x.dtype)
        return _forward_blockwise(x, wqkv, bqkv, wo, bo, heads, dim, bt, pos_bias=pos_bias)

    tokens = b * s
    bt = _choose_tile(tokens, f, c, _ENVELOPE_FWD, x.dtype)
    xt = x.reshape(tokens, f, c)
    # Mosaic can only merge the (bt, f) axes into tokens when f is a
    # sublane multiple: pad the frame axis and mask (see _head_attention).
    f_pad = max(8, -(-f // 8) * 8)
    if f_pad != f:
        xt = jnp.pad(xt, ((0, 0), (0, f_pad - f), (0, 0)))
    hd3 = 3 * heads * dim

    in_specs = [
        pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, hd3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hd3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads * dim, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [
        xt,
        wqkv.astype(x.dtype),
        bqkv.reshape(1, hd3).astype(jnp.float32),
        wo.astype(x.dtype),
        bo.reshape(1, c).astype(jnp.float32),
    ]
    if pos_bias is None:
        kernel = functools.partial(_fwd_kernel, f=f_pad, heads=heads, dim=dim, kv_len=f)
    else:
        def kernel(x_ref, w_ref, b_ref, wo_ref, bo_ref, bias_ref, out_ref):
            _fwd_kernel(
                x_ref, w_ref, b_ref, wo_ref, bo_ref, out_ref,
                f=f_pad, heads=heads, dim=dim, kv_len=f, bias_ref=bias_ref,
            )

        in_specs.append(
            pl.BlockSpec((heads, f_pad, f_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(_pad_bias(pos_bias, heads, f, f_pad))

    out = pl.pallas_call(
        kernel,
        grid=(tokens // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tokens, f_pad, c), x.dtype),
        interpret=FORCE_INTERPRET,
    )(*args)
    if f_pad != f:
        out = out[:, :f]
    return out.reshape(b, s, f, c)


def _fwd(x, wqkv, bqkv, wo, bo, heads, dim):
    return _forward(x, wqkv, bqkv, wo, bo, heads, dim), (x, wqkv, bqkv, wo, bo)


def _bwd(heads, dim, residuals, g):
    """Fused Pallas backward on TPU; XLA-composite VJP elsewhere."""
    x, wqkv, bqkv, wo, bo = residuals
    return _backward(x, wqkv, bqkv, wo, bo, g, heads, dim)


def _backward(x, wqkv, bqkv, wo, bo, g, heads, dim, pos_bias=None):
    """Shared backward; with ``pos_bias`` the return gains a trailing dbias."""
    b, s, f, c = x.shape
    route = _route(x, f)
    if route == "composite":
        if pos_bias is None:
            _, vjp = jax.vjp(
                lambda *a: _composite_xla(*a, heads, dim), x, wqkv, bqkv, wo, bo
            )
            return vjp(g)
        _, vjp = jax.vjp(
            lambda *a: _composite_xla(*a[:5], heads, dim, pos_bias=a[5]),
            x, wqkv, bqkv, wo, bo, pos_bias,
        )
        return vjp(g)
    if route == "blockwise":
        f_pad = max(8, -(-f // 8) * 8)
        bt = _choose_tile_blockwise(b * s, f_pad, c, _ENVELOPE_BLOCKWISE_BWD, x.dtype)
        return _backward_blockwise(
            x, wqkv, bqkv, wo, bo, g, heads, dim, bt, pos_bias=pos_bias
        )

    tokens = b * s
    bt = _choose_tile(tokens, f, c, _ENVELOPE_BWD, x.dtype)
    xt = x.reshape(tokens, f, c)
    gt = g.reshape(tokens, f, c)
    # Frame-axis padding as in _forward; the padded g rows are zero, so
    # every padded-frame gradient contribution vanishes exactly.
    f_pad = max(8, -(-f // 8) * 8)
    if f_pad != f:
        xt = jnp.pad(xt, ((0, 0), (0, f_pad - f), (0, 0)))
        gt = jnp.pad(gt, ((0, 0), (0, f_pad - f), (0, 0)))
    wq_h, bq_h, wo_h = _head_major(wqkv, bqkv, wo, heads, dim)
    wq_h = wq_h.astype(x.dtype)
    wo_h = wo_h.astype(x.dtype)

    const = lambda i: (0, 0, 0)  # noqa: E731 — weight-grad blocks are grid-invariant
    in_specs = [
        pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, c, 3 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, 1, 3 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, dim, c), const, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((bt, f_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, c, 3 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, 1, 3 * dim), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, dim, c), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((tokens, f_pad, c), x.dtype),
        jax.ShapeDtypeStruct((heads, c, 3 * dim), jnp.float32),
        jax.ShapeDtypeStruct((heads, 1, 3 * dim), jnp.float32),
        jax.ShapeDtypeStruct((heads, dim, c), jnp.float32),
        jax.ShapeDtypeStruct((1, c), jnp.float32),
    ]
    args = [xt, gt, wq_h, bq_h, wo_h]
    if pos_bias is None:
        kernel = functools.partial(_bwd_kernel, f=f_pad, heads=heads, dim=dim, kv_len=f)
    else:
        def kernel(x_ref, g_ref, w_ref, b_ref, wo_ref, bias_ref,
                   dx_ref, dw_ref, db_ref, dwo_ref, dbo_ref, dbias_ref):
            _bwd_kernel(
                x_ref, g_ref, w_ref, b_ref, wo_ref,
                dx_ref, dw_ref, db_ref, dwo_ref, dbo_ref,
                f=f_pad, heads=heads, dim=dim, kv_len=f,
                bias_ref=bias_ref, dbias_ref=dbias_ref,
            )

        in_specs.append(
            pl.BlockSpec((heads, f_pad, f_pad), const, memory_space=pltpu.VMEM)
        )
        args.append(_pad_bias(pos_bias, heads, f, f_pad))
        out_specs.append(
            pl.BlockSpec((heads, f_pad, f_pad), const, memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((heads, f_pad, f_pad), jnp.float32))

    results = pl.pallas_call(
        kernel,
        grid=(tokens // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=FORCE_INTERPRET,
    )(*args)
    if pos_bias is None:
        dx, dw_h, db_h, dwo_h, dbo = results
        dbias = None
    else:
        dx, dw_h, db_h, dwo_h, dbo, dbias = results
        dbias = dbias[:, :f, :f].astype(pos_bias.dtype)

    if f_pad != f:
        dx = dx[:, :f]
    dwqkv, dbqkv, dwo = _from_head_major(dw_h, db_h, dwo_h, heads, dim)
    grads = (
        dx.reshape(b, s, f, c),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(bqkv.dtype),
        dwo.astype(wo.dtype),
        dbo.reshape(c).astype(bo.dtype),
    )
    return grads if pos_bias is None else grads + (dbias,)


fused_temporal_attention_block.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_temporal_attention_block_biased(
    x, wqkv, bqkv, wo, bo, pos_bias, heads: int, dim: int
):
    """``x + MHA(x, pos_bias)`` with an additive PRE-softmax logits bias.

    The FIXED-math temporal attention (reference modules.py:247-326 as
    *intended*: rel-pos bias on the logits, not on the probabilities).
    ``pos_bias``: ``(heads, f, f)``, differentiable — the T5-style bias
    table trains through this op. The pre-norm of the fixed PreNorm chain
    runs OUTSIDE (callers pass the normalized x and add the residual from
    the un-normalized input: ``out = x_orig + (this(xn, ...) - xn)``).
    """
    return _forward(x, wqkv, bqkv, wo, bo, heads, dim, pos_bias=pos_bias)


def _fwd_biased(x, wqkv, bqkv, wo, bo, pos_bias, heads, dim):
    return (
        _forward(x, wqkv, bqkv, wo, bo, heads, dim, pos_bias=pos_bias),
        (x, wqkv, bqkv, wo, bo, pos_bias),
    )


def _bwd_biased(heads, dim, residuals, g):
    x, wqkv, bqkv, wo, bo, pos_bias = residuals
    return _backward(x, wqkv, bqkv, wo, bo, g, heads, dim, pos_bias=pos_bias)


fused_temporal_attention_block_biased.defvjp(_fwd_biased, _bwd_biased)


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
