"""Fused spatial linear attention block as a Pallas TPU kernel.

Replaces the composite XLA path for the Unet3D spatial attention block
(``Residual(PreNorm(SpatialLinearAttention))`` in reference-compat mode,
reference unet3d.py:169-181 + modules.py:64-129):

    out = x + to_out( q_softmax(q(x)) . (k_softmax(k(x))^T @ v(x)) )

with the reference's dropped-q-scale quirk (modules.py:107-108) preserved —
the kernel computes exactly the compat-mode math.

Why fuse
--------
Like temporal attention, the block is HBM-bound: q/k/v are ``heads*32``
channels regardless of the level width (512 MB each at the top level in
f32). The linear-attention contraction ``context = softmax(k)^T @ v`` is a
``(D, n) @ (n, D)`` matmul per (frame, head) — a genuine MXU reduction over
the big ``n = h*w`` axis. One program per frame keeps the whole chain
(projections, both softmaxes, two matmuls, output projection, residual) in
VMEM; heads are peeled by lane-slicing the packed projection weights (no
lane-splitting reshapes, which Mosaic rejects).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FORCE_INTERPRET = False
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _kernel(wq_ref, wk_ref, wv_ref, wo_ref, x_ref, out_ref, *, group, dim, scale):
    """One frame per program; heads processed in 128-lane groups.

    Heads are ``dim`` (typically 32) wide — processing one at a time wastes
    3/4 of every vector register (lanes pad to 128) and 3/4 of the MXU
    output width. Instead ``group = 128 // dim`` heads are projected
    together as (n, group*dim) panels; per-head softmax statistics are
    computed on lane-sliced sub-panels, and the (gd, gd) context matrix is
    masked block-diagonal so heads never mix. ``fori_loop`` over the head
    groups keeps one group's buffers live at a time.
    """
    n = x_ref.shape[1]
    c = x_ref.shape[-1]
    gd = group * dim
    x = x_ref[0]  # (n, c) — one frame's spatial tokens
    # Matmul operands stay in the input dtype (bf16 -> native MXU rate);
    # accumulation and softmax statistics are f32.
    xf = x

    # Block-diagonal mask zeroing cross-head context entries.
    block_mask = _block_diag_mask(gd, dim)

    def group_body(g, y):
        q = jnp.dot(xf, wq_ref[g], preferred_element_type=jnp.float32)  # (n, gd)
        k = jnp.dot(xf, wk_ref[g], preferred_element_type=jnp.float32)
        v = jnp.dot(xf, wv_ref[g], preferred_element_type=jnp.float32)

        # q: softmax over each head's dim-wide feature block (per token).
        # Reference-compat drops the q scale (scale == 1.0 in compat mode).
        q = _blockwise_q_softmax(q, n, group, dim, scale)

        # k: softmax over the token axis (column-wise; head-independent).
        k = k - jnp.max(k, axis=0, keepdims=True)
        ek = jnp.exp(k)
        k = ek / jnp.sum(ek, axis=0, keepdims=True)

        # context[d, e] = sum_n k[n, d] v[n, e] for the whole group, then
        # masked block-diagonal so only within-head pairs survive.
        context = jax.lax.dot_general(
            k.astype(x.dtype), v.astype(x.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, gd)
        context = context * block_mask
        o_g = jnp.dot(
            q.astype(x.dtype), context.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )  # (n, gd)
        contrib = jnp.dot(
            o_g.astype(x.dtype), wo_ref[g], preferred_element_type=jnp.float32
        )
        return y + contrib  # (n, c)

    n_groups = wq_ref.shape[0]
    y = jax.lax.fori_loop(0, n_groups, group_body, jnp.zeros((n, c), jnp.float32))
    out_ref[0] = x + y.astype(x.dtype)


def _head_group(heads: int, dim: int) -> tuple[int, int]:
    """``(group, n_groups)``: how many heads share one 128-lane panel.

    The single definition used by the kernels' weight views AND the VMEM
    gate — they must agree on the grouping or the gate estimates the wrong
    kernel.
    """
    group = max(1, min(heads, 128 // dim))
    while heads % group != 0:
        group -= 1
    return group, heads // group


def _group_views(wqkv, wo, heads: int, dim: int, dtype):
    """Packed (c, 3HD)/(HD, c) params -> group-major kernel views.

    ``group = 128 // dim`` heads share a 128-lane panel (full vector
    register / MXU output width); views are ``(n_groups, c, group*dim)``.
    """
    c = wqkv.shape[0]
    hd = heads * dim
    group, n_groups = _head_group(heads, dim)
    gd = group * dim
    wqkv_c = wqkv.astype(dtype)
    wq = jnp.transpose(wqkv_c[:, :hd].reshape(c, n_groups, gd), (1, 0, 2))
    wk = jnp.transpose(wqkv_c[:, hd : 2 * hd].reshape(c, n_groups, gd), (1, 0, 2))
    wv = jnp.transpose(wqkv_c[:, 2 * hd :].reshape(c, n_groups, gd), (1, 0, 2))
    wo3 = wo.astype(dtype).reshape(n_groups, gd, c)
    return wq, wk, wv, wo3, group, n_groups


def _block_diag_mask(gd: int, dim: int) -> jax.Array:
    row = jax.lax.broadcasted_iota(jnp.int32, (gd, gd), 0) // dim
    col = jax.lax.broadcasted_iota(jnp.int32, (gd, gd), 1) // dim
    return (row == col).astype(jnp.float32)


def _blockwise_q_softmax(q, n, group, dim, scale):
    """Per-head softmax over each dim-wide feature block of a (n, g*d) panel.

    The max subtracted before exp is each head's OWN block max (static lane
    slices + lane concat — both Mosaic-supported), exactly like the
    composite's per-head softmax. A shared row max across the group is NOT
    safe: when one head's logits sit far (> ~88, the f32 exp underflow
    range) below a sibling head's, its whole exp block underflows to zero
    and the 0/0 division poisons the output with NaN. The per-block sums
    broadcast back to lanes via ONE matmul with the block-diagonal 0/1 mask
    (MXU) instead of slice+reduce+concat.
    """
    gd = group * dim
    if group == 1:
        m = jnp.max(q, axis=-1, keepdims=True)
    else:
        m = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.max(q[:, i * dim : (i + 1) * dim], axis=-1, keepdims=True),
                    (q.shape[0], dim),
                )
                for i in range(group)
            ],
            axis=-1,
        )
    e = jnp.exp(q - m)
    s = jnp.dot(e, _block_diag_mask(gd, dim), preferred_element_type=jnp.float32)
    q = e / s
    if scale != 1.0:
        q = q * scale
    return q


def _context_kernel(wk_ref, wv_ref, x_ref, ctx_ref, *, group, dim):
    """Pass 1: per-frame, per head-GROUP context -> (n_groups, gd, gd).

    Needs the whole frame in VMEM (the k-softmax normalizes over ALL n
    tokens), but holds only one 128-lane group's k/v at a time (fori +
    group-major weights), so it fits even at n = 64*64. The (gd, gd)
    context is masked block-diagonal so heads never mix.
    """
    x = x_ref[0]  # (n, c) — matmuls in the input dtype, f32 softmax/accum
    gd = group * dim
    mask = _block_diag_mask(gd, dim)
    # k is computed TRANSPOSED, (gd, n): its softmax normalizes over the
    # token axis, and on the lane (last) axis that reduction is a fast
    # within-register VPU op instead of a cross-sublane one.
    xT = x.T  # (c, n)

    def body(g, _):
        kT = jax.lax.dot_general(
            wk_ref[g], xT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, n) = (x @ wk)^T
        kT = kT - jnp.max(kT, axis=-1, keepdims=True)
        ek = jnp.exp(kT)
        kT = ek / jnp.sum(ek, axis=-1, keepdims=True)
        v = jnp.dot(x, wv_ref[g], preferred_element_type=jnp.float32)
        ctx = jax.lax.dot_general(
            kT.astype(x.dtype), v.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, gd)
        ctx_ref[0, g] = ctx * mask
        return 0

    jax.lax.fori_loop(0, wk_ref.shape[0], body, 0)


def _out_kernel(wq_ref, wo_ref, ctx_ref, x_ref, out_ref, *, group, dim, scale):
    """Pass 2: token-chunked q-softmax and output projection, per group.

    The q softmax is strictly per-token, so the token axis chunks freely in
    the grid; each program reads the tiny per-frame contexts and writes its
    chunk of ``x + y``.
    """
    x = x_ref[0]  # (nc, c) — matmuls in the input dtype, f32 softmax/accum
    nc, c = x.shape

    def body(g, y):
        q = jnp.dot(x, wq_ref[g], preferred_element_type=jnp.float32)  # (nc, gd)
        q = _blockwise_q_softmax(q, nc, group, dim, scale)
        o = jnp.dot(
            q.astype(x.dtype), ctx_ref[0, g].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )  # (nc, gd) — cross-head terms are zero (block-diagonal context)
        return y + jnp.dot(
            o.astype(x.dtype), wo_ref[g], preferred_element_type=jnp.float32
        )

    y = jax.lax.fori_loop(0, wq_ref.shape[0], body, jnp.zeros((nc, c), jnp.float32))
    out_ref[0] = x + y.astype(x.dtype)


def _ctx_pallas(xt, wk, wv, group, dim):
    """Per-frame, per-group block-diagonal contexts (pass 1 / bwd recompute)."""
    frames, n, c = xt.shape
    n_groups, _, gd = wk.shape
    return pl.pallas_call(
        functools.partial(_context_kernel, group=group, dim=dim),
        grid=(frames,),
        in_specs=[
            pl.BlockSpec((n_groups, c, gd), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, c, gd), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_groups, gd, gd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((frames, n_groups, gd, gd), jnp.float32),
        interpret=FORCE_INTERPRET,
    )(wk, wv, xt)


def _ctx_stats_kernel(wk_ref, wv_ref, x_ref, ctx_ref, m_ref, z_ref, *, group, dim):
    """Like :func:`_context_kernel`, but also emits the k-softmax row max and
    denominator per (group, head-lane) so later passes can recompute
    softmax probabilities chunk-by-chunk without the whole frame in VMEM.
    Stats are stored as ``(gd, 1)`` panels (lane dim 1) — reshaping them to
    lane-major would split the lane dim, which Mosaic rejects."""
    x = x_ref[0]  # (n, c)
    gd = group * dim
    mask = _block_diag_mask(gd, dim)
    xT = x.T  # (c, n)

    def body(g, _):
        kT_raw = jax.lax.dot_general(
            wk_ref[g], xT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, n)
        m = jnp.max(kT_raw, axis=-1, keepdims=True)  # (gd, 1)
        ek = jnp.exp(kT_raw - m)
        z = jnp.sum(ek, axis=-1, keepdims=True)  # (gd, 1)
        sT = ek / z
        v = jnp.dot(x, wv_ref[g], preferred_element_type=jnp.float32)
        ctx = jax.lax.dot_general(
            sT.astype(x.dtype), v.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ctx_ref[0, g] = ctx * mask
        m_ref[0, g] = m
        z_ref[0, g] = z
        return 0

    jax.lax.fori_loop(0, wk_ref.shape[0], body, 0)


def _ctx_stats_pallas(xt, wk, wv, group, dim):
    """Contexts plus k-softmax statistics, for the chunked backward."""
    frames, n, c = xt.shape
    n_groups, _, gd = wk.shape
    const = lambda i: (0, 0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_ctx_stats_kernel, group=group, dim=dim),
        grid=(frames,),
        in_specs=[
            pl.BlockSpec((n_groups, c, gd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, c, gd), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_groups, gd, gd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_groups, gd, 1), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_groups, gd, 1), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((frames, n_groups, gd, gd), jnp.float32),
            jax.ShapeDtypeStruct((frames, n_groups, gd, 1), jnp.float32),
            jax.ShapeDtypeStruct((frames, n_groups, gd, 1), jnp.float32),
        ],
        interpret=FORCE_INTERPRET,
    )(wk, wv, xt)


def _token_chunk(n: int) -> int:
    nc = min(n, 2048)
    while n % nc != 0:
        nc //= 2
    return nc


def _forward_two_pass(x, wqkv, wo, heads, dim, scale):
    """Large-n path (e.g. 64*64 tokens): contexts per frame, then chunked out."""
    b, f, hh, ww, c = x.shape
    n = hh * ww
    frames = b * f
    xt = x.reshape(frames, n, c)
    wq, wk, wv, wo3, group, n_groups = _group_views(wqkv, wo, heads, dim, x.dtype)
    gd = group * dim

    ctx = _ctx_pallas(xt, wk, wv, group, dim)

    nc = _token_chunk(n)
    out = pl.pallas_call(
        functools.partial(_out_kernel, group=group, dim=dim, scale=scale),
        grid=(frames, n // nc),
        in_specs=[
            pl.BlockSpec((n_groups, c, gd), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, gd, c), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_groups, gd, gd), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nc, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((frames, n, c), x.dtype),
        interpret=FORCE_INTERPRET,
    )(wq, wo3, ctx, xt)
    return out.reshape(b, f, hh, ww, c)


def _composite_xla(x, wqkv, wo, heads: int, dim: int, scale: float):
    """Compat-mode math in plain XLA (fallback + custom-VJP backward).

    Output dtype is exactly ``x.dtype`` — the custom VJP requires forward
    (Pallas) and backward-recompute paths to agree on JAX types.
    """
    b, f, hh, ww, c = x.shape
    n = hh * ww
    t = x.reshape(b * f, n, c)
    qkv = jnp.einsum("bnc,ck->bnk", t, wqkv.astype(x.dtype))
    hd = heads * dim

    def split(a, i):
        part = a[..., i * hd : (i + 1) * hd]
        return part.reshape(b * f, n, heads, dim)

    q, k, v = split(qkv, 0), split(qkv, 1), split(qkv, 2)
    q = jax.nn.softmax(q.astype(jnp.float32), axis=-1).astype(x.dtype)
    if scale != 1.0:
        q = q * jnp.asarray(scale, x.dtype)
    k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
    context = jnp.einsum("bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32)
    o = jnp.einsum("bnhd,bhde->bnhe", q, context.astype(x.dtype))
    o = o.reshape(b * f, n, hd)
    y = jnp.einsum("bnk,kc->bnc", o, wo.astype(x.dtype))
    return x + y.reshape(b, f, hh, ww, c).astype(x.dtype)


def _pad128(d: int) -> int:
    return ((d + 127) // 128) * 128


def _supported(x, heads: int, dim: int) -> bool:
    if x.ndim != 5:
        return False
    _, _, hh, ww, c = x.shape
    n = hh * ww
    # Live VMEM per program, accounting for Mosaic's lane padding to 128:
    # x + y + out (c lanes) and one head's q/k/v + softmax temporaries
    # (dim lanes). Measured headroom: the compiler's stack estimate runs
    # ~2x this, so budget conservatively.
    live = 4 * n * (3 * _pad128(c) + 6 * _pad128(dim))
    if live > _VMEM_BUDGET_BYTES:
        return False
    if FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_spatial_linear_attention_block(x, wqkv, wo, heads: int, dim: int, scale: float):
    """``x + SpatialLinearAttention(x)``; x is ``(b, f, h, w, c)``.

    ``wqkv``: ``(c, 3*heads*dim)`` packed q|k|v 1x1-conv kernels (no biases —
    the reference's projections are bias-free); ``wo``: ``(heads*dim, c)``.
    ``scale``: 1.0 for reference-compat (dropped scale), ``dim**-0.5`` fixed.
    """
    return _forward(x, wqkv, wo, heads, dim, scale)


def _two_pass_supported(x) -> bool:
    if x.ndim != 5:
        return False
    _, _, hh, ww, c = x.shape
    n = hh * ww
    # Pass 1 keeps one frame + one head's k/v in VMEM.
    live = 4 * n * (_pad128(c) + 3 * _pad128(32))
    if live > _VMEM_BUDGET_BYTES:
        return False
    if FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def _forward(x, wqkv, wo, heads, dim, scale):
    if not _supported(x, heads, dim):
        if _two_pass_supported(x):
            # Large-n frames (e.g. 64x64 tokens): group-major weights, two
            # Pallas passes (contexts, then chunked outputs).
            return _forward_two_pass(x, wqkv, wo, heads, dim, scale)
        return _composite_xla(x, wqkv, wo, heads, dim, scale)
    b, f, hh, ww, c = x.shape
    n = hh * ww
    frames = b * f
    xt = x.reshape(frames, n, c)
    # Group-major weight views for leading-dim indexing inside the kernel:
    # (n_groups, c, group*dim) with heads laid out contiguously per group.
    wq, wk, wv, wo3, group, n_groups = _group_views(wqkv, wo, heads, dim, x.dtype)
    gd = group * dim
    kernel = functools.partial(_kernel, group=group, dim=dim, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(frames,),
        in_specs=[
            pl.BlockSpec((n_groups, c, gd), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, c, gd), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, c, gd), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, gd, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((frames, n, c), x.dtype),
        interpret=FORCE_INTERPRET,
    )(wq, wk, wv, wo3, xt)
    return out.reshape(b, f, hh, ww, c)


def _bwd_q_kernel(
    wq_ref, wo_ref, ctx_ref, x_ref, g_ref,
    dx_ref, dctx_ref, dwq_ref, dwo_ref,
    *, group, dim, scale,
):
    """Backward pass 1 (token-chunked): the q/out-projection path.

    Recomputes q-softmax and the attention output for one token chunk and
    emits dx_q = g + dq @ wq^T plus the dctx cotangent (accumulated across
    the chunk axis; the TPU grid is sequential so zero-at-chunk-0 +
    accumulate is race-free) and the dwq/dwo weight gradients (accumulated
    across the whole grid via constant out-block index maps).
    """
    x = x_ref[0]  # (nc, c)
    g = g_ref[0]
    nc, c = x.shape
    gd = group * dim
    gf32 = g.astype(jnp.float32)
    gc = gf32.astype(x.dtype)
    mask = _block_diag_mask(gd, dim)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init_w():
        dwq_ref[...] = jnp.zeros(dwq_ref.shape, dwq_ref.dtype)
        dwo_ref[...] = jnp.zeros(dwo_ref.shape, dwo_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _init_ctx():
        dctx_ref[...] = jnp.zeros(dctx_ref.shape, dctx_ref.dtype)

    def body(gi, y):
        q = jnp.dot(x, wq_ref[gi], preferred_element_type=jnp.float32)  # (nc, gd)
        p = _blockwise_q_softmax(q, nc, group, dim, 1.0)  # f32 probabilities
        qs_c = (p * scale).astype(x.dtype)
        o = jnp.dot(
            qs_c, ctx_ref[0, gi].astype(x.dtype), preferred_element_type=jnp.float32
        )  # (nc, gd)

        dwo_ref[gi] = dwo_ref[gi] + jax.lax.dot_general(
            o.astype(x.dtype), gc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, c)
        do = jax.lax.dot_general(
            gc, wo_ref[gi],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nc, gd)
        do_c = do.astype(x.dtype)

        dctx_ref[0, gi] = dctx_ref[0, gi] + mask * jax.lax.dot_general(
            qs_c, do_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, gd); cross-head entries were masked in the forward

        dqs = jax.lax.dot_general(
            do_c, ctx_ref[0, gi].astype(x.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nc, gd) = do @ ctx^T
        # Blockwise-softmax VJP: dq = p * (dp - sum_block(dp * p)); the
        # per-block sums broadcast back to lanes via the 0/1 mask matmul.
        dp = dqs * scale
        t = jnp.dot(dp * p, mask, preferred_element_type=jnp.float32)
        dq = p * (dp - t)
        dq_c = dq.astype(x.dtype)

        dwq_ref[gi] = dwq_ref[gi] + jax.lax.dot_general(
            x, dq_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (c, gd)
        return y + jax.lax.dot_general(
            dq_c, wq_ref[gi],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (nc, c)

    y = jax.lax.fori_loop(0, wq_ref.shape[0], body, jnp.zeros((nc, c), jnp.float32))
    # Residual path: dx_q = g + q-path gradient (the k/v path adds in pass 2).
    dx_ref[0] = (gf32 + y).astype(dx_ref.dtype)


def _bwd_kv_kernel(
    wk_ref, wv_ref, x_ref, dctx_ref, dxp_ref,
    dx_ref, dwk_ref, dwv_ref,
    *, group, dim,
):
    """Backward pass 2 (per frame): the k/v path, in transposed layout.

    The k-softmax normalizes over ALL n tokens, so the whole frame must be
    in VMEM; everything is computed as (gd, n) panels so the token-axis
    softmax statistics and VJP reductions run along lanes (fast VPU ops).
    Only one head group's panels are live at a time (fori + group-major
    weights). dx = dx_partial (from pass 1) + dk @ wk^T + dv @ wv^T.
    """
    x = x_ref[0]  # (n, c)
    n, c = x.shape
    xT = x.T  # (c, n)

    @pl.when(pl.program_id(0) == 0)
    def _init_w():
        dwk_ref[...] = jnp.zeros(dwk_ref.shape, dwk_ref.dtype)
        dwv_ref[...] = jnp.zeros(dwv_ref.shape, dwv_ref.dtype)

    def body(gi, dxT):
        kT = jax.lax.dot_general(
            wk_ref[gi], xT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, n) = (x @ wk)^T
        kT = kT - jnp.max(kT, axis=-1, keepdims=True)
        ek = jnp.exp(kT)
        sT = ek / jnp.sum(ek, axis=-1, keepdims=True)  # f32 probabilities
        sT_c = sT.astype(x.dtype)
        vT = jax.lax.dot_general(
            wv_ref[gi], xT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, n)
        dctx_c = dctx_ref[0, gi].astype(x.dtype)

        # ctx[d, e] = sum_n s[n, d] v[n, e]  (transposed: sT (d, n), vT (e, n))
        dsT = jax.lax.dot_general(
            dctx_c, vT.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, n): dsT[d, n] = sum_e dctx[d, e] vT[e, n]
        dvT = jax.lax.dot_general(
            dctx_c, sT_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, n): dvT[e, n] = sum_d dctx[d, e] sT[d, n]

        # Token-axis softmax VJP, reduced along lanes.
        dkT = sT * (dsT - jnp.sum(dsT * sT, axis=-1, keepdims=True))
        dkT_c = dkT.astype(x.dtype)
        dvT_c = dvT.astype(x.dtype)

        # Weight grads in TRANSPOSED form: dwk^T = dk^T @ x is a plain
        # (gd, n) @ (n, c) matmul (no cross-lane contraction); the caller
        # transposes back once outside the kernel.
        dwk_ref[gi] = dwk_ref[gi] + jnp.dot(
            dkT_c, x, preferred_element_type=jnp.float32
        )  # (gd, c)
        dwv_ref[gi] = dwv_ref[gi] + jnp.dot(
            dvT_c, x, preferred_element_type=jnp.float32
        )  # (gd, c)

        # dxT += wk @ dkT + wv @ dvT  (each (c, gd) @ (gd, n) -> (c, n))
        dxT = dxT + jnp.dot(wk_ref[gi], dkT_c, preferred_element_type=jnp.float32)
        return dxT + jnp.dot(wv_ref[gi], dvT_c, preferred_element_type=jnp.float32)

    dxT = jax.lax.fori_loop(
        0, wk_ref.shape[0], body, jnp.zeros((c, n), jnp.float32)
    )
    dx_ref[0] = (dxp_ref[0].astype(jnp.float32) + dxT.T).astype(dx_ref.dtype)


def _bwd_kv_chunk1_kernel(
    wk_ref, wv_ref, m_ref, z_ref, dctx_ref, x_ref, dxp_ref,
    dxpart_ref, rho_ref, dwv_ref,
    *, group, dim,
):
    """Chunked k/v backward, phase 1: the v path plus the softmax-VJP
    reduction ``rho = sum_n dsT * sT``.

    The whole-frame kernel (:func:`_bwd_kv_kernel`) needs every ``(gd, n)``
    panel in VMEM at once, which overflows the 16 MB stack at wide channels
    (c=128 at 64x64 tokens). Here softmax probabilities are recomputed
    chunk-by-chunk from the saved per-frame max/denominator, so VMEM scales
    with the chunk, not the frame. ``rho`` accumulates across the
    (sequential) chunk axis; ``dwv`` accumulates across the whole grid.
    """
    x = x_ref[0]  # (nc, c)
    nc, c = x.shape
    xT = x.T

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init_w():
        dwv_ref[...] = jnp.zeros(dwv_ref.shape, dwv_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _init_rho():
        rho_ref[...] = jnp.zeros(rho_ref.shape, rho_ref.dtype)

    def body(gi, dxT):
        kT = jax.lax.dot_general(
            wk_ref[gi], xT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, nc)
        sT = jnp.exp(kT - m_ref[0, gi]) / z_ref[0, gi]
        sT_c = sT.astype(x.dtype)
        vT = jax.lax.dot_general(
            wv_ref[gi], xT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, nc)
        dctx_c = dctx_ref[0, gi].astype(x.dtype)
        dsT = jax.lax.dot_general(
            dctx_c, vT.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, nc)
        rho_ref[0, gi] = rho_ref[0, gi] + jnp.sum(dsT * sT, axis=-1, keepdims=True)
        dvT = jax.lax.dot_general(
            dctx_c, sT_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (gd, nc)
        dvT_c = dvT.astype(x.dtype)
        dwv_ref[gi] = dwv_ref[gi] + jnp.dot(dvT_c, x, preferred_element_type=jnp.float32)
        return dxT + jnp.dot(wv_ref[gi], dvT_c, preferred_element_type=jnp.float32)

    dxT = jax.lax.fori_loop(0, wk_ref.shape[0], body, jnp.zeros((c, nc), jnp.float32))
    dxpart_ref[0] = (dxp_ref[0].astype(jnp.float32) + dxT.T).astype(dxpart_ref.dtype)


def _bwd_kv_chunk2_kernel(
    wk_ref, wv_ref, m_ref, z_ref, dctx_ref, rho_ref, x_ref, dxp_ref,
    dx_ref, dwk_ref,
    *, group, dim,
):
    """Chunked k/v backward, phase 2: finish the k path with the complete
    ``rho`` (dkT = sT * (dsT - rho)) and emit dx plus dwk."""
    x = x_ref[0]  # (nc, c)
    nc, c = x.shape
    xT = x.T

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init_w():
        dwk_ref[...] = jnp.zeros(dwk_ref.shape, dwk_ref.dtype)

    def body(gi, dxT):
        kT = jax.lax.dot_general(
            wk_ref[gi], xT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sT = jnp.exp(kT - m_ref[0, gi]) / z_ref[0, gi]
        vT = jax.lax.dot_general(
            wv_ref[gi], xT,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dctx_c = dctx_ref[0, gi].astype(x.dtype)
        dsT = jax.lax.dot_general(
            dctx_c, vT.astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dkT = sT * (dsT - rho_ref[0, gi])
        dkT_c = dkT.astype(x.dtype)
        dwk_ref[gi] = dwk_ref[gi] + jnp.dot(dkT_c, x, preferred_element_type=jnp.float32)
        return dxT + jnp.dot(wk_ref[gi], dkT_c, preferred_element_type=jnp.float32)

    dxT = jax.lax.fori_loop(0, wk_ref.shape[0], body, jnp.zeros((c, nc), jnp.float32))
    dx_ref[0] = (dxp_ref[0].astype(jnp.float32) + dxT.T).astype(dx_ref.dtype)


def _q_path_pallas(xt, gt, wq, wo3, ctx, group, dim, scale):
    """Token-chunked q/out-projection backward (shared by the whole-frame
    and chunked k/v backwards): returns ``(dxq, dctx, dwq, dwo3)``."""
    frames, n, c = xt.shape
    n_groups, _, gd = wq.shape
    nc = _token_chunk(n)
    const2 = lambda i, j: (0, 0, 0)  # noqa: E731 — grid-invariant weight grads
    return pl.pallas_call(
        functools.partial(_bwd_q_kernel, group=group, dim=dim, scale=scale),
        grid=(frames, n // nc),
        in_specs=[
            pl.BlockSpec((n_groups, c, gd), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, gd, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_groups, gd, gd), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nc, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_groups, gd, gd), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, c, gd), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, gd, c), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((frames, n, c), xt.dtype),
            jax.ShapeDtypeStruct((frames, n_groups, gd, gd), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, c, gd), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, gd, c), jnp.float32),
        ],
        interpret=FORCE_INTERPRET,
    )(wq, wo3, ctx, xt, gt)


def _backward_pallas_chunked(x, wqkv, wo, g, heads, dim, scale):
    """Fused backward for frames too wide for the whole-frame k/v kernel.

    Four passes, all chunk-bounded in VMEM: contexts + k-softmax stats
    (per frame), the token-chunked q path (shared with the fitting case),
    then the k/v path split into a rho-accumulation phase and a
    finish phase (the token-axis softmax VJP needs the full-frame
    reduction before any chunk's dk can be finished).
    """
    b, f, hh, ww, c = x.shape
    n = hh * ww
    frames = b * f
    xt = x.reshape(frames, n, c)
    gt = g.reshape(frames, n, c)
    wq, wk, wv, wo3, group, n_groups = _group_views(wqkv, wo, heads, dim, x.dtype)
    gd = group * dim

    ctx, m, z = _ctx_stats_pallas(xt, wk, wv, group, dim)
    dxq, dctx, dwq, dwo3 = _q_path_pallas(xt, gt, wq, wo3, ctx, group, dim, scale)

    const2 = lambda i, j: (0, 0, 0)  # noqa: E731
    nck = _token_chunk(min(n, 1024))
    stat_spec = pl.BlockSpec((1, n_groups, gd, 1), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, nck, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    dxpart, rho, dwv = pl.pallas_call(
        functools.partial(_bwd_kv_chunk1_kernel, group=group, dim=dim),
        grid=(frames, n // nck),
        in_specs=[
            pl.BlockSpec((n_groups, c, gd), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, c, gd), const2, memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
            pl.BlockSpec((1, n_groups, gd, gd), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            chunk_spec,
            chunk_spec,
        ],
        out_specs=[
            chunk_spec,
            stat_spec,
            pl.BlockSpec((n_groups, gd, c), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((frames, n, c), x.dtype),
            jax.ShapeDtypeStruct((frames, n_groups, gd, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, gd, c), jnp.float32),
        ],
        interpret=FORCE_INTERPRET,
    )(wk, wv, m, z, dctx, xt, dxq)

    dx, dwk = pl.pallas_call(
        functools.partial(_bwd_kv_chunk2_kernel, group=group, dim=dim),
        grid=(frames, n // nck),
        in_specs=[
            pl.BlockSpec((n_groups, c, gd), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, c, gd), const2, memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
            pl.BlockSpec((1, n_groups, gd, gd), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            stat_spec,
            chunk_spec,
            chunk_spec,
        ],
        out_specs=[
            chunk_spec,
            pl.BlockSpec((n_groups, gd, c), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((frames, n, c), x.dtype),
            jax.ShapeDtypeStruct((n_groups, gd, c), jnp.float32),
        ],
        interpret=FORCE_INTERPRET,
    )(wk, wv, m, z, dctx, rho, xt, dxpart)

    hd = heads * dim

    def _unpack(dwx):  # (n_groups, c, gd) -> (c, hd)
        return jnp.transpose(dwx, (1, 0, 2)).reshape(c, hd)

    def _unpack_t(dwxT):  # (n_groups, gd, c) -> (c, hd)
        return jnp.transpose(dwxT, (2, 0, 1)).reshape(c, hd)

    dwqkv = jnp.concatenate([_unpack(dwq), _unpack_t(dwk), _unpack_t(dwv)], axis=-1)
    dwo = dwo3.reshape(hd, c)
    return (
        dx.reshape(b, f, hh, ww, c),
        dwqkv.astype(wqkv.dtype),
        dwo.astype(wo.dtype),
    )


def _backward_pallas(x, wqkv, wo, g, heads, dim, scale):
    """Fused three-pass backward: recompute contexts, q-path, then k/v-path."""
    b, f, hh, ww, c = x.shape
    n = hh * ww
    frames = b * f
    xt = x.reshape(frames, n, c)
    gt = g.reshape(frames, n, c)
    wq, wk, wv, wo3, group, n_groups = _group_views(wqkv, wo, heads, dim, x.dtype)
    gd = group * dim

    ctx = _ctx_pallas(xt, wk, wv, group, dim)
    dxq, dctx, dwq, dwo3 = _q_path_pallas(xt, gt, wq, wo3, ctx, group, dim, scale)

    const1 = lambda i: (0, 0, 0)  # noqa: E731
    dx, dwk, dwv = pl.pallas_call(
        functools.partial(_bwd_kv_kernel, group=group, dim=dim),
        grid=(frames,),
        in_specs=[
            pl.BlockSpec((n_groups, c, gd), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, c, gd), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_groups, gd, gd), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, gd, c), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, gd, c), const1, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((frames, n, c), x.dtype),
            jax.ShapeDtypeStruct((n_groups, gd, c), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, gd, c), jnp.float32),
        ],
        interpret=FORCE_INTERPRET,
    )(wk, wv, xt, dctx, dxq)

    # Group-major gradients back to the packed public layouts (dwk/dwv come
    # out of the kernel transposed, (n_groups, gd, c)).
    hd = heads * dim
    def _unpack(dwx):  # (n_groups, c, gd) -> (c, hd)
        return jnp.transpose(dwx, (1, 0, 2)).reshape(c, hd)

    def _unpack_t(dwxT):  # (n_groups, gd, c) -> (c, hd)
        return jnp.transpose(dwxT, (2, 0, 1)).reshape(c, hd)

    dwqkv = jnp.concatenate([_unpack(dwq), _unpack_t(dwk), _unpack_t(dwv)], axis=-1)
    dwo = dwo3.reshape(hd, c)
    return (
        dx.reshape(b, f, hh, ww, c),
        dwqkv.astype(wqkv.dtype),
        dwo.astype(wo.dtype),
    )


def _fwd(x, wqkv, wo, heads, dim, scale):
    return _forward(x, wqkv, wo, heads, dim, scale), (x, wqkv, wo)


def _bwd_fits(x, heads: int, dim: int) -> bool:
    """VMEM estimate for the k/v backward kernel (the tightest of the three
    backward passes: whole-frame (gd, n) f32 panels).

    Per-token live bytes: six f32 ``(gd, n)`` panels (kT/sT/vT/dsT/dvT/dkT),
    their bf16 casts, three double-buffered ``(n, c)`` blocks (x, dx_partial,
    dx — lanes pad to 128), the f32 ``(c, n)`` dxT accumulator and the bf16
    xT view. Mosaic's allocator reuses ~30% of that in practice, so the
    estimate is scaled by 0.7 against a 15.5 MB budget — calibrated on this
    toolchain: (n=4096, c=32, gd=128) measures ~14 MB (fits), (n=4096,
    c=128) measures 16.76 MB (OOMs the 16 MB stack).
    """
    _, _, hh, ww, c = x.shape
    n = hh * ww
    it = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    group, _ = _head_group(heads, dim)
    gd = group * dim
    per_token = 6 * gd * 4 + 2 * gd * it + 3 * 2 * _pad128(c) * it + c * 4 + c * it
    return 0.7 * n * per_token <= 15.5 * 1024 * 1024


def _bwd(heads, dim, scale, residuals, g):
    """Fused Pallas backward on TPU; XLA-composite VJP elsewhere.

    Frames whose whole-frame k/v panels fit the VMEM stack take the
    three-pass kernel; wider frames (e.g. c=128 at 64x64 tokens) take the
    chunked variant, which recomputes softmax probabilities per token chunk
    from saved per-frame statistics."""
    x, wqkv, wo = residuals
    if _two_pass_supported(x):
        if _bwd_fits(x, heads, dim):
            return _backward_pallas(x, wqkv, wo, g, heads, dim, scale)
        return _backward_pallas_chunked(x, wqkv, wo, g, heads, dim, scale)
    _, vjp = jax.vjp(lambda *a: _composite_xla(*a, heads, dim, scale), x, wqkv, wo)
    return vjp(g)


fused_spatial_linear_attention_block.defvjp(_fwd, _bwd)


def pack_sla_weights(sla) -> tuple[jax.Array, jax.Array]:
    """Pack a SpatialLinearAttention module's 1x1-conv kernels for the kernel."""
    c = sla.q.kernel[...].shape[1]
    wq = sla.q.kernel[...][0]  # (c, H*D)
    wk = sla.k.kernel[...][0]
    wv = sla.v.kernel[...][0]
    wqkv = jnp.concatenate([wq, wk, wv], axis=-1)
    wo = sla.to_out.kernel[...][0]  # (H*D, c)
    return wqkv, wo
