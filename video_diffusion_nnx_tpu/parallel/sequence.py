"""Sequence (frame-axis) parallelism for temporal attention.

Greenfield capability — the reference has no long-context scaling at all
(SURVEY.md §5): its full ``f x f`` temporal attention runs wholly on every
device, so activation memory per device grows linearly with frame count.

Design (Ulysses-style all-gather, right-sized for video diffusion): shard
activations over the frame axis on a ``'seq'`` mesh axis. Each device
projects q/k/v for its local frames, all-gathers only the (small) K and V
panels over ICI, attends its local queries against the global K/V, and
keeps outputs frame-sharded. For f <= a few hundred frames the gathered
K/V are tiny compared to ring-attention bookkeeping, and XLA overlaps the
all-gather with the projection matmuls.

Communication per block: 2 * f * heads * dim * bytes — independent of the
(much larger) spatial extent, so the collective rides ICI far below the
compute time of the surrounding convs.
"""

from __future__ import annotations

import math
from functools import partial


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sequence_parallel_temporal_attention(
    x: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    heads: int,
    dim: int,
    mesh: Mesh,
    seq_axis: str = "seq",
    batch_axis: str | None = None,
) -> jax.Array:
    """``x + MHA(x)`` over frames, with frames sharded across ``seq_axis``.

    ``x``: ``(b, s, f, c)`` (s = spatial tokens); returns the same shape,
    frame-sharded on ``seq_axis``. Weight packing matches
    ``ops.temporal_attention.pack_mha_weights``. ``batch_axis`` keeps the
    batch dimension sharded (e.g. over ``'data'``) inside the shard_map —
    without it a data-parallel caller would all-gather the batch here.
    """
    hd = heads * dim
    scale = 1.0 / math.sqrt(dim)

    def local_block(x_local, wqkv, bqkv, wo, bo):
        # x_local: (b_local, s, f_local, c) — this device's frame slice.
        wqkv, wo = wqkv.astype(x_local.dtype), wo.astype(x_local.dtype)
        qkv = jnp.einsum("bsfc,ck->bsfk", x_local, wqkv) + bqkv.astype(x_local.dtype)
        q = qkv[..., :hd] * scale
        k = qkv[..., hd : 2 * hd]
        v = qkv[..., 2 * hd :]

        # Gather K/V panels from every seq shard: (b, s, f_global, h*d).
        # tiled=True concatenates along the frame axis.
        k = jax.lax.all_gather(k, seq_axis, axis=2, tiled=True)
        v = jax.lax.all_gather(v, seq_axis, axis=2, tiled=True)

        b, s, fl, _ = q.shape
        fg = k.shape[2]
        q = q.reshape(b, s, fl, heads, dim)
        k = k.reshape(b, s, fg, heads, dim)
        v = v.reshape(b, s, fg, heads, dim)

        sim = jnp.einsum("bsihd,bsjhd->bshij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1)
        o = jnp.einsum("bshij,bsjhd->bsihd", attn.astype(x_local.dtype), v)
        o = o.reshape(b, s, fl, hd)
        return x_local + jnp.einsum("bsfk,kc->bsfc", o, wo) + bo.astype(x_local.dtype)

    x_spec = P(batch_axis, None, seq_axis, None)
    shard = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(x_spec, P(), P(), P(), P()),
        out_specs=x_spec,
    )
    return shard(local_block)(x, wqkv, bqkv, wo, bo)
