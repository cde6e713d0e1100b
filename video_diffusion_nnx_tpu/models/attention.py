"""Attention blocks: spatial linear attention, temporal multi-head attention,
and T5-style relative position bias.

Parity surface: reference modules.py:64-129 (SpatialLinearAttention),
247-326 (MultiheadAttention), 330-390 (RelativePositionBias).

TPU-first design
----------------
* Q/K/V projections are pointwise convs lowered to flattened matmuls
  (:class:`~video_diffusion_nnx_tpu.models.layers.PointwiseConv`) — one big
  ``(tokens, cin) @ (cin, cout)`` per projection for the MXU.
* The temporal attention matrix is tiny (``f x f`` with f = 2..32) but is
  batched over ``b * h * w`` tokens, so the einsums below are large batched
  matmuls; XLA tiles them onto the MXU directly. A fused Pallas kernel lives
  in ``ops/temporal_attention.py`` for the hot path.
* Reference-compat quirks are preserved behind ``reference_compat`` (see
  each class) because reference checkpoints were trained with them.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import nnx

from video_diffusion_nnx_tpu.models.layers import PointwiseConv

_NEG_INF = jnp.finfo(jnp.float32).min


def _concrete_bool(x) -> bool | None:
    """Return a Python bool for a concrete JAX/numpy scalar, else None."""
    try:
        return bool(x)
    except (jax.errors.TracerBoolConversionError, jax.errors.ConcretizationTypeError):
        return None


class SpatialLinearAttention(nnx.Module):
    """Linear (softmax-kernelized) attention over the ``h*w`` spatial tokens
    of each frame, frames folded into batch.

    Parity: reference modules.py:64-129. Cost is O(h*w * D^2) instead of
    O((h*w)^2 * D): ``context = softmax(k) @ v^T`` reduces over the spatial
    axis first, then ``out = context^T @ softmax(q)``.

    Reference quirk preserved in ``reference_compat=True`` mode: the scaled
    query ``q * D**-0.5`` is computed but *discarded* — the einsums consume
    the unscaled softmaxed q (reference modules.py:107-108 binds the scaled
    value to a name never used at 117-118). Checkpoints were trained with
    the unscaled math, so compat mode reproduces it; ``False`` applies the
    scale as intended.

    Input/output layout: ``(b, f, h, w, c)``.
    """

    def __init__(
        self,
        dim: int,
        heads: int,
        D: int,
        rngs: nnx.Rngs,
        dtype=None,
        reference_compat: bool = True,
    ):
        self.scale = D ** -0.5
        self.heads = heads
        self.dtype = dtype
        self.reference_compat = reference_compat
        hD = D * heads
        self.q = PointwiseConv(dim, hD, kernel_size=1, use_bias=False, dtype=dtype, rngs=rngs)
        self.k = PointwiseConv(dim, hD, kernel_size=1, use_bias=False, dtype=dtype, rngs=rngs)
        self.v = PointwiseConv(dim, hD, kernel_size=1, use_bias=False, dtype=dtype, rngs=rngs)
        self.to_out = PointwiseConv(hD, dim, kernel_size=1, use_bias=False, dtype=dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, h, w, c = x.shape
        tokens = x.reshape(b * f, h * w, c)

        # (bf, n, heads*D) -> (bf, heads, D, n); n = h*w spatial tokens.
        def split_heads(t: jax.Array) -> jax.Array:
            return rearrange(t, "b n (h d) -> b h d n", h=self.heads)

        q = split_heads(self.q(tokens))
        k = split_heads(self.k(tokens))
        v = split_heads(self.v(tokens))

        # Kernelization per reference modules.py:107-112: q softmaxed over the
        # feature axis, k over the token axis. Softmaxes run in f32 even under
        # a bf16 compute policy (exp/normalize is precision-sensitive).
        q = jax.nn.softmax(q.astype(jnp.float32), axis=-2)
        if not self.reference_compat:
            q = q * self.scale
        k = jax.nn.softmax(k.astype(jnp.float32), axis=-1)
        if self.dtype is not None:
            q = q.astype(self.dtype)
            k = k.astype(self.dtype)

        # (bf, heads, D, D): reduce over the n tokens first — this is the
        # "linear" trick that keeps cost linear in h*w. f32 accumulation on
        # the MXU regardless of compute dtype.
        context = jnp.einsum("bhdn,bhen->bhde", k, v, preferred_element_type=jnp.float32)
        if self.dtype is not None:
            context = context.astype(self.dtype)
        out = jnp.einsum("bhde,bhdn->bhen", context, q, preferred_element_type=jnp.float32)
        if self.dtype is not None:
            out = out.astype(self.dtype)

        out = rearrange(out, "b h d n -> b n (h d)")
        out = self.to_out(out)
        return out.reshape(b, f, h, w, c)


class MultiheadAttention(nnx.Module):
    """Multi-head attention along the second-to-last axis (frames, for the
    temporal wrapping used in Unet3D).

    Parity: reference modules.py:247-326, including — in
    ``reference_compat=True`` mode — its two quirks:

    * the focus-present mask is applied *after* softmax (masked entries set
      to ``-inf`` without renormalizing, modules.py:307-316);
    * ``pos_bias`` is *added to the attention probabilities* after softmax
      (modules.py:320-321).

    Neither quirk is reachable from the reference Unet3D (PreNorm drops the
    kwargs), but direct callers see identical behavior. With
    ``reference_compat=False`` the mask and bias are applied to the logits
    before softmax (the mathematically standard form), fully traceable under
    ``jit`` (no Python branching on traced values).

    Input: ``(..., f, in_features)``; output: same shape.
    """

    def __init__(
        self,
        in_features: int,
        dim: int,
        num_heads: int,
        rngs: nnx.Rngs,
        rotary_emb: Any | None = None,
        reference_compat: bool = True,
        dtype=None,
    ):
        self.q = nnx.LinearGeneral(
            in_features=in_features, out_features=(num_heads, dim), dtype=dtype, rngs=rngs
        )
        self.k = nnx.LinearGeneral(
            in_features=in_features, out_features=(num_heads, dim), dtype=dtype, rngs=rngs
        )
        self.v = nnx.LinearGeneral(
            in_features=in_features, out_features=(num_heads, dim), dtype=dtype, rngs=rngs
        )
        self.out = nnx.LinearGeneral(
            in_features=(num_heads, dim),
            out_features=in_features,
            axis=(-2, -1),
            dtype=dtype,
            rngs=rngs,
        )
        self.dim = dim
        self.rotary_emb = rotary_emb
        self.reference_compat = reference_compat
        self.dtype = dtype

    def __call__(
        self,
        x: jax.Array,
        focus_present_mask: jax.Array | None = None,
        pos_bias: jax.Array | None = None,
    ) -> jax.Array:
        q = self.q(x)  # (..., f, heads, dim)
        k = self.k(x)
        v = self.v(x)
        f = x.shape[-2]

        if focus_present_mask is not None:
            all_present = _concrete_bool(jnp.all(focus_present_mask))
            if all_present:
                # Every sample attends only to itself: attention is the
                # identity, so the block reduces to the output projection of v
                # (reference modules.py:291-292).
                return self.out(v)
            if all_present is None and self.reference_compat:
                raise ValueError(
                    "reference_compat MultiheadAttention cannot trace a "
                    "data-dependent focus_present_mask; use reference_compat=False"
                )

        q = q / math.sqrt(self.dim)

        if self.rotary_emb is not None:
            q = self.rotary_emb.rotate_queries_or_keys(q)
            k = self.rotary_emb.rotate_queries_or_keys(k)

        # (..., heads, f, f) batched over every leading axis — on the Unet3D
        # temporal path the batch is b*h*w tokens, so this is one large
        # batched matmul for the MXU despite f being small. Accumulate and
        # softmax in f32 regardless of compute dtype.
        sim = jnp.einsum("...ihd,...jhd->...hij", q, k, preferred_element_type=jnp.float32)

        if self.reference_compat:
            attn = jax.nn.softmax(sim, axis=-1)
            if focus_present_mask is not None and _concrete_bool(jnp.any(focus_present_mask)):
                attn = jnp.where(self._focus_mask(focus_present_mask, f, attn.ndim), attn, _NEG_INF)
            if pos_bias is not None:
                attn = attn + pos_bias
        else:
            if pos_bias is not None:
                sim = sim + pos_bias
            if focus_present_mask is not None:
                sim = jnp.where(self._focus_mask(focus_present_mask, f, sim.ndim), sim, _NEG_INF)
            attn = jax.nn.softmax(sim, axis=-1)

        if self.dtype is not None:
            attn = attn.astype(self.dtype)
        out = jnp.einsum("...hij,...jhd->...ihd", attn, v, preferred_element_type=jnp.float32)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return self.out(out)

    @staticmethod
    def _focus_mask(focus_present_mask: jax.Array, f: int, attn_ndim: int) -> jax.Array:
        """Per-sample choice between attend-to-all and attend-to-self.

        Broadcasts the ``(b,)`` mask against the attention map's actual rank
        (the reference hardcoded a rank-6 broadcast, modules.py:311, which
        mis-broadcasts for the rank-5 temporal layout; this generalizes it).
        """
        attend_all = jnp.ones((f, f), dtype=jnp.bool_)
        attend_self = jnp.eye(f, dtype=jnp.bool_)
        batch_shape = focus_present_mask.shape + (1,) * (attn_ndim - 1)
        return jnp.where(
            focus_present_mask.reshape(batch_shape), attend_self, attend_all
        )


class RelativePositionBias(nnx.Module):
    """T5-style bucketed relative position bias for temporal attention.

    Parity: reference modules.py:330-390. Buckets are split half/half between
    positive and negative offsets; within each half, the first half of the
    buckets are exact distances and the rest are log-spaced up to
    ``max_distance``. Returns ``(heads, n, n)``.

    Deliberate divergence: the reference invokes its bucket function with the
    *default* ``num_buckets=32, max_distance=128`` (modules.py:386), silently
    ignoring the values passed to the constructor (Unet3D asks for
    ``max_distance=32``, unet3d.py:98-100). Here the configured values are
    honored. This is unobservable in reference-compat forward passes (PreNorm
    drops ``pos_bias`` before it reaches attention) and only changes the
    fixed-mode bias bucketing.
    """

    def __init__(
        self,
        rngs: nnx.Rngs,
        heads: int = 8,
        num_buckets: int = 32,
        max_distance: int = 128,
    ):
        self.num_buckets = num_buckets
        self.max_distance = max_distance
        self.relative_attention_bias = nnx.Embed(num_buckets, heads, rngs=rngs)

    @staticmethod
    def _relative_position_bucket(
        relative_position: jax.Array,
        num_buckets: int = 32,
        max_distance: int = 128,
    ) -> jax.Array:
        n = -relative_position
        num_buckets //= 2
        ret = (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)

        max_exact = num_buckets // 2
        is_small = n < max_exact

        val_if_large = max_exact + (
            jnp.log(n.astype(jnp.float32) / max_exact)
            / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)
        ).astype(jnp.int32)
        val_if_large = jnp.minimum(val_if_large, num_buckets - 1)

        return ret + jnp.where(is_small, n, val_if_large)

    def __call__(self, n: int) -> jax.Array:
        q_pos = jnp.arange(n, dtype=jnp.int32)
        k_pos = jnp.arange(n, dtype=jnp.int32)
        rel_pos = q_pos[:, None] - k_pos[None, :]
        rp_buckets = self._relative_position_bucket(
            rel_pos, num_buckets=self.num_buckets, max_distance=self.max_distance
        )
        emb = self.relative_attention_bias(rp_buckets)  # (n, n, heads)
        return jnp.transpose(emb, (2, 0, 1))
