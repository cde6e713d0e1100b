"""VideoDiT — a transformer (DiT-style) video denoiser family.

A second model family beyond the reference (which has only the
convolutional Unet3D): a factorized space/time video transformer in the
style of DiT (Peebles & Xie 2023) extended to video the way Sora-class
models are described — patchify each frame, alternate spatial attention
(tokens = patches, frames folded into batch) with temporal attention
(tokens = frames, patches folded into batch), condition every block on
the timestep (and optional text) embedding via adaLN-Zero, and
unpatchify.

It is a drop-in ``denoise_fn``: same calling convention as ``Unet3D``
(``(b, c, f, h, w)`` in, ``(b, f, h, w, c)`` out, ``forward_with_cond_scale``
for CFG), so ``GaussianDiffusion``, the Trainer, every sampler, the
distillation pipeline, and the CLIs work unchanged. Select it with
``unet.arch: dit`` in YAML.

TPU-first notes: all compute is large batched matmuls (MXU-shaped);
attention reuses ``MultiheadAttention`` in fixed (pre-softmax) math over
the second-to-last axis for both the spatial and temporal factorizations;
positional information is computed sin/cos (no size-locked buffers, so one
checkpoint serves any resolution whose patches divide evenly); adaLN-Zero
gates start at zero so every block is the identity at init and the
zero-init output projection makes the initial denoiser output exactly
zero (the DiT training-stability recipe, tested).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import nnx

from video_diffusion_nnx_tpu.models.attention import MultiheadAttention
from video_diffusion_nnx_tpu.models.layers import SinusoidalPosEmb
from video_diffusion_nnx_tpu.models.text import BERT_MODEL_DIM
from video_diffusion_nnx_tpu.utils.functional import exists, prob_mask_like


def _zero_linear(din: int, dout: int, rngs: nnx.Rngs, dtype=None) -> nnx.Linear:
    lin = nnx.Linear(din, dout, dtype=dtype, rngs=rngs)
    lin.kernel[...] = jnp.zeros_like(lin.kernel[...])
    lin.bias[...] = jnp.zeros_like(lin.bias[...])
    return lin


def _sincos_1d(dim: int, n: int) -> jax.Array:
    """(n, dim) fixed sin/cos positional table (computed, not stored)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / max(half - 1, 1)))
    angles = jnp.arange(n)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    if emb.shape[-1] < dim:  # odd dim
        emb = jnp.pad(emb, ((0, 0), (0, dim - emb.shape[-1])))
    return emb


class DiTBlock(nnx.Module):
    """Factorized space/time transformer block with adaLN-Zero conditioning.

    Nine modulation parameters per block (shift/scale/gate for spatial
    attention, temporal attention, and the MLP), regressed from the
    conditioning vector by a zero-initialized linear — the block is the
    identity function at init.
    """

    def __init__(
        self, dim: int, heads: int, head_dim: int, mlp_ratio: int,
        cond_dim: int, rngs: nnx.Rngs, dtype=None, use_fused_attention: bool = False,
    ):
        self.use_fused_attention = use_fused_attention
        kw = dict(use_scale=False, use_bias=False, rngs=rngs)
        self.norm_spatial = nnx.LayerNorm(dim, **kw)
        self.attn_spatial = MultiheadAttention(
            dim, head_dim, heads, rngs=rngs, reference_compat=False, dtype=dtype
        )
        self.norm_temporal = nnx.LayerNorm(dim, **kw)
        self.attn_temporal = MultiheadAttention(
            dim, head_dim, heads, rngs=rngs, reference_compat=False, dtype=dtype
        )
        self.norm_mlp = nnx.LayerNorm(dim, **kw)
        self.mlp = nnx.Sequential(
            nnx.Linear(dim, mlp_ratio * dim, dtype=dtype, rngs=rngs),
            nnx.gelu,
            nnx.Linear(mlp_ratio * dim, dim, dtype=dtype, rngs=rngs),
        )
        self.ada = _zero_linear(cond_dim, 9 * dim, rngs)

    def _attn(self, mha: MultiheadAttention, h: jax.Array) -> jax.Array:
        """Pure attention output over axis -2 — fused Pallas when enabled.

        The fused kernel computes ``h + MHA(h)`` in one VMEM-resident
        program (with automatic composite fallback for unsupported
        shapes); subtracting ``h`` recovers the attention output so the
        adaLN gate applies to exactly the same quantity as the composite
        path (the same residual-swap identity the Unet3D fixed mode uses).
        """
        if self.use_fused_attention:
            from video_diffusion_nnx_tpu.ops.temporal_attention import (
                fused_temporal_attention_block,
                pack_mha_weights,
            )

            wqkv, bqkv, wo, bo = pack_mha_weights(mha)
            heads = mha.q.kernel[...].shape[1]
            return fused_temporal_attention_block(h, wqkv, bqkv, wo, bo, heads, mha.dim) - h
        return mha(h)

    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        """x: (b, f, s, d); c: (b, cond_dim)."""
        m = self.ada(nnx.silu(c))[:, None, None, :]
        (sh_s, sc_s, g_s, sh_t, sc_t, g_t, sh_m, sc_m, g_m) = jnp.split(m, 9, axis=-1)

        h = self.norm_spatial(x) * (1 + sc_s) + sh_s
        x = x + g_s * self._attn(self.attn_spatial, h)  # attends s (axis -2)

        h = self.norm_temporal(x) * (1 + sc_t) + sh_t
        h = self._attn(self.attn_temporal, h.transpose(0, 2, 1, 3))  # attends f
        x = x + g_t * h.transpose(0, 2, 1, 3)

        h = self.norm_mlp(x) * (1 + sc_m) + sh_m
        return x + g_m * self.mlp(h)


class VideoDiT(nnx.Module):
    """DiT-style video denoiser with the Unet3D calling convention."""

    def __init__(
        self,
        dim: int,
        rngs: nnx.Rngs,
        depth: int = 8,
        channels: int = 3,
        attn_heads: int = 8,
        attn_dim_head: int = 64,
        patch_size: int = 4,
        mlp_ratio: int = 4,
        cond_dim: int | None = None,
        use_bert_text_cond: bool = False,
        compute_dtype=None,
        guidance_embed: bool = False,
        use_fused_attention: bool = False,
    ):
        if isinstance(compute_dtype, str):
            compute_dtype = jnp.dtype(compute_dtype)
        self.channels = channels
        self.patch_size = int(patch_size)
        self.dim = dim
        p = self.patch_size

        self.patch_proj = nnx.Linear(channels * p * p, dim, dtype=compute_dtype, rngs=rngs)

        time_dim = dim
        self.time_mlp = nnx.Sequential(
            SinusoidalPosEmb(dim),
            nnx.Linear(dim, time_dim, rngs=rngs),
            nnx.gelu,
            nnx.Linear(time_dim, time_dim, rngs=rngs),
        )

        self.has_cond = exists(cond_dim) or use_bert_text_cond
        cond_in = BERT_MODEL_DIM if use_bert_text_cond else cond_dim
        if self.has_cond:
            # Same null-embedding semantics as Unet3D (CFG dropout swaps in
            # a learned null vector), but sanely initialized — this family
            # has no reference-parity obligation. Drawn from the module's
            # rngs stream so distinct seeds give distinct embeddings.
            self.null_cond_emb = nnx.Param(
                jax.random.normal(rngs.params(), (1, cond_in)) * 0.02
            )
            self.cond_proj = nnx.Linear(cond_in, time_dim, rngs=rngs)

        self.has_guidance_embed = guidance_embed
        if guidance_embed:
            w_out = _zero_linear(time_dim, time_dim, rngs)
            self.guidance_mlp = nnx.Sequential(
                SinusoidalPosEmb(dim), nnx.Linear(dim, time_dim, rngs=rngs),
                nnx.gelu, w_out,
            )

        self.blocks = nnx.List(
            [
                DiTBlock(
                    dim, attn_heads, attn_dim_head, mlp_ratio, time_dim,
                    rngs=rngs, dtype=compute_dtype,
                    use_fused_attention=use_fused_attention,
                )
                for _ in range(depth)
            ]
        )

        self.final_norm = nnx.LayerNorm(dim, use_scale=False, use_bias=False, rngs=rngs)
        self.final_ada = _zero_linear(time_dim, 2 * dim, rngs)
        # Zero-init output projection: the denoiser predicts exactly zero at
        # init (DiT recipe; also makes a grafted guidance pathway a no-op).
        self.final_proj = _zero_linear(dim, channels * p * p, rngs, dtype=compute_dtype)

    # ------------------------------------------------------------------ #

    def forward_with_cond_scale(self, *args: Any, cond_scale: float = 2.0, **kwargs: Any) -> jax.Array:
        """CFG ``null + (cond - null) * scale`` — batched into one 2b
        forward like Unet3D's (identical per-sample math, half the
        dispatches); a guidance_embed model folds the scale into its
        w-embedding in ONE forward instead."""
        if self.has_guidance_embed:
            gs = jnp.full((args[0].shape[0],), cond_scale, jnp.float32)
            return self(*args, null_cond_prob=0.0, guidance_scale=gs, **kwargs)
        if cond_scale == 1 or not self.has_cond:
            return self(*args, null_cond_prob=0.0, **kwargs)

        x, time = args[0], args[1]
        cond = args[2] if len(args) > 2 else kwargs.pop("cond", None)
        assert cond is not None, "has_cond requires cond"
        b = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        time2 = jnp.concatenate([time, time], axis=0)
        cond2 = jnp.concatenate([cond, cond], axis=0)
        null_mask = jnp.arange(2 * b) >= b
        out = self(x2, time2, cond=cond2, null_cond_mask=null_mask, **kwargs)
        logits, null_logits = out[:b], out[b:]
        return null_logits + (logits - null_logits) * cond_scale

    def __call__(
        self,
        x: jax.Array,
        time: jax.Array,
        cond: jax.Array | None = None,
        null_cond_prob: float = 0.0,
        focus_present_mask: jax.Array | None = None,
        prob_focus_present: float = 0.0,
        *,
        key: jax.Array | None = None,
        null_cond_mask: jax.Array | None = None,
        guidance_scale: jax.Array | None = None,
    ) -> jax.Array:
        """Denoise ``(b, c, f, h, w)`` -> ``(b, f, h, w, c)``.

        The focus-present arguments exist for Unet3D interface parity and
        are ignored (the concept is a Unet3D-lineage quirk; DiT conditions
        through adaLN only).
        """
        del focus_present_mask, prob_focus_present
        assert not (self.has_cond and not exists(cond)), "cond must be passed in if cond_dim specified"
        b, c, f, h, w = x.shape
        p = self.patch_size
        assert h % p == 0 and w % p == 0, (
            f"spatial size {h}x{w} must divide the patch size {p}"
        )

        # Patchify: (b, c, f, h, w) -> (b, f, s, p*p*c) -> project to dim.
        tokens = rearrange(x, "b c f (hh p1) (ww p2) -> b f (hh ww) (p1 p2 c)", p1=p, p2=p)
        tokens = self.patch_proj(tokens)
        s = tokens.shape[2]

        # Computed (not stored) factorized positions: spatial + temporal.
        pos = _sincos_1d(self.dim, s)[None, None] + _sincos_1d(self.dim, f)[None, :, None]
        tokens = tokens + pos.astype(tokens.dtype)

        t_emb = self.time_mlp(time)
        if self.has_guidance_embed:
            gw = (
                guidance_scale
                if guidance_scale is not None
                else jnp.ones((b,), jnp.float32)
            )
            t_emb = t_emb + self.guidance_mlp(gw * 100.0)
        if self.has_cond:
            mask_key = jax.random.split(key)[0] if key is not None else None
            mask = (
                null_cond_mask
                if null_cond_mask is not None
                else prob_mask_like((b,), null_cond_prob, key=mask_key)
            )
            cond_vec = jnp.where(mask[:, None], self.null_cond_emb[...], cond)
            t_emb = t_emb + self.cond_proj(cond_vec)

        for block in self.blocks:
            tokens = block(tokens, t_emb)

        m = self.final_ada(nnx.silu(t_emb))[:, None, None, :]
        shift, scale = jnp.split(m, 2, axis=-1)
        tokens = self.final_norm(tokens) * (1 + scale) + shift
        out = self.final_proj(tokens)  # (b, f, s, p*p*c)
        out = rearrange(
            out, "b f (hh ww) (p1 p2 c) -> b f (hh p1) (ww p2) c",
            hh=h // p, p1=p, p2=p,
        )
        return out.astype(jnp.float32)
