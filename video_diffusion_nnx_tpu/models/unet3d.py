"""Unet3D: factorized-(2+1)D video denoiser.

Parity surface: reference unet3d.py:21-387. The architecture is a U-Net over
``(b, f, h, w, c)`` video with:

* spatial-only convs (temporal kernel extent 1) — all temporal mixing happens
  in temporal attention over the frame axis;
* per-level: ResnetBlock x2 -> spatial linear attention -> temporal
  attention -> stride-2 spatial down/upsample;
* a bottleneck with full spatial attention;
* sinusoidal timestep embedding -> MLP, injected via FiLM into every
  ResnetBlock;
* optional text conditioning (BERT-dim) with classifier-free guidance.

Checkpoint/init parity contract
-------------------------------
Attribute names, container nesting (``downs``/``ups`` as lists of 5-element
lists), and *construction order* all mirror the reference exactly:

* names + nesting fix the ``nnx.State`` tree paths, so Orbax checkpoints
  written by the reference restore here unchanged;
* construction order fixes the ``nnx.Rngs`` draw sequence, so
  ``Unet3D(dim, rngs=nnx.Rngs(seed))`` materializes bit-identical initial
  parameters to the reference at the same seed.

The *compute* inside ``__call__`` is TPU-first (folded-frame 2-D convs,
flattened-matmul pointwise convs, optional fused kernels) — see
``models/layers.py`` and ``ops/``.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import nnx

from video_diffusion_nnx_tpu.models.attention import (
    MultiheadAttention,
    RelativePositionBias,
    SpatialLinearAttention,
)
from video_diffusion_nnx_tpu.models.blocks import ResnetBlock
from video_diffusion_nnx_tpu.models.layers import (
    Downsample,
    EinopsToAndFrom,
    Identity,
    PointwiseConv,
    PreNorm,
    PseudoConv3d,
    Residual,
    SinusoidalPosEmb,
    Upsample,
)
from video_diffusion_nnx_tpu.models.text import BERT_MODEL_DIM
from video_diffusion_nnx_tpu.utils.functional import default, exists, is_odd, prob_mask_like

logger = logging.getLogger(__name__)


@nnx.remat
def _remat_resnet(block, x, t):
    return block(x, t)


class Unet3D(nnx.Module):
    """3-D U-Net denoiser for video diffusion (reference unet3d.py:21-252).

    Args mirror the reference. ``reference_compat`` (new) selects between
    bit-faithful reference behavior (default True; PreNorm is a no-op wrapper
    that drops pos_bias/focus masks — see ``layers.PreNorm``) and the fixed
    math (pre-norm applied, rel-pos bias and focus masks actually reach
    temporal attention, applied pre-softmax).
    """

    def __init__(
        self,
        dim: int,
        rngs: nnx.Rngs,
        dim_mults=(1, 2, 4, 8),
        cond_dim: int | None = None,
        out_dim: int | None = None,
        channels: int = 3,
        attn_heads: int = 8,
        attn_dim_head: int = 32,
        use_bert_text_cond: bool = False,
        init_dim: int | None = None,
        init_kernel_size: int = 7,
        use_sparse_linear_attn: bool = True,
        block_type: str = "resnet",
        resnet_groups: int = 8,
        log_dims: bool = False,
        reference_compat: bool = True,
        compute_dtype=None,
        use_fused_attention: bool = False,
        use_fused_spatial_attention: bool = False,
        remat_blocks: bool = False,
        sequence_parallel_mesh=None,
        guidance_embed: bool = False,
    ):
        self.channels = channels
        self.log_dims = log_dims
        self.reference_compat = reference_compat
        if isinstance(compute_dtype, str):
            compute_dtype = jnp.dtype(compute_dtype)
        self.compute_dtype = compute_dtype
        # Route temporal attention through the fused Pallas kernel (VMEM-
        # resident QKV+attention+out-proj+residual). Covers BOTH modes:
        # reference-compat (PreNorm is a no-op wrapper, chain = x + MHA(x))
        # and fixed math (chain = x + MHA(LN(x), pos_bias) — the LayerNorm
        # runs in XLA, the rel-pos bias is added to the logits in-kernel via
        # the biased kernel variant, and the residual uses the identity
        # x + (fused(xn) - xn) since the kernels fold their own residual).
        self.use_fused_attention = use_fused_attention
        # The fused spatial-linear-attention kernel is opt-in separately.
        # It computes in the input dtype (native MXU bf16 rate) and has a
        # fused Pallas backward; measured on one v5e chip at the v2_2 train
        # shape it beats the bf16 composite at every level, fwd and fwd+bwd
        # (L0: 4.0 vs 6.0 ms fwd, 5.9 vs 10.6 ms fwd+bwd).
        self.use_fused_spatial_attention = use_fused_spatial_attention
        # Rematerialize ResnetBlock activations in the backward pass: trades
        # ~30% more forward FLOPs for O(levels) less activation memory —
        # the enabler for 32-frame/128x128-scale training on one chip.
        self.remat_blocks = remat_blocks
        # Sequence (frame-axis) parallelism: a Mesh with a 'seq' axis routes
        # every temporal-attention block through the Ulysses-style
        # all-gather-K/V path in parallel/sequence.py, frame-sharding the
        # activations. Long-context capability beyond the reference (which
        # holds the full f x f attention on every device, SURVEY §5).
        # Compat-mode only (the wrapper chain reduces to x + MHA(x)); takes
        # precedence over the fused single-chip kernel.
        self.sequence_parallel_mesh = sequence_parallel_mesh if reference_compat else None
        rotary_emb = None

        # Temporal attention: fold the h*w pixels into the batch axis and
        # attend along frames (reference unet3d.py:86-96).
        def temporal_attn(d: int) -> EinopsToAndFrom:
            return EinopsToAndFrom(
                "b f h w c",
                "b (h w) f c",
                MultiheadAttention(
                    in_features=d,
                    dim=attn_dim_head,
                    num_heads=attn_heads,
                    rotary_emb=rotary_emb,
                    rngs=rngs,
                    reference_compat=reference_compat,
                    dtype=compute_dtype,
                ),
            )

        prenorm = partial(PreNorm, rngs=rngs, reference_compat=reference_compat)

        # --- construction order below mirrors reference unet3d.py:98-252 ---
        self.time_rel_pos_bias = RelativePositionBias(heads=attn_heads, max_distance=32, rngs=rngs)

        init_dim = default(init_dim, dim)
        assert init_dim is not None
        assert is_odd(init_kernel_size)

        self.init_conv = PseudoConv3d(
            channels,
            init_dim,
            kernel_size=(1, init_kernel_size, init_kernel_size),
            dtype=compute_dtype,
            rngs=rngs,
        )
        self.init_temporal_attn = Residual(prenorm(init_dim, temporal_attn(init_dim)))

        dims = [init_dim, *(dim * m for m in dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))

        time_dim = dim * 4
        self.time_mlp = nnx.Sequential(
            SinusoidalPosEmb(dim),
            nnx.Linear(dim, time_dim, rngs=rngs),
            nnx.gelu,
            nnx.Linear(time_dim, time_dim, rngs=rngs),
        )

        self.has_cond = exists(cond_dim) or use_bert_text_cond
        cond_dim = BERT_MODEL_DIM if use_bert_text_cond else cond_dim
        # Parity quirk preserved: the null-conditioning embedding is drawn as
        # *random integers* cast to float32 from a fixed PRNGKey(0)
        # (reference unet3d.py:138-149).
        self.null_cond_emb = (
            nnx.Param(
                jax.random.randint(
                    jax.random.PRNGKey(0), (1, cond_dim), minval=1, maxval=cond_dim
                ).astype(jnp.float32)
            )
            if self.has_cond
            else 0.0
        )
        cond_dim = time_dim + int(cond_dim or 0)

        num_resolutions = len(in_out)
        block_klass = partial(ResnetBlock, groups=resnet_groups, rngs=rngs, dtype=compute_dtype)
        block_klass_cond = partial(block_klass, time_emb_dim=cond_dim)

        downs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= (num_resolutions - 1)
            downs.append(
                nnx.List(
                    [
                        block_klass_cond(dim_in, dim_out),
                        block_klass_cond(dim_out, dim_out),
                        (
                            Residual(
                                prenorm(
                                    dim_out,
                                    SpatialLinearAttention(
                                        dim_out,
                                        heads=attn_heads,
                                        D=32,
                                        rngs=rngs,
                                        dtype=compute_dtype,
                                        reference_compat=reference_compat,
                                    ),
                                )
                            )
                            if use_sparse_linear_attn
                            else Identity()
                        ),
                        Residual(prenorm(dim_out, temporal_attn(dim_out))),
                        Downsample(dim_out, rngs=rngs, dtype=compute_dtype) if not is_last else Identity(),
                    ]
                )
            )
        self.downs = nnx.List(downs)

        mid_dim = dims[-1]
        self.mid_block1 = block_klass_cond(mid_dim, mid_dim)

        # Bottleneck: full (quadratic) spatial attention over h*w tokens,
        # frames folded into batch (reference unet3d.py:196-202).
        spatial_attn = EinopsToAndFrom(
            "b f h w c",
            "b f (h w) c",
            MultiheadAttention(
                in_features=mid_dim,
                dim=attn_dim_head,
                num_heads=attn_heads,
                rngs=rngs,
                reference_compat=reference_compat,
                dtype=compute_dtype,
            ),
        )
        self.mid_spatial_attn = Residual(prenorm(mid_dim, spatial_attn))
        self.mid_temporal_attn = Residual(prenorm(mid_dim, temporal_attn(mid_dim)))
        self.mid_block2 = block_klass_cond(mid_dim, mid_dim)

        ups = []
        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind >= (num_resolutions - 1)
            ups.append(
                nnx.List(
                    [
                        block_klass_cond(dim_out * 2, dim_in),
                        block_klass_cond(dim_in, dim_in),
                        (
                            Residual(
                                prenorm(
                                    dim_in,
                                    SpatialLinearAttention(
                                        dim_in,
                                        heads=attn_heads,
                                        D=32,
                                        rngs=rngs,
                                        dtype=compute_dtype,
                                        reference_compat=reference_compat,
                                    ),
                                )
                            )
                            if use_sparse_linear_attn
                            else Identity()
                        ),
                        Residual(prenorm(dim_in, temporal_attn(dim_in))),
                        Upsample(dim_in, rngs=rngs, dtype=compute_dtype) if not is_last else Identity(),
                    ]
                )
            )
        self.ups = nnx.List(ups)

        out_dim = default(out_dim, channels)
        self.final_conv = nnx.Sequential(
            block_klass(dim * 2, dim),
            PointwiseConv(dim, out_dim, kernel_size=1, dtype=compute_dtype, rngs=rngs),
        )

        # Guidance-scale conditioning (Meng et al. 2023, "On Distillation of
        # Guided Diffusion Models") — capability beyond the reference: a
        # w-embedding added to the time embedding lets ONE forward reproduce
        # the CFG combination null + (cond - null)*w, removing guidance's 2x
        # FLOP cost after distillation (training/guidance.py). Constructed
        # LAST so every earlier RNG draw — and therefore init parity with
        # the reference for all non-guidance configs — is unchanged; the
        # final Linear starts at zero so a freshly grafted embedding is a
        # no-op until trained.
        self.has_guidance_embed = guidance_embed
        if guidance_embed:
            w_in = nnx.Linear(dim, time_dim, rngs=rngs)
            w_out = nnx.Linear(time_dim, time_dim, rngs=rngs)
            w_out.kernel[...] = jnp.zeros_like(w_out.kernel[...])
            w_out.bias[...] = jnp.zeros_like(w_out.bias[...])
            self.guidance_mlp = nnx.Sequential(
                SinusoidalPosEmb(dim), w_in, nnx.gelu, w_out
            )

    def forward_with_cond_scale(self, *args: Any, cond_scale: float = 2.0, **kwargs: Any) -> jax.Array:
        """Classifier-free guidance: ``null + (cond - null) * scale``.

        Parity: reference unet3d.py:254-260 computes this as TWO sequential
        full forward passes. Here the conditioned and null passes are batched
        into ONE forward at ``2b`` (per-sample math is independent, so the
        result is identical — tested bitwise). This halves dispatches and
        avoids a second program; the FLOPs still double, so on a saturated
        chip CFG sampling costs ~2x unconditional (measured 22.8 s vs 11.0 s
        at the 250-step b8 bench shape) — the latency win appears at small
        batches where the chip is underutilized. Without conditioning (or at
        ``cond_scale == 1``) this is a single forward pass.
        """
        if self.has_guidance_embed:
            # Guidance-distilled model: the CFG combination is baked into
            # the w-conditioned weights — ONE forward at any cond_scale
            # (the 2x FLOP cost of guidance is gone, not just batched).
            gs = jnp.full((args[0].shape[0],), cond_scale, jnp.float32)
            return self(*args, null_cond_prob=0.0, guidance_scale=gs, **kwargs)

        if cond_scale == 1 or not self.has_cond:
            return self(*args, null_cond_prob=0.0, **kwargs)

        if len(args) > 3:
            raise TypeError(
                "forward_with_cond_scale takes at most (x, time, cond) "
                "positionally; pass the rest as keywords"
            )
        x, time = args[0], args[1]
        cond = args[2] if len(args) > 2 else kwargs.pop("cond", None)
        assert cond is not None, "has_cond requires cond"
        b = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        time2 = jnp.concatenate([time, time], axis=0)
        cond2 = jnp.concatenate([cond, cond], axis=0)
        # First half: conditioned (mask False); second half: null (mask True).
        null_mask = jnp.arange(2 * b) >= b
        fpm = kwargs.pop("focus_present_mask", None)
        prob_fp = kwargs.pop("prob_focus_present", 0.0)
        if fpm is None and prob_fp > 0:
            # Draw the (b,) mask ONCE with the same subkey the single-pass
            # draw would use, so both CFG halves share it — a (2b,) draw
            # would give the conditioned and null passes different masks.
            key = kwargs.get("key")
            mask_key = jax.random.split(key)[0] if key is not None else None
            fpm = prob_mask_like((b,), prob_fp, key=mask_key)
        if fpm is not None:
            fpm = jnp.concatenate([fpm, fpm], axis=0)
        out = self(
            x2, time2, cond=cond2, null_cond_mask=null_mask,
            focus_present_mask=fpm, **kwargs,
        )
        logits, null_logits = out[:b], out[b:]
        return null_logits + (logits - null_logits) * cond_scale

    def _log_shape(self, tag: str, x: jax.Array) -> None:
        if self.log_dims:
            logger.debug("%s: %s", tag, ", ".join(map(str, x.shape)))

    def _resnet(self, block, x, t):
        if self.remat_blocks:
            return _remat_resnet(block, x, t)
        return block(x, t)

    def _temporal(self, block, x, pos_bias, focus_present_mask, static_no_focus=False):
        """Apply a temporal-attention block, fused when enabled.

        In reference-compat mode the wrapper chain
        Residual(PreNorm(EinopsToAndFrom(MHA))) reduces to
        ``x + MHA(rearrange(x))`` (PreNorm drops the norm and the kwargs),
        which is exactly what the fused Pallas kernel computes in one
        VMEM-resident pass. In FIXED mode the chain is
        ``x + MHA(LN(x), pos_bias, mask)``: the LayerNorm runs in XLA and
        the rel-pos bias rides the biased kernel variant. A LIVE focus mask
        needs no in-kernel support: a masked sample's row keeps only its
        diagonal logit, so softmax collapses to the identity and its output
        is exactly ``x + v @ Wo + bo`` — two cheap XLA matmuls selected
        per-sample with ``where`` (``static_no_focus`` skips even that).
        Gradients are exact: the select zeroes the discarded branch's
        cotangents row-wise through both paths.
        """
        if self.sequence_parallel_mesh is not None and not isinstance(block, Identity):
            from video_diffusion_nnx_tpu.ops.temporal_attention import pack_mha_weights
            from video_diffusion_nnx_tpu.parallel.sequence import (
                sequence_parallel_temporal_attention,
            )

            mesh = self.sequence_parallel_mesh
            mha = block.fn.fn.fn
            b, f, h, w, c = x.shape
            x_r = x.reshape(b, f, h * w, c).transpose(0, 2, 1, 3)  # (b, hw, f, c)
            wqkv, bqkv, wo, bo = pack_mha_weights(mha)
            heads = mha.q.kernel[...].shape[1]
            y = sequence_parallel_temporal_attention(
                x_r, wqkv, bqkv, wo, bo, heads, mha.dim, mesh,
                batch_axis="data" if "data" in mesh.axis_names else None,
            )
            return y.transpose(0, 2, 1, 3).reshape(b, f, h, w, c)
        if self.use_fused_attention and not isinstance(block, Identity):
            from video_diffusion_nnx_tpu.ops.temporal_attention import (
                fused_temporal_attention_block,
                fused_temporal_attention_block_biased,
                pack_mha_weights,
            )

            mha = block.fn.fn.fn  # Residual -> PreNorm -> EinopsToAndFrom -> MHA
            b, f, h, w, c = x.shape
            x_r = x.reshape(b, f, h * w, c).transpose(0, 2, 1, 3)  # (b, hw, f, c)
            wqkv, bqkv, wo, bo = pack_mha_weights(mha)
            heads = mha.q.kernel[...].shape[1]
            if self.reference_compat:
                # PreNorm drops pos_bias/focus mask in compat mode
                # (PARITY.md #1), so the plain kernel is the whole story.
                y = fused_temporal_attention_block(x_r, wqkv, bqkv, wo, bo, heads, mha.dim)
            else:
                xn = block.fn.norm(x_r)
                z = fused_temporal_attention_block_biased(
                    xn, wqkv, bqkv, wo, bo, pos_bias, heads, mha.dim
                )
                y = x_r + (z - xn)  # kernel folds xn's residual; swap in x's
                if not static_no_focus and focus_present_mask is not None:
                    # Masked samples attend only to themselves: the row's
                    # softmax collapses to the identity, so the output is
                    # the v-projection alone (matches the composite MHA's
                    # fixed-branch masked semantics exactly).
                    hd = heads * mha.dim
                    v = (
                        jnp.einsum("bsfc,ck->bsfk", xn, wqkv[:, 2 * hd:])
                        + bqkv[2 * hd:]
                    )
                    y_self = x_r + jnp.einsum("bsfk,kc->bsfc", v, wo) + bo
                    y = jnp.where(
                        focus_present_mask.reshape(b, 1, 1, 1), y_self, y
                    )
            return y.transpose(0, 2, 1, 3).reshape(b, f, h, w, c)
        return block(x, pos_bias=pos_bias, focus_present_mask=focus_present_mask)

    def _mid_spatial(self, block, x):
        """Bottleneck full spatial attention, fused when enabled.

        ``EinopsToAndFrom('b f h w c', 'b f (h w) c', MHA)`` is attention
        over the h*w axis with frames folded into batch — exactly the fused
        temporal kernel's contract with hw as the attended axis, so the same
        kernel serves it ((h*w) > 64 routes through the blockwise variant,
        e.g. 128x128 inputs). No pos_bias/focus mask reach this block in
        either mode (reference unet3d.py:316-334 passes none).
        """
        if self.use_fused_attention:
            from video_diffusion_nnx_tpu.ops.temporal_attention import (
                fused_temporal_attention_block,
                pack_mha_weights,
            )

            mha = block.fn.fn.fn
            b, f, h, w, c = x.shape
            x_r = x.reshape(b, f, h * w, c)  # attend over h*w, batch (b, f)
            wqkv, bqkv, wo, bo = pack_mha_weights(mha)
            heads = mha.q.kernel[...].shape[1]
            if self.reference_compat:
                y = fused_temporal_attention_block(x_r, wqkv, bqkv, wo, bo, heads, mha.dim)
            else:
                xn = block.fn.norm(x_r)
                z = fused_temporal_attention_block(xn, wqkv, bqkv, wo, bo, heads, mha.dim)
                y = x_r + (z - xn)
            return y.reshape(b, f, h, w, c)
        return block(x)

    def _spatial(self, block, x):
        """Apply a spatial-linear-attention block, fused when enabled.

        Residual(PreNorm(SpatialLinearAttention)) in compat mode reduces to
        ``x + SLA(x)`` with the reference's dropped q scale — one
        VMEM-resident Pallas program per frame. In FIXED mode the chain is
        ``x + SLA(LN(x))`` with the q scale applied: LayerNorm in XLA, then
        the same kernel on the normalized input with the residual swapped
        (``x + (fused(xn) - xn)``).
        """
        if self.use_fused_spatial_attention and not isinstance(block, Identity):
            from video_diffusion_nnx_tpu.ops.spatial_linear_attention import (
                fused_spatial_linear_attention_block,
                pack_sla_weights,
            )

            sla = block.fn.fn  # Residual -> PreNorm -> SpatialLinearAttention
            wqkv, wo = pack_sla_weights(sla)
            hd = wo.shape[0]
            dim = hd // sla.heads
            if self.reference_compat:
                return fused_spatial_linear_attention_block(
                    x, wqkv, wo, sla.heads, dim, 1.0
                )
            xn = block.fn.norm(x)
            z = fused_spatial_linear_attention_block(
                xn, wqkv, wo, sla.heads, dim, sla.scale
            )
            return x + (z - xn)
        return block(x)

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
        """Denoise ``x`` of shape ``(b, c, f, h, w)``; returns ``(b, f, h, w, c)``.

        Parity: reference unet3d.py:262-387 (including the channels-last
        output that callers rearrange). ``key`` (new) threads randomness into
        the CFG null-cond dropout and focus-present mask; when omitted the
        reference's host-seeded fallback is used (only reachable when those
        probabilities are strictly between 0 and 1). ``null_cond_mask`` (new)
        overrides the sampled null-conditioning mask with an explicit boolean
        per-sample mask — used by the batched-CFG path.
        """
        assert not (self.has_cond and not exists(cond)), "cond must be passed in if cond_dim specified"

        mask_key = cfg_key = None
        if key is not None:
            mask_key, cfg_key = jax.random.split(key)
        # Static (trace-time) knowledge that no focus masking can occur —
        # what lets the fixed-math path take the fused kernels.
        static_no_focus = focus_present_mask is None and prob_focus_present == 0.0
        focus_present_mask = default(
            focus_present_mask,
            lambda: prob_mask_like((x.shape[0],), prob_focus_present, key=mask_key),
        )
        time_rel_pos_bias = self.time_rel_pos_bias(x.shape[2])

        x = rearrange(x, "b c f h w -> b f h w c")
        x = self.init_conv(x)
        x = self._temporal(self.init_temporal_attn, x, time_rel_pos_bias, None, static_no_focus=True)
        r = x

        t = self.time_mlp(time)

        if self.has_guidance_embed:
            # w rides the sinusoidal embedding scaled into the frequency
            # band the embedding resolves well (w in [1, 10] -> [100, 1000],
            # the timestep range it was designed for). Unspecified w means
            # "unguided", i.e. w = 1 — a value inside the training range —
            # not a skipped pathway.
            w = (
                guidance_scale
                if guidance_scale is not None
                else jnp.ones((x.shape[0],), jnp.float32)
            )
            t = t + self.guidance_mlp(w * 100.0)

        if self.has_cond:
            mask = (
                null_cond_mask
                if null_cond_mask is not None
                else prob_mask_like((x.shape[0],), null_cond_prob, key=cfg_key)
            )
            cond = jnp.where(mask[:, None], self.null_cond_emb[...], cond)
            t = jnp.concatenate((t, cond), axis=-1)

        h = []
        for block1, block2, spatial_attn, temporal_attn, downsample in self.downs:
            x = self._resnet(block1, x, t)
            x = self._resnet(block2, x, t)
            x = self._spatial(spatial_attn, x)
            x = self._temporal(
                temporal_attn, x, time_rel_pos_bias, focus_present_mask,
                static_no_focus=static_no_focus,
            )
            h.append(x)
            self._log_shape("down pre-downsample", x)
            x = downsample(x)

        self._log_shape("mid input", x)
        x = self._resnet(self.mid_block1, x, t)
        x = self._mid_spatial(self.mid_spatial_attn, x)
        x = self._temporal(
            self.mid_temporal_attn, x, time_rel_pos_bias, focus_present_mask,
            static_no_focus=static_no_focus,
        )
        x = self._resnet(self.mid_block2, x, t)

        for i, (block1, block2, spatial_attn, temporal_attn, upsample) in enumerate(self.ups):
            skip = h.pop()
            x = jnp.concatenate((x, skip), axis=-1)
            self._log_shape(f"up {i} post-concat", x)
            x = self._resnet(block1, x, t)
            x = self._resnet(block2, x, t)
            x = self._spatial(spatial_attn, x)
            x = self._temporal(
                temporal_attn, x, time_rel_pos_bias, focus_present_mask,
                static_no_focus=static_no_focus,
            )
            x = upsample(x)

        x = jnp.concatenate((x, r), axis=-1)
        self._log_shape("final conv input", x)
        out = self.final_conv(x)
        self._log_shape("output", out)
        # The denoiser contract is float32 epsilon regardless of the internal
        # compute policy (the diffusion math is precision-sensitive).
        return out.astype(jnp.float32)
