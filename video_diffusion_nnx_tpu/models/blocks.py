"""Conv blocks: Block (conv + GroupNorm + FiLM + SiLU) and ResnetBlock.

Parity surface: reference modules.py:150-243.

TPU-first design
----------------
* The ``(1, 3, 3)`` conv runs as a folded 2-D conv
  (:class:`~video_diffusion_nnx_tpu.models.layers.PseudoConv3d`).
* GroupNorm must see the *unfolded* ``(b, f, h, w, c)`` tensor — its
  statistics reduce over frames, space, and the channels of each group per
  sample (folding frames into batch would wrongly compute per-frame stats).
* GroupNorm + FiLM + SiLU stays on the XLA path deliberately: XLA already
  fuses the whole chain into the conv epilogue. Measured at the L0 bench
  shape (b8, 16f, 64x64, c32, bf16, one v5e chip): full Block 2.21 ms vs
  the conv alone 1.81 ms — the epilogue costs ~0.4 ms fused, while the
  same chain standalone costs 1.59 ms. A Pallas kernel could only win by
  also beating XLA's (1,3,3) conv, which is out of scope (SURVEY §7 step 9
  descoped on this measurement).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import nnx

from video_diffusion_nnx_tpu.models.layers import Identity, PointwiseConv, PseudoConv3d


class Block(nnx.Module):
    """Spatial conv -> GroupNorm -> optional FiLM ``x*(scale+1)+shift`` -> SiLU.

    Parity: reference modules.py:150-179 (same parameter tree: ``proj`` conv
    with kernel ``(1, 3, 3, cin, cout)``, ``norm`` GroupNorm).
    """

    def __init__(
        self, in_features: int, out_features: int, rngs: nnx.Rngs, groups: int = 8, dtype=None
    ):
        self.proj = PseudoConv3d(in_features, out_features, (1, 3, 3), dtype=dtype, rngs=rngs)
        # GroupNorm statistics always reduce in f32 — normalization is
        # precision-sensitive even under a bf16 compute policy.
        self.norm = nnx.GroupNorm(out_features, num_groups=groups, dtype=jnp.float32, rngs=rngs)
        self.act = nnx.silu
        self.dtype = dtype

    def __call__(self, x: jax.Array, scale_shift=None, *args: Any, **kwds: Any) -> jax.Array:
        x = self.proj(x)
        x = self.norm(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        x = self.act(x)
        return x.astype(self.dtype) if self.dtype is not None else x


class ResnetBlock(nnx.Module):
    """Two Blocks with FiLM time conditioning and a normalized 1x1 residual.

    Parity: reference modules.py:182-243, including its two structural
    quirks, both load-bearing for checkpoint-tree compatibility:

    * ``norm_1`` (LayerNorm over the doubled time embedding) is materialized
      even when ``time_emb_dim is None`` — the reference creates it
      unconditionally (modules.py:208), so ``final_conv``'s ResnetBlock
      carries unused LayerNorm parameters that checkpoints contain.
    * The residual branch is ``norm_2(res_conv(x))`` — LayerNorm *after* the
      1x1 projection (modules.py:242), not a plain residual.
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        rngs: nnx.Rngs,
        *,
        time_emb_dim: int | None = None,
        groups: int = 8,
        dtype=None,
    ):
        self.mlp = (
            nnx.Sequential(
                nnx.silu,
                nnx.Linear(in_features=time_emb_dim, out_features=out_features * 2, rngs=rngs),
            )
            if time_emb_dim is not None
            else None
        )
        self.norm_1 = nnx.LayerNorm(out_features * 2, rngs=rngs)
        self.block_1 = Block(
            in_features=in_features, out_features=out_features, groups=groups, rngs=rngs, dtype=dtype
        )
        self.block_2 = Block(
            in_features=out_features, out_features=out_features, groups=groups, rngs=rngs, dtype=dtype
        )
        self.res_conv = (
            PointwiseConv(
                in_features=in_features,
                out_features=out_features,
                kernel_size=1,
                dtype=dtype,
                rngs=rngs,
            )
            if in_features != out_features
            else Identity()
        )
        self.norm_2 = nnx.LayerNorm(out_features, rngs=rngs)
        self.dtype = dtype

    def __call__(self, x: jax.Array, time_embed: jax.Array | None = None) -> jax.Array:
        scale_shift = None
        if self.mlp is not None:
            assert time_embed is not None, "time emb must be passed in"
            emb = self.norm_1(self.mlp(time_embed))  # (b, 2*out)
            emb = emb[:, None, None, None, :]  # broadcast over (f, h, w)
            scale_shift = jnp.split(emb, 2, axis=-1)

        h = self.block_1(x, scale_shift=scale_shift)
        h = self.block_2(h)
        res = self.norm_2(self.res_conv(x))
        if self.dtype is not None:
            res = res.astype(self.dtype)
        return h + res
