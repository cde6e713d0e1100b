"""Core layers: TPU-oriented conv primitives and small structural wrappers.

Parity surface: reference modules.py:9-60, 132-148, 393-396 and
utils.py:103-125 (Upsample/Downsample).

TPU-first design
----------------
The reference runs every convolution as a 3-D conv with temporal kernel
extent 1 (the "(2+1)D" factorization — all temporal mixing happens in
attention). A 3-D conv with a singleton window is semantically a batched 2-D
conv, so here the frame axis is folded into the batch axis and the conv runs
as a genuine 2-D NHWC conv: larger batch for the MXU's 128x128 systolic
array, no wasted singleton dimension in the XLA conv tiling. Likewise,
1x1(x1) convs are lowered to a single flattened matmul. Parameters keep the
reference's exact shapes/names (``kernel`` of shape ``(1, kh, kw, cin, cout)``
etc.) by subclassing ``nnx.Conv`` — only ``__call__`` changes — so Orbax
checkpoints from the reference restore unchanged.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import nnx

from flax.nnx.nn import dtypes as nnx_dtypes




class PseudoConv3d(nnx.Conv):
    """``(1, kh, kw)`` conv evaluated as a 2-D conv with frames folded into batch.

    Drop-in for ``nnx.Conv(cin, cout, (1, kh, kw), ...)`` on ``(b, f, h, w, c)``
    input (reference modules.py:162-165, unet3d.py:110-115, utils.py:115-125).
    Parameter tree is identical to the parent class. Honors the layer's
    ``dtype`` computation policy (bf16 compute keeps the MXU on its native
    precision and halves HBM traffic; params stay float32).
    """

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim != 5 or self.kernel_size[0] != 1:
            return super().__call__(x)
        b, f, h, w, c = x.shape
        kernel = self.kernel[0]  # (kh, kw, cin, cout)
        bias = self.bias[...] if self.use_bias else None
        x, kernel, bias = nnx_dtypes.promote_dtype((x, kernel, bias), dtype=self.dtype)
        strides = self.strides if isinstance(self.strides, tuple) else (self.strides,) * 3
        y = jax.lax.conv_general_dilated(
            x.reshape(b * f, h, w, c),
            kernel,
            window_strides=strides[1:],
            padding=self.padding if isinstance(self.padding, str) else self.padding[1:],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias
        return y.reshape(b, f, *y.shape[1:])


class PseudoConvTranspose3d(nnx.ConvTranspose):
    """``(1, kh, kw)`` transposed conv with frames folded into batch.

    Drop-in for ``nnx.ConvTranspose(d, d, (1, 4, 4), (1, 2, 2))``
    (reference utils.py:103-113).
    """

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim != 5 or self.kernel_size[0] != 1:
            return super().__call__(x)
        b, f, h, w, c = x.shape
        kernel = self.kernel[0]  # (kh, kw, cin, cout)
        bias = self.bias[...] if self.use_bias else None
        x, kernel, bias = nnx_dtypes.promote_dtype((x, kernel, bias), dtype=self.dtype)
        strides = self.strides if isinstance(self.strides, tuple) else (self.strides,) * 3
        y = jax.lax.conv_transpose(
            x.reshape(b * f, h, w, c),
            kernel,
            strides=strides[1:],
            padding=self.padding if isinstance(self.padding, str) else self.padding[1:],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias
        return y.reshape(b, f, *y.shape[1:])


class PointwiseConv(nnx.Conv):
    """1x1 conv evaluated as one flattened matmul over all tokens.

    Drop-in for ``nnx.Conv(cin, cout, kernel_size=1)`` applied to any-rank
    channels-last input (reference modules.py:71-91, 219-222,
    unet3d.py:251). A pointwise conv is exactly a dense layer per token;
    flattening every leading axis into one long token dimension gives the MXU
    a single large ``(tokens, cin) @ (cin, cout)`` matmul instead of a conv
    with a degenerate window.
    """

    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.kernel[...]
        if kernel.ndim != 3 or kernel.shape[0] != 1:
            return super().__call__(x)
        bias = self.bias[...] if self.use_bias else None
        x, kernel, bias = nnx_dtypes.promote_dtype((x, kernel, bias), dtype=self.dtype)
        y = jnp.einsum("...i,io->...o", x, kernel[0])
        if bias is not None:
            y = y + bias
        return y


def Upsample(dim: int, rngs: nnx.Rngs, dtype=None) -> nnx.ConvTranspose:
    """2x spatial upsample via (1,4,4)/(1,2,2) transposed conv.

    Parity: reference utils.py:103-113 (same parameter shapes).
    """
    return PseudoConvTranspose3d(dim, dim, (1, 4, 4), (1, 2, 2), dtype=dtype, rngs=rngs)


def Downsample(dim: int, rngs: nnx.Rngs, dtype=None) -> nnx.Conv:
    """2x spatial downsample via (1,4,4)/(1,2,2) strided conv.

    Parity: reference utils.py:115-125 (same parameter shapes).
    """
    return PseudoConv3d(dim, dim, (1, 4, 4), (1, 2, 2), dtype=dtype, rngs=rngs)


class Identity(nnx.Module):
    """Pass-through accepting and ignoring extra args (reference modules.py:393)."""

    def __call__(self, x: jax.Array, *args: Any, **kwds: Any) -> jax.Array:
        return x


class Residual(nnx.Module):
    """``fn(x, *args, **kwargs) + x`` (reference modules.py:21-27)."""

    def __init__(self, fn: nnx.Module):
        self.fn = fn

    def __call__(self, x: jax.Array, *args: Any, **kwds: Any) -> jax.Array:
        return self.fn(x, *args, **kwds) + x


class PreNorm(nnx.Module):
    """LayerNorm-then-fn wrapper with a reference-compat switch.

    The reference's PreNorm (modules.py:132-148) contains a bug load-bearing
    for checkpoint parity: it computes ``norm(x)`` but then calls ``fn`` on
    the *un-normalized* input and silently drops ``*args/**kwargs`` — so in
    the full Unet3D neither ``pos_bias`` nor ``focus_present_mask`` ever
    reaches temporal attention, and the LayerNorm parameters are trained but
    inert. ``reference_compat=True`` (default) reproduces that behavior
    exactly (without wasting the FLOPs on the discarded norm); ``False``
    applies the norm and forwards the extra arguments as intended. Either
    way the LayerNorm parameters are materialized so the state tree matches
    reference checkpoints.
    """

    def __init__(
        self,
        dim: int,
        fn: nnx.Module,
        rngs: nnx.Rngs,
        reference_compat: bool = True,
    ):
        self.fn = fn
        self.norm = nnx.LayerNorm(dim, rngs=rngs)
        self.reference_compat = reference_compat

    def __call__(self, x: jax.Array, *args: Any, **kwds: Any) -> jax.Array:
        if self.reference_compat:
            return self.fn(x)
        return self.fn(self.norm(x), *args, **kwds)


class SinusoidalPosEmb(nnx.Module):
    """Classic sin/cos timestep embedding (reference modules.py:30-45).

    ``dim // 2`` geometric frequencies with base 10000; output is
    ``concat(sin, cos)`` along the last axis.
    """

    def __init__(self, dim: int):
        self.dim = dim

    def __call__(self, x: jax.Array) -> jax.Array:
        half_dim = self.dim // 2
        step = math.log(10000) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim) * -step)
        angles = x[..., None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


class EinopsToAndFrom(nnx.Module):
    """Rearrange -> fn -> rearrange-back wrapper (reference modules.py:47-60).

    Named axes of the ``from`` pattern are captured from the input shape so
    the inverse rearrangement can reconstitute grouped axes.
    """

    def __init__(self, from_einops: str, to_einops: str, fn: nnx.Module):
        self.from_einops = from_einops
        self.to_einops = to_einops
        self.fn = fn

    def __call__(self, x: jax.Array, **kwargs: Any) -> jax.Array:
        axes = {
            name: size
            for name, size in zip(self.from_einops.split(" "), x.shape)
            if not name.startswith("(")
        }
        x = rearrange(x, f"{self.from_einops} -> {self.to_einops}")
        x = self.fn(x, **kwargs)
        return rearrange(x, f"{self.to_einops} -> {self.from_einops}", **axes)


class Linear(nnx.Module):
    """Minimal dense layer with uniform-init weight and zero bias.

    Parity: reference modules.py:9-18 (used only in tests there; kept for
    API completeness).
    """

    def __init__(self, din: int, dout: int, *, rngs: nnx.Rngs):
        key = rngs.params()
        self.w = nnx.Param(jax.random.uniform(key, (din, dout)))
        self.b = nnx.Param(jnp.zeros((dout,)))
        self.din, self.dout = din, dout

    def __call__(self, x: jax.Array) -> jax.Array:
        return x @ self.w + self.b
