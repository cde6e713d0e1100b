"""Gradient utilities: global-norm clipping with optional per-parameter logging.

Parity surface: reference utils.py:127-221 (``clip_grad_norm``,
``clip_grad_norm_with_tb_logging``). Unlike the reference — which imports the
clip but never calls it in the train step (trainer.py:32, no call site) — the
trainer here actually applies it when ``max_grad_norm`` is set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def global_l2_norm(grads, epsilon: float = 1e-6) -> jax.Array:
    """Global L2 norm over a gradient pytree (single fused reduction)."""
    leaves = jax.tree_util.tree_leaves(grads)
    total_sq = sum(jnp.sum(jnp.square(g)) for g in leaves)
    return jnp.sqrt(total_sq + epsilon)


def clip_grad_norm(grads, max_grad_norm: float, epsilon: float = 1e-6):
    """Scale ``grads`` so their global L2 norm is at most ``max_grad_norm``.

    Returns ``(clipped_grads, pre_clip_l2_norm)`` — same contract as reference
    utils.py:127-152.
    """
    l2_norm = global_l2_norm(grads, epsilon)
    scale = jnp.minimum(max_grad_norm / (l2_norm + epsilon), 1.0)
    return jax.tree_util.tree_map(lambda g: g * scale, grads), l2_norm


def clip_grad_norm_with_tb_logging(
    grads, max_grad_norm: float, tb_writer, step: int, epsilon: float = 1e-6
):
    """Clip by global norm and log pre-clip norm, scale, and per-leaf norms.

    Parity: reference utils.py:156-221. Logging tags:
      - ``global_grad_norm/pre_clip``
      - ``global_grad_norm/clip_scale``
      - ``per_param_grad_norm/<dot.joined.path>``
    """
    grad_sq = jax.tree_util.tree_map(lambda g: jnp.sum(jnp.square(g)), grads)
    total_sq = jax.tree_util.tree_reduce(jnp.add, grad_sq, 0.0)
    l2_norm = jnp.sqrt(total_sq + epsilon)
    scale = jnp.minimum(max_grad_norm / (l2_norm + epsilon), 1.0)

    tb_writer.add_scalar("global_grad_norm/pre_clip", np.asarray(l2_norm), step)
    tb_writer.add_scalar("global_grad_norm/clip_scale", np.asarray(scale), step)

    clipped = jax.tree_util.tree_map(lambda g: g * scale, grads)

    per_param = jax.tree_util.tree_map(lambda sq: jnp.sqrt(sq + epsilon), grad_sq)
    for path, leaf_norm in jax.tree_util.tree_leaves_with_path(per_param):
        parts = []
        for entry in path:
            if isinstance(entry, jax.tree_util.DictKey):
                parts.append(str(entry.key))
            elif isinstance(entry, jax.tree_util.SequenceKey):
                parts.append(str(entry.idx))
            elif isinstance(entry, jax.tree_util.GetAttrKey):
                parts.append(entry.name)
            else:
                parts.append(str(entry))
        tb_writer.add_scalar(
            f"per_param_grad_norm/{'.'.join(parts)}", np.asarray(leaf_norm), step
        )

    return clipped, l2_norm
