"""Parameter / optimizer-state sharding rules (tensor-parallel layout).

Parity surface: reference trainer.py:191-239 and 394-490. The reference's
tensor-parallel scheme shards the *last* dimension of every kernel/weight and
bias leaf over the ``'model'`` mesh axis and replicates everything else,
relying on XLA GSPMD propagation for all activation resharding. That scheme
is reproduced here (so training state laid out by the reference maps 1:1),
with one safety improvement: a leaf whose last dimension does not divide
evenly by the model-axis size is replicated instead of crashing.

Beyond parity, :func:`logical_param_spec` exposes the rules as data so tests
and the dry-run driver can assert the layout, and the trainer composes these
with batch sharding ``P('data', None, ...)`` on inputs.
"""

from __future__ import annotations

import logging
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

PyTree = Any


def path_entry_to_str(p: Any) -> str:
    """Normalize a jax tree path entry (DictKey/SequenceKey/GetAttrKey/...) to str.

    Parity: reference trainer.py:394-405.
    """
    if isinstance(p, jax.tree_util.GetAttrKey):
        return p.name
    if isinstance(p, jax.tree_util.SequenceKey):
        return str(p.idx)
    if isinstance(p, jax.tree_util.DictKey):
        return str(p.key)
    if hasattr(p, "key") and p.key is not None:
        return str(p.key)
    return str(p)


def path_to_names(path: tuple) -> tuple[str, ...]:
    return tuple(path_entry_to_str(p) for p in path)


def param_partition_spec(
    path_names: tuple[str, ...],
    leaf: Any,
    model_axis_name: str = "model",
    model_axis_size: int = 1,
) -> P:
    """Reference TP heuristic: last-dim model sharding for kernels/weights/biases.

    Parity: reference trainer.py:407-426 (plus the divisibility guard).
    """
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0:
        return P()

    leaf_name = path_names[-1] if path_names else ""
    is_kernel_or_weight = leaf_name in ("kernel", "w")
    is_bias = leaf_name == "bias"
    if leaf_name == "b" and any("Linear" in n or "mlp" in n for n in path_names):
        is_bias = True

    spec = [None] * ndim
    if is_kernel_or_weight or is_bias:
        last = leaf.shape[-1]
        if model_axis_size <= 1 or last % model_axis_size == 0:
            spec[-1] = model_axis_name
        else:
            logger.debug(
                "replicating %s: last dim %d not divisible by model axis %d",
                "/".join(path_names),
                last,
                model_axis_size,
            )
    return P(*spec)


def params_partition_specs(
    abstract_params: PyTree,
    model_axis_name: str = "model",
    model_axis_size: int = 1,
) -> PyTree:
    """PartitionSpec tree for a parameter pytree (reference trainer.py:198-201)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: param_partition_spec(
            path_to_names(path), x, model_axis_name, model_axis_size
        ),
        abstract_params,
    )


def fsdp_partition_spec(
    path_names: tuple[str, ...],
    leaf: Any,
    data_axis_name: str = "data",
    data_axis_size: int = 1,
    min_size_to_shard: int = 2**14,
) -> P:
    """ZeRO/FSDP-style layout: shard each large parameter over the data axis.

    Capability beyond the reference (its params are replicated on 'data',
    reference trainer.py:421-426): every parameter bigger than
    ``min_size_to_shard`` elements is sharded along its largest evenly
    divisible dimension, cutting per-device param+optimizer+EMA memory by
    ~the data-axis size. GSPMD inserts the all-gathers before use and
    reduce-scatters on the gradients.
    """
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0 or data_axis_size <= 1:
        return P() if ndim == 0 else P(*([None] * ndim))
    size = 1
    for d in leaf.shape:
        size *= d
    spec = [None] * ndim
    if size >= min_size_to_shard:
        # Largest dim divisible by the axis size, ties to the last dim.
        best = None
        for i, d in enumerate(leaf.shape):
            if d % data_axis_size == 0 and (best is None or d >= leaf.shape[best]):
                best = i
        if best is not None:
            spec[best] = data_axis_name
    return P(*spec)


def fsdp_partition_specs(
    abstract_params: PyTree,
    data_axis_name: str = "data",
    data_axis_size: int = 1,
    min_size_to_shard: int = 2**14,
) -> PyTree:
    return jax.tree_util.tree_map_with_path(
        lambda path, x: fsdp_partition_spec(
            path_to_names(path), x, data_axis_name, data_axis_size, min_size_to_shard
        ),
        abstract_params,
    )


def mirror_partition_spec(param_spec_leaf: P, leaf_struct: Any) -> P:
    """EMA/optimizer leaves mirror their parameter's spec; scalars replicate.

    Parity: reference trainer.py:428-434.
    """
    if not hasattr(leaf_struct, "ndim") or leaf_struct.ndim == 0:
        return P()
    return param_spec_leaf


def optimizer_partition_specs(param_specs: PyTree, abstract_opt_state: PyTree) -> PyTree:
    """Sharding specs for an optax Adam-like state (reference trainer.py:436-490).

    ``mu``/``nu`` mirror the parameter specs; ``count`` and any trailing
    states (e.g. ``EmptyState`` from a schedule) replicate.
    """
    if not isinstance(abstract_opt_state, tuple):
        adam_like = abstract_opt_state
        others = ()
    else:
        adam_like = abstract_opt_state[0]
        others = abstract_opt_state[1:]

    # A flattened optimizer (optax.flatten — trainer ``flatten_optimizer``)
    # holds mu/nu as ONE flat buffer whose tree structure no longer mirrors
    # the parameter tree; per-leaf specs cannot apply, so replicate. The
    # trainer restricts the flat path to replicated-params topologies.
    if jax.tree_util.tree_structure(adam_like.mu) != jax.tree_util.tree_structure(
        param_specs, is_leaf=lambda x: isinstance(x, P)
    ):
        return jax.tree_util.tree_map(lambda _: P(), abstract_opt_state)

    mu_spec = jax.tree_util.tree_map(mirror_partition_spec, param_specs, adam_like.mu)
    nu_spec = jax.tree_util.tree_map(mirror_partition_spec, param_specs, adam_like.nu)
    adam_spec = type(adam_like)(count=P(), mu=mu_spec, nu=nu_spec)

    if not isinstance(abstract_opt_state, tuple):
        return adam_spec
    return (adam_spec,) + tuple(P() for _ in others)


def named_shardings(mesh: Mesh, spec_tree: PyTree) -> PyTree:
    """Wrap a PartitionSpec tree into NamedShardings over ``mesh``."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
