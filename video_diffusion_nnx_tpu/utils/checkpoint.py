"""Orbax checkpointing with the reference's exact on-disk layout.

Parity surface: reference utils.py:432-508. The checkpoint at step ``N`` is
``{checkpoint_dir}/{N}/**`` holding a StandardSave of
``{'model': <nnx.State of the whole GaussianDiffusion>, 'ema_params': <same>}``
— including the diffusion schedule ``nnx.Variable`` buffers. This layout is
what lets checkpoints written by the reference restore into this framework
unchanged (and vice versa).
"""

from __future__ import annotations

import logging
from typing import Any

import orbax.checkpoint as ocp
from flax import nnx
from orbax.checkpoint import CheckpointManager
from orbax.checkpoint import args as ocp_args

PyTree = Any

logger = logging.getLogger(__name__)


def save_checkpoint(
    ckpt_manager: CheckpointManager,
    model_params: PyTree,
    ema_params: PyTree,
    step: int,
    wait: bool = True,
) -> None:
    """Save ``{'model': model_params, 'ema_params': ema_params}`` at ``step``.

    Parity: reference utils.py:432-458 (StandardSave, ``force=True``, blocking
    wait so the step directory is complete when we return). ``wait=False``
    lets Orbax finalize in its background thread so the train loop is not
    blocked on disk I/O; callers must issue one final blocking save (or
    ``ckpt_manager.wait_until_finished()``) before relying on the artifact.
    """
    save_items = {"model": model_params, "ema_params": ema_params}
    ckpt_manager.save(step, args=ocp_args.StandardSave(save_items), force=True)
    if wait:
        ckpt_manager.wait_until_finished()
    logger.info("Checkpoint save %s at step %d", "finished" if wait else "enqueued", step)


def save_opt_state(
    ckpt_manager: CheckpointManager, opt_state: PyTree, step: int, wait: bool = True
) -> None:
    """Save optimizer state under its own manager (opt-in full-state resume).

    Kept out of the main checkpoint so the reference-compatible
    ``{'model', 'ema_params'}`` layout (utils.py:445-448) stays exactly
    interchangeable; the optimizer tree lives in a sibling directory.
    """
    ckpt_manager.save(step, args=ocp_args.StandardSave(opt_state), force=True)
    if wait:
        ckpt_manager.wait_until_finished()
    logger.info("Optimizer state save %s at step %d", "finished" if wait else "enqueued", step)


def load_opt_state(ckpt_manager: CheckpointManager, abstract_opt_state: PyTree, step: int):
    """Restore optimizer state saved by :func:`save_opt_state`."""
    if step not in ckpt_manager.all_steps():
        raise FileNotFoundError(f"no optimizer state for step {step}")
    return ckpt_manager.restore(step, args=ocp_args.StandardRestore(abstract_opt_state))


def load_checkpoint(
    model: nnx.Module,
    step: int,
    path: str,
    ckpt_manager: CheckpointManager | None = None,
    load_ema_params: bool = False,
):
    """Restore a checkpoint into ``model``'s structure.

    Returns ``(model, ema_params)`` — the merged model (EMA weights when
    ``load_ema_params``) plus the raw EMA state, matching reference
    utils.py:460-508.
    """
    if ckpt_manager is None:
        ckpt_manager = ocp.CheckpointManager(path, options=ocp.CheckpointManagerOptions())

    steps = ckpt_manager.all_steps()
    if step not in steps:
        available = ", ".join(map(str, sorted(steps))) if steps else "none"
        raise FileNotFoundError(
            f"no checkpoint for step {step} under {path} (available steps: {available})"
        )

    graphdef, abstract_state = nnx.split(model)
    abstract = {"model": abstract_state, "ema_params": abstract_state}
    state_dict = ckpt_manager.restore(step, args=ocp_args.StandardRestore(abstract))
    model_params = state_dict["model"]
    ema_params = state_dict["ema_params"]

    if load_ema_params:
        model = nnx.merge(graphdef, ema_params)
        logger.info("Loaded EMA parameters")
    else:
        model = nnx.merge(graphdef, model_params)
        logger.info("Loaded model parameters")
    logger.info("Checkpoint loaded from step: %d", step)
    return model, ema_params
