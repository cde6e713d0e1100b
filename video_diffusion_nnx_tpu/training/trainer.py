"""Trainer: jit-compiled, mesh-sharded training loop with EMA and Orbax
checkpointing.

Parity surface: reference trainer.py:44-629. Constructor signature, config
semantics (LR schedule shape, EMA cadence, checkpoint layout/cadence,
resume-with-fresh-optimizer), and the 2-D ``(data, model)`` mesh with
last-dim tensor-parallel parameter sharding are all preserved.

TPU-first improvements over the reference hot loop:

* **donated state** — the train state is donated to the compiled step, so
  params/opt/EMA update in place in HBM instead of being double-buffered;
* **prefetching input pipeline** — batches are shipped to device, already
  sharded ``P('data')``, by a background thread while the previous step runs
  (the reference paid torch->numpy->jnp->device on the critical path every
  step, trainer.py:546-552);
* **pipelined metrics** — the loss fetched each iteration is the *previous*
  step's, so the host never blocks on the step it just dispatched (the
  reference's ``device_get(loss)`` serialized host and device every step,
  trainer.py:581);
* **gradient clipping actually applied** when ``max_grad_norm`` is set (the
  reference imported the clip but never called it, trainer.py:32);
* **gradient accumulation implemented** (``lax.scan`` over microbatches)
  behind ``enable_gradient_accumulation`` — the reference accepted the knob
  and ignored it (trainer.py:99,158). Off by default so reference configs
  behave identically.
"""

from __future__ import annotations

import logging
import math
import time

from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import nnx, struct
from jax.flatten_util import ravel_pytree
from jax.sharding import NamedSharding, PartitionSpec as P

import orbax.checkpoint as ocp
from orbax.checkpoint import CheckpointManager

from video_diffusion_nnx_tpu.data.loader import endless_prefetching_loader
from video_diffusion_nnx_tpu.data.moving_mnist import MovingMNIST
from video_diffusion_nnx_tpu.parallel.mesh import data_model_mesh
from video_diffusion_nnx_tpu.parallel.sharding import (
    named_shardings,
    optimizer_partition_specs,
    params_partition_specs,
)
from video_diffusion_nnx_tpu.training.metrics import create_summary_writer
from video_diffusion_nnx_tpu.utils.checkpoint import (
    load_checkpoint,
    load_opt_state,
    save_checkpoint,
    save_opt_state,
)
from video_diffusion_nnx_tpu.utils.functional import noop
from video_diffusion_nnx_tpu.utils.grad import clip_grad_norm

logger = logging.getLogger(__name__)


@struct.dataclass
class NnxTrainState:
    """Dynamic (sharded) training state; graphdef/tx stay static outside.

    Parity: reference trainer.py:44-50.
    """

    params: nnx.State
    opt_state: optax.OptState
    ema_params: nnx.State


class Trainer:
    """Training runtime for a GaussianDiffusion model (reference trainer.py:52-392)."""

    def __init__(
        self,
        diffusion_model: nnx.Module,
        folder: str,
        *,
        rng_seed: int = 0,
        dataset_path: str,
        num_frames: int = 16,
        train_batch_size: int = 4,
        train_lr: float = 1e-4,
        train_num_steps: int = 100000,
        gradient_accumulate_every: int = 2,
        step_start_ema: int = 2000,
        update_ema_every: int = 10,
        save_and_sample_every: int = 100000,
        results_folder: str = "./results",
        num_sample_rows: int = 4,
        max_grad_norm: float | None = None,
        use_path_as_cond: bool = False,
        sample_text: str | None = None,
        cond_scale: float = 2.0,
        checkpoint_every_steps: int = 10,
        checkpoint_dir_path: str = "",
        add_loss_plot: bool = False,
        tensorboard_dir: str = "",
        resume_training_step: int = 0,
        ema_decay: float = 0.9999,
        max_to_keep: int | None = None,
        lr_decay_start_step: int = 0,
        lr_decay_steps: int = 0,
        lr_decay_coeff: float = 1.0,
        profile_flush_step: int = 100,
        num_model_shards: int = 1,
        enable_gradient_accumulation: bool = False,
        prefetch_depth: int = 2,
        dataset_normalize: bool = False,
        param_sharding: str = "tensor",
        fsdp_min_size_to_shard: int = 2**14,
        save_optimizer_state: bool = False,
        log_every_steps: int = 1,
        sequence_parallel_size: int = 1,
        async_checkpointing: bool = False,
        null_cond_prob: float = 0.0,
        freeze_schedule_buffers: bool = False,
        flatten_optimizer: bool = False,
    ):
        self.key = jax.random.PRNGKey(rng_seed)
        self.profile_flush_step = profile_flush_step
        # Opt-in fix for PARITY.md #11: the reference differentiates and
        # Adam-updates its FULL state, so the 10 diffusion-schedule
        # nnx.Variable buffers receive real gradients through q_sample/
        # extract and drift over training. True zeroes their gradients so
        # the noise schedule stays the mathematical constant it is meant to
        # be; False (default) reproduces the reference exactly.
        self.freeze_schedule_buffers = freeze_schedule_buffers

        # EMA configuration (reference trainer.py:130-132).
        self.step_start_ema = step_start_ema
        self.update_ema_every = update_ema_every
        self.ema_decay = ema_decay

        # --- Core components ---
        self.model = diffusion_model
        # Sequence (frame-axis) parallelism: build the ('data', 'seq') mesh
        # and attach it to the denoiser BEFORE nnx.split captures the
        # graphdef — the mesh is static module state that routes temporal
        # attention through parallel/sequence.py. Long-context capability
        # beyond the reference (SURVEY §5).
        self.sequence_parallel_size = sequence_parallel_size
        self._seq_mesh = None
        if sequence_parallel_size > 1:
            assert num_model_shards == 1, (
                "sequence parallelism composes with data parallelism only"
            )
            n = jax.local_device_count()
            assert n % sequence_parallel_size == 0, (
                f"{n} devices not divisible by sequence_parallel_size={sequence_parallel_size}"
            )
            model_frames = getattr(diffusion_model, "num_frames", num_frames)
            assert model_frames % sequence_parallel_size == 0, (
                f"num_frames={model_frames} must divide by sequence_parallel_size"
            )
            from video_diffusion_nnx_tpu.parallel.mesh import make_mesh

            self._seq_mesh = make_mesh(
                (n // sequence_parallel_size, sequence_parallel_size), ("data", "seq")
            )
            denoiser = getattr(diffusion_model, "denoise_fn", None)
            assert denoiser is not None and denoiser.reference_compat, (
                "sequence parallelism needs a reference_compat denoiser"
            )
            denoiser.sequence_parallel_mesh = self._seq_mesh
        self.graphdef, init_params = nnx.split(self.model)

        # Hold train_lr until lr_decay_start_step, then cosine-decay to
        # train_lr * lr_decay_coeff over lr_decay_steps (reference :138-145).
        self.lr_schedule = optax.piecewise_interpolate_schedule(
            interpolate_type="cosine",
            init_value=train_lr,
            boundaries_and_scales={
                lr_decay_start_step: 1.0,
                lr_decay_start_step + lr_decay_steps: lr_decay_coeff,
            },
        )
        # Flattened-buffer optimizer (TPU dispatch optimization, off by
        # default for opt/EMA checkpoint-layout parity): the ~400-leaf
        # parameter tree lowers Adam+EMA to hundreds of sub-roofline small
        # kernels (measured at 4-12% of HBM peak in isolation —
        # results/roofline_train_step.json). optax.flatten ravels grads/
        # moments into single flat buffers AND the EMA is held as one flat
        # vector (an axpy over ravel(new_params)). Both must flatten
        # together: A/B on hardware (scripts/ab_flat_opt.py) measured
        # flatten-Adam-alone 32% SLOWER (the ravel/unravel lowers to
        # per-leaf copies that don't pay for themselves) and flat-EMA-alone
        # neutral, while the combination is 5-6% faster (XLA fuses the
        # update unravel -> apply -> EMA ravel chain into flat-buffer
        # passes). Numerics are identical (Adam/EMA are elementwise;
        # concatenation order changes nothing — tested in
        # tests/test_trainer.py). Restricted to replicated-params
        # topologies: one flat buffer cannot carry per-leaf TP/FSDP specs.
        self.flatten_optimizer = flatten_optimizer
        if flatten_optimizer:
            assert num_model_shards == 1 and param_sharding == "tensor", (
                "flatten_optimizer supports replicated parameters only "
                "(num_model_shards=1, param_sharding='tensor'); a flat "
                "moment buffer cannot carry per-leaf TP/FSDP shardings"
            )
            self.tx = optax.flatten(optax.adam(self.lr_schedule))
            # ravel_pytree copies into a fresh flat buffer (donation-safe)
            # and returns the unravel fn used at checkpoint/sample time.
            init_ema_params, self._ema_unravel = ravel_pytree(init_params)
        else:
            self.tx = optax.adam(self.lr_schedule)
            self._ema_unravel = None
            # Real copies, not aliases: the train step donates the whole
            # state, and XLA rejects donating one buffer via two arguments.
            init_ema_params = jax.tree_util.tree_map(jnp.copy, init_params)
        init_opt_state = self.tx.init(init_params)

        # --- Training configuration ---
        self.train_num_steps = train_num_steps
        self.batch_size = train_batch_size
        self.max_grad_norm = max_grad_norm
        self.use_path_as_cond = use_path_as_cond
        # Classifier-free-guidance conditioning dropout: fraction of batch
        # rows whose text condition is swapped for the learned null
        # embedding each step. The reference accepted text conditioning but
        # never trained the null branch (its trainer threads no
        # null_cond_prob, reference trainer.py:337-358), so its CFG
        # sampling path could never be meaningfully used. Default 0 = parity.
        self.null_cond_prob = null_cond_prob
        self.gradient_accumulate_every = gradient_accumulate_every
        self.enable_gradient_accumulation = (
            enable_gradient_accumulation and gradient_accumulate_every > 1
        )
        if self.enable_gradient_accumulation:
            assert train_batch_size % gradient_accumulate_every == 0, (
                "batch_size must divide into gradient_accumulate_every microbatches"
            )

        # --- Device mesh: (data, model) like reference :160-178, or
        # (data, seq) when sequence parallelism is on ---
        self.n_devices = jax.local_device_count()
        self.num_model_shards = num_model_shards
        self.data_axis_name = "data"
        self.model_axis_name = "model"
        if self._seq_mesh is not None:
            data_size = self.n_devices // self.sequence_parallel_size
            assert self.batch_size % data_size == 0, (
                "batch_size must be divisible by the data-parallel degree"
            )
            self.per_device_bs = self.batch_size // data_size
            self.mesh = self._seq_mesh
        else:
            assert self.batch_size % self.n_devices == 0, (
                "batch_size must be divisible by number of devices"
            )
            if self.n_devices < num_model_shards:
                # e.g. config_v2_3 (num_model_shards: 2) on a single dev
                # chip: clamp to a feasible degree instead of crashing so
                # every shipped config runs anywhere (the reference asserts).
                feasible = math.gcd(self.n_devices, num_model_shards)
                logger.warning(
                    "num_model_shards=%d exceeds the %d available device(s); "
                    "clamping to %d (single-host portability fallback)",
                    num_model_shards, self.n_devices, feasible,
                )
                num_model_shards = self.num_model_shards = feasible
            else:
                # On a real multi-device mesh a non-dividing shard count is a
                # genuine misconfiguration (silently running a different
                # topology, e.g. pure DP, would mask it) — fail loud.
                assert self.n_devices % num_model_shards == 0, (
                    f"num_model_shards={num_model_shards} does not divide "
                    f"{self.n_devices} devices; pick a divisor"
                )
            self.per_device_bs = self.batch_size // self.n_devices
            self.mesh = data_model_mesh(self.n_devices, num_model_shards)
        logger.info(
            "Created mesh with shape: %s and axis_names: %s",
            dict(self.mesh.shape),
            self.mesh.axis_names,
        )

        # --- Sharding specs: reference TP heuristic over params/opt/EMA ---
        abstract_params = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), init_params
        )
        if self._seq_mesh is not None:
            # Params replicate on the (data, seq) mesh; the TP specs would
            # name a 'model' axis this mesh doesn't have.
            param_specs = jax.tree_util.tree_map(lambda _: P(), abstract_params)
        elif param_sharding == "fsdp":
            # ZeRO-style: shard params/opt/EMA over the data axis (capability
            # beyond the reference, which replicates them on 'data').
            from video_diffusion_nnx_tpu.parallel.sharding import fsdp_partition_specs

            param_specs = fsdp_partition_specs(
                abstract_params,
                self.data_axis_name,
                self.n_devices // num_model_shards,
                min_size_to_shard=fsdp_min_size_to_shard,
            )
        else:
            assert param_sharding == "tensor", param_sharding
            param_specs = params_partition_specs(
                abstract_params, self.model_axis_name, num_model_shards
            )
        abstract_opt = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x,
            init_opt_state,
        )
        opt_specs = optimizer_partition_specs(param_specs, abstract_opt)
        # Flat EMA is a single (replicated-only) vector; its structure no
        # longer mirrors the param tree.
        ema_specs = P() if self.flatten_optimizer else param_specs
        spec_tree = NnxTrainState(params=param_specs, opt_state=opt_specs, ema_params=ema_specs)
        self.train_state_sharding = named_shardings(self.mesh, spec_tree)
        self.batch_sharding = NamedSharding(self.mesh, P(self.data_axis_name))
        self.repl_sharding = NamedSharding(self.mesh, P())

        self.state = NnxTrainState(
            params=init_params, opt_state=init_opt_state, ema_params=init_ema_params
        )

        # --- Dataset & prefetching pipeline ---
        self.image_size = diffusion_model.image_size
        model_num_frames = diffusion_model.num_frames
        logger.info("Loading dataset from: %s", dataset_path)
        collate_fn = None
        if Path(dataset_path).is_dir():
            # Folder of GIF clips (optionally caption-conditioned via
            # filename, collated to dense BERT embeddings on the host).
            from video_diffusion_nnx_tpu.data.gif_dataset import GifVideoDataset
            from video_diffusion_nnx_tpu.data.loader import collate_with_text_cond

            self.ds = GifVideoDataset(
                dataset_path,
                image_size=self.image_size,
                channels=diffusion_model.channels,
                num_frames=model_num_frames,
                force_num_frames=True,
                use_path_as_cond=use_path_as_cond,
            )
            if use_path_as_cond:
                collate_fn = collate_with_text_cond
        else:
            self.ds = MovingMNIST(
                dataset_path,
                image_size=(self.image_size, self.image_size),
                num_frames=model_num_frames,
                force_num_frames=True,
                normalize=dataset_normalize,
            )
        num_samples = len(self.ds)
        logger.info("Found %d sequences in dataset.", num_samples)
        assert num_samples > 0, "Dataset is empty. Check path and format."
        self._prefetch_depth = prefetch_depth
        self._data_seed = rng_seed
        batch_shardings = (
            (self.batch_sharding, self.batch_sharding) if use_path_as_cond else self.batch_sharding
        )
        self.dl = endless_prefetching_loader(
            self.ds,
            batch_size=self.batch_size,
            sharding=batch_shardings,
            seed=self._data_seed,
            depth=prefetch_depth,
            collate_fn=collate_fn,
        )

        # --- Results / checkpointing (reference :260-273) ---
        self.results_folder = Path(results_folder).resolve()
        self.results_folder.mkdir(exist_ok=True, parents=True)
        self.checkpoint_dir_path = (
            Path(checkpoint_dir_path).resolve()
            if checkpoint_dir_path
            else (self.results_folder / "checkpoints").resolve()
        )
        self.checkpoint_dir_path.mkdir(exist_ok=True, parents=True)
        self.checkpoint_every_steps = checkpoint_every_steps
        self.async_checkpointing = async_checkpointing
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self.ckpt_manager = CheckpointManager(self.checkpoint_dir_path, options=options)
        # Opt-in full-state resume (the reference re-initializes the
        # optimizer on resume, trainer.py:291-292 — kept as the default).
        self.save_optimizer_state = save_optimizer_state
        self._opt_ckpt_manager = None
        if save_optimizer_state:
            self._opt_ckpt_manager = CheckpointManager(
                self.checkpoint_dir_path / "opt_state",
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
            )
        logger.info(
            "Checkpoint manager initialized at %s with max_to_keep=%s",
            self.checkpoint_dir_path,
            max_to_keep,
        )

        # --- Metrics ---
        self.tensorboard_dir = (
            Path(tensorboard_dir).resolve()
            if tensorboard_dir
            else self.results_folder / "tensorboard"
        )
        self.tensorboard_dir.mkdir(exist_ok=True, parents=True)
        self.writer = create_summary_writer(str(self.tensorboard_dir))

        # --- Resume (reference :281-302; opt_state deliberately fresh) ---
        self.step = resume_training_step
        if self.step > 0:
            logger.info("Attempting to resume training from step %d", self.step)
            try:
                model, ema_params = load_checkpoint(
                    self.model, self.step, str(self.checkpoint_dir_path), self.ckpt_manager
                )
                if model is not None and ema_params is not None:
                    if self.flatten_optimizer:
                        # Checkpoints always hold the EMA as the canonical
                        # param tree (layout parity); ravel back to the
                        # flat runtime layout.
                        ema_params = ravel_pytree(ema_params)[0]
                    restored_opt = init_opt_state
                    if self._opt_ckpt_manager is not None:
                        try:
                            abstract_opt_tree = jax.tree_util.tree_map(
                                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                                if hasattr(x, "shape")
                                else x,
                                init_opt_state,
                            )
                            restored_opt = load_opt_state(
                                self._opt_ckpt_manager, abstract_opt_tree, self.step
                            )
                            logger.info("Restored optimizer state for step %d", self.step)
                        except FileNotFoundError:
                            logger.warning(
                                "No optimizer state for step %d; starting fresh", self.step
                            )
                    self.state = NnxTrainState(
                        params=nnx.split(model)[1],
                        opt_state=restored_opt,
                        ema_params=ema_params,
                    )
                    logger.info("Successfully loaded checkpoint state for step %d", self.step)
                else:
                    logger.warning("Checkpoint loading returned None for step %d.", self.step)
                    self.step = 0
            except FileNotFoundError:
                logger.warning(
                    "Checkpoint for step %d not found at %s.", self.step, self.checkpoint_dir_path
                )
                self.step = 0

        # Reference trainer.py:111,304 accepted this knob but never used it
        # (its README loss-curve PNG was produced out-of-band). Here it
        # collects the logged losses and writes results/loss_plot.png when
        # training finishes.
        self.add_loss_plot = add_loss_plot
        self._loss_history: list[tuple[int, float]] = []
        # Host<->device loss fetches synchronize the pipeline; on tunneled
        # or high-latency runtimes fetch every N steps instead (default 1 =
        # reference cadence).
        self.log_every_steps = max(1, log_every_steps)
        self.save_and_sample_every = save_and_sample_every
        self.num_sample_rows = num_sample_rows
        self.sample_text = sample_text
        self.cond_scale = cond_scale

        self._step_cache: dict = {}
        self.p_train_step = self._build_train_step(prob_focus_present=0.0)

    # ------------------------------------------------------------------ #
    # Compiled train step                                                  #
    # ------------------------------------------------------------------ #

    def _build_train_step(self, prob_focus_present: float = 0.0) -> Callable:
        """One fused XLA program: loss -> grads -> (clip) -> Adam -> EMA.

        Mirrors reference trainer.py:322-392 semantically; state is donated,
        hyperparameters are compile-time constants, and ``step`` stays a
        traced scalar so no recompilation happens per step.
        """
        cached = self._step_cache.get(prob_focus_present)
        if cached is not None:
            return cached

        graphdef = self.graphdef
        tx = self.tx
        use_path_as_cond = self.use_path_as_cond
        step_start_ema = self.step_start_ema
        update_ema_every = self.update_ema_every
        ema_decay = self.ema_decay
        max_grad_norm = self.max_grad_norm
        accum = self.gradient_accumulate_every if self.enable_gradient_accumulation else 1

        null_cond_prob = self.null_cond_prob

        def loss_fn(params, batch_data, key):
            model = nnx.merge(graphdef, params)
            if use_path_as_cond:
                video_data, cond_data = batch_data
                return model(
                    video_data,
                    key=key,
                    cond=cond_data,
                    null_cond_prob=null_cond_prob,
                    prob_focus_present=prob_focus_present,
                    focus_present_mask=None,
                )
            return model(
                batch_data,
                key=key,
                prob_focus_present=prob_focus_present,
                focus_present_mask=None,
            )

        def grads_of(params, batch_data, key):
            if accum == 1:
                return jax.value_and_grad(loss_fn)(params, batch_data, key)

            # Microbatch accumulation: (A, b/A, ...) scan keeps peak
            # activation memory at one microbatch while matching the
            # full-batch gradient in expectation.
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(accum, x.shape[0] // accum, *x.shape[1:]), batch_data
            )
            keys = jax.random.split(key, accum)

            def body(carry, xs):
                loss_acc, grad_acc = carry
                mb, k = xs
                loss, grads = jax.value_and_grad(loss_fn)(params, mb, k)
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return (loss_acc + loss, grad_acc), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            (loss_sum, grad_sum), _ = jax.lax.scan(body, (0.0, zero_grads), (micro, keys))
            inv = 1.0 / accum
            return loss_sum * inv, jax.tree_util.tree_map(lambda g: g * inv, grad_sum)

        freeze_buffers = self.freeze_schedule_buffers
        ema_is_flat = self.flatten_optimizer

        def train_step(state: NnxTrainState, batch_data, key, step):
            loss, grads = grads_of(state.params, batch_data, key)

            if freeze_buffers:
                # Zero non-Param gradients (schedule nnx.Variable buffers):
                # Adam then leaves them exactly unchanged. See PARITY.md #11.
                g_params, g_rest = nnx.split_state(grads, nnx.Param, ...)
                g_rest = jax.tree_util.tree_map(jnp.zeros_like, g_rest)
                grads = nnx.merge_state(g_params, g_rest)

            if max_grad_norm is not None:
                grads, grad_norm = clip_grad_norm(grads, max_grad_norm)
            else:
                from video_diffusion_nnx_tpu.utils.grad import global_l2_norm

                grad_norm = global_l2_norm(grads)

            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)

            if freeze_buffers:
                # Restore buffer VALUES post-update: zeroed grads alone keep
                # buffers fixed only while their Adam moments are zero — an
                # opt_state resumed from a run without the flag would keep
                # drifting them for ~1/(1-beta1) steps as the stale moments
                # decay. Copying the old values back makes the freeze
                # unconditional (advisor r3 finding).
                p_new, _ = nnx.split_state(new_params, nnx.Param, ...)
                _, rest_old = nnx.split_state(state.params, nnx.Param, ...)
                new_params = nnx.merge_state(p_new, rest_old)

            do_ema = jnp.logical_and(step >= step_start_ema, (step % update_ema_every) == 0)
            if ema_is_flat:
                # One full-bandwidth axpy over the raveled params instead of
                # ~400 per-leaf kernels (see flatten_optimizer in __init__).
                def ema_fire():
                    return ema_decay * state.ema_params + (
                        1 - ema_decay
                    ) * ravel_pytree(new_params)[0]
            else:
                def ema_fire():
                    return jax.tree_util.tree_map(
                        lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                        state.ema_params,
                        new_params,
                    )

            new_ema_params = jax.lax.cond(do_ema, ema_fire, lambda: state.ema_params)
            new_state = state.replace(
                params=new_params, opt_state=new_opt_state, ema_params=new_ema_params
            )
            return new_state, (loss, grad_norm)

        batch_in = (
            (self.batch_sharding, self.batch_sharding) if use_path_as_cond else self.batch_sharding
        )
        jitted = jax.jit(
            train_step,
            in_shardings=(
                self.train_state_sharding,
                batch_in,
                self.repl_sharding,
                self.repl_sharding,
            ),
            out_shardings=(
                self.train_state_sharding,
                (self.repl_sharding, self.repl_sharding),
            ),
            donate_argnums=(0,),
        )
        self._step_cache[prob_focus_present] = jitted
        return jitted

    # ------------------------------------------------------------------ #
    # Loop                                                                 #
    # ------------------------------------------------------------------ #

    def train(
        self,
        prob_focus_present: float = 0.0,
        focus_present_mask: Any = None,
        log_fn: Callable = noop,
    ) -> None:
        """Run the training loop (reference trainer.py:508-629)."""
        assert callable(log_fn)
        logger.info("Starting training loop from step %d...", self.step)

        step_fn = self._build_train_step(prob_focus_present=prob_focus_present)

        key = self.key
        try:
            jax.profiler.start_server(9999)
        except Exception as e:  # port already bound by a previous Trainer
            logger.debug("profiler server not started: %s", e)

        tracing = False
        if self.profile_flush_step > 0:
            Path(self.tensorboard_dir).mkdir(parents=True, exist_ok=True)
            try:
                jax.profiler.start_trace(str(self.tensorboard_dir), create_perfetto_link=False)
                tracing = True
                logger.info(
                    "JAX profiler file trace started; flushing at step %d.",
                    self.profile_flush_step,
                )
            except Exception as e:
                logger.warning("profiler trace not started: %s", e)

        pending: tuple | None = None  # (step, loss, grad_norm) one step behind
        last_dispatch = time.time()

        while self.step < self.train_num_steps:
            key, step_key = jax.random.split(key)
            batch_data = next(self.dl)

            self.state, (loss_val, grad_norm) = step_fn(
                self.state, batch_data, step_key, jnp.asarray(self.step, jnp.int32)
            )

            now = time.time()
            self.writer.add_scalar("step_time", now - last_dispatch, self.step)
            last_dispatch = now

            # Log the *previous* step's loss so the host never blocks on the
            # step it just dispatched.
            if pending is not None:
                self._log_loss(pending[0], pending[1], pending[2], log_fn)
                pending = None
            if self.step % self.log_every_steps == 0:
                pending = (self.step, loss_val, grad_norm)

            if self.step > 0 and self.step % self.checkpoint_every_steps == 0:
                logger.info("Step: %d | Saving checkpoint...", self.step)
                self._save_checkpoint()

            # In-training sample artifacts. The reference accepted this knob
            # but its sample_batch was a warning stub returning zeros
            # (reference trainer.py:102,492-506) — here it writes real EMA
            # sample GIFs under results/samples/step_{N}/.
            if (
                self.save_and_sample_every
                and 0 < self.save_and_sample_every <= self.train_num_steps
                and self.step > 0
                and self.step % self.save_and_sample_every == 0
            ):
                self._sample_and_save()

            self.step += 1

            if tracing and self.step == self.profile_flush_step:
                jax.profiler.stop_trace()
                tracing = False

        if pending is not None:
            self._log_loss(pending[0], pending[1], pending[2], log_fn)
        if tracing:
            jax.profiler.stop_trace()

        self.key = key
        logger.info("Training completed!")
        logger.info("Saving final checkpoint...")
        self._save_checkpoint(wait=True)

        self._write_loss_plot()
        self.writer.close()
        logger.info("TensorBoard logs saved to: %s", self.tensorboard_dir)

    def _log_loss(self, step: int, loss_val, grad_norm, log_fn: Callable) -> None:
        current_loss = float(jax.device_get(loss_val))
        logger.info("Step: %d/%d | Loss: %.4f", step, self.train_num_steps, current_loss)
        log_fn({"loss": current_loss, "step": step})
        self.writer.add_scalar("loss/train", current_loss, step)
        self.writer.add_scalar("lr/train", float(self.lr_schedule(step)), step)
        self.writer.add_scalar("grad_norm/train", float(jax.device_get(grad_norm)), step)
        if self.add_loss_plot:
            self._loss_history.append((step, current_loss))

    def _write_loss_plot(self) -> None:
        if not (self.add_loss_plot and self._loss_history):
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            steps, losses = zip(*self._loss_history)
            fig, ax = plt.subplots(figsize=(8, 4.5))
            ax.plot(steps, losses, linewidth=1)
            ax.set_xlabel("step")
            ax.set_ylabel("loss")
            ax.set_title(f"Training loss over {steps[-1] + 1} steps")
            fig.tight_layout()
            out = self.results_folder / "loss_plot.png"
            fig.savefig(out, dpi=120)
            plt.close(fig)
            logger.info("Loss plot saved to %s", out)
        except Exception as e:  # plotting must never fail training
            logger.error("Error writing loss plot: %s", e)

    def _save_checkpoint(self, wait: bool | None = None) -> None:
        """Periodic save. With ``async_checkpointing`` the Orbax finalize runs
        in its background thread and the train loop continues immediately;
        the final save (``wait=True``) blocks so every enqueued checkpoint is
        durable when ``train()`` returns.

        A *periodic* save failure is logged and training continues (the next
        cadence retries); a failed **final** blocking save re-raises so
        callers never see train() succeed without a durable terminal
        checkpoint (e.g. async background write hitting a full disk).
        """
        final = wait is True
        if wait is None:
            wait = not self.async_checkpointing
        if self.step in (self.ckpt_manager.all_steps() or []):
            # Resuming at (or re-reaching) an already-saved step: Orbax
            # refuses to overwrite a finalized step directory, and the state
            # is the one that was saved there — nothing to do.
            logger.info("Checkpoint for step %d already exists; skipping save", self.step)
            return
        try:
            ema_to_save = self.state.ema_params
            if self.flatten_optimizer:
                # Checkpoints keep the canonical param-tree EMA layout
                # (reference/Orbax parity): unravel the flat runtime vector
                # on device (cheap slices) before the host fetch.
                ema_to_save = self._ema_unravel(ema_to_save)
            state_to_save = jax.device_get(
                self.state.replace(ema_params=ema_to_save)
            )
            save_checkpoint(
                self.ckpt_manager, state_to_save.params, state_to_save.ema_params,
                self.step, wait=wait,
            )
            if self._opt_ckpt_manager is not None:
                save_opt_state(
                    self._opt_ckpt_manager, state_to_save.opt_state, self.step, wait=wait
                )
        except Exception as e:
            logger.error("Error saving checkpoint at step %d: %s", self.step, e)
            if final:
                raise

    # ------------------------------------------------------------------ #
    # Sampling from the trained model                                      #
    # ------------------------------------------------------------------ #

    def _sample_and_save(self) -> None:
        """Write ``num_sample_rows`` EMA sample GIFs to
        ``results/samples/step_{N}/sample_{i}.gif`` (same shared artifact
        writer as sample.py)."""
        from video_diffusion_nnx_tpu.utils import write_sample_gifs

        try:
            videos = self.sample_batch(self.num_sample_rows)
            out_dir = self.results_folder / "samples" / f"step_{self.step}"
            paths = write_sample_gifs(videos, out_dir)
            logger.info("Step: %d | Wrote %d sample GIFs to %s", self.step, len(paths), out_dir)
        except Exception as e:
            logger.error("Error sampling at step %d: %s", self.step, e)

    def sample_batch(self, batch_size: int, use_ema: bool = True, key: jax.Array | None = None):
        """Sample videos from the current (EMA by default) parameters.

        The reference's version was a warning stub returning zeros
        (trainer.py:492-506); this one actually samples via the on-device
        scan sampler. The parameters are merged ON DEVICE — no
        ``jax.device_get`` round trip of the tree (for the dim-128 model that
        is a multi-hundred-MB HBM->host->HBM copy mid-training); the sampler
        jit reshards them from the training layout directly over ICI.
        """
        if key is None:
            self.key, key = jax.random.split(self.key)
        params = self.state.ema_params if use_ema else self.state.params
        if use_ema and self.flatten_optimizer:
            params = self._ema_unravel(params)  # flat vector -> param tree
        model = nnx.merge(self.graphdef, params)
        cond = [self.sample_text] * batch_size if self.sample_text else None
        return model.sample(
            key, cond=cond, cond_scale=self.cond_scale if cond else 1.0, batch_size=batch_size
        )
