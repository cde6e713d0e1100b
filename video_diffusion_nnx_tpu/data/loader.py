"""Torch-free batching + device-prefetching input pipeline.

Replaces the reference's ``torch.utils.data.DataLoader`` +
``itertools.cycle`` + per-step ``jnp.array(batch.detach().cpu().numpy())``
hot-loop copy (reference trainer.py:258, 546-552).

TPU-first design
----------------
The reference pays, every step, for: torch worker IPC -> torch tensor ->
numpy -> jnp host array -> device transfer, all on the critical path between
two train steps. Here:

* :class:`DataLoader` assembles shuffled, drop-last batches directly from
  the numpy-backed dataset (zero copies beyond the final stack);
* :func:`device_prefetch` runs a background thread that ships the next
  ``depth`` batches to device HBM with their target ``NamedSharding``
  *while the current step is still executing*, so the train loop never
  blocks on host->device transfer;
* batches are placed pre-sharded (per-device slices), so no gather/reshard
  happens at dispatch.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Sequence

import jax
import numpy as np

from video_diffusion_nnx_tpu.utils.functional import cycle


class DataLoader:
    """Minimal shuffling, drop-last batch loader over a numpy-item dataset.

    One iteration = one epoch. Combine with ``utils.cycle`` for an endless
    stream (each pass reshuffles).
    """

    def __init__(
        self,
        dataset: Sequence,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        collate_fn: Callable[[list], Any] | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self.collate_fn = collate_fn or (lambda items: np.stack(items, axis=0))

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Any]:
        n = len(self.dataset)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield self.collate_fn([self.dataset[int(i)] for i in idx])


class _PrefetchThread(threading.Thread):
    def __init__(self, it, out_q, put_fn):
        super().__init__(daemon=True)
        self._it = it
        self._q = out_q
        self._put = put_fn
        self._stop = threading.Event()

    def run(self):
        try:
            for item in self._it:
                if self._stop.is_set():
                    return
                self._q.put(self._put(item))
        except Exception as e:  # surface errors at the consumer
            self._q.put(_PrefetchError(e))

    def stop(self):
        self._stop.set()


class _PrefetchError:
    def __init__(self, exc: BaseException):
        self.exc = exc


def device_prefetch(
    iterator,
    sharding: jax.sharding.Sharding | None = None,
    depth: int = 2,
) -> Iterator[Any]:
    """Wrap a host batch iterator with background device placement.

    Yields device arrays already laid out with ``sharding`` (or default
    placement). ``depth`` batches are kept in flight, overlapping
    host->device DMA with the running computation.
    """

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        if jax.process_count() > 1:
            # Multi-host: each process holds its local slice of the global
            # batch; assemble a global jax.Array across hosts.
            shardings = (
                sharding
                if isinstance(sharding, tuple)
                else jax.tree_util.tree_map(lambda _: sharding, batch)
            )
            return jax.tree_util.tree_map(
                lambda b, s: jax.make_array_from_process_local_data(s, b), batch, shardings
            )
        return jax.device_put(batch, sharding)

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    thread = _PrefetchThread(iter(iterator), q, put)
    thread.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, _PrefetchError):
                raise item.exc
            yield item
    finally:
        thread.stop()


def collate_with_text_cond(items: list) -> tuple:
    """Collate ``(video, caption)`` items into ``(videos, cond_embeddings)``.

    Captions are tokenized + BERT-embedded on the host inside the prefetch
    thread, so the device only ever sees dense ``(b, BERT_MODEL_DIM)``
    conditioning vectors — this is the collate to pair with
    ``Trainer(use_path_as_cond=True)`` and ``GifVideoDataset(use_path_as_cond=True)``.
    """
    from video_diffusion_nnx_tpu.models.text import bert_embed, tokenize

    videos = np.stack([v for v, _ in items], axis=0)
    captions = [c for _, c in items]
    cond = bert_embed(tokenize(captions)).astype(np.float32)
    return videos, cond


def endless_prefetching_loader(
    dataset: Sequence,
    batch_size: int,
    sharding: jax.sharding.Sharding | None = None,
    seed: int = 0,
    depth: int = 2,
    collate_fn: Callable[[list], Any] | None = None,
) -> Iterator[Any]:
    """Endless shuffled sharded-on-device batch stream (the trainer's feed)."""
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=True,
        drop_last=True,
        seed=seed,
        collate_fn=collate_fn,
    )
    return device_prefetch(cycle(loader), sharding=sharding, depth=depth)
