"""Worker process for the 2-process multi-host test (run via subprocess).

Executes the two branches that only run when ``jax.process_count() > 1``:
``parallel.mesh.initialize_distributed`` (real ``jax.distributed``
handshake over localhost) and the prefetch loader's
``make_array_from_process_local_data`` global-batch assembly — then one
global-mesh train step on a tiny real model.

Usage: ``python multihost_worker.py <process_id> <num_processes> <port>``
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# Force CPU with 4 virtual devices BEFORE any backend use (the container's
# sitecustomize pins the TPU plugin; the config update is what redirects).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from video_diffusion_nnx_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_diffusion_nnx_tpu.data.loader import endless_prefetching_loader

    mesh = make_mesh((4 * nproc,), ("data",), devices=jax.devices())
    batch_sharding = NamedSharding(mesh, P("data"))

    # Each process feeds its LOCAL half of the global batch; the loader's
    # multi-host branch assembles the global jax.Array across processes.
    size, frames = 8, 2
    ds = [np.full((1, frames, size, size), float(i), np.float32) for i in range(8)]
    global_batch = 4 * nproc
    dl = endless_prefetching_loader(
        ds, batch_size=global_batch // nproc, sharding=batch_sharding, seed=0
    )
    batch = next(dl)
    assert batch.shape == (global_batch, 1, frames, size, size), batch.shape
    assert len(batch.addressable_shards) == 4

    # One global-mesh train step on a real (tiny) GaussianDiffusion.
    import optax
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D

    unet = Unet3D(dim=8, rngs=nnx.Rngs(0), dim_mults=(1,), channels=1, attn_heads=2)
    diff = GaussianDiffusion(
        unet, image_size=size, num_frames=frames, channels=1, timesteps=5, loss_type="l2"
    )
    graphdef, params = nnx.split(diff)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    repl = NamedSharding(mesh, P())

    def step(params, opt, batch, key):
        def loss_fn(p):
            return nnx.merge(graphdef, p)(batch, key=key)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    jitted = jax.jit(
        step,
        in_shardings=(repl, repl, batch_sharding, repl),
        out_shardings=(repl, repl, repl),
    )
    params, opt, loss = jitted(params, opt, batch, jax.random.PRNGKey(0))
    loss_val = float(loss)
    assert np.isfinite(loss_val), loss_val
    print(f"MULTIHOST_OK process={pid} devices={jax.device_count()} loss={loss_val:.4f}")


if __name__ == "__main__":
    main()
