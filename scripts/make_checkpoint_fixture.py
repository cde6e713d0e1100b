"""Generate the committed checkpoint-interchange fixture.

Writes an Orbax checkpoint in the reference's exact on-disk layout
(``{step}/**`` holding ``{'model': <GaussianDiffusion nnx.State>,
'ema_params': <same>}``, reference utils.py:432-458) for a tiny seeded
model into ``tests/golden/ckpt_fixture``. The committed artifact lets
``tests/test_checkpoint_fixture.py`` prove restore interchange against a
checkpoint that the test run itself never wrote.

Usage: /opt/venv/bin/python scripts/make_checkpoint_fixture.py
"""

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Fixture recipe — mirrored by the test; change both together.
SEED = 7
DIM, DIM_MULTS, CHANNELS = 8, (1, 2), 1
IMAGE_SIZE, FRAMES, TIMESTEPS = 16, 4, 10
STEP = 1
OUT = REPO / "tests" / "golden" / "ckpt_fixture"


def main() -> None:
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from flax import nnx

    from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
    from video_diffusion_nnx_tpu.models import Unet3D
    from video_diffusion_nnx_tpu.utils.checkpoint import save_checkpoint

    unet = Unet3D(dim=DIM, rngs=nnx.Rngs(SEED), dim_mults=DIM_MULTS, channels=CHANNELS)
    diffusion = GaussianDiffusion(
        unet, image_size=IMAGE_SIZE, num_frames=FRAMES, channels=CHANNELS,
        timesteps=TIMESTEPS, loss_type="l2",
    )
    _, params = nnx.split(diffusion)
    # EMA values are deliberately distinct from the live params so the test
    # can tell which tree --load-ema-params actually restored.
    ema = jax.tree_util.tree_map(lambda x: x * jnp.asarray(0.5, x.dtype), params)

    mgr = ocp.CheckpointManager(OUT.resolve(), options=ocp.CheckpointManagerOptions(create=True))
    save_checkpoint(mgr, params, ema, STEP)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    print(f"fixture written to {OUT} (step {STEP}, {n_leaves} leaves)")


if __name__ == "__main__":
    main()
