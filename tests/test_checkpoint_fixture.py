"""Checkpoint-interchange proof against a COMMITTED Orbax artifact.

``tests/golden/ckpt_fixture`` was written once by
``scripts/make_checkpoint_fixture.py`` and committed; no test here writes
it. Restoring it demonstrates that the on-disk layout (reference
utils.py:432-508: ``{step}/**`` of ``{'model', 'ema_params'}`` including
the schedule buffers) is a stable interchange format — any checkpoint with
this tree restores into a freshly constructed model regardless of who
wrote it or with what parameter values.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from video_diffusion_nnx_tpu.diffusion import GaussianDiffusion
from video_diffusion_nnx_tpu.models import Unet3D
from video_diffusion_nnx_tpu.utils.checkpoint import load_checkpoint

FIXTURE = Path(__file__).parent / "golden" / "ckpt_fixture"
# Recipe mirrored from scripts/make_checkpoint_fixture.py.
SEED, DIM, DIM_MULTS, CHANNELS = 7, 8, (1, 2), 1
IMAGE_SIZE, FRAMES, TIMESTEPS, STEP = 16, 4, 10, 1


def build(seed: int) -> GaussianDiffusion:
    unet = Unet3D(dim=DIM, rngs=nnx.Rngs(seed), dim_mults=DIM_MULTS, channels=CHANNELS)
    return GaussianDiffusion(
        unet, image_size=IMAGE_SIZE, num_frames=FRAMES, channels=CHANNELS,
        timesteps=TIMESTEPS, loss_type="l2",
    )


class TestCommittedFixtureRestore:
    def test_restore_replaces_differently_seeded_init(self):
        """Restore into a model the fixture writer never saw (seed 99):
        every leaf must come back bit-identical to the seed-7 init."""
        model, ema = load_checkpoint(build(seed=99), STEP, str(FIXTURE))
        _, restored = nnx.split(model)
        _, expected = nnx.split(build(seed=SEED))

        restored_leaves = jax.tree_util.tree_leaves_with_path(restored)
        expected_leaves = dict(
            (jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_leaves_with_path(expected)
        )
        assert len(restored_leaves) == len(expected_leaves)
        for path, leaf in restored_leaves:
            want = expected_leaves[jax.tree_util.keystr(path)]
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(want), err_msg=jax.tree_util.keystr(path)
            )

    def test_ema_restore_selects_ema_tree(self):
        """--load-ema-params must materialize the fixture's EMA values
        (written as 0.5x the live params)."""
        model, _ = load_checkpoint(build(seed=99), STEP, str(FIXTURE), load_ema_params=True)
        _, restored = nnx.split(model)
        _, expected = nnx.split(build(seed=SEED))
        got = jax.tree_util.tree_leaves(restored)
        want = jax.tree_util.tree_leaves(expected)
        # Spot the scaling on every non-zero leaf (bias leaves are zeros).
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), 0.5 * np.asarray(w, np.float32), atol=0.0
            )

    def test_restored_model_samples(self):
        """The restored model is directly usable: a short DDPM chain runs
        and produces finite frames of the right shape."""
        model, _ = load_checkpoint(build(seed=99), STEP, str(FIXTURE))
        out = model.sample(jax.random.PRNGKey(0), batch_size=1)
        assert out.shape == (1, CHANNELS, FRAMES, IMAGE_SIZE, IMAGE_SIZE)
        assert bool(jnp.isfinite(out).all())
