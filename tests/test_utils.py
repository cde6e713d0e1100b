"""Tests for the functional core (utils layer).

Coverage model: reference utils_test.py:39-184 (helpers) — rebuilt, not
ported — plus new checks for check_shape and the stacked schedule buffers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_nnx_tpu import utils
from video_diffusion_nnx_tpu.utils.schedule import ScheduleBuffers


class TestFunctional:
    def test_exists(self):
        assert utils.exists(0)
        assert utils.exists("")
        assert not utils.exists(None)

    def test_default(self):
        assert utils.default(None, 5) == 5
        assert utils.default(3, 5) == 3
        assert utils.default(None, lambda: 7) == 7

    def test_is_odd(self):
        assert utils.is_odd(7)
        assert not utils.is_odd(4)

    def test_identity_and_noop(self):
        assert utils.identity(42, 1, k=2) == 42
        assert utils.noop(1, 2, x=3) is None

    def test_is_list_str(self):
        assert utils.is_list_str(["a", "b"])
        assert utils.is_list_str(("a",))
        assert not utils.is_list_str("a")
        assert not utils.is_list_str(["a", 1])

    def test_num_to_groups(self):
        assert utils.num_to_groups(10, 4) == [4, 4, 2]
        assert utils.num_to_groups(8, 4) == [4, 4]

    def test_get_text_from_path(self):
        assert utils.get_text_from_path("/a/b/cat-on_mat.gif") == "cat on mat"

    def test_cycle_reiterates(self):
        it = utils.cycle([1, 2])
        assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]

    def test_prob_mask_like_extremes(self):
        ones = utils.prob_mask_like((4,), 1)
        zeros = utils.prob_mask_like((4,), 0)
        assert ones.dtype == jnp.bool_ and bool(jnp.all(ones))
        assert zeros.dtype == jnp.bool_ and not bool(jnp.any(zeros))

    def test_prob_mask_like_keyed_deterministic(self):
        key = jax.random.PRNGKey(3)
        a = utils.prob_mask_like((1000,), 0.3, key=key)
        b = utils.prob_mask_like((1000,), 0.3, key=key)
        assert bool(jnp.all(a == b))
        frac = float(jnp.mean(a.astype(jnp.float32)))
        assert 0.2 < frac < 0.4

    def test_check_shape(self):
        x = jnp.zeros((2, 1, 4, 8, 8))
        utils.check_shape(x, "b c f h w", b=2, c=1, f=4, h=8, w=8)
        with pytest.raises(ValueError):
            utils.check_shape(x, "b c f h w", c=3)
        with pytest.raises(ValueError):
            utils.check_shape(x, "b c f h")


class TestImage:
    def test_normalize_roundtrip(self):
        x = jnp.linspace(0, 1, 11)
        assert float(jnp.max(jnp.abs(utils.unnormalize_img(utils.normalize_img(x)) - x))) < 1e-6
        assert float(utils.normalize_img(jnp.array(0.0))) == -1.0
        assert float(utils.normalize_img(jnp.array(1.0))) == 1.0

    def test_cast_num_frames(self):
        t = np.ones((1, 5, 8, 8), np.float32)
        same = utils.cast_num_frames(t, frames=5)
        assert same.shape == (1, 5, 8, 8)
        trunc = utils.cast_num_frames(t, frames=3)
        assert trunc.shape == (1, 3, 8, 8)
        padded = utils.cast_num_frames(t, frames=7)
        assert padded.shape == (1, 7, 8, 8)
        assert padded[:, 5:].sum() == 0
        assert padded[:, :5].sum() == t.sum()


class TestGrad:
    def test_clip_grad_norm_noop_below_threshold(self):
        grads = {"a": jnp.array([3.0, 4.0])}  # norm 5
        clipped, norm = utils.clip_grad_norm(grads, max_grad_norm=100.0)
        assert abs(float(norm) - 5.0) < 1e-3
        np.testing.assert_allclose(np.asarray(clipped["a"]), [3.0, 4.0], rtol=1e-4)

    def test_clip_grad_norm_scales(self):
        grads = {"a": jnp.array([30.0, 40.0])}  # norm 50
        clipped, norm = utils.clip_grad_norm(grads, max_grad_norm=5.0)
        assert abs(float(norm) - 50.0) < 1e-2
        clipped_norm = float(jnp.linalg.norm(clipped["a"]))
        assert abs(clipped_norm - 5.0) < 1e-2


class TestSchedule:
    def test_cosine_beta_schedule_shape_and_range(self):
        betas = utils.cosine_beta_schedule(200)
        assert betas.shape == (200,)
        assert float(betas.min()) >= 0.0
        assert float(betas.max()) <= 0.9999
        # Monotone increasing at the tail for cosine schedules.
        assert float(betas[-1]) > float(betas[0])

    def test_cosine_beta_schedule_closed_form(self):
        t_steps = 50
        betas = np.asarray(utils.cosine_beta_schedule(t_steps))
        s = 0.008
        x = np.linspace(0, t_steps, t_steps + 1, dtype=np.float32)
        ac = np.cos(((x / t_steps) + s) / (1 + s) * np.pi * 0.5) ** 2
        ac = ac / ac[0]
        expected = np.clip(1 - ac[1:] / ac[:-1], 0, 0.9999)
        np.testing.assert_allclose(betas, expected, atol=1e-5)

    def test_extract(self):
        a = jnp.arange(10.0)
        t = jnp.array([0, 3, 9])
        out = utils.extract(a, t, (3, 1, 4, 8, 8))
        assert out.shape == (3, 1, 1, 1, 1)
        np.testing.assert_allclose(np.asarray(out).ravel(), [0.0, 3.0, 9.0])

    def test_schedule_buffers_consistency(self):
        buf = ScheduleBuffers.create(100)
        assert buf.betas.shape == (100,)
        ac = np.asarray(buf.alphas_cumprod)
        np.testing.assert_allclose(
            np.asarray(buf.sqrt_alphas_cumprod), np.sqrt(ac), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(buf.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - ac), rtol=1e-6
        )
        # posterior_variance[0] uses alphas_cumprod_prev = 1 -> 0/...
        assert float(buf.posterior_variance[0]) == pytest.approx(0.0, abs=1e-8)


class TestMedia:
    def test_video_array_to_gif_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        vid = (rng.uniform(0, 255, (5, 16, 16, 1))).astype(np.uint8)
        path = tmp_path / "clip.gif"
        frames = utils.video_array_to_gif(vid, path)
        assert len(frames) == 5
        assert path.exists()

        from PIL import Image

        img = Image.open(path)
        decoded = list(utils.seek_all_images(img, channels=1))
        assert len(decoded) == 5
        assert decoded[0].size == (16, 16)

    def test_video_array_to_gif_rgb(self, tmp_path):
        vid = np.zeros((3, 8, 8, 3), np.uint8)
        path = tmp_path / "rgb.gif"
        utils.video_array_to_gif(vid, path)
        assert path.exists()
